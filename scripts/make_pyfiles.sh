#!/bin/sh
# Package the engine for spark-submit --py-files (north rule packaging).
#
#   sh scripts/make_pyfiles.sh               # -> dist/latyas_spark.zip
#   spark-submit --py-files dist/latyas_spark.zip scripts/run_extract.py \
#       --input s3://corpus/documents --sidecar s3://corpus/layout_blocks \
#       --output s3://out/spans
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/latyas_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/latyas_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("latyas_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/latyas_spark.zip")
EOF
