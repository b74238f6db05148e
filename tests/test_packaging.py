"""The spark-submit --py-files artifact must track the source tree.

A stale dist/latyas_spark.zip ships silently (spark-submit happily uses
it) and then lacks newly-registered operators — callers get KeyError
from queries() on a query the repo claims to support.  Byte-compare
every packaged module against the tree so `pytest` fails until
scripts/make_pyfiles.sh is rerun.
"""

import pathlib
import zipfile

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_pyfiles_zip_matches_source_tree():
    zip_path = ROOT / "dist" / "latyas_spark.zip"
    assert zip_path.exists(), "run scripts/make_pyfiles.sh"
    with zipfile.ZipFile(zip_path) as z:
        names = set(z.namelist())
        on_disk = {
            str(p.relative_to(ROOT))
            for p in (ROOT / "latyas_spark").rglob("*.py")
            if "__pycache__" not in p.parts
        }
        assert names == on_disk, (
            "zip/tree file sets differ — run scripts/make_pyfiles.sh; "
            f"only in zip: {sorted(names - on_disk)}; "
            f"only on disk: {sorted(on_disk - names)}"
        )
        stale = [
            n for n in sorted(names)
            if z.read(n) != (ROOT / n).read_bytes()
        ]
        assert not stale, (
            f"stale modules in dist/latyas_spark.zip: {stale} — "
            "run scripts/make_pyfiles.sh"
        )
