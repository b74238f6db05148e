"""Multi-format documents source: JSONL and parquet feeds must be
indistinguishable downstream — identical schema, identical extraction
output — and corrupt crawl shards must fail loudly under strict mode.
"""

import pytest

from latyas_spark.pipeline.extract import extract_spans
from latyas_spark.pipeline.sources import (
    INTERLEAVED_SCHEMA,
    read_interleaved_docs,
)


@pytest.fixture(scope="module")
def jsonl_corpus(spark, corpus_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("jsonl") / "documents.jsonl")
    spark.read.parquet(f"{corpus_dir}/documents.parquet").write.json(d)
    return d


def test_jsonl_feed_matches_parquet_feed(spark, corpus_dir, jsonl_corpus):
    pq = read_interleaved_docs(spark, f"{corpus_dir}/documents.parquet")
    js = read_interleaved_docs(spark, jsonl_corpus)
    want = INTERLEAVED_SCHEMA.simpleString()
    assert js.schema.simpleString() == want
    assert pq.schema.simpleString() == want
    blocks = spark.read.parquet(f"{corpus_dir}/layout_blocks.parquet")
    key = ["doc_id", "order"]
    a = extract_spans(pq, blocks).toPandas().sort_values(key).reset_index(drop=True)
    b = extract_spans(js, blocks).toPandas().sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_strict_mode_fails_on_corrupt_shard(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"doc_id": "ok-1", "spans": []}\n'
        "{this is not json at all\n"
    )
    with pytest.raises(Exception):
        read_interleaved_docs(spark, str(p), fmt="json", strict=True).count()
    lax = read_interleaved_docs(spark, str(p), fmt="json", strict=False)
    rows = lax.toPandas()
    assert list(rows.doc_id) == ["ok-1"]


def test_format_inference_and_rejection(spark, corpus_dir):
    df = read_interleaved_docs(spark, f"{corpus_dir}/documents.parquet")
    assert df.schema.simpleString() == INTERLEAVED_SCHEMA.simpleString()
    with pytest.raises(ValueError):
        read_interleaved_docs(spark, "x.avro", fmt="avro")
