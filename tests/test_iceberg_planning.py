"""UNGATED unit tests for iceberg.py's pure checkpoint-commit planning
half (VERDICT r4 #7): DDL construction, overwrite-filter predicates,
config-drift checking, the resume work list, and manifest-row
construction all execute without a catalog or JVM — only the thin
``spark.sql``/``writeTo`` executors stay behind the jar gate
(tests/test_iceberg_optional.py)."""

import pytest

from latyas_spark.pipeline.iceberg import (
    CHECKPOINT_SCHEMA,
    check_config_drift,
    checkpoint_table_ddl,
    doc_id_prune_sql,
    manifest_row,
    overwrite_filter_sql,
    remaining_buckets,
    spans_table_ddl,
)


def test_spans_ddl_has_hidden_bucket_and_commit_unit():
    ddl = spans_table_ddl("local.latyas", doc_id_buckets=128)
    assert "CREATE TABLE IF NOT EXISTS local.latyas.spans" in ddl
    assert "USING iceberg" in ddl
    # commit unit first, then the hidden transform — readers filtering
    # on doc_id prune without a derived column in the schema
    assert "PARTITIONED BY (ckpt_bucket, bucket(128, doc_id))" in ddl
    for col in ("doc_id STRING", "`order` INT", "media_ref STRING",
                "_pid INT", "ckpt_bucket INT"):
        assert col in ddl


def test_checkpoint_ddl_lineage_shape():
    ddl = checkpoint_table_ddl("ns1")
    assert "CREATE TABLE IF NOT EXISTS ns1.checkpoint" in ddl
    assert "lineage ARRAY<STRUCT<partition_id: INT, spans: BIGINT>>" in ddl
    assert "USING iceberg" in ddl


def test_overwrite_filter_is_exactly_one_bucket():
    assert overwrite_filter_sql(0) == "ckpt_bucket = 0"
    assert overwrite_filter_sql(15) == "ckpt_bucket = 15"
    with pytest.raises(ValueError):
        overwrite_filter_sql(-1)
    with pytest.raises(TypeError):
        overwrite_filter_sql("3; DROP TABLE spans")
    with pytest.raises(TypeError):
        overwrite_filter_sql(True)


def test_doc_id_prune_escapes_quotes():
    assert doc_id_prune_sql("doc-00000001") == "doc_id = 'doc-00000001'"
    assert doc_id_prune_sql("o'brien") == "doc_id = 'o''brien'"


def test_config_drift_accepts_same_and_null_sha():
    done = check_config_drift(
        [(0, "aaa"), (2, "aaa"), (5, None)], fp="aaa"
    )
    assert done == {0, 2, 5}


def test_config_drift_refuses_mismatch():
    with pytest.raises(ValueError, match="config drift: bucket 2"):
        check_config_drift([(0, "aaa"), (2, "bbb")], fp="aaa")


def test_remaining_buckets_resume_order():
    assert remaining_buckets(6, set()) == [0, 1, 2, 3, 4, 5]
    assert remaining_buckets(6, {0, 3, 5}) == [1, 2, 4]
    # a widened re-run with fewer buckets tolerates out-of-range ids
    assert remaining_buckets(4, {2, 9}) == [0, 1, 3]
    assert remaining_buckets(0, {1}) == []


def test_manifest_row_totals_derive_from_lineage():
    row = manifest_row(
        "run-7", 3, "sha" * 8, [(2, 10), (0, 5), (1, 7)], 1.23456
    )
    run_id, bucket, status, sha, spans, wall, lineage = row
    assert (run_id, bucket, status) == ("run-7", 3, "done")
    assert spans == 22  # sum of lineage, never passed separately
    assert wall == 1.235
    # lineage sorted by partition id for stable manifests
    assert [d["partition_id"] for d in lineage] == [0, 1, 2]
    assert [d["spans"] for d in lineage] == [5, 7, 10]
    # one value per top-level schema field (the nested struct's comma
    # doesn't split a field)
    assert len(row) == 7
    assert CHECKPOINT_SCHEMA.count("run_id") == 1
