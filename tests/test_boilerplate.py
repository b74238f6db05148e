"""Boilerplate-strip kernels: flat density rule + CETD tree variant.

The flat rule's cross-engine parity is covered by the oracle SQL
(registry: boilerplate_strip); here we pin the local semantics and the
Spark kernel's equality with the local CETD implementation.
"""

import numpy as np
import pytest

from latyas_spark.core.boilerplate import (
    CHUNK,
    FLAT_KEEP_FACTOR,
    flat_density_keep,
    node_hash,
    strip_boilerplate_doc,
    synth_nodes,
)


def test_synth_nodes_chunking_and_determinism():
    text = "a" * 130
    nodes = synth_nodes("d1", text)
    assert [n["nid"] for n in nodes] == [0, 1, 2]
    assert nodes[0]["chunk"] == "a" * CHUNK
    assert nodes[2]["chunk"] == "a" * 2
    assert synth_nodes("d1", text) == nodes  # deterministic
    assert synth_nodes("", None) == []
    assert synth_nodes("d1", "") == []
    for n in nodes:
        assert 1 <= n["depth"] <= 6
        h = node_hash("d1", n["nid"])
        assert n["is_link"] == (h % 7 == 0)


def test_flat_density_uniform_doc_keeps_everything():
    # same length + same depth everywhere -> density == mean for all
    nodes = [
        {"doc_id": "d", "nid": i, "chunk": "x" * 64, "depth": 3,
         "is_link": False}
        for i in range(10)
    ]
    assert len(flat_density_keep(nodes)) == 10


def test_flat_density_drops_deep_short_nodes():
    nodes = [
        {"doc_id": "d", "nid": 0, "chunk": "x" * 64, "depth": 1,
         "is_link": False},
        {"doc_id": "d", "nid": 1, "chunk": "x" * 8, "depth": 6,
         "is_link": False},
    ]
    kept = flat_density_keep(nodes)
    assert [n["nid"] for n in kept] == [0]


def test_flat_density_short_link_dropped_even_if_dense():
    nodes = [
        {"doc_id": "d", "nid": 0, "chunk": "x" * 20, "depth": 1,
         "is_link": True},
        {"doc_id": "d", "nid": 1, "chunk": "x" * 20, "depth": 1,
         "is_link": False},
    ]
    kept = flat_density_keep(nodes)
    assert [n["nid"] for n in kept] == [1]


def test_cetd_keeps_all_on_single_node():
    out = strip_boilerplate_doc("doc", "short text")
    assert out == [(0, "short text")]


def test_cetd_kept_subset_is_ordered_and_from_source():
    text = "word " * 400
    out = strip_boilerplate_doc("docX", text)
    assert out, "dense uniform text should keep something"
    nids = [nid for nid, _ in out]
    assert nids == sorted(nids)
    for nid, chunk in out:
        assert text[nid * CHUNK : (nid + 1) * CHUNK] == chunk


def test_cetd_descendants_of_kept_nodes_are_kept():
    text = "lorem ipsum " * 300
    out = strip_boilerplate_doc("docY", text)
    kept = {nid for nid, _ in out}
    for nid in kept:
        if nid > 0 and (nid - 1) // 2 in kept:
            pass  # fine either way
    # ancestor-propagation: if parent kept, child must be kept
    n = len(synth_nodes("docY", text))
    for i in range(1, n):
        if (i - 1) // 2 in kept:
            assert i in kept


@pytest.mark.parametrize("seed", [0, 1])
def test_spark_kernel_matches_local(spark, seed):
    import pandas as pd

    from latyas_spark.core.boilerplate import strip_boilerplate_pdf

    rng = np.random.RandomState(42 + seed)
    rows = []
    for i in range(40):
        n_words = int(rng.randint(0, 120))
        text = " ".join(
            rng.choice(["spark", "table", "row", "agg", "x"], size=n_words)
        )
        rows.append((f"bp-{seed}-{i:04d}", text or None))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.repartition(4, "doc_id")
        .mapInPandas(
            strip_boilerplate_pdf, schema="doc_id string, nid int, chunk string"
        )
        .collect()
    )
    got_set = {(r["doc_id"], r["nid"], r["chunk"]) for r in got}
    want = set()
    for doc_id, text in rows:
        for nid, chunk in strip_boilerplate_doc(doc_id, text):
            want.add((doc_id, nid, chunk))
    assert got_set == want
