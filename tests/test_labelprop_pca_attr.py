"""Independent local recomputation tests for the round-3b operators:
label_propagation, embed_pca, event_attribution, ngram_coverage.

Each test re-derives the expected answer in plain Python (pandas /
numpy / collections) from the raw parquet — never through the Spark
code under test — mirroring the repo's golden-oracle strategy.  The
DuckDB contract for the same four queries is covered by
scripts/check_contract.py (and the driver's CORRECTNESS gate)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from latyas_spark.relational import registry as R


# -- label_propagation -------------------------------------------------------


def test_label_propagation_votes_from_edges(spark, sf001_dir):
    """Votes recomputed from the shared candidate-edge frame (itself
    pinned by knn_graph's DuckDB hash): top-K selection, seed filter,
    floor-quantized weight sums and argmax tie-break re-derived in
    plain Python."""
    edges = R._emb_knn_edges(spark, sf001_dir).toPandas()
    labels = pd.read_parquet(f"{sf001_dir}/embeddings.parquet").set_index(
        "vec_id"
    )["label"]
    out = R.q_label_propagation(spark, sf001_dir).toPandas()

    by_node = defaultdict(list)
    for r in edges.itertuples():
        by_node[r.vec_id].append((r.cos, r.nbr_id))
    expected = {}
    for vec_id, lst in by_node.items():
        if vec_id % R.LP_SEED_MOD == 0:
            continue
        lst.sort(key=lambda t: (-t[0], t[1]))
        votes = defaultdict(lambda: [0, 0])
        for cos, nbr in lst[: R.KNN_K]:
            if nbr % R.LP_SEED_MOD != 0:
                continue
            v = votes[int(labels.loc[nbr])]
            v[0] += 1
            v[1] += int(math.floor(cos * 1_000_000))
        if not votes:
            continue
        lab, (n, w) = sorted(
            votes.items(), key=lambda kv: (-kv[1][1], kv[0])
        )[0]
        expected[vec_id] = (lab, n, w)

    got = out.set_index("vec_id")
    assert set(got.index) == set(expected)
    for vec_id, (lab, n, w) in expected.items():
        r = got.loc[vec_id]
        assert int(r["pred_label"]) == lab
        assert int(r["n_seed_nbrs"]) == n
        assert int(r["weight_sum"]) == w
    # the seed slice never appears, and at least one node got a label
    assert len(expected) > 0
    assert all(v % R.LP_SEED_MOD != 0 for v in got.index)


# -- embed_pca ---------------------------------------------------------------


def _pca_python(emb: np.ndarray):
    """Exact-int power iteration as specified: Q=1000, seed e_0, two
    rounds, HALF_UP (away-from-zero) normalization rounding."""
    iv = np.floor(emb.astype(np.float64) * R._PCA_Q).astype(np.int64)

    def step(d):
        w = (iv * d[:, None]).sum(axis=0)
        mx = np.abs(w).max()
        x = w.astype(np.float64) / float(mx) * R._PCA_Q
        # HALF_UP: round half away from zero (numpy rounds half-to-even)
        return np.where(
            x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
        ).astype(np.int64)

    v1 = step(iv[:, 0])
    v2 = step(iv @ v1)
    return iv, v2, iv @ v2


def test_embed_pca_rederivation(spark, sf001_dir):
    emb = pd.read_parquet(f"{sf001_dir}/embeddings.parquet")
    out = (
        R.q_embed_pca(spark, sf001_dir)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    emb = emb.sort_values("vec_id")
    mat = np.stack(emb["embedding"].to_numpy())
    iv, v2, proj = _pca_python(mat)
    # both sides ordered by vec_id -> exact int equality elementwise
    assert (out["pc1_proj"].to_numpy() == proj).all()
    # labels pass through unchanged
    assert (out["label"].to_numpy() == emb["label"].to_numpy()).all()


def test_embed_pca_improves_rayleigh_quotient(spark, sf001_dir):
    """Non-vacuity: the synthetic corpus has a nearly flat spectrum
    (top eigengap ~1.07), so two rounds cannot pin the exact top
    eigenvector — the honest power-iteration invariant is that each
    round strictly LIFTS the Rayleigh quotient toward the top
    eigenvalue, and v2 lands well above the mean eigenvalue (measured
    ~77% of optimal here vs 54% for the seed)."""
    emb = pd.read_parquet(f"{sf001_dir}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy())
    iv, v2, _ = _pca_python(mat)
    m = (iv.T @ iv).astype(np.float64)

    def rq(v):
        v = v.astype(np.float64)
        return (v @ m @ v) / (v @ v)

    v1 = np.where(
        np.arange(iv.shape[1]) == 0, 1, 0
    )  # seed e_0 for the chain below
    w1 = (iv * iv[:, 0][:, None]).sum(axis=0)
    mx = np.abs(w1).max()
    x = w1.astype(np.float64) / float(mx) * R._PCA_Q
    v1r = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )
    vals = np.linalg.eigvalsh(m)
    assert rq(v1) < rq(v1r) < rq(v2)
    assert rq(v2) > 1.25 * vals.mean()
    assert rq(v2) > 0.7 * vals[-1]


# -- event_attribution -------------------------------------------------------


def test_event_attribution_rederivation(spark, sf001_dir):
    ev = pd.read_parquet(f"{sf001_dir}/events.parquet")
    ev = ev[ev["event_type"].isin(["click", "purchase"])].sort_values(
        ["user_id", "ts", "event_id"]
    )
    out = (
        R.q_event_attribution(spark, sf001_dir)
        .toPandas()
        .set_index("event_id")
    )
    n_purch = 0
    for _, grp in ev.groupby("user_id"):
        last = None  # (epoch_sec_floor, click_id)
        for r in grp.itertuples():
            sec = int(np.floor(r.ts.timestamp()))
            if r.event_type == "purchase":
                n_purch += 1
                row = out.loc[r.event_id]
                if last is not None and sec - last[0] <= R._ATTR_WINDOW_SEC:
                    assert int(row["click_id"]) == last[1]
                    assert int(row["gap_sec"]) == sec - last[0]
                else:
                    assert int(row["click_id"]) == -1
                    assert int(row["gap_sec"]) == -1
                assert abs(row["amount"] - round(r.value, 2)) < 1e-9
            else:
                last = (sec, r.event_id)
    assert len(out) == n_purch
    # non-vacuity: the data contains both attributed and orphan purchases
    assert (out["click_id"] >= 0).any() and (out["click_id"] == -1).any()


# -- ngram_coverage ----------------------------------------------------------


def test_ngram_coverage_rederivation(spark, sf001_dir):
    docs = pd.read_parquet(f"{sf001_dir}/documents.parquet")
    grams_per_doc = {}
    cnt = Counter()
    for r in docs.itertuples():
        ws = r.text.strip().split()
        gs = [
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        ]
        if gs:
            grams_per_doc[str(r.doc_id)] = gs
            cnt.update(gs)
    top = {
        g
        for g, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            : R._COV_TOP
        ]
    }
    out = (
        R.q_ngram_coverage(spark, sf001_dir).toPandas().set_index("doc_id")
    )
    assert set(out.index) == set(grams_per_doc)
    for doc_id, gs in grams_per_doc.items():
        hits = sum(1 for g in gs if g in top)
        r = out.loc[doc_id]
        assert int(r["n_grams"]) == len(gs)
        assert int(r["n_in_top"]) == hits
        assert abs(r["coverage"] - round(hits / len(gs), 6)) < 1e-9
    # non-vacuity: coverage actually varies across the corpus
    assert out["coverage"].nunique() > 1


# -- vocab_growth ------------------------------------------------------------


def test_vocab_growth_rederivation(spark, sf001_dir):
    docs = pd.read_parquet(f"{sf001_dir}/documents.parquet").sort_values(
        "doc_id"
    )
    first = {}
    for r in docs.itertuples():
        ws = r.text.strip().split()
        for i in range(len(ws) - 2):
            g = " ".join(ws[i : i + 3])
            if g not in first:
                first[g] = int(r.doc_id)
    buckets = Counter(
        (fid + 1).bit_length() - 1 for fid in first.values()
    )
    out = (
        R.q_vocab_growth(spark, sf001_dir)
        .toPandas()
        .set_index("bucket")
        .sort_index()
    )
    assert set(out.index) == set(buckets)
    cum = 0
    for k in sorted(buckets):
        cum += buckets[k]
        r = out.loc[k]
        assert int(r["new_grams"]) == buckets[k]
        assert int(r["cum_vocab"]) == cum
        assert int(r["prefix_docs"]) == min(2 ** (k + 1) - 1, len(docs))
    # non-vacuity: the curve has several steps and ends at the full vocab
    assert len(out) >= 3
    assert int(out["cum_vocab"].iloc[-1]) == len(first)


# -- snapshot_diff -----------------------------------------------------------


def test_snapshot_diff_rederivation(spark, sf001_dir):
    docs = pd.read_parquet(f"{sf001_dir}/documents.parquet")
    out = (
        R.q_snapshot_diff(spark, sf001_dir)
        .toPandas()
        .set_index("doc_id")["change_type"]
    )
    expected = {}
    for r in docs.itertuples():
        d = int(r.doc_id)
        in_old = d % 11 != 3
        in_new = d % 13 != 7
        if not in_old and not in_new:
            continue
        if not in_old:
            expected[d] = "added"
        elif not in_new:
            expected[d] = "deleted"
        elif d % 11 == 5 and r.text.upper() != r.text:
            expected[d] = "modified"
        else:
            expected[d] = "unchanged"
    assert dict(out) == expected
    # non-vacuity: all four outcomes occur
    assert set(expected.values()) == {
        "added",
        "deleted",
        "modified",
        "unchanged",
    }
