"""Seeded property tests for the newest integer-exact registry
operators (VERDICT r4 #6) — randomized INPUT TABLES (not the fixture
corpus), invariants checked against independent recomputation or
structural dominance, mirroring test_property.py's oracle-on-random-
geometry pattern at Spark-query granularity:

  * unigram_drift: the full integer derivation (snapshot split,
    add-one smoothing, double integer-floor ppm, top-K tiebreak)
    equals a from-scratch pure-Python recompute on random corpora;
  * minhash_pr_eval: the (n_cand, n_true, tp, precision, recall) row
    is invariant under any bijective relabeling of doc_ids — both
    pair generators key on doc identity only, so renaming documents
    must not change set-level counts;
  * ann_ivfpq_multiprobe: probing 2 cells dominates probing 1 — the
    candidate set is a superset with identical ADC on shared
    candidates, so the sorted top-10 ADC list is element-wise <= the
    single-probe list.
"""

import random
import re

import pandas as pd
import pytest

VOCAB = [f"w{i}" for i in range(30)]


def _write_documents(tmp_path, rng, n_docs, near_dups=0):
    rows = []
    for d in range(n_docs):
        n = rng.randint(3, 40)
        words = [rng.choice(VOCAB) for _ in range(n)]
        rows.append(
            {
                "doc_id": d,
                "text": " ".join(words),
                "lang": rng.choice(["en", "de", "zh"]),
                "source": rng.choice(["web", "pdf"]),
            }
        )
    # near-dup tail: clones of earlier docs with a 1-word edit, so the
    # candidate generator and the exact-Jaccard verifier both fire
    for k in range(near_dups):
        src = rows[rng.randrange(n_docs)]
        words = src["text"].split(" ")
        words[rng.randrange(len(words))] = rng.choice(VOCAB)
        rows.append(
            {
                "doc_id": n_docs + k,
                "text": " ".join(words),
                "lang": src["lang"],
                "source": src["source"],
            }
        )
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len()
    path = tmp_path / "documents.parquet"
    df.to_parquet(path, index=False)
    return df


def _drift_pure_python(df):
    """Independent integer-exact recompute of q_unigram_drift."""
    from collections import Counter

    oc, nc = Counter(), Counter()
    for _, r in df.iterrows():
        text = r["text"]
        if r["doc_id"] % 11 != 3:
            t = text.upper() if r["doc_id"] % 11 == 5 else text
            oc.update(w for w in re.split(" +", t.strip()) if w)
        if r["doc_id"] % 13 != 7:
            nc.update(w for w in re.split(" +", text.strip()) if w)
    vocab = set(oc) | set(nc)
    n_old, n_new, v = sum(oc.values()), sum(nc.values()), len(vocab)
    out = []
    for w in vocab:
        co, cn = oc.get(w, 0), nc.get(w, 0)
        drift = ((cn + 1) * 10**9 // (n_new + v)) * 10**6 // (
            (co + 1) * 10**9 // (n_old + v)
        )
        out.append((w, co, cn, drift))
    out.sort(key=lambda t: (-abs(t[3] - 10**6), t[0]))
    return out[:20]


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_unigram_drift_matches_pure_python(spark, tmp_path, seed):
    from latyas_spark.relational.registry import q_unigram_drift

    rng = random.Random(seed)
    df = _write_documents(tmp_path, rng, n_docs=60)
    got = [
        (r["word"], r["c_old"], r["c_new"], r["drift_ppm"])
        for r in q_unigram_drift(spark, str(tmp_path)).collect()
    ]
    assert got == _drift_pure_python(df)


@pytest.mark.parametrize("seed", [5, 91])
def test_minhash_pr_eval_invariant_under_relabeling(
    spark, tmp_path, seed
):
    from latyas_spark.relational.registry import q_minhash_pr_eval

    rng = random.Random(seed)
    d_orig = tmp_path / "orig"
    d_perm = tmp_path / "perm"
    d_orig.mkdir()
    d_perm.mkdir()
    df = _write_documents(d_orig, rng, n_docs=40, near_dups=12)
    ids = df["doc_id"].tolist()
    shuffled = ids[:]
    rng.shuffle(shuffled)
    relabeled = df.copy()
    relabeled["doc_id"] = relabeled["doc_id"].map(dict(zip(ids, shuffled)))
    relabeled.to_parquet(d_perm / "documents.parquet", index=False)
    base = q_minhash_pr_eval(spark, str(d_orig)).collect()
    perm = q_minhash_pr_eval(spark, str(d_perm)).collect()
    assert len(base) == len(perm) == 1
    assert base[0].asDict() == perm[0].asDict()
    # the fixture must actually exercise the generators
    assert base[0]["n_cand"] > 0 and base[0]["n_true"] > 0


@pytest.mark.parametrize("seed", [3, 17])
def test_ann_ivfpq_multiprobe_dominates_single_probe(
    spark, tmp_path, seed
):
    import numpy as np

    from latyas_spark.relational.registry import (
        q_ann_ivfpq,
        q_ann_ivfpq_multiprobe,
    )

    rng = np.random.default_rng(seed)
    n, dim = 120, 64
    emb = rng.uniform(-1.0, 1.0, size=(n, dim)).astype("float32")
    pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [row.tolist() for row in emb],
            "label": [int(i % 5) for i in range(n)],
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    one = q_ann_ivfpq(spark, str(tmp_path)).collect()
    multi = q_ann_ivfpq_multiprobe(spark, str(tmp_path)).collect()
    assert len(multi) >= len(one) > 0
    one_adc = sorted(r["adc_dist"] for r in one)
    multi_adc = sorted(r["adc_dist"] for r in multi)
    # superset with identical ADC on shared candidates => element-wise
    # dominance of the sorted top-k ADC lists
    for m, o in zip(multi_adc, one_adc):
        assert m <= o
    # shared candidates (same cell as the query) carry the SAME adc
    one_by_id = {r["vec_id"]: r for r in one}
    for r in multi:
        if r["vec_id"] in one_by_id:
            assert r["adc_dist"] == one_by_id[r["vec_id"]]["adc_dist"]
            assert r["cid"] == one_by_id[r["vec_id"]]["cid"]
