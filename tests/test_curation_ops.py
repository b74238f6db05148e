"""Independent local recomputation tests for the round-3 curation /
structure operators: reading_order_eval, bigram_lm_score,
filter_cascade, section_assign, bpe_merges.

Each test re-derives the expected answer in plain Python (pandas /
collections) from the raw parquet — never through the Spark code under
test — mirroring the repo's golden-oracle strategy."""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
import pytest

from latyas_spark.relational import registry as R


def _docs(sf001_dir):
    return pd.read_parquet(f"{sf001_dir}/documents.parquet")


# -- reading_order_eval ------------------------------------------------------


def test_reading_order_eval_tau_from_ranks(spark, sf001_dir):
    """tau recomputed per page from the two rank queries' own outputs
    (which are themselves hash-checked against DuckDB): exhaustive
    pair enumeration in Python."""
    g = R.q_grid_rank(spark, sf001_dir).toPandas()
    p = R.q_position_rank(spark, sf001_dir).toPandas()
    out = R.q_reading_order_eval(spark, sf001_dir).toPandas()
    j = g.merge(p, on=["doc_id", "page", "offset"])
    got = out.set_index(["doc_id", "page"])
    assert len(out) == j.groupby(["doc_id", "page"]).ngroups
    for (doc, page), grp in j.groupby(["doc_id", "page"]):
        rows = list(zip(grp["grid_rank"], grp["position_rank"]))
        conc = disc = 0
        for i in range(len(rows)):
            for k in range(i + 1, len(rows)):
                if (rows[i][0] < rows[k][0]) == (rows[i][1] < rows[k][1]):
                    conc += 1
                else:
                    disc += 1
        r = got.loc[(doc, page)]
        assert int(r["n_blocks"]) == len(rows)
        assert int(r["concordant"]) == conc
        assert int(r["discordant"]) == disc
        n_pairs = conc + disc
        if n_pairs == 0:
            assert r["tau"] == 1.0
        else:
            assert abs(r["tau"] - round((conc - disc) / n_pairs, 6)) < 1e-9
    # the two strategies genuinely differ somewhere (metric is not vacuous)
    assert (out["tau"] < 1.0).any()


# -- bigram_lm_score ---------------------------------------------------------


def test_bigram_lm_score_rederivation(spark, sf001_dir):
    docs = _docs(sf001_dir)
    toks = {r.doc_id: re.split(" +", r.text) for r in docs.itertuples()}
    uni = Counter(w for ws in toks.values() for w in ws)
    total = sum(uni.values())
    bbudget = int(math.floor(math.log2(total)))
    vocab = {w: c for w, c in uni.items() if c >= R._PPL_MIN_CNT}
    bg = Counter()
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] += 1
    hit_bits = {
        (a, b): int(math.floor(math.log2(vocab[a])))
        - int(math.floor(math.log2(c)))
        for (a, b), c in bg.items()
        if c >= R._BG_MIN_CNT and a in vocab
    }
    backoff = {
        w: bbudget - int(math.floor(math.log2(c))) + R._BG_BACKOFF
        for w, c in vocab.items()
    }
    out = R.q_bigram_lm_score(spark, sf001_dir).toPandas()
    got = out.set_index("doc_id")
    assert len(out) == sum(1 for ws in toks.values() if len(ws) >= 2)
    for doc_id, ws in toks.items():
        if len(ws) < 2:
            continue
        bits, hits = [], 0
        for a, b in zip(ws, ws[1:]):
            if (a, b) in hit_bits:
                bits.append(hit_bits[(a, b)])
                hits += 1
            elif b in backoff:
                bits.append(backoff[b])
            else:
                bits.append(bbudget + 1 + R._BG_BACKOFF)
        r = got.loc[doc_id]
        assert int(r["n_bigrams"]) == len(bits)
        assert int(r["n_hits"]) == hits
        assert int(r["mbits"]) == sum(bits) * 1000 // len(bits)
        assert abs(r["hit_rate"] - round(hits / len(bits), 6)) < 1e-9


# -- filter_cascade ----------------------------------------------------------


def test_filter_cascade_funnel_chains_and_rederivation(spark, sf001_dir):
    docs = _docs(sf001_dir)
    flags = []
    for r in docs.itertuples():
        t = r.text
        f1 = bool(re.search(r"(^| )(the|and|of|a)( |$)", t)) and not re.search(
            "[一-鿿]", t
        )
        ws = re.split(" +", t.strip())
        f2 = 10 <= len(ws) <= 1000
        mean_wl = len(t.replace(" ", "")) / len(ws)
        sym = len(t) - len(re.sub("[^a-zA-Z0-9 ]", "", t))
        f3 = 2.0 <= mean_wl <= 12.0 and sym / len(t) <= 0.2
        grams = [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
        f4 = len(grams) == 0 or (
            (len(grams) - len(set(grams))) / len(grams) <= 0.3
        )
        flags.append((r.doc_id, t, f1, f2, f3, f4))
    n0 = len(flags)
    n1 = sum(f[2] for f in flags)
    n2 = sum(f[2] and f[3] for f in flags)
    n3 = sum(f[2] and f[3] and f[4] for f in flags)
    n4 = sum(all(f[2:6]) for f in flags)
    first = {}
    for doc_id, t, f1, f2, f3, f4 in flags:
        if f1 and f2 and f3 and f4:
            first.setdefault(t, doc_id)
            first[t] = min(first[t], doc_id)
    n5 = sum(
        1
        for doc_id, t, f1, f2, f3, f4 in flags
        if f1 and f2 and f3 and f4 and first[t] == doc_id
    )
    out = (
        R.q_filter_cascade(spark, sf001_dir)
        .toPandas()
        .sort_values("stage")
        .reset_index(drop=True)
    )
    assert list(out["stage_name"]) == [
        "langid",
        "length",
        "quality",
        "repetition",
        "exact_dedup",
    ]
    assert list(out["n_in"]) == [n0, n1, n2, n3, n4]
    assert list(out["n_kept"]) == [n1, n2, n3, n4, n5]
    # funnel chain invariant: each stage's n_in is the previous n_kept
    for i in range(1, 5):
        assert out.loc[i, "n_in"] == out.loc[i - 1, "n_kept"]
        assert out.loc[i, "n_kept"] <= out.loc[i, "n_in"]


# -- section_assign ----------------------------------------------------------


def test_section_assign_partition_and_titles(spark, sf001_dir):
    from latyas_spark.pipeline.adapter import synth_blocks
    from pyspark.sql import functions as F

    b = (
        synth_blocks(spark, sf001_dir)
        .withColumn("kind", R._classify_col())
        .toPandas()
    )
    out = R.q_section_assign(spark, sf001_dir).toPandas()
    # sections partition every doc's blocks exactly
    per_doc_blocks = b.groupby("doc_id").size()
    per_doc_sections = out.groupby("doc_id")["n_blocks"].sum()
    assert per_doc_blocks.sort_index().equals(per_doc_sections.sort_index())
    for doc_id, grp in b.groupby("doc_id"):
        grp = grp.sort_values(["page", "offset"])
        sid, opener = 0, {}
        counts = Counter()
        for r in grp.itertuples():
            if r.kind == "title":
                sid += 1
                opener[sid] = r.text
            counts[sid] += 1
        g = out[out["doc_id"] == doc_id].set_index("section_id")
        assert set(g.index) == set(counts)
        for s in counts:
            assert int(g.loc[s, "n_blocks"]) == counts[s]
            expect = opener.get(s, "<preamble>")
            assert g.loc[s, "section_title"] == expect
    assert (out[out["section_id"] == 0]["section_title"] == "<preamble>").all()


# -- bpe_merges --------------------------------------------------------------


def _bpe_greedy_apply(s, a, b):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def test_bpe_merges_against_reference_trainer(spark, sf001_dir):
    """Plain-Python BPE trainer (the textbook Sennrich loop) over the
    same word-frequency table must produce the identical merge list,
    counts, and post-merge vocab sizes."""
    docs = _docs(sf001_dir)
    wc = Counter(w for t in docs["text"] for w in re.split(" +", t))
    wc = {w: c for w, c in wc.items() if c >= R._BPE_MIN_FREQ}
    syms = {w: list(w) for w in wc}
    expected = []
    for _ in range(R._BPE_ROUNDS):
        pc = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += wc[w]
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        syms = {w: _bpe_greedy_apply(s, a, b) for w, s in syms.items()}
        vocab_after = len({x for s in syms.values() for x in s})
        expected.append((a, b, c, vocab_after))
    out = (
        R.q_bpe_merges(spark, sf001_dir)
        .toPandas()
        .sort_values("round")
        .reset_index(drop=True)
    )
    assert len(out) == R._BPE_ROUNDS
    for i, (a, b, c, v) in enumerate(expected):
        assert out.loc[i, "best_a"] == a
        assert out.loc[i, "best_b"] == b
        assert int(out.loc[i, "pair_count"]) == c
        assert int(out.loc[i, "n_symbols_after"]) == v


def test_bpe_fold_degenerate_overlap(spark):
    """[a,a,a] with pair (a,a) must merge greedily to [aa,a] — the
    overlap case where naive string replace double-merges."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(["a", "a", "a"],)], "s array<string>")
    df = df.select(
        F.lit("a").alias("best_a"), F.lit("a").alias("best_b"), "s"
    )
    got = df.select(F.expr(R._bpe_fold_expr()).alias("m")).collect()[0]["m"]
    assert got == ["aa", "a"]
    assert _bpe_greedy_apply(["a", "a", "a"], "a", "a") == ["aa", "a"]
