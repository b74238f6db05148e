"""Independent rederivations for the layout/scale-planning operators:
skew_profile (salting planner), zorder_layout (Morton clustering),
bpe_encode (distributed merge application), media_dedup (CAS dedup).

Each test recomputes the expected output in plain pandas/python from
the raw parquet (never via the query's own SQL), so the Spark plan and
the DuckDB oracle are BOTH checked against a third derivation.
"""

import hashlib
import math
from collections import Counter

import pandas as pd
import pytest

from latyas_spark.relational import registry as R


# -- skew_profile ------------------------------------------------------------


def test_skew_profile_rederivation(spark, sf001_dir):
    ev = pd.read_parquet(f"{sf001_dir}/events.parquet")
    counts = ev.groupby("user_id").size().reset_index(name="cnt")
    counts = counts.sort_values(
        ["cnt", "user_id"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)
    total = len(ev)
    out = (
        R.q_skew_profile(spark, sf001_dir)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert len(out) == min(R._SKEW_TOPK, len(counts))
    for i, r in out.iterrows():
        exp = counts.iloc[i]
        assert int(r["user_id"]) == int(exp["user_id"])
        assert int(r["cnt"]) == int(exp["cnt"])
        assert int(r["rank"]) == i + 1
        assert int(r["share_ppm"]) == int(exp["cnt"] * 1000000 / total)
        assert int(r["salt_factor"]) == math.ceil(
            exp["cnt"] / R._SKEW_TARGET_ROWS
        )
    # non-vacuity: the profile is ordered and the head is a real hitter
    assert out["cnt"].is_monotonic_decreasing
    assert int(out["cnt"].iloc[0]) > int(out["cnt"].iloc[-1])


# -- zorder_layout -----------------------------------------------------------


def _morton(zx: int, zy: int, bits: int) -> int:
    m = 0
    for i in range(bits):
        m += ((zx >> i) & 1) << (2 * i)
        m += ((zy >> i) & 1) << (2 * i + 1)
    return m


def test_zorder_layout_rederivation_and_locality(spark, sf001_dir):
    li = pd.read_parquet(f"{sf001_dir}/lineitem.parquet")
    zx = (li["l_partkey"] % 256).astype(int)
    zy = (li["l_suppkey"] % 256).astype(int)
    morton = [_morton(a, b, R._ZORDER_BITS) for a, b in zip(zx, zy)]
    exp = pd.DataFrame({"zx": zx, "zy": zy, "morton": morton})
    exp["z_bucket"] = exp["morton"] // (1 << R._ZORDER_BUCKET_SHIFT)
    g = exp.groupby("z_bucket")
    out = (
        R.q_zorder_layout(spark, sf001_dir)
        .toPandas()
        .set_index("z_bucket")
        .sort_index()
    )
    assert set(out.index) == set(g.groups)
    assert int(out["n_rows"].sum()) == len(li)
    for b, grp in g:
        r = out.loc[b]
        assert int(r["n_rows"]) == len(grp)
        assert int(r["x_span"]) == int(grp["zx"].max() - grp["zx"].min())
        assert int(r["y_span"]) == int(grp["zy"].max() - grp["zy"].min())
        assert int(r["z_min"]) == int(grp["morton"].min())
        assert int(r["z_max"]) == int(grp["morton"].max())
    # the z-order locality invariant: a top-6-bit bucket fixes the top
    # 3 bits of each dim, so per-bucket spans are bounded by 31 and the
    # morton range stays inside the bucket's 1024-key window
    assert (out["x_span"] <= 31).all()
    assert (out["y_span"] <= 31).all()
    shift = 1 << R._ZORDER_BUCKET_SHIFT
    for b, r in out.iterrows():
        assert b * shift <= int(r["z_min"]) <= int(r["z_max"]) < (b + 1) * shift


# -- bpe_encode --------------------------------------------------------------


def test_bpe_encode_rederivation(spark, sf001_dir):
    docs = pd.read_parquet(f"{sf001_dir}/documents.parquet")
    docs = docs[docs["text"].str.strip().str.len() > 0]
    pair_counts = Counter()
    for t in docs["text"]:
        for w in t.strip().split():
            for i in range(len(w) - 1):
                pair_counts[w[i : i + 2]] += 1
    top = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    pat = top[0] + " " + top[1]
    out = (
        R.q_bpe_encode(spark, sf001_dir).toPandas().set_index("doc_id")
    )
    assert len(out) == len(docs)
    n_checked_merges = 0
    for r in docs.itertuples():
        words = r.text.strip().split()
        # python str.replace is leftmost-non-overlapping: the exact
        # greedy single-pass semantics the query's replace() relies on
        enc = [" ".join(w).replace(pat, top) for w in words]
        before = sum(len(w) for w in words)
        after = sum(len(e.split(" ")) for e in enc)
        row = out.loc[int(r.doc_id)]
        assert int(row["n_sym_before"]) == before
        assert int(row["n_sym_after"]) == after
        assert int(row["n_merged"]) == before - after
        fp = hashlib.md5(" | ".join(enc).encode()).hexdigest()
        assert row["enc_fp"] == fp
        n_checked_merges += before - after
    # non-vacuity: the corpus-wide winning pair actually merges things
    assert n_checked_merges > 0


# -- media_dedup -------------------------------------------------------------


def test_media_dedup_rederivation(spark, sf001_dir):
    from latyas_spark.pipeline.adapter import synth_blocks

    b = synth_blocks(spark, sf001_dir).toPandas()
    m = b[b["media_ref"].notna()].copy()
    m["payload_fp"] = [
        hashlib.md5(str(int(ref[8:]) % 97).encode()).hexdigest()
        for ref in m["media_ref"]
    ]
    out = (
        R.q_media_dedup(spark, sf001_dir).toPandas().set_index("payload_fp")
    )
    g = m.groupby("payload_fp")
    expected = {fp for fp, grp in g if len(grp) >= 2}
    assert set(out.index) == expected
    for fp, grp in g:
        if len(grp) < 2:
            continue
        r = out.loc[fp]
        canonical = grp["media_ref"].min()
        assert int(r["n_copies"]) == len(grp)
        assert int(r["n_docs"]) == grp["doc_id"].nunique()
        assert r["canonical_ref"] == canonical
        assert int(r["bytes_saved"]) == int(
            grp["media_ref"].str.len().sum() - len(canonical)
        )
    # non-vacuity: shared payloads exist and some span multiple docs
    assert len(out) > 0
    assert (out["n_docs"] >= 2).any()


# -- event_transitions ---------------------------------------------------------


def test_event_transitions_rederivation(spark, sf001_dir):
    ev = pd.read_parquet(f"{sf001_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    pairs = Counter()
    for _, grp in ev.groupby("user_id", sort=False):
        types = list(grp["event_type"])
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] += 1
    row_tot = Counter()
    for (a, _), c in pairs.items():
        row_tot[a] += c
    out = (
        R.q_event_transitions(spark, sf001_dir)
        .toPandas()
        .set_index(["event_type", "next_type"])
    )
    assert set(out.index) == set(pairs)
    for (a, b), c in pairs.items():
        r = out.loc[(a, b)]
        assert int(r["cnt"]) == c
        assert int(r["p_ppm"]) == math.floor(c * 1000000 / row_tot[a])
    # rows of the matrix sum to ~1 (ppm floor loses < n_cols per row)
    sums = out.groupby(level=0)["p_ppm"].sum()
    assert ((sums > 999900) & (sums <= 1000000)).all()


# -- join_size_estimate --------------------------------------------------------


def test_join_size_estimate_matches_executed_join(spark, sf001_dir):
    """The estimate must EQUAL the real join's size — computed here by
    actually executing the join in pandas (the thing the query avoids
    doing at scale)."""
    li = pd.read_parquet(f"{sf001_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf001_dir}/orders.parquet")
    joined = li.merge(
        orders[["o_orderkey", "o_orderstatus"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    actual = joined.groupby("o_orderstatus").size()
    out = (
        R.q_join_size_estimate(spark, sf001_dir)
        .toPandas()
        .set_index("o_orderstatus")
    )
    assert set(out.index) == set(actual.index)
    for status, n in actual.items():
        assert int(out.loc[status, "est_rows"]) == int(n)
    # n_keys counts matched orderkeys, bounded by the orders side
    assert int(out["n_keys"].sum()) <= orders["o_orderkey"].nunique()
    assert (out["max_key_rows"] >= 1).all()


# -- triangle_count ------------------------------------------------------------


def test_triangle_count_rederivation(spark, sf001_dir):
    """Rederive per-node triangle counts in python sets from the SAME
    kNN edge list the query consumes (the graph construction itself is
    oracle-checked as knn_graph)."""
    knn = R.q_knn_graph(spark, sf001_dir).toPandas()
    edges = set()
    for r in knn.itertuples():
        a, b = sorted((int(r.vec_id), int(r.nbr_id)))
        edges.add((a, b))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = Counter()
    for a, b in edges:
        common = adj[a] & adj[b]
        for c in common:
            x, y, z = sorted((a, b, c))
            tri[(x, y, z)] += 1
    per_node = Counter()
    for (x, y, z), c in tri.items():
        assert c == 3  # each triangle discovered via each of its edges
        for v in (x, y, z):
            per_node[v] += 1
    out = (
        R.q_triangle_count(spark, sf001_dir).toPandas().set_index("vec_id")
    )
    assert set(out.index) == set(adj)
    for v, nbrs in adj.items():
        r = out.loc[v]
        assert int(r["deg"]) == len(nbrs)
        assert int(r["tri"]) == per_node.get(v, 0)
        d = len(nbrs)
        exp_cc = (
            math.floor(per_node.get(v, 0) * 2000000 / (d * (d - 1)))
            if d >= 2
            else 0
        )
        assert int(r["cc_ppm"]) == exp_cc
    # non-vacuity: the LSH-candidate kNN graph really contains triangles
    assert len(tri) > 0
    assert (out["cc_ppm"] > 0).any()


# -- watermark_lag_stats -------------------------------------------------------


def test_watermark_lag_stats_rederivation(spark, sf001_dir):
    ev = pd.read_parquet(f"{sf001_dir}/events.parquet")
    ev = ev.assign(
        shard=(ev["user_id"] % 8).astype(int),
        arrival_seq=ev["event_id"] + (ev["event_id"] * 37) % 11,
        sec=ev["ts"].values.astype("datetime64[s]").astype("int64"),
    ).sort_values(["shard", "arrival_seq", "event_id"])
    hist = Counter()
    max_lag = Counter()
    for shard, grp in ev.groupby("shard"):
        hwm = -(10**18)
        for s in grp["sec"]:
            hwm = max(hwm, s)
            lag = int(hwm - s)
            b = (lag + 1).bit_length() - 1
            hist[(shard, b)] += 1
            max_lag[(shard, b)] = max(max_lag[(shard, b)], lag)
    out = (
        R.q_watermark_lag_stats(spark, sf001_dir)
        .toPandas()
        .set_index(["shard", "lag_bucket"])
    )
    assert set(out.index) == set(hist)
    for k, n in hist.items():
        assert int(out.loc[k, "n_events"]) == n
        assert int(out.loc[k, "max_lag_sec"]) == max_lag[k]
    # non-vacuity: the jittered arrival order produces real lateness,
    # enough to size a watermark from (several nonzero buckets)
    assert len({b for (_, b) in hist if b > 0}) >= 3


# -- cluster_purity ------------------------------------------------------------


def test_cluster_purity_rederivation(spark, sf001_dir):
    """Rederive purity in pandas from the SAME materialized assignment
    frame (the Lloyd chain itself is oracle-checked via ann_kmeans and
    semdedup); purity/majority arithmetic is re-done independently."""
    from latyas_spark.relational.registry import (
        _km_final_assign,
        _km_vectors,
    )

    assigned = (
        _km_final_assign(_km_vectors(spark, sf001_dir))
        .select("vec_id", "cid")
        .toPandas()
    )
    emb = pd.read_parquet(f"{sf001_dir}/embeddings.parquet")[
        ["vec_id", "label"]
    ]
    m = assigned.merge(emb, on="vec_id")
    out = (
        R.q_cluster_purity(spark, sf001_dir).toPandas().set_index("cid")
    )
    assert set(out.index) == set(m["cid"].unique())
    assert int(out["n_vecs"].sum()) == len(emb)
    for cid, grp in m.groupby("cid"):
        counts = grp.groupby("label").size()
        best = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        r = out.loc[cid]
        assert int(r["n_vecs"]) == len(grp)
        assert int(r["majority_label"]) == int(best[0])
        assert int(r["purity_ppm"]) == math.floor(
            best[1] * 1000000 / len(grp)
        )
    # non-vacuity: clusters are purer than the label prior -> the
    # embedding space actually separates labels
    n_labels = emb["label"].nunique()
    assert (out["purity_ppm"] > 1000000 // n_labels).any()


# -- scan_prune_stats ----------------------------------------------------------


def test_scan_prune_stats_rederivation(spark, sf001_dir):
    li = pd.read_parquet(f"{sf001_dir}/lineitem.parquet")
    d = li["l_shipdate"].dt.strftime("%Y-%m-%d")
    month = li["l_shipdate"].dt.strftime("%Y-%m")
    out = (
        R.q_scan_prune_stats(spark, sf001_dir)
        .toPandas()
        .set_index("part_month")
    )
    grp = pd.DataFrame({"m": month, "d": d}).groupby("m")["d"]
    assert set(out.index) == set(grp.groups)
    assert int(out["n_rows"].sum()) == len(li)
    for m_, ds in grp:
        r = out.loc[m_]
        assert int(r["n_rows"]) == len(ds)
        assert r["min_ship"] == ds.min()
        assert r["max_ship"] == ds.max()
        exp_pruned = int(ds.max() < R._PRUNE_LO or ds.min() > R._PRUNE_HI)
        assert int(r["pruned"]) == exp_pruned
    # non-vacuity: the predicate prunes MOST partitions (that is the
    # point of partition stats) but not all
    pruned_frac = out.loc[out["pruned"] == 1, "n_rows"].sum() / len(li)
    assert 0.5 < pruned_frac < 1.0


# -- column_stats --------------------------------------------------------------


def test_column_stats_rederivation(spark, sf001_dir):
    li = pd.read_parquet(f"{sf001_dir}/lineitem.parquet")
    out = (
        R.q_column_stats(spark, sf001_dir).toPandas().set_index("col_name")
    )
    assert set(out.index) == set(R._STATS_COLS)
    for c in R._STATS_COLS:
        col = li[c]
        r = out.loc[c]
        assert int(r["n_distinct"]) == col.nunique()
        assert int(r["n_nulls"]) == int(col.isna().sum())
        # min/max compare as strings the way both engines render them;
        # numeric columns re-parse for a value-level check instead
        if col.dtype == object:
            assert r["min_val"] == col.min()
            assert r["max_val"] == col.max()
        else:
            assert float(r["min_val"]) == float(col.min())
            assert float(r["max_val"]) == float(col.max())
    # non-vacuity: the profile distinguishes categorical from numeric
    assert int(out.loc["l_returnflag", "n_distinct"]) < 10
    assert int(out.loc["l_extendedprice", "n_distinct"]) > 100


def test_value_histogram_rederivation(spark, sf001_dir):
    from decimal import Decimal

    li = pd.read_parquet(f"{sf001_dir}/lineitem.parquet")
    cents = (
        li["l_extendedprice"]
        .map(lambda x: int(Decimal(str(x)).quantize(Decimal("0.01")) * 100))
        .astype("int64")
    )
    vmin, vmax = int(cents.min()), int(cents.max())
    width_num = vmax - vmin + 1
    bins = ((cents - vmin) * R._HIST_BINS // width_num).astype(int)
    out = (
        R.q_value_histogram(spark, sf001_dir).toPandas().set_index("bin")
    )
    exp = bins.value_counts()
    assert set(out.index) == set(exp.index)
    assert int(out["n_rows"].sum()) == len(li)
    for b, n in exp.items():
        r = out.loc[b]
        assert int(r["n_rows"]) == n
        assert int(r["bin_lo_cents"]) == vmin + b * width_num // R._HIST_BINS
    # every bin within range is populated (equi-width over a dense
    # uniform-ish price distribution) and the max value lands in the
    # last bin, never out of range
    assert bins.max() == R._HIST_BINS - 1
    assert bins.min() == 0


# -- plan-shape guards ---------------------------------------------------------

# Measured executed-plan shuffle counts for the scale-planning family:
# a regression that adds an Exchange (e.g. losing a partitioning reuse
# or a broadcast downgrade) fails here before it ever reaches a bench.
_PLAN_SHUFFLES = {
    "zorder_layout": 1,  # per-row morton projection + one 64-key agg
    "bpe_encode": 1,  # ONLY the pair-count learn shuffles; encode is
    #                   a map-side broadcast-join projection
    "watermark_lag_stats": 1,  # shard window; histogram agg reuses it
    "scan_prune_stats": 1,  # one partition-stats agg
    "media_dedup": 2,  # synth row_number window + content-hash agg
    "skew_profile": 2,  # key agg (TakeOrderedAndProject top-K, no
    #                     global sort) + single-row total-count agg
    "event_transitions": 3,  # user window + pair agg + row-normalize
}


@pytest.mark.parametrize("name", sorted(_PLAN_SHUFFLES))
def test_scale_ops_plan_shuffle_counts(name, spark, sf001_dir):
    fn = R._REGISTRY[name][0]
    plan = (
        fn(spark, sf001_dir)._jdf.queryExecution().executedPlan().toString()
    )
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == _PLAN_SHUFFLES[name], plan


def test_ngram_novelty_single_corpus_scan(spark, sf001_dir):
    """Both consumers of the gram frame (per-doc size, first-occurrence
    agg) must read the ONE lazily-checkpointed frame — zero parquet
    scans in the final plan means the corpus tokenize runs once, and
    the within-doc dedup is array_distinct BEFORE the explode, so no
    global DISTINCT exchange either (exactly 2 shuffles: gram-key agg
    + doc-key agg)."""
    plan = (
        R.q_ngram_novelty(spark, sf001_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 0, plan
    assert plan.count("Scan ExistingRDD") == 2, plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 2, plan


def test_bpe_encode_merge_table_is_broadcast(spark, sf001_dir):
    """The learned merge must reach the corpus as a broadcast, never a
    shuffled join — that is the whole scan-speed-encode argument."""
    plan = (
        R.q_bpe_encode(spark, sf001_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan


# -- k_anonymity ---------------------------------------------------------------


def test_k_anonymity_rederivation(spark, sf001_dir):
    docs = pd.read_parquet(f"{sf001_dir}/documents.parquet")
    lb = (docs["n_chars"] + 1).map(int).map(lambda v: v.bit_length() - 1)
    grp = (
        pd.DataFrame({"lang": docs["lang"], "lb": lb})
        .groupby(["lang", "lb"])
        .size()
    )
    out = (
        R.q_k_anonymity(spark, sf001_dir)
        .toPandas()
        .set_index(["lang", "len_bucket"])
    )
    assert set(out.index) == set(grp.index)
    assert int(out["n_docs"].sum()) == len(docs)
    for key, n in grp.items():
        r = out.loc[key]
        assert int(r["n_docs"]) == n
        assert int(r["risky"]) == int(n < R._KANON_K)
    # non-vacuity: the audit finds BOTH risky classes and safe mass
    assert (out["risky"] == 1).any()
    assert (out["risky"] == 0).any()
    # suppressing risky classes must cost < 20% of the corpus (the
    # audit is actionable, not a blanket rejection)
    risky_rows = out.loc[out["risky"] == 1, "n_docs"].sum()
    assert risky_rows / len(docs) < 0.2


# -- compaction_plan -----------------------------------------------------------


def test_compaction_plan_rederivation(spark, sf001_dir):
    li = pd.read_parquet(f"{sf001_dir}/lineitem.parquet")
    files = (
        li["l_shipdate"]
        .dt.strftime("%Y-%m")
        .value_counts()
        .sort_index()
    )
    cum = 0
    groups = {}
    for month, n in files.items():
        gid = cum // R._COMPACT_TARGET
        groups.setdefault(gid, []).append((month, int(n)))
        cum += int(n)
    out = (
        R.q_compaction_plan(spark, sf001_dir).toPandas().set_index("group_id")
    )
    assert set(out.index) == set(groups)
    assert int(out["n_rows"].sum()) == len(li)
    for gid, members in groups.items():
        r = out.loc[gid]
        assert int(r["n_files"]) == len(members)
        assert int(r["n_rows"]) == sum(n for _, n in members)
        assert r["first_month"] == members[0][0]
        assert r["last_month"] == members[-1][0]
    # plan properties: groups partition the timeline contiguously (no
    # month range overlap between consecutive groups), and overshoot
    # is bounded — a group spans at most one target window plus the
    # largest single file (start-window binning admits small groups
    # when a file lands late in its window, but never huge ones)
    months_sorted = sorted(out["first_month"])
    assert months_sorted == list(out.sort_index()["first_month"])
    max_file = int(files.max())
    assert (out["n_rows"] <= R._COMPACT_TARGET + max_file).all()
    # non-vacuity: the plan actually merges (multiple files per group)
    assert (out["n_files"] > 1).any()
    assert len(out) > 1


# -- classifier_pr_eval --------------------------------------------------------


def test_classifier_pr_eval_rederivation(spark, sf001_dir):
    """Rederive P/R/F1 with sklearn-style set arithmetic in python
    from the SAME confusion matrix (the matrix itself is the
    oracle-checked langid query)."""
    cm = R.q_langid(spark, sf001_dir).toPandas()
    classes = set(cm["lang"]) | set(cm["pred_lang"])
    out = (
        R.q_classifier_pr_eval(spark, sf001_dir)
        .toPandas()
        .set_index("cls")
    )
    assert set(out.index) == classes
    for c in classes:
        tp = int(cm[(cm["lang"] == c) & (cm["pred_lang"] == c)]["n_docs"].sum())
        n_pred = int(cm[cm["pred_lang"] == c]["n_docs"].sum())
        n_true = int(cm[cm["lang"] == c]["n_docs"].sum())
        r = out.loc[c]
        assert int(r["tp"]) == tp
        assert int(r["n_pred"]) == n_pred
        assert int(r["n_true"]) == n_true
        assert int(r["precision_ppm"]) == (
            math.floor(tp * 1000000 / n_pred) if n_pred else 0
        )
        assert int(r["recall_ppm"]) == (
            math.floor(tp * 1000000 / n_true) if n_true else 0
        )
        den = 2 * tp + (n_pred - tp) + (n_true - tp)
        assert int(r["f1_ppm"]) == (
            math.floor(2 * tp * 1000000 / den) if den else 0
        )
    # non-vacuity: the heuristic is good on en but not perfect overall
    assert int(out.loc["en", "recall_ppm"]) > 500000
    assert (out["f1_ppm"] < 1000000).any()


# -- kind_pivot ----------------------------------------------------------------


def test_kind_pivot_rederivation(spark, sf001_dir):
    from latyas_spark.pipeline.adapter import synth_blocks

    b = synth_blocks(spark, sf001_dir).toPandas()
    out = (
        R.q_kind_pivot(spark, sf001_dir)
        .toPandas()
        .set_index(["doc_id", "page"])
        .sort_index()
    )
    # wide schema is fixed and row count = page count
    assert list(out.columns) == [
        f"n_{k}" for k in R._PIVOT_KINDS
    ] + ["n_other"]
    pages = b.groupby(["doc_id", "page"]).size()
    assert set(out.index) == set(pages.index)
    # row sums reconstruct the page block counts (pivot loses nothing)
    got_sums = out.sum(axis=1)
    for key, n in pages.items():
        assert int(got_sums.loc[key]) == int(n)
    # spot-check one kind column against a direct label count: the
    # classify chain is oracle-checked elsewhere (classify_counts);
    # here we pin the pivot bookkeeping
    n_title_direct = int(
        b["label"].str.lower().str.contains("title").sum()
    )
    assert int(out["n_title"].sum()) <= n_title_direct  # title wins only
    # if no earlier needle matched
    assert int(out["n_title"].sum()) > 0


def test_kind_pivot_single_exchange(spark, sf001_dir):
    """Conditional aggregation must compile to ONE shuffle total: the
    (doc_id, page) groupBy REUSES the synth window's doc_id hash
    partitioning (grouping on a superset of the partition key needs no
    re-exchange), and the fixed-column pivot adds no per-kind scans or
    unions."""
    plan = (
        R.q_kind_pivot(spark, sf001_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, plan


# -- ngram_containment ---------------------------------------------------------


def test_ngram_containment_rederivation(spark, sf001_dir):
    docs = pd.read_parquet(f"{sf001_dir}/documents.parquet")
    gsets = {}
    for r in docs.itertuples():
        ws = str(r.text).split()
        gsets[str(r.doc_id)] = {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        }
    # candidate generation uses the df<=64 cap — mirror it
    df = Counter(g for gs in gsets.values() for g in gs)
    kept = {g for g, c in df.items() if c <= 64}
    out = (
        R.q_ngram_containment(spark, sf001_dir)
        .toPandas()
        .set_index(["doc_a", "doc_b"])
    )
    expected = {}
    ids = sorted(gsets)
    for key, row in out.iterrows():
        a, b = key
        shared = len((gsets[a] & gsets[b]) & kept)
        na, nb = len(gsets[a]), len(gsets[b])
        assert int(row["shared"]) == shared
        assert int(row["cont_a_in_b_ppm"]) == math.floor(
            shared * 1000000 / na
        )
        assert int(row["cont_b_in_a_ppm"]) == math.floor(
            shared * 1000000 / nb
        )
    # completeness: every qualifying pair is present
    n_expected = 0
    docs_by_gram = {}
    for d, gs in gsets.items():
        for g in gs & kept:
            docs_by_gram.setdefault(g, set()).add(d)
    cand = set()
    for ds in docs_by_gram.values():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                cand.add((a, b))
    for a, b in cand:
        shared = len((gsets[a] & gsets[b]) & kept)
        if shared >= 2 and (
            shared * 1000000 // len(gsets[a]) >= 500000
            or shared * 1000000 // len(gsets[b]) >= 500000
        ):
            n_expected += 1
            assert (a, b) in out.index
    assert len(out) == n_expected
    assert n_expected > 0


def test_ngram_containment_finds_subset_jaccard_misses(spark, tmp_path):
    """The operator's reason to exist: a small doc fully embedded in a
    much larger one scores containment 1.0 but Jaccard far below the
    0.4 near-dup cut."""
    small = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} w{i}x w{i}y" for i in range(120))
    big = small + " " + filler
    pd.DataFrame(
        {"doc_id": [1, 2], "text": [small, big]}
    ).to_parquet(f"{tmp_path}/documents.parquet")
    cont = (
        R.q_ngram_containment(spark, str(tmp_path))
        .toPandas()
        .set_index(["doc_a", "doc_b"])
    )
    jac = R.q_ngram_jaccard(spark, str(tmp_path)).toPandas()
    r = cont.loc[("1", "2")]
    assert int(r["cont_a_in_b_ppm"]) == 1000000  # fully contained
    assert int(r["cont_b_in_a_ppm"]) < 100000
    assert len(jac) == 0  # jaccard's 0.4 cut misses the subset pair
