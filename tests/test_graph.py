"""connected_components: multi-round convergence, determinism, and the
non-convergence backstop — pinned against a pure-python union-find."""

import random

import pytest
from pyspark.sql import functions as F

from latyas_spark.relational.graph import connected_components


def _uf_components(edges):
    """Pure-python union-find oracle: node -> min node of component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = connected_components(df).collect()
    return {r["node"]: r["component"] for r in got}


def test_chain_needs_multiple_rounds(spark):
    # a 10-node path has diameter 9: exercises real iteration, not just
    # the one-hop case LSH cliques produce
    edges = [(f"d{i}", f"d{i+1}") for i in range(9)]
    got = _cc(spark, edges)
    assert got == {f"d{i}": "d0" for i in range(10)}


def test_components_and_lexicographic_labels(spark):
    edges = [("b", "z"), ("z", "a"), ("m", "n"), ("q", "q")]
    got = _cc(spark, edges)
    assert got == {"a": "a", "b": "a", "z": "a", "m": "m", "n": "m", "q": "q"}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(20260817)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    assert _cc(spark, edges) == _uf_components(edges)


def test_nonconvergence_raises(spark):
    edges = [(f"d{i}", f"d{i+1}") for i in range(9)]
    df = spark.createDataFrame(edges, "src string, dst string")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=2)


def test_stratified_sample_plan_broadcasts_quota(spark, sf001_dir):
    """The quota dim must reach the corpus as a broadcast (a shuffle
    join keyed on lang would be catastrophic skew at 100 TB: one
    language = one partition)."""
    from latyas_spark.relational import registry as R

    plan = (
        R.q_stratified_sample(spark, sf001_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cluster_queries_consistent(spark, sf001_dir):
    """dedup_canonical must agree with dedup_clusters: one rep per
    component, rep is a member, n_members sums to the cluster rows."""
    from latyas_spark.relational import registry as R

    cc = R.q_dedup_clusters(spark, sf001_dir).toPandas()
    canon = R.q_dedup_canonical(spark, sf001_dir).toPandas()
    assert set(canon["component"]) == set(cc["component"].unique())
    members = cc.groupby("component").size()
    for _, row in canon.iterrows():
        assert row["n_members"] == members[row["component"]]
        assert (
            (cc["doc_id"] == row["rep_doc"])
            & (cc["component"] == row["component"])
        ).any()
    # every component labeled by its min member (cross-check vs pandas)
    assert (
        cc.groupby("component")["doc_id"].min() == members.index
    ).all()


def _cc_star(spark, edges):
    from latyas_spark.relational.graph import connected_components_star

    df = spark.createDataFrame(edges, "src string, dst string")
    got = connected_components_star(df).collect()
    return {r["node"]: r["component"] for r in got}


def test_star_matches_union_find_on_random_graph(spark):
    """Star contraction against the pure-python union-find oracle AND
    against min-label propagation on the same random graph — the two
    distributed algorithms must agree node-for-node."""
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(80)]
    want = _uf_components(edges)
    star = _cc_star(spark, edges)
    assert star == want
    assert star == _cc(spark, edges)


def test_star_converges_on_long_chain_where_propagation_cannot(spark):
    """The swap-in's reason to exist, pinned: a 40-node path (diameter
    39) exceeds propagation's MAX_CC_ROUNDS backstop, but star
    contraction labels it correctly in O(log n) rounds."""
    from latyas_spark.relational.graph import MAX_CC_ROUNDS

    n = 40
    assert n - 1 > MAX_CC_ROUNDS
    # min id pinned to one END of the path: label distance to the far
    # end is n-1 hops, the true worst case for propagation (a shuffled
    # mid-path min would halve it under the backstop)
    rng = random.Random(11)
    rest = [f"p{i:03d}" for i in range(1, n)]
    rng.shuffle(rest)
    ids = ["p000"] + rest
    edges = list(zip(ids, ids[1:]))
    got = _cc_star(spark, edges)
    root = min(ids)
    assert got == {i: root for i in ids}
    with pytest.raises(RuntimeError):
        _cc(spark, edges)
