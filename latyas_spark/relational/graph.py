"""Distributed connected components over a candidate-pair edge list.

Near-dup detection (minhash LSH / simhash / ngram-jaccard) emits PAIRS;
a real dedup pipeline must then group pairs into duplicate CLUSTERS and
pick one canonical representative per cluster — the drop-list is
"everything not canonical".  This module supplies that missing last
stage as a reusable DataFrame operator.

Algorithm: iterative min-label propagation ("hash-to-min").  Every node
starts labeled with itself; each round every node takes the minimum
label among itself and its neighbors; converged when no label changes.
Rounds needed = graph diameter.

Scale shape (the reason propagation is the right choice HERE):

* LSH candidate graphs are locally dense — a duplicate cluster's docs
  share (band, sig) buckets, so clusters are near-cliques with diameter
  ~1-3, and the bucket frequency cap (registry.MINHASH_BUCKET_CAP)
  bounds max degree at 4 bands x 64 = 256.  Propagation therefore
  converges in a handful of rounds with NO giant-component hazard; for
  general web graphs with long chains, swap in large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14) which converges in O(log n) rounds on the same primitives —
  implemented below as ``connected_components_star`` (same output
  contract; registry query ``dedup_clusters_star``).
* Each round is one shuffle join (edges x labels, both hash-partitioned
  on the join key) plus one map-side-combinable min-aggregation — no
  driver-side graph state, no collect of nodes or edges.  The driver
  sees only a scalar changed-count per round.
* Lineage is truncated every round with ``localCheckpoint`` — iterative
  plans otherwise grow linearly and re-execute the whole history each
  action.  On a real cluster prefer reliable ``checkpoint`` (HDFS) for
  executor-loss tolerance; localCheckpoint is the single-JVM analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Backstop far above the 1-3 round diameter of capped LSH cluster
# graphs; hitting it means the edge input is not a candidate-pair graph
# (or the cap upstream was removed) and the caller must hear about it.
MAX_CC_ROUNDS = 25


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = MAX_CC_ROUNDS,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id of its connected component.

    Returns a DataFrame ``(node, component)`` with one row per distinct
    node appearing in ``edges``.  Node ids must be orderable (doc_ids
    are strings; min = lexicographic).  Deterministic: the component
    label is a pure function of the edge set.
    """
    # Bidirect once so one join direction propagates both ways, and
    # materialize: every round re-reads this frame.
    bi = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .union(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .distinct()
        .localCheckpoint()
    )
    labels = bi.select(F.col("n").alias("node")).distinct().withColumn(
        "component", F.col("node")
    ).localCheckpoint()

    for _ in range(max_rounds):
        # neighbor labels flow along edges; union in the node's own
        # label so min() is over {self} U neighbors.
        msgs = bi.join(
            labels, bi["m"] == labels["node"], "inner"
        ).select(F.col("n").alias("node"), "component")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "node")
            .filter(F.col("a.component") != F.col("b.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds: "
        "input is not a bounded-diameter candidate graph"
    )


# Star rounds needed = O(log n); 20 covers any graph this sandbox can
# hold and exists only as a runaway backstop.
MAX_STAR_ROUNDS = 20


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = MAX_STAR_ROUNDS,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the documented general-graph swap-in for
    ``connected_components``: min-label propagation needs diameter
    rounds (fine for near-clique LSH clusters, hopeless for a
    long-chain web graph), star contraction converges in O(log n)
    rounds on ANY graph using the same join+min-aggregate primitives.

    large-star: every node u sends each LARGER neighbor v > u to
    m = min(N(u) ∪ {{u}}); small-star: every node u (grouped as the
    larger endpoint of its edges) re-points its smaller neighbors and
    itself at m.  Both phases preserve connectivity and monotonically
    contract components toward their minimum; at the fixed point the
    edge set is a star forest (child -> component min), read off
    directly as the label map.

    Output contract identical to ``connected_components``: one
    ``(node, component)`` row per distinct node of ``edges``,
    component = min node id, deterministic in the edge set.
    """
    orig_nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )

    for _ in range(max_rounds):
        # large-star: (v, min(N(u) ∪ {u})) for every v ∈ N(u), v > u
        nbrs = e.select(F.col("a").alias("n"), F.col("b").alias("m")).union(
            e.select(F.col("b").alias("n"), F.col("a").alias("m"))
        )
        mins = nbrs.groupBy("n").agg(
            F.least(F.min("m"), F.first("n")).alias("mn")
        )
        e1 = (
            nbrs.filter(F.col("m") > F.col("n"))
            .join(mins, "n")
            .select(F.col("m").alias("a"), F.col("mn").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star: group by the larger endpoint u; re-point its
        # smaller neighbors AND u itself at min(N⁻(u) ∪ {u})
        d = e1.select(
            F.greatest("a", "b").alias("big"), F.least("a", "b").alias("small")
        )
        mins2 = d.groupBy("big").agg(F.min("small").alias("mn"))
        repoint = (
            d.join(mins2, "big")
            .select(F.col("small").alias("a"), F.col("mn").alias("b"))
            .union(mins2.select(F.col("big").alias("a"), F.col("mn").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        changed = (
            repoint.exceptAll(e).count() + e.exceptAll(repoint).count()
        )
        e = repoint
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds"
        )

    # fixed point is a star forest: every surviving edge is
    # (child, component-min); roots (and isolated-after-contraction
    # nodes) label themselves
    stars = e.select(
        F.greatest("a", "b").alias("node"), F.least("a", "b").alias("comp")
    )
    return orig_nodes.join(stars, "node", "left").select(
        "node", F.coalesce("comp", F.col("node")).alias("component")
    )
