"""Distributed connected components over a pair/edge table.

Every near-duplicate family in this engine (minhash/simhash/ngram-Jaccard,
embedding cosine, audio fingerprint) stops at PAIRS; a training-data
pipeline needs CLUSTERS — one canonical id per duplicate group, so exactly
one representative per group survives deduplication.  Pairs → clusters is
connected components on the similarity graph.

Spark-first implementation of the alternating Large-Star / Small-Star
algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014): each round is
two hash aggregations + two co-partitioned joins on the node id, the edge
set monotonically contracts toward a star per component, and convergence
takes O(log^2 n) rounds — ~3 rounds on real near-dup graphs, whose
components are shallow.  No vertex ever materializes its full neighbor
list (no collect_list), so a pathological hot document that pairs with
millions of others stays an aggregate + join, both AQE-skew-handled.

Scale notes (100 TB): state per round is only the current edge set —
bounded by the input pair count and shrinking every round.  Lineage is
truncated with an eager localCheckpoint per round (iterative DataFrame
loops otherwise stack plans exponentially); the same action returns the
(count, hash) signature used for the convergence test, so each round costs
exactly one job.  The reference has no analog — its consumers observe
per-key change sequences only; this lifts the engine's dedup families to
group-level semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to m = min(N(u) ∪ {u}).

    Emitted edges are oriented high → low (u > v after this step)."""
    bidir = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = bidir.groupBy("u").agg(F.min("v").alias("mn"))
    m = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    return (
        bidir.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges high → low, then connect every smaller neighbor (and u
    itself) to m = min(N≤(u) ∪ {u})."""
    d = (
        e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    joined = d.join(d.groupBy("u").agg(F.min("v").alias("mn")), "u")
    out = joined.select(F.col("v").alias("u"), F.col("mn").alias("v")).unionByName(
        joined.select("u", F.col("mn").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def _signature(e: DataFrame) -> tuple[int, int]:
    """Order-insensitive content signature of the edge set, one job."""
    # bit_xor: order-insensitive, overflow-free under ANSI mode (sum of
    # hashes overflows long); the edge set is distinct, so no two equal
    # hashes cancel spuriously.
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    *,
    max_iter: int = 30,
) -> DataFrame:
    """Label every node of the pair graph with its component's minimum id.

    edges: a DataFrame of undirected pairs (duplicate/reverse pairs and
    self-loops are fine — they are canonicalized away).  Node ids may be
    any orderable atomic type (long doc ids, string clip ids, ...).

    Output: (node, label) — one row per node that appears in >= 1 edge;
    `label` is the smallest node id of its component.  Nodes with no edges
    are singleton clusters by definition; callers that need them union
    `nodes.join(result, "node", "left_anti")` labeled as themselves.

    Raises RuntimeError if the edge set has not stabilized after
    `max_iter` rounds (each round is large-star ∘ small-star; the paper
    bounds rounds by O(log^2 n) — 30 covers any physical graph).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    sig = _signature(e)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig2 = _signature(e2)
        e.unpersist()
        e = e2
        if sig2 == sig:
            break
        sig = sig2
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # Converged edge set is a star per component, oriented node → min.
    # Roots (the minima) appear only on the v side: label them themselves.
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("label"))
    roots = e.select(F.col("v").alias("node"), F.col("v").alias("label"))
    return labels.unionByName(roots).distinct()


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id) groups; cluster_id is the
    minimum member id, so `cluster_id == doc_id` selects one canonical
    representative per duplicate group (the standard keep-one policy)."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
