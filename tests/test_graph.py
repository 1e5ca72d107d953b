"""Connected components (functions/graph.py): crafted graphs vs a
reference union-find, plus the dedup_clusters composition."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.functions.graph import (
    connected_components,
    dedup_clusters,
)


def _union_find(edges: list[tuple]) -> dict:
    """Reference labeling: component minimum per node."""
    parent: dict = {}

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


def _run(spark, edges: list[tuple], dtype: str = "long") -> dict:
    df = spark.createDataFrame(edges, f"u {dtype}, v {dtype}")
    out = connected_components(df)
    return {r["node"]: r["label"] for r in out.collect()}


GRAPHS = {
    "two_pairs": [(1, 2), (3, 4)],
    "chain": [(i, i + 1) for i in range(1, 12)],
    "star": [(10, i) for i in range(1, 10)],
    "cycle": [(1, 2), (2, 3), (3, 4), (4, 1)],
    "merged_components": [(1, 2), (3, 4), (2, 3), (7, 8)],
    "reverse_and_dup_edges": [(2, 1), (1, 2), (2, 3), (3, 2)],
    "bridged_stars": [(1, i) for i in range(2, 6)]
    + [(10, i) for i in range(11, 15)]
    + [(5, 14)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_matches_union_find(spark, name):
    edges = GRAPHS[name]
    got = _run(spark, edges)
    want = _union_find(edges)
    assert got == want


def test_self_loops_dropped_and_empty_graph(spark):
    assert _run(spark, [(5, 5), (1, 2)]) == {1: 1, 2: 1}
    empty = spark.createDataFrame([], "u long, v long")
    assert connected_components(empty).count() == 0


def test_string_node_ids(spark):
    got = _run(spark, [("b", "a"), ("b", "c"), ("x", "y")], dtype="string")
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_long_chain_converges_within_budget(spark):
    # 64-node chain: worst diameter shape; large/small-star halves depth
    # per round, so the 30-round budget is ample — this pins convergence.
    edges = [(i, i + 1) for i in range(64)]
    got = _run(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_dedup_clusters_keep_one_representative(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = dedup_clusters(pairs)
    rows = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert rows == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    reps = out.where(F.col("cluster_id") == F.col("doc_id"))
    assert {r["doc_id"] for r in reps.collect()} == {1, 10}
