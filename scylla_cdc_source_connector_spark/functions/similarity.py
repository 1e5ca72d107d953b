"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: broadcast the (small) query set, score every
  row with a codegen'd zip_with/aggregate dot product, take top-k per query
  with a window.  The baseline — exact, one scan, no shuffle except the
  final top-k.
- LSH-bucketed ANN: deterministic random-hyperplane signatures; candidates
  share a signature bucket, scored exactly within buckets.  The scale path:
  the join shuffles only bucket keys.
- embedding-cosine near-dup: pairs above a cosine threshold via the same
  bucketing.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays — zip_with + aggregate stay in
    codegen (no Python)."""
    # cast BEFORE multiplying: float32 products then widened would diverge
    # from a float64 oracle (DuckDB) in the last ulps
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / F.greatest(na * nb, F.lit(1e-30))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self).  queries must be
    small — it is broadcast so the scan side never shuffles."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    scored = (
        e.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr(F.col("vec"), F.col("query_vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine"))
    )


def hyperplane_signature(
    vec: Column, *, dim: int, n_planes: int = 12, seed: int = 42
) -> Column:
    """Deterministic random-hyperplane LSH signature (sign pattern packed
    into a long).  Hyperplanes are literal constants — broadcast-free,
    fully codegen'd."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bits = []
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[i]])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_planes: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the hyperplane bucket; exact
    cosine within buckets.  Recall < 1 by construction — pair with
    brute_force_topk to measure."""
    sig = lambda df, idn, vn: df.select(  # noqa: E731
        F.col(id_col).alias(idn),
        F.col(vec_col).alias(vn),
        hyperplane_signature(
            F.col(vec_col), dim=dim, n_planes=n_planes, seed=seed
        ).alias("bucket"),
    )
    e = sig(embeddings, "neighbor_id", "vec")
    q = sig(queries, "query_id", "query_vec")
    scored = (
        e.alias("e")
        .join(
            F.broadcast(q).alias("q"),
            (F.col("e.bucket") == F.col("q.bucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn("cosine", cosine_expr(F.col("vec"), F.col("query_vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine"))
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Coarse quantization: assign every vector to its nearest centroid
    (max cosine).  Centroids are broadcast (they are tiny: C ≪ rows), so
    assignment is one scan with zero shuffle — at 100 TB the cell id is
    precomputed once and persisted as a partition column."""
    c = centroids.select(
        F.col("centroid_id"), F.col("centroid_vec").alias("__cvec")
    )
    scored = embeddings.join(F.broadcast(c)).withColumn(
        "__csim", cosine_expr(F.col(vec_col), F.col("__cvec"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__csim"), F.asc("centroid_id"))
    return (
        scored.withColumn("__crank", F.row_number().over(w))
        .filter(F.col("__crank") == 1)
        .select(id_col, vec_col, F.col("centroid_id").alias(out_col))
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style approximate top-k: deterministic coarse centroids (the
    first `n_centroids` vectors by id — reproducible without a training
    step; production swaps in k-means centroids), every vector assigned to
    its nearest cell, each query probed against its `n_probe` nearest
    cells only.  The candidate join shuffles on the small cell-id key
    instead of broadcasting the full corpus — the scale path when the
    query set is large.  Recall < 1 by construction; measured against
    brute_force_topk in tests."""
    w_id = Window.orderBy(F.asc(id_col))
    centroids = (
        embeddings.orderBy(F.asc(id_col))
        .limit(n_centroids)
        .select(
            F.row_number().over(w_id).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )
    cells = ivf_assign(
        embeddings, centroids, id_col=id_col, vec_col=vec_col, out_col="cell"
    ).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"), "cell"
    )

    # per-query probe list: n_probe nearest cells
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = centroids.select("centroid_id", F.col("centroid_vec").alias("__cvec"))
    qs = q.join(F.broadcast(c)).withColumn(
        "__csim", cosine_expr(F.col("query_vec"), F.col("__cvec"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("__csim"), F.asc("centroid_id"))
    probes = (
        qs.withColumn("__crank", F.row_number().over(wq))
        .filter(F.col("__crank") <= n_probe)
        .select("query_id", "query_vec", F.col("centroid_id").alias("cell"))
    )

    scored = (
        cells.join(
            F.broadcast(probes),
            on="cell",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr(F.col("vec"), F.col("query_vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine"))
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via hyperplane buckets (high
    cosine ⇒ same sign pattern with high probability), verified exactly."""
    sig = embeddings.select(
        F.col(id_col),
        F.col(vec_col).alias("vec"),
        hyperplane_signature(
            F.col(vec_col), dim=dim, n_planes=n_planes, seed=seed
        ).alias("bucket"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("cosine", cosine_expr(F.col("a.vec"), F.col("b.vec")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round("cosine", 4).alias("cosine"),
        )
    )
