"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: broadcast the (small) query set, score every
  row with a codegen'd zip_with/aggregate dot product, take top-k per query
  with a TWO-PHASE window (partial per input partition, then final) so no
  single reducer ever sees all N candidates of one query.
- LSH-bucketed ANN: deterministic random-hyperplane signatures, BANDED the
  same way dedup.py bands minhash — a pair is a candidate if ANY band's
  sign-bits agree (OR over bands), then verified with the exact cosine.
  Single-bucket matching (all planes must agree) has recall
  (1 - theta/pi)^n_planes, which is exponentially small at moderate
  thresholds; banding with b bands of r planes lifts it to
  1 - (1 - p^r)^b.
- IVF: coarse centroids collected to the driver (C is tiny) and inlined as
  literal arrays, so cell assignment is a pure per-row argmax expression —
  one scan, zero joins, zero shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase top-k over (query_id, neighbor_id, cosine) rows.

    Phase 1 ranks within (query_id, input-partition) so each reducer holds
    at most k rows per (query, partition); phase 2 ranks the surviving
    (#partitions x k) rows per query.  With a single window, one reducer
    receives ALL N candidates of a query — flat at 5 queries, catastrophic
    at 10^6.  Ties break identically in both phases (desc cosine, asc
    neighbor_id), so the result is exactly the global top-k.
    """
    order = [F.desc("cosine"), F.asc("neighbor_id")]
    w_part = Window.partitionBy("query_id", "__pid").orderBy(*order)
    pruned = (
        scored.withColumn("__pid", F.spark_partition_id())
        .withColumn("__prank", F.row_number().over(w_part))
        .filter(F.col("__prank") <= k)
        .drop("__pid", "__prank")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine")
        )
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self).  queries must be
    small — it is broadcast so the scan side never shuffles; the top-k is
    two-phase so no reducer materializes a full query's candidate list."""
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
    return _topk_per_query(scored, k)


def hyperplane_signature(
    vec: Column, *, dim: int, n_planes: int = 12, seed: int = 42
) -> Column:
    """Deterministic random-hyperplane LSH signature (sign pattern packed
    into a long).  Hyperplanes are literal constants — broadcast-free,
    fully codegen'd.  NOTE: matching on the FULL signature has recall
    (1 - theta/pi)^n_planes — use banded_hyperplane_buckets for candidate
    generation; this packed form remains for compact fingerprinting."""
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


def banded_hyperplane_buckets(
    vec: Column,
    *,
    dim: int,
    n_bands: int = 16,
    planes_per_band: int = 5,
    seed: int = 42,
) -> Column:
    """array<struct<band:int, bucket:long>> — one sign-bit bucket per band
    of `planes_per_band` hyperplanes.  Two vectors are LSH candidates when
    ANY band bucket matches (OR over bands), mirroring minhash banding in
    dedup.py.  With per-plane agreement p = 1 - theta/pi, pair recall is
    1 - (1 - p^r)^b: at cosine 0.5 (p = 2/3) the defaults give ~0.90 where
    a single 8-plane bucket gives ~0.04.

    Reference expression form, kept for parity checks: higher-order
    aggregate/zip_with expressions are INTERPRETED (not codegen'd) in
    Spark, so with b*r=80 planes of 64 literals each this tree costs
    ~6 s/2k rows at analysis+eval time.  The hot path (_banded) uses the
    Arrow-batched matmul UDF below instead — same planes, same sign rule,
    identical buckets up to float-summation order on |dot| ~ 1e-15."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bands * planes_per_band, dim))

    def _bit(i: int, shift: int) -> Column:
        plane = F.array(*[F.lit(float(v)) for v in planes[i]])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(dot > 0, F.lit(1 << shift).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    structs = []
    for b in range(n_bands):
        bucket = _bit(b * planes_per_band, 0)
        for r in range(1, planes_per_band):
            bucket = bucket.bitwiseOR(_bit(b * planes_per_band + r, r))
        structs.append(
            F.struct(F.lit(b).alias("band"), bucket.alias("bucket"))
        )
    return F.array(*structs)


def _bucket_udf(*, dim: int, n_bands: int, planes_per_band: int, seed: int):
    """array<long> of per-band sign-bit buckets, computed as ONE numpy
    matmul per Arrow batch: (batch x dim) @ (dim x b*r) -> sign bits ->
    bit-packed per band.  Replaces the interpreted 80-plane higher-order
    expression tree of banded_hyperplane_buckets on the hot path (~40x
    on 2k x 64-dim rows) while producing the same buckets: same seeded
    planes, same dot>0 rule, bit r of band b = plane b*r+r."""
    from pyspark.sql.functions import pandas_udf

    rng = np.random.default_rng(seed)
    # (dim, b*r), transposed once at closure build, broadcast with the task
    planes_t = rng.standard_normal((n_bands * planes_per_band, dim)).T
    weights = (1 << np.arange(planes_per_band, dtype=np.int64))

    @pandas_udf("array<long>")
    def buckets(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        mat = np.vstack(vs.to_numpy()).astype(np.float64, copy=False)
        bits = (mat @ planes_t > 0).astype(np.int64)
        bkts = bits.reshape(len(vs), n_bands, planes_per_band) @ weights
        return pd.Series(list(bkts))

    return buckets


def pair_cosine_udf():
    """double cosine(vec_a, vec_b) as one numpy einsum per Arrow batch —
    the LSH candidate-verification kernel (candidate sets run to ~N²/2
    pairs at low thresholds, where the interpreted cosine_expr HOF tree
    dominates the whole near-dup pass).  Summation order differs from
    cosine_expr in the last ulps, so oracle-checked EXACT paths
    (brute_force_topk, embedding_near_dup) keep cosine_expr — this kernel
    serves the rows-only LSH verify."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype=float)
        ma = np.vstack(a.to_numpy()).astype(np.float64, copy=False)
        mb = np.vstack(b.to_numpy()).astype(np.float64, copy=False)
        dots = np.einsum("ij,ij->i", ma, mb)
        norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(dots / np.maximum(norms, 1e-30))

    return pair_cosine


def _banded(
    df: DataFrame,
    id_alias: str,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    n_bands: int,
    planes_per_band: int,
    seed: int,
) -> DataFrame:
    """SLIM (id, band, bucket) rows — one per band, vectors dropped before
    the explode so candidate duplication across bands never copies them."""
    buckets = _bucket_udf(
        dim=dim, n_bands=n_bands, planes_per_band=planes_per_band, seed=seed
    )
    return df.select(
        F.col(id_col).alias(id_alias),
        F.posexplode(buckets(F.col(vec_col))).alias("band", "bucket"),
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_bands: int = 20,
    planes_per_band: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: a corpus row is a candidate for a query when any
    hyperplane band bucket matches; candidates are scored with the exact
    cosine and reduced with the two-phase top-k.  Recall < 1 by
    construction — pytest pins recall >= 0.8 against brute_force_topk.

    Defaults (b=20, r=4) target the hard low-similarity regime (top-k
    neighbors at cosine ~0.25-0.4, per-plane agreement p ~ 0.58-0.63 →
    pair recall 1-(1-p^4)^20 ~ 0.9).  LSH pruning is inherently weak
    there (the gap to p=0.5 for unrelated pairs is small); for
    high-similarity retrieval raise planes_per_band to sharpen buckets."""
    opts = dict(
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        n_bands=n_bands,
        planes_per_band=planes_per_band,
        seed=seed,
    )
    e_b = _banded(embeddings, "neighbor_id", **opts)
    q_b = _banded(queries, "query_id", **opts)
    cand = (
        e_b.join(
            F.broadcast(q_b),
            ["band", "bucket"],
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    e_vec = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    q_vec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    scored = (
        cand.join(e_vec, "neighbor_id")
        .join(F.broadcast(q_vec), "query_id")
        .withColumn("cosine", cosine_expr(F.col("vec"), F.col("query_vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    return _topk_per_query(scored, k)


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Coarse quantization: assign every vector to its nearest centroid
    (max cosine).  The centroid table is tiny (C << rows), so it is
    collected once and inlined as literal arrays; assignment is then a
    pure per-row argmax expression — ONE scan, ZERO joins, ZERO shuffles.
    (A broadcast join + row_number window would replicate every row x C,
    each copy carrying the full vector, then shuffle all C*N rows on the
    vector id — a scale-killer.)  At 100 TB the cell id is precomputed
    once and persisted as a partition column."""
    rows = (
        centroids.select("centroid_id", "centroid_vec")
        .orderBy(F.asc("centroid_id"))
        .collect()
    )
    if not rows:
        raise ValueError("ivf_assign: centroids is empty")
    sims = F.array(
        *[
            cosine_expr(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in r["centroid_vec"]]),
            )
            for r in rows
        ]
    )
    cids = F.array(*[F.lit(int(r["centroid_id"])) for r in rows])
    # array_position returns the FIRST index of the max — centroids are
    # sorted by id, so ties break toward the lowest centroid_id (matching
    # the previous desc-sim/asc-id window semantics)
    pos = F.array_position(sims, F.array_max(sims)).cast("int")
    return embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(cids, pos).alias(out_col),
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
    its nearest cell by the zero-shuffle argmax, each query probed against
    its `n_probe` nearest cells only.  The candidate join keys on the
    small cell id; Catalyst/AQE picks broadcast vs shuffle from the probe
    set's size, so large query sets degrade to a cell-key shuffle rather
    than a broadcast of the whole probe table.  Recall < 1 by
    construction; measured against brute_force_topk in tests."""
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

    # per-query probe list: n_probe nearest cells (Q x C rows — tiny)
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
        cells.join(probes, on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr(F.col("vec"), F.col("query_vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    return _topk_per_query(scored, k)


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    n_bands: int = 20,
    planes_per_band: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-banded candidate
    generation (any-band match, mirroring dedup.py's minhash banding) with
    exact cosine verification.  The self-join runs on SLIM (id, band,
    bucket) rows; vectors rejoin only for the surviving candidate pairs.

    Defaults (b=20, r=4) keep pair recall >= ~0.9 down to threshold ~0.35
    (pytest pins >= 0.8 vs the exact pairs).  At genuinely high thresholds
    (0.9+) raise planes_per_band — sharper buckets mean far fewer false
    candidates and recall stays ~1."""
    banded = _banded(
        embeddings,
        "vid",
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        n_bands=n_bands,
        planes_per_band=planes_per_band,
        seed=seed,
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = embeddings.select(F.col(id_col), F.col(vec_col))
    return (
        pairs.join(
            vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")),
            "id_a",
        )
        .join(
            vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")),
            "id_b",
        )
        .withColumn("cosine", pair_cosine_udf()(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )
