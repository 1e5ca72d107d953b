"""Skew-salted aggregation for hot keys (north_rule: "skew-salted shuffle
for hot clip_id keys at 10^12-clip scale").

At 10^12 clips with ~1% hot ids drawing ~30% of traffic (FIXTURES.md), a
plain groupBy(clip_id) sends each hot key's entire traffic to a single
reducer.  Two-phase salted aggregation bounds any single reducer's share of
a hot key to 1/n_salt:

  phase 1: groupBy(key, salt) partial-agg      (salt = pmod(hash(tiebreak), n))
  phase 2: groupBy(key) combine partials

Only works for decomposable aggregates (count/sum/min/max — re-aggregable);
AVG is carried as (sum, count).  Catalyst's map-side partial aggregation
already does most of this for *dense* inputs; explicit salting matters when
a single group's rows exceed one task's memory/CPU — exactly the hot-key
case.  Complemented by AQE skew-join handling
(spark.sql.adaptive.skewJoin.enabled) for joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (partial_agg_exprs, final_agg_exprs) templates keyed by kind
_DECOMPOSABLE = {"count", "sum", "min", "max"}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    metrics: dict[str, tuple[str, str]],
    *,
    n_salt: int = 16,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation: metrics = {out_name: (kind, col)} with kind in
    {count, sum, min, max}; count ignores its col.

    salt_expr defaults to a uniform pseudo-random-but-deterministic bucket
    from the row's full content hash (monotonically_increasing_id would
    break determinism across retries — never use it in a salted agg).
    """
    for name, (kind, _) in metrics.items():
        if kind not in _DECOMPOSABLE:
            raise ValueError(f"{name}: {kind} is not decomposable-salt-safe")
    if salt_expr is None:
        salt_expr = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))

    partial = []
    final = []
    for name, (kind, col) in metrics.items():
        p = f"__p_{name}"
        if kind == "count":
            partial.append(F.count(F.lit(1)).alias(p))
            final.append(F.sum(p).alias(name))
        elif kind == "sum":
            partial.append(F.sum(col).alias(p))
            final.append(F.sum(p).alias(name))
        elif kind == "min":
            partial.append(F.min(col).alias(p))
            final.append(F.min(p).alias(name))
        elif kind == "max":
            partial.append(F.max(col).alias(p))
            final.append(F.max(p).alias(name))

    phase1 = df.withColumn("__salt", salt_expr).groupBy(*keys, "__salt").agg(*partial)
    return phase1.groupBy(*keys).agg(*final)
