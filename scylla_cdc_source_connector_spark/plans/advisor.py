"""Statistics-driven physical-plan advisory — NDV + heavy hitters → the
broadcast / sort-merge / salt decision.

The reference connector never joins (SURVEY §2.8); this exists because the
engine's OWN docs keep making the same three calls by hand — "broadcast
the small side", "salt the hot keys", "shuffle partitions sized to fit" —
and the round-5 Puffin statistics (sources/puffin.py) make those calls
computable from table METADATA alone: no sampling job, no scan.

Inputs, all metadata-scale:
- live row count + on-disk bytes from the current snapshot's manifests
  (`metadata_table($files)` — the same numbers scan planning reads),
- NDV per join key from the registered KMV sketch (`ndv_estimates`),
- the heaviest key's frequency lower bound from the Misra-Gries summary
  (`heavy_hitters`) with its rows/(m+1) additive error.

The advisory mirrors what AQE would discover AT RUNTIME (broadcast
thresholds, skew splits) — computing it from stats moves the decision to
PLAN time, where a pipeline author can bucket/salt/pre-partition before
the first shuffle ever happens.  At 10^12 rows the difference between
"AQE noticed the skew on stage 7" and "the layout never shuffled the hot
key" is the job.

Reference for the decision thresholds: Spark's own
`spark.sql.autoBroadcastJoinThreshold` default (10 MB) and AQE's
`skewedPartitionFactor` heuristics — both public Spark configuration
surface.
"""

from __future__ import annotations

import math

#: Spark's autoBroadcastJoinThreshold default
DEFAULT_BROADCAST_BYTES = 10 * 1024 * 1024
#: a key whose row count exceeds this multiple of the mean per-key load
#: is "skewed" (AQE's skewedPartitionFactor default is 5)
DEFAULT_SKEW_FACTOR = 5.0


def table_profile(spark, location: str, *, key: str | None = None) -> dict:
    """Metadata-only profile of the CURRENT snapshot: {rows, bytes,
    files} from the manifests, plus — when `key` is given and stats are
    registered — {ndv, rows_per_key, top_count, top_share, stats_stale}.
    Missing statistics degrade gracefully (fields absent), never scan."""
    from pyspark.sql import functions as F

    from scylla_cdc_source_connector_spark.sources import iceberg_meta as im
    from scylla_cdc_source_connector_spark.sources import puffin

    files = (
        im.metadata_table(spark, location, "files")
        .where(F.col("content") == 0)
        .agg(
            F.coalesce(F.sum("record_count"), F.lit(0)).alias("rows"),
            F.coalesce(F.sum("file_size_in_bytes"), F.lit(0)).alias("bytes"),
            F.count("*").alias("files"),
        )
        .collect()[0]
    )
    out = {
        "location": location,
        "rows": int(files["rows"]),
        "bytes": int(files["bytes"]),
        "files": int(files["files"]),
    }
    if key is not None:
        try:
            nd = puffin.ndv_estimates(location)
            ndv = nd["ndv"].get(key)
            if ndv:
                out["ndv"] = ndv
                out["rows_per_key"] = out["rows"] / ndv
                out["stats_stale"] = nd["stale"]
        except ValueError:
            pass
        try:
            hh = puffin.heavy_hitters(location, key)
            out["top_count"] = hh["hitters"][0][1] if hh["hitters"] else 0
            out["top_count_error"] = hh["error_bound"]
            if out["rows"]:
                out["top_share"] = out["top_count"] / out["rows"]
        except ValueError:
            pass
    return out


def advise_join(
    spark,
    left_location: str,
    right_location: str,
    key: str,
    *,
    broadcast_threshold_bytes: int = DEFAULT_BROADCAST_BYTES,
    skew_factor: float = DEFAULT_SKEW_FACTOR,
    shuffle_partitions: int | None = None,
) -> dict:
    """Advise the physical strategy for `left JOIN right ON key` from
    registered statistics alone:

    - strategy "broadcast" with build_side when either side's live bytes
      fit the threshold (Spark's autoBroadcastJoinThreshold rule, decided
      from manifests instead of a runtime size estimate);
    - otherwise "sort_merge", with a skew advisory: using the probe
      side's Misra-Gries summary, the heaviest key's share is compared
      against the mean per-partition load — when one key would exceed
      `skew_factor` x the mean partition, the advisory recommends
      salting with `salt_factor` = ceil(top_count / mean_partition_rows)
      (the operators/skew.py two-phase shape).

    Returns {strategy, build_side?, skew: {detected, salt_factor?,
    top_count?, error_bound?}, profiles, reasons: [...]}."""
    lp = table_profile(spark, left_location, key=key)
    rp = table_profile(spark, right_location, key=key)
    reasons: list[str] = []
    out: dict = {"profiles": {"left": lp, "right": rp}, "reasons": reasons}
    small, side = min((lp, "left"), (rp, "right"), key=lambda t: t[0]["bytes"])
    if small["bytes"] <= broadcast_threshold_bytes:
        out["strategy"] = "broadcast"
        out["build_side"] = side
        reasons.append(
            f"{side} side is {small['bytes']} B live "
            f"(<= {broadcast_threshold_bytes} B threshold): broadcast it — "
            "no shuffle at any probe-side size"
        )
        return out
    out["strategy"] = "sort_merge"
    reasons.append(
        f"both sides exceed the broadcast threshold "
        f"({lp['bytes']} / {rp['bytes']} B): shuffle on {key!r}"
    )
    probe = max(lp, rp, key=lambda p: p["bytes"])
    skew: dict = {"detected": False}
    out["skew"] = skew
    n_part = shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    top = probe.get("top_count")
    if top is not None and probe["rows"]:
        mean_part = max(probe["rows"] / n_part, 1.0)
        skew["top_count"] = top
        skew["error_bound"] = probe.get("top_count_error", 0)
        if top > skew_factor * mean_part:
            skew["detected"] = True
            skew["salt_factor"] = int(math.ceil(top / mean_part))
            reasons.append(
                f"heaviest {key!r} key carries >= {top} rows "
                f"(> {skew_factor}x the {mean_part:.0f}-row mean partition "
                f"over {n_part} partitions): salt it "
                f"{skew['salt_factor']}-ways (operators/skew.py)"
            )
        else:
            reasons.append(
                f"heaviest key {top} rows vs {mean_part:.0f}-row mean "
                "partition: no salting needed"
            )
    elif "rows_per_key" in probe:
        # NDV-only fallback: the AVERAGE key load still gates grouping
        skew["rows_per_key"] = probe["rows_per_key"]
        reasons.append(
            "no heavy-hitter summary registered; average "
            f"{probe['rows_per_key']:.1f} rows/key from NDV only"
        )
    else:
        reasons.append(
            "no statistics registered for the probe side; run "
            "compute_table_stats for a skew advisory"
        )
    return out
