#!/usr/bin/env python
"""Benchmark harness: headline CDC-engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "extra": {...}}

The headline is the real engine: synthetic audio changelog (scaled off the
sf's events count) → correlation → envelopes, batch and streaming, plus the
windowed/dedup/ANN operator suite over the sf tables.  Throughput
(change-events/sec) is reported in extra.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def _mk_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("scylla-cdc-spark-bench")
        .getOrCreate()
    )


def bench_changelog_path(sf_dir: str, n_events: int) -> str:
    """Deterministic bench changelog cached per (sf, size)."""
    from scylla_cdc_source_connector_spark.fixtures import (
        FixtureSpec,
        make_changelog,
        write_changelog_chunk,
    )

    path = f"/tmp/sccs_bench_changelog_{n_events}.parquet"
    if not os.path.exists(path):
        spec = FixtureSpec(
            n_events=n_events,
            n_clips=max(200, n_events // 10),
            n_shards=64,
            n_generations=2,
            min_dur_ms=200,
            max_dur_ms=500,
        )
        write_changelog_chunk(make_changelog(spec), path)
    return path


def run_bench(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from scylla_cdc_source_connector_spark import audio
    from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
    from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes

    timings: dict[str, float] = {}
    extra: dict = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    cl_path = bench_changelog_path(sf_dir, n_events)
    changelog = spark.read.parquet(cl_path)
    n_changelog_rows = changelog.count()
    cfg = EngineConfig(
        include_before=IncludeMode.FULL, include_after=IncludeMode.FULL
    )

    # 1. headline: batch CDC pipeline (correlation + envelopes)
    n_emitted = timed(
        "cdc_pipeline_batch",
        lambda: cdc_envelopes(changelog, cfg, processing_ts_ms=F.lit(0)).count(),
    )
    extra["changelog_rows"] = n_changelog_rows
    extra["emitted"] = n_emitted
    extra["events_per_sec_batch"] = round(
        n_changelog_rows / timings["cdc_pipeline_batch"], 1
    )

    # 2. streaming end-to-end (availableNow, exactly-once sink)
    # stream source needs a directory of just this changelog
    stream_in = "/tmp/sccs_bench_stream_in"
    if not os.path.isdir(stream_in) or not os.listdir(stream_in):
        os.makedirs(stream_in, exist_ok=True)
        shutil.copy(cl_path, os.path.join(stream_in, "chunk-000.parquet"))

    def _stream(mode: str):
        from scylla_cdc_source_connector_spark.streaming.engine import run_stream

        root = f"/tmp/sccs_bench_stream_{mode}"
        shutil.rmtree(root, ignore_errors=True)
        scfg = EngineConfig(
            include_before=IncludeMode.FULL,
            include_after=IncludeMode.FULL,
            checkpoint_dir=f"{root}/ck",
            output_dir=f"{root}/out",
            lineage_dir=f"{root}/lin",
        )
        q = run_stream(spark, scfg, stream_in, mode=mode)
        q.awaitTermination(3600)

    # headline: vectorized foreachBatch correlation (zero-Python hot path)
    timed("cdc_pipeline_streaming", lambda: _stream("vectorized"))
    extra["events_per_sec_streaming"] = round(
        n_changelog_rows / timings["cdc_pipeline_streaming"], 1
    )

    # reference-shaped per-group state machine, capped input (it is the
    # slow path by construction; measured for the comparison record)
    stateful_rows = min(n_changelog_rows, 5000)
    stateful_in = "/tmp/sccs_bench_stream_in_stateful"
    if not os.path.isdir(stateful_in) or not os.listdir(stateful_in):
        os.makedirs(stateful_in, exist_ok=True)
        pdf = __import__("pandas").read_parquet(cl_path).head(stateful_rows)
        from scylla_cdc_source_connector_spark.fixtures import (
            write_changelog_chunk,
        )

        write_changelog_chunk(pdf, os.path.join(stateful_in, "chunk-000.parquet"))

    def _stream_stateful():
        from scylla_cdc_source_connector_spark.streaming.engine import run_stream

        root = "/tmp/sccs_bench_stream_stateful"
        shutil.rmtree(root, ignore_errors=True)
        scfg = EngineConfig(
            include_before=IncludeMode.FULL,
            include_after=IncludeMode.FULL,
            checkpoint_dir=f"{root}/ck",
            output_dir=f"{root}/out",
            lineage_dir=f"{root}/lin",
        )
        q = run_stream(spark, scfg, stateful_in, mode="stateful")
        q.awaitTermination(3600)

    timed("cdc_pipeline_streaming_stateful_5k", _stream_stateful)
    extra["events_per_sec_stateful"] = round(
        stateful_rows / timings["cdc_pipeline_streaming_stateful_5k"], 1
    )

    # 3. audio validation path (vectorized decode + stats over postimages)
    def _audio():
        post = changelog.where("`cdc$operation` = 9").select(
            "clip_id", "bytes", "codec"
        )
        return post.mapInPandas(
            audio.audio_stats_batches, audio.AUDIO_STATS_SCHEMA
        ).where("decode_ok AND roundtrip_snr_db >= 30.0").count()

    extra["audio_validated"] = timed("audio_validate", _audio)

    # 4. operator suite over the sf tables (same entries the driver checks)
    suite = [
        "cdc_tumbling_window",
        "cdc_sliding_window",
        "cdc_session_window",
        "cdc_hot_keys_salted",
        "cdc_latest_state",
        "dedup_exact",
        "dedup_minhash_lsh",
        "ann_cosine_topk",
    ]
    qs = em.queries()
    for name in suite:
        timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    return {
        "metric": "cdc change-events/sec + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "extra": extra,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _mk_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        result = run_bench(spark, sf_dir)
    finally:
        spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
