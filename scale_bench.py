#!/usr/bin/env python
"""Scaling-efficiency evidence for the north_rule's two-cluster-size
criterion (BASELINE.json: throughput scaling efficiency >= 0.8 from N to
4N executors).

A real multi-node cluster is unavailable in this sandbox, so the identical
job runs at two local parallelism levels — local[N] and local[4N] (default
N=8) — on the SAME input, each in its own JVM (subprocess) with matched
`spark.sql.shuffle.partitions`.  Efficiency = (thr_4N / thr_N) / 4.

The measured job is the engine's hot path end-to-end: changelog scan →
correlate_batch (one shuffle, codegen) → envelope projection → vectorized
audio PCM decode + SNR>=30dB validation (Arrow-batched pandas UDF) → count.
Input is written as 64 parquet chunk files so the scan parallelizes at both
levels without an extra repartition shuffle.

Prints ONE JSON line:
  {"n_cores": N, "n4_cores": 4N, "thr_n": rows/s, "thr_4n": rows/s,
   "efficiency": e, "rows": R, "runs": {...}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_CHUNKS = 64
REPEATS = 3


def prepare_input(sf_dir: str) -> tuple[str, int]:
    """Deterministic multi-file changelog for this sf (cached).

    The input is SPARK_GRAFT_SCALE_MULT x (default 4x) the sf's event count:
    the scaling measurement needs a job long enough (tens of seconds at N
    cores) that fixed driver costs (listing, planning, tiny final stages)
    don't drown the parallel fraction — at 100 TB they are noise."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pandas as pd

    from bench import bench_changelog_path
    from scylla_cdc_source_connector_spark.fixtures import write_changelog_chunk

    # n_events scaled off the sf's events table, same as bench.py
    import pyarrow.parquet as pq

    mult = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "4"))
    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows * mult
    single = bench_changelog_path(sf_dir, n_events)
    pdf = pd.read_parquet(single)
    d = f"/tmp/sccs_scale_in_{len(pdf)}"
    if not os.path.isdir(d) or len(os.listdir(d)) != N_CHUNKS:
        os.makedirs(d, exist_ok=True)
        size = (len(pdf) + N_CHUNKS - 1) // N_CHUNKS
        for i in range(N_CHUNKS):
            write_changelog_chunk(
                pdf.iloc[i * size : (i + 1) * size], f"{d}/chunk-{i:03d}.parquet"
            )
    return d, len(pdf)


def worker(input_dir: str, cpus: int) -> None:
    """Run the measured job at one parallelism level; print timings JSON."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/sccs-spark-local")
    os.makedirs(local_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.local.dir", local_dir)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # keep scan splits small enough that 4N cores stay busy
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .appName(f"scylla-cdc-spark-scale-{cpus}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from scylla_cdc_source_connector_spark import audio
    from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
    from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes

    cfg = EngineConfig(include_before=IncludeMode.FULL, include_after=IncludeMode.FULL)

    def job() -> int:
        changelog = spark.read.parquet(input_dir)
        env = cdc_envelopes(changelog, cfg, processing_ts_ms=F.lit(0))
        decoded = env.select(
            F.col("clip_id"),
            F.col("value.after.bytes").alias("bytes"),
            F.col("value.after.codec").alias("codec"),
        ).where("bytes IS NOT NULL")
        ok = decoded.mapInPandas(
            audio.audio_stats_batches, audio.AUDIO_STATS_SCHEMA
        ).where("decode_ok AND roundtrip_snr_db >= 30.0")
        return ok.count()

    job()  # warmup: JIT, codegen, file listing
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        n = job()
        times.append(time.time() - t0)
    spark.stop()
    print(json.dumps({"cpus": cpus, "times": times, "best": min(times), "n_ok": n}))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
    input_dir, rows = prepare_input(sf_dir)

    runs = {}
    for cpus in (n, 4 * n):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", input_dir, str(cpus)],
            capture_output=True,
            text=True,
            timeout=3600,
            check=True,
        )
        runs[cpus] = json.loads(out.stdout.strip().splitlines()[-1])

    thr_n = rows / runs[n]["best"]
    thr_4n = rows / runs[4 * n]["best"]
    eff = (thr_4n / thr_n) / 4
    print(
        json.dumps(
            {
                "metric": "scaling efficiency, N -> 4N cores (same input)",
                "n_cores": n,
                "n4_cores": 4 * n,
                "rows": rows,
                "thr_n_rows_per_s": round(thr_n, 1),
                "thr_4n_rows_per_s": round(thr_4n, 1),
                "efficiency": round(eff, 3),
                "sf": sf_dir,
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) == 4 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]))
    else:
        main()
