"""Exactly-once Kafka-record-shaped sink with per-partition lineage.

The reference is at-least-once (pom.xml:135-137): a crash between poll-drain
and Kafka Connect's periodic offset flush replays records.  The north_rule
requires a strict upgrade to exactly-once.  Mechanism:

- `foreachBatch(sink)` — Structured Streaming replays a failed micro-batch
  with the SAME batch_id from the checkpoint;
- the sink writes each batch's envelopes to `output_dir/batch_id=N/` with
  mode("overwrite") — an idempotent write keyed by batch_id, so a replayed
  batch overwrites its own partial output instead of duplicating it;
- a `_SUCCESS`-style lineage commit (`lineage_dir/batch-N.json`, written
  tmp+atomic-rename) records per-shard offsets: (shard, generation,
  window_start=min cdc$time, window_end=max cdc$time, last_change_clip_id,
  last_change_time, n_records) — the Spark analog of the reference's offset
  map {window_start, window_end, change_id_stream_id, change_id_time}
  (SourceInfo.java:32-63, resume parsing ScyllaConnectorTask.java:153-213);
- readers take only batch dirs with a committed lineage file, so an
  uncommitted partial write is invisible → exactly-once end-to-end.

Emission order: rows are repartitioned by shard and sorted by
(cdc$time_us, cdc$batch_seq_no) within each shard before writing — the
same per-task ordering scope the reference guarantees via its per-vnode
worker loop (SURVEY §7.3).

Empty batches still commit a lineage file — the heartbeat that moves
offsets past empty windows (K4, ScyllaWorkerTransport.java:58-79).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig


def lineage_path(cfg: EngineConfig, batch_id: int) -> str:
    return os.path.join(cfg.lineage_dir, f"batch-{batch_id}.json")


def batch_output_path(cfg: EngineConfig, batch_id: int) -> str:
    return os.path.join(cfg.output_dir, f"batch_id={batch_id}")


def committed_batch_ids(cfg: EngineConfig) -> list[int]:
    if not os.path.isdir(cfg.lineage_dir):
        return []
    out = []
    for f in os.listdir(cfg.lineage_dir):
        if f.startswith("batch-") and f.endswith(".json"):
            out.append(int(f[len("batch-") : -len(".json")]))
    return sorted(out)


def read_lineage(cfg: EngineConfig) -> list[dict]:
    """All committed lineage records, batch order."""
    out = []
    for bid in committed_batch_ids(cfg):
        with open(lineage_path(cfg, bid)) as fh:
            out.append(json.load(fh))
    return out


def read_emitted(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    """Exactly-once view of the sink: only batches with committed lineage."""
    paths = [
        batch_output_path(cfg, bid)
        for bid in committed_batch_ids(cfg)
        if os.path.isdir(batch_output_path(cfg, bid))
    ]
    if not paths:
        return spark.createDataFrame([], "topic string")
    return spark.read.parquet(*paths)


def make_sink(cfg: EngineConfig):
    """foreachBatch body.  Usage:
    writeStream.foreachBatch(make_sink(cfg)).option("checkpointLocation",...)
    """
    os.makedirs(cfg.lineage_dir, exist_ok=True)
    os.makedirs(cfg.output_dir, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        if os.path.exists(lineage_path(cfg, batch_id)):
            # replay of an already-committed batch (crash after commit,
            # before checkpoint advance): idempotent no-op
            return

        shards = []
        n = 0
        if not batch_df.isEmpty():
            # per-shard ordered emit: co-locate each stream, sort by
            # (event time, batch seq) — reference per-task order scope
            ordered = batch_df.repartition(
                F.col("`cdc$stream_id`")
            ).sortWithinPartitions("`cdc$time_us`", "`cdc$batch_seq_no`")
            ordered.write.mode("overwrite").parquet(
                batch_output_path(cfg, batch_id)
            )

            # per-shard offsets (SourceInfo.offset() analog)
            stats = (
                batch_df.groupBy("`cdc$stream_id`", "generation")
                .agg(
                    F.min("`cdc$time_us`").alias("window_start_us"),
                    F.max("`cdc$time_us`").alias("window_end_us"),
                    F.max_by("clip_id", "`cdc$time_us`").alias(
                        "last_change_clip_id"
                    ),
                    F.count("*").alias("n_records"),
                )
                .collect()
            )
            for r in stats:
                shards.append(
                    {
                        "shard_id": r["cdc$stream_id"],
                        "generation": r["generation"],
                        "window_start_us": r["window_start_us"],
                        "window_end_us": r["window_end_us"],
                        "last_change_clip_id": r["last_change_clip_id"],
                        "n_records": r["n_records"],
                    }
                )
                n += r["n_records"]

        # atomic lineage commit: tmp + rename (heartbeat on empty batches)
        rec = {
            "batch_id": batch_id,
            "n_records": n,
            "shards": shards,
            "committed_at_ms": int(time.time() * 1000),
            "sink_seconds": round(time.time() - t0, 3),
        }
        tmp = lineage_path(cfg, batch_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, lineage_path(cfg, batch_id))

    return sink


def max_consumed_time_us(cfg: EngineConfig, generation: int) -> dict[str, int]:
    """Per-shard high-water mark for a generation — the gate input for
    generation rollover (areTasksFullyConsumedUntil,
    ScyllaMasterTransport.java:50-70)."""
    hwm: dict[str, int] = {}
    for rec in read_lineage(cfg):
        for s in rec["shards"]:
            if s["generation"] == generation:
                hwm[s["shard_id"]] = max(
                    hwm.get(s["shard_id"], 0), s["window_end_us"]
                )
    return hwm
