"""Progress / lag metrics over the sink's lineage and emitted output
(SURVEY §7.2 item 7; north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

The reference exposes lag as the difference between the envelope's
top-level ts_ms (processing time) and source.ts_ms (DB time from the
change's timeuuid) — README.md:188-194 — and moves offsets on heartbeats
when windows are empty (ScyllaWorkerTransport.java:58-79).  Here:

- emit_lag_percentiles: distributed percentiles (approxQuantile, no
  collect) of ts_ms − source.ts_ms over emitted envelopes;
- shard_progress: per-shard high-water marks / record counts folded from
  the lineage records — the SourceInfo.offset() view of progress;
- heartbeat_batches: committed batches that carried no records (offset
  progress without data — K4);
- streaming_query_summary: throughput + batch-duration percentiles from
  a StreamingQuery's recentProgress;
- connector_metrics: the Debezium streaming-metrics MBean attribute set
  (ScyllaConnectorTask.java:134 registers the stock
  DefaultChangeEventSourceMetricsFactory), folded driver-only from
  lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig
from scylla_cdc_source_connector_spark.streaming.sink import (
    read_emitted,
    read_lineage,
)


def emit_lag_percentiles(
    emitted: DataFrame, *, probabilities: tuple[float, ...] = (0.5, 0.95, 0.99)
) -> dict[str, float]:
    """Lag = envelope processing ts_ms − source.ts_ms (README.md:188-194),
    as approximate percentiles computed executor-side."""
    lag = emitted.select(
        (F.col("value.ts_ms") - F.col("value.source.ts_ms")).cast("double").alias("lag_ms")
    )
    if lag.isEmpty():
        return {}
    qs = lag.approxQuantile("lag_ms", list(probabilities), 0.001)
    return {f"p{int(p * 100)}_ms": v for p, v in zip(probabilities, qs)}


def shard_progress(cfg: EngineConfig) -> dict[str, dict]:
    """Fold lineage into per-shard progress: the engine's answer to
    `SELECT * FROM offsets` (SourceInfo.java:32-63 partition/offset maps)."""
    out: dict[str, dict] = {}
    for rec in read_lineage(cfg):
        for s in rec["shards"]:
            cur = out.setdefault(
                s["shard_id"],
                {
                    "generation": s["generation"],
                    "window_start_us": s["window_start_us"],
                    "window_end_us": s["window_end_us"],
                    "n_records": 0,
                    "n_batches": 0,
                    "last_change_clip_id": None,
                },
            )
            cur["generation"] = max(cur["generation"], s["generation"])
            cur["window_start_us"] = min(cur["window_start_us"], s["window_start_us"])
            if s["window_end_us"] >= cur["window_end_us"]:
                cur["window_end_us"] = s["window_end_us"]
                cur["last_change_clip_id"] = s["last_change_clip_id"]
            cur["n_records"] += s["n_records"]
            cur["n_batches"] += 1
    return out


def connector_metrics(cfg: EngineConfig, *, now_ms: int | None = None) -> dict:
    """The Debezium streaming-metrics MBean analog, folded from lineage
    on the driver (no Spark job).

    The reference registers Debezium's stock streaming metrics via
    DefaultChangeEventSourceMetricsFactory (ScyllaConnectorTask.java:134);
    the attribute names here are that MBean's, computed from the sink's
    committed lineage records:

    - TotalNumberOfEventsSeen = emitted + quarantined (everything the
      sink processed); NumberOfEventsFiltered = quarantined (the audio
      gate is the engine's event filter);
    - TotalNumberOfCreate/Update/DeleteEventsSeen from the per-shard
      per-op tallies the stats pass records (older lineage without the
      tallies contributes zero — the totals stay sums, never guesses);
    - MilliSecondsSinceLastEvent = now − last data-carrying commit;
    - MilliSecondsBehindSource = at that commit, wall clock − the newest
      source event time it shipped (the consumer-visible replication lag);
    - LastEvent / SourceEventPosition = the newest change's key and the
      per-shard high-water marks (SourceInfo.java:32-63 offsets view);
    - Connected = a committed lineage record exists.
    """
    import time as _time

    recs = read_lineage(cfg)
    if now_ms is None:
        now_ms = int(_time.time() * 1000)
    m: dict = {
        "Connected": bool(recs),
        "NumberOfCommittedBatches": len(recs),
        "TotalNumberOfEventsSeen": 0,
        "NumberOfEventsFiltered": 0,
        "TotalNumberOfCreateEventsSeen": 0,
        "TotalNumberOfUpdateEventsSeen": 0,
        "TotalNumberOfDeleteEventsSeen": 0,
        "MilliSecondsSinceLastEvent": None,
        "MilliSecondsBehindSource": None,
        "LastEvent": None,
        "SourceEventPosition": {},
    }
    last_commit_ms = None
    last_event_us = None
    for rec in recs:
        m["TotalNumberOfEventsSeen"] += rec["n_records"] + rec.get("n_quarantined", 0)
        m["NumberOfEventsFiltered"] += rec.get("n_quarantined", 0)
        for s in rec["shards"]:
            m["TotalNumberOfCreateEventsSeen"] += s.get("n_creates", 0)
            m["TotalNumberOfUpdateEventsSeen"] += s.get("n_updates", 0)
            m["TotalNumberOfDeleteEventsSeen"] += s.get("n_deletes", 0)
        if rec["n_records"] > 0:
            batch_max_us = max(s["window_end_us"] for s in rec["shards"])
            if last_event_us is None or batch_max_us >= last_event_us:
                last_event_us = batch_max_us
            last_commit_ms = max(last_commit_ms or 0, rec["committed_at_ms"])
    if last_commit_ms is not None:
        m["MilliSecondsSinceLastEvent"] = max(now_ms - last_commit_ms, 0)
        m["MilliSecondsBehindSource"] = max(
            last_commit_ms - last_event_us // 1000, 0
        )
    prog = shard_progress(cfg)
    m["SourceEventPosition"] = {
        sid: s["window_end_us"] for sid, s in prog.items()
    }
    if prog:
        newest = max(prog.values(), key=lambda s: s["window_end_us"])
        m["LastEvent"] = newest["last_change_clip_id"]
    return m


def heartbeat_batches(cfg: EngineConfig) -> list[int]:
    """Batch ids committed with zero records — pure offset progress, the
    heartbeat analog (K4)."""
    return [rec["batch_id"] for rec in read_lineage(cfg) if rec["n_records"] == 0]


def emitted_lag_report(
    spark: SparkSession, cfg: EngineConfig
) -> dict[str, float]:
    """Convenience: lag percentiles over everything the sink has committed."""
    return emit_lag_percentiles(read_emitted(spark, cfg))


def streaming_query_summary(query, cfg: EngineConfig | None = None) -> dict:
    """Throughput + per-batch duration percentiles from recentProgress
    (the observable the driver's dashboards scrape).

    With cfg, input_rows is ROWS ARRIVED, taken from the sink's exact
    per-batch `n_input_rows` lineage field (a scalar Observation on the
    raw batch input — counted once regardless of how many metadata/
    pending passes rescanned the source; numInputRows multiplies per
    scan, recorded as `n_source_scans` for the division fallback on old
    lineage).  Without cfg the raw numInputRows is reported unchanged."""
    seen: set = set()
    progresses = []
    # recentProgress can report the terminal batch twice — dedupe by batchId
    for p in query.recentProgress or []:
        if p.get("numInputRows", 0) > 0 and p.get("batchId") not in seen:
            seen.add(p.get("batchId"))
            progresses.append(p)
    if not progresses:
        return {"n_batches": 0}
    durs = sorted(
        p["durationMs"]["triggerExecution"]
        for p in progresses
        if p.get("durationMs", {}).get("triggerExecution") is not None
    )
    arrived_by_batch: dict = {}
    scans_by_batch: dict = {}
    if cfg is not None:
        for rec in read_lineage(cfg):
            scans_by_batch[rec["batch_id"]] = rec.get("n_source_scans", 1)
            if "n_input_rows" in rec:
                arrived_by_batch[rec["batch_id"]] = rec["n_input_rows"]
    rows = sum(
        arrived_by_batch[p.get("batchId")]
        if p.get("batchId") in arrived_by_batch
        else p["numInputRows"] // max(scans_by_batch.get(p.get("batchId"), 1), 1)
        for p in progresses
    )
    total_s = sum(durs) / 1000.0

    def pct(f: float) -> float:
        return durs[min(int(f * len(durs)), len(durs) - 1)]

    return {
        "n_batches": len(progresses),
        "input_rows": rows,
        "rows_per_sec": round(rows / total_s, 1) if total_s else None,
        "batch_ms_p50": pct(0.5),
        "batch_ms_p95": pct(0.95),
        "batch_ms_max": durs[-1],
    }
