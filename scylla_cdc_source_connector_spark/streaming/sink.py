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
import shutil
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig
from scylla_cdc_source_connector_spark.retry import with_retries
from scylla_cdc_source_connector_spark.schemas import DEFAULT_TABLE, TableModel


def _commit_lineage(cfg: EngineConfig, batch_id: int, rec: dict) -> None:
    """Atomic lineage commit (tmp + rename), retried with the reference's
    backoff policy on transient I/O errors (K6) — a failed commit would
    otherwise kill the streaming query even though the batch output is
    already idempotently written."""

    def write() -> None:
        tmp = lineage_path(cfg, batch_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, lineage_path(cfg, batch_id))

    with_retries(write)


def lineage_path(cfg: EngineConfig, batch_id: int) -> str:
    return os.path.join(cfg.lineage_dir, f"batch-{batch_id}.json")


def batch_output_path(cfg: EngineConfig, batch_id: int) -> str:
    return os.path.join(cfg.output_dir, f"batch_id={batch_id}")


def pending_path(cfg: EngineConfig, batch_id: int) -> str:
    """Carry-over state of the vectorized correlator: raw changelog rows of
    groups still incomplete AFTER processing batch_id (versioned per batch
    so a replayed batch rebuilds identical state — exactly-once)."""
    return os.path.join(cfg.output_dir, "_pending", f"batch_id={batch_id}")


def stamp_source(cfg: EngineConfig, identity: str) -> None:
    """Pin the lineage namespace to ONE source identity (mode + location).

    The file-stream path numbers batches with Spark's 0-based checkpoint
    batch ids while the jarless Iceberg path uses 1-based snapshot
    sequence numbers; pointing both modes at one EngineConfig would make
    resume silently skip snapshots as 'already committed'.  The first
    run stamps `lineage_dir/_source.json`; a later run with a DIFFERENT
    identity fails loudly instead."""
    os.makedirs(cfg.lineage_dir, exist_ok=True)
    p = os.path.join(cfg.lineage_dir, "_source.json")
    if os.path.isfile(p):
        with open(p) as fh:
            prev = json.load(fh)["identity"]
        if prev != identity:
            raise ValueError(
                f"lineage dir {cfg.lineage_dir} belongs to source {prev!r}; "
                f"refusing to resume it as {identity!r} — use a fresh "
                "output/lineage namespace per source"
            )
        return
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"identity": identity}, fh)
    os.replace(tmp, p)


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


def read_lineage_one(cfg: EngineConfig, batch_id: int) -> dict:
    """One committed lineage record ({} if the batch never committed)."""
    p = lineage_path(cfg, batch_id)
    if not os.path.isfile(p):
        return {}
    with open(p) as fh:
        return json.load(fh)


def read_emitted(
    spark: SparkSession, cfg: EngineConfig, *, merge_schema: bool = False
) -> DataFrame:
    """Exactly-once view of the sink: only batches with committed lineage.

    merge_schema=True unions batches written under DIFFERENT adopted
    table models (schema_evolution): pre-evolution envelopes surface the
    added image fields as nulls."""
    paths = [
        batch_output_path(cfg, bid)
        for bid in committed_batch_ids(cfg)
        if os.path.isdir(batch_output_path(cfg, bid))
    ]
    if not paths:
        return spark.createDataFrame([], "topic string")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def quarantine_path(cfg: EngineConfig, batch_id: int) -> str:
    return os.path.join(cfg.output_dir, "_quarantine", f"batch_id={batch_id}")


def read_quarantined(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    """Dead-letter view: envelopes diverted by the audio-validation gate,
    with `quarantine_reason` + the measured verdict.  Exactly-once like
    the emit stream (only committed batches are listed)."""
    paths = [
        quarantine_path(cfg, bid)
        for bid in committed_batch_ids(cfg)
        if os.path.isdir(quarantine_path(cfg, bid))
    ]
    if not paths:
        return spark.createDataFrame([], "quarantine_reason string")
    return spark.read.parquet(*paths)


def heartbeat_path(cfg: EngineConfig, batch_id: int) -> str:
    return os.path.join(cfg.output_dir, "_heartbeat", f"batch_id={batch_id}")


#: heartbeat record schema — offset-bearing progress signal
#: (the Spark shape of Debezium's heartbeat topic record)
HEARTBEAT_SCHEMA = (
    "topic string, shard_id string, generation int, window_end_us long, "
    "batch_id long, n_records long, committed_at_ms long"
)


def read_heartbeats(spark: SparkSession, cfg: EngineConfig):
    """All heartbeat records emitted so far (advisory, at-least-once —
    same delivery class as Debezium's heartbeat topic)."""
    root = os.path.join(cfg.output_dir, "_heartbeat")
    if not os.path.isdir(root) or not os.listdir(root):
        return spark.createDataFrame([], HEARTBEAT_SCHEMA)
    return spark.read.schema(HEARTBEAT_SCHEMA).parquet(
        *(os.path.join(root, d) for d in sorted(os.listdir(root)))
    )


def _make_heartbeat_emitter(cfg: EngineConfig):
    """Per-sink heartbeat timer + writer (K4).

    The reference dispatches a heartbeat record to a heartbeat topic when
    a task's window moves and the heartbeat timer expired
    (ScyllaWorkerTransport.java:58-79); its offsets only advance with
    records, so heartbeats are mandatory on empty windows.  Here the
    lineage commit itself advances offsets, so heartbeat RECORDS are the
    downstream-visible progress signal: emitted unconditionally for an
    EMPTY batch (the offset advance has no other carrier) and
    timer-gated otherwise.  Written idempotently per batch_id
    (overwrite), read via read_heartbeats."""

    state = {"last_ms": 0.0}

    def emit(
        spark: SparkSession,
        batch_id: int,
        n_records: int,
        shards: list[dict],
    ) -> None:
        if cfg.heartbeat_interval_ms <= 0:
            return
        now_ms = time.time() * 1000
        expired = now_ms - state["last_ms"] >= cfg.heartbeat_interval_ms
        if n_records > 0 and not expired:
            return
        if not shards:
            # empty window: carry the last committed per-shard offsets so
            # consumers see WHERE progress stands, not just that it moved
            hwm: dict[str, dict] = {}
            for rec in read_lineage(cfg):
                for s in rec["shards"]:
                    cur = hwm.get(s["shard_id"])
                    if cur is None or s["window_end_us"] >= cur["window_end_us"]:
                        hwm[s["shard_id"]] = s
            shards = list(hwm.values())
        rows = [
            (
                f"__heartbeat.{cfg.connector_name}",
                s["shard_id"],
                s["generation"],
                s["window_end_us"],
                batch_id,
                n_records,
                int(now_ms),
            )
            for s in shards
        ] or [
            # no offsets at all yet: a single engine-level liveness record
            (
                f"__heartbeat.{cfg.connector_name}",
                None,
                None,
                None,
                batch_id,
                n_records,
                int(now_ms),
            )
        ]
        # driver-side pyarrow write: the record set is bounded by the
        # shard count, so a 1-task Spark job here is pure per-trigger
        # overhead (job launch + coalesce(1) measured up to ~5 s in slow
        # host phases).  Same layout/read path (read_heartbeats uses an
        # explicit schema); idempotent overwrite per batch_id.
        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = list(zip(*rows))
        tbl = pa.table(
            {
                "topic": pa.array(cols[0], pa.string()),
                "shard_id": pa.array(cols[1], pa.string()),
                "generation": pa.array(cols[2], pa.int32()),
                "window_end_us": pa.array(cols[3], pa.int64()),
                "batch_id": pa.array(cols[4], pa.int64()),
                "n_records": pa.array(cols[5], pa.int64()),
                "committed_at_ms": pa.array(cols[6], pa.int64()),
            }
        )
        d = heartbeat_path(cfg, batch_id)
        import shutil as _shutil

        _shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"))
        state["last_ms"] = now_ms

    return emit


def _obs_get(obs: Observation, defaults: dict) -> dict:
    """Observation.get, tolerating a plan whose observed subtree never
    executed (e.g. every file/row statically pruned → Catalyst/AQE
    replaces the subtree with an empty relation and the CollectMetrics
    node vanishes with it): the defaults stand in for the missing row."""
    try:
        return {**defaults, **obs.get}
    except Exception:
        return dict(defaults)


def make_sink(cfg: EngineConfig):
    """foreachBatch body.  Usage:
    writeStream.foreachBatch(make_sink(cfg)).option("checkpointLocation",...)
    """
    os.makedirs(cfg.lineage_dir, exist_ok=True)
    os.makedirs(cfg.output_dir, exist_ok=True)
    heartbeat = _make_heartbeat_emitter(cfg)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        if os.path.exists(lineage_path(cfg, batch_id)):
            # replay of an already-committed batch (crash after commit,
            # before checkpoint advance): idempotent no-op
            return

        # per-shard ordered emit + offsets (SourceInfo.offset() analog)
        n, shards, n_quar, n_dups = _write_batch(batch_df, batch_id, cfg)
        heartbeat(batch_df.sparkSession, batch_id, n, shards)

        # atomic lineage commit: tmp + rename (heartbeat on empty batches)
        _commit_lineage(
            cfg,
            batch_id,
            {
                "batch_id": batch_id,
                "n_records": n,
                "n_quarantined": n_quar,
                "n_dup_pairs": n_dups,
                "shards": shards,
                "committed_at_ms": int(time.time() * 1000),
                "sink_seconds": round(time.time() - t0, 3),
            },
        )

    return sink


def make_correlating_sink(cfg: EngineConfig, table: TableModel = DEFAULT_TABLE):
    """foreachBatch body over the RAW changelog stream — the vectorized
    (default) correlation mode.

    The per-group Python of applyInPandasWithState is the reference's
    per-row consume() loop reborn (ScyllaChangesConsumer.java:187-249) —
    at 10^12 rows that is the bottleneck.  This sink instead runs the
    whole-stage-codegen'd `correlate_batch` hash aggregation (ONE shuffle,
    map-side partial agg, zero Python) inside each micro-batch and carries
    the cross-batch waits — groups whose write batch was split by a
    micro-batch boundary — in an explicit pending-state table:

      batch N input  = micro-batch rows ∪ pending(batch N-1)
      complete groups → envelopes → idempotent batch_id=N output
      incomplete, not expired → pending(batch N), committed in the same
      lineage record (tmp+rename) → replay-safe

    Stale eviction (C4, ScyllaChangesConsumer.java:147-185): incomplete
    groups older than hwm − incomplete_task_timeout are dropped, where
    hwm = max event time seen so far (the engine-maintained watermark,
    persisted in lineage as `max_event_us` — the streaming analog of the
    confidence window S2).
    """
    from scylla_cdc_source_connector_spark.operators.correlation import (
        correlate_batch,
        is_complete_expr,
        mask_unused_images,
        needs_delta_flags,
    )
    from scylla_cdc_source_connector_spark.operators.projection import (
        build_envelopes,
    )

    os.makedirs(cfg.lineage_dir, exist_ok=True)
    os.makedirs(cfg.output_dir, exist_ok=True)
    heartbeat = _make_heartbeat_emitter(cfg)

    def sink(raw_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        if os.path.exists(lineage_path(cfg, batch_id)):
            return  # replayed, already-committed batch: idempotent no-op
        spark = raw_df.sparkSession

        # resume state comes from the LATEST committed lineage record only:
        # hwm is monotone, and a later batch without pending means earlier
        # pending state was consumed (each batch rewrites the pending table)
        bids = committed_batch_ids(cfg)
        if bids:
            with open(lineage_path(cfg, bids[-1])) as fh:
                latest = json.load(fh)
        else:
            latest = {}
        prev_hwm = latest.get("max_event_us", 0)
        prev_pending = (
            latest["batch_id"] if latest.get("has_pending") else None
        )
        # exact rows-arrived accounting: a scalar Observation stamped on
        # the raw batch input BEFORE the confidence filter / pending union
        # — evaluated during the main write pass, so lineage records the
        # true per-batch arrival count and metrics need not guess how many
        # times the source was rescanned (numInputRows multiplies per scan)
        obs_in = Observation(f"sink-arrived-{batch_id}")
        raw_df = raw_df.observe(obs_in, F.count(F.lit(1)).alias("n_arrived"))
        # confidence-window enforcement (S2): drop input rows older than the
        # watermark = max event time of prior batches − confidence window,
        # exactly Spark's withWatermark semantics (watermark advances at
        # batch boundaries).  Pending rows were already admitted.
        if prev_hwm > 0:
            raw_df = raw_df.filter(
                F.col("`cdc$time_us`")
                >= prev_hwm - cfg.confidence_window_ms * 1000
            )
        all_rows = raw_df
        n_carried = 0
        if prev_pending is not None and os.path.isdir(
            pending_path(cfg, prev_pending)
        ):
            pdir = pending_path(cfg, prev_pending)
            # pending rows may predate a schema adoption (restart after
            # ALTER TABLE): reconcile them to the CURRENT model — adopted
            # columns surface as NULL, dropped columns vanish — the same
            # rule the source read applies (ScyllaSchema.
            # updateChangeSchema analog, latest observed schema wins)
            pend_df = spark.read.parquet(pdir)
            have = set(pend_df.columns)
            pend_df = pend_df.select(
                *[
                    F.col(f"`{f.name}`")
                    if f.name in have
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in raw_df.schema.fields
                ]
            )
            all_rows = raw_df.unionByName(pend_df)
            # footer-only count of the carried backlog (no Spark job);
            # feeds the provably-nothing-deferred skip below
            import pyarrow.parquet as _pq

            n_carried = sum(
                _pq.read_metadata(os.path.join(pdir, f)).num_rows
                for f in os.listdir(pdir)
                if f.endswith(".parquet")
            )
        # The batch input is deliberately NOT persisted.  Spark's SQL cache
        # builds compressed columnar batches, and on a payload-bearing
        # changelog that materialization costs more than the one extra
        # column-pruned scan it would save (measured: the two payload
        # caches dominated sink time ~4:1 over the actual write).  Each
        # pass below reads only the columns it needs straight off the
        # parquet scan; the payload rides exactly ONE pass (the ordered
        # envelope write).  The file source may report numInputRows once
        # per extra metadata pass — a cosmetic double-count.
        cached = None

        # S4/K1 record-level admission (the reference's per-task
        # max.batch.size poll cap, README.md:1363-1370): admit the first
        # K rows PER SHARD in (cdc$time_us, seq) order; the rest divert
        # to the replay-safe pending table and drain on later triggers.
        # Per-shard ranking = one shuffle on the shard key, no global
        # sort, deterministic — a group split by the cap simply completes
        # in a later batch like any boundary-split group.
        deferred = None
        budget = cfg.max_records_per_trigger_per_shard
        if budget and budget > 0:
            from pyspark.sql import Window

            # the ranking window is consumed twice (admitted + deferred), so
            # THIS path does persist — the budget cap bounds the batch size,
            # keeping the cache small by construction
            all_rows.persist()
            cached = all_rows
            w_adm = Window.partitionBy("`cdc$stream_id`").orderBy(
                "`cdc$time_us`",
                "`cdc$batch_seq_no`",
                *[f"`{c}`" for c in table.pk_columns],
            )
            ranked = all_rows.withColumn("__rn", F.row_number().over(w_adm))
            deferred = ranked.filter(F.col("__rn") > budget).drop("__rn")
            all_rows = ranked.filter(F.col("__rn") <= budget).drop("__rn")

        # require_delta=False: groups whose delta hasn't arrived yet
        # (micro-batch or admission boundary between a group's images and
        # its delta — Scylla batch order puts preimages FIRST) must reach
        # the pending table instead of being silently dropped
        # cluster_by_stream: the correlation's one exchange is a
        # repartition on cdc$stream_id (HashPartitioning(stream) satisfies
        # the finer grouping), so the correlated rows — and the envelopes
        # built from them — arrive already clustered per shard and the
        # ordered write below skips its own repartition.  The payload
        # crosses exactly ONE exchange end-to-end in the sink.
        corr = mask_unused_images(
            correlate_batch(
                all_rows,
                delta_flags=needs_delta_flags(cfg),
                require_delta=False,
                table=table,
                cluster_by_stream=True,
            ),
            cfg,
        )
        try:
            # Watermark + incomplete-group bookkeeping ride the write pass
            # itself as an Observation on the correlated rows (evaluated
            # while the plan executes — no second execution, no second
            # source scan, so numInputRows stays an honest per-row count).
            # The Observation carries SCALARS ONLY (max event time + an
            # incomplete-group count): per-group keys never travel to the
            # driver, so a poison batch where every group is boundary-split
            # costs executor work, not driver memory.  When the count says
            # incomplete groups exist, their keys are computed by the
            # distributed metadata-only status plan below.
            complete = is_complete_expr(cfg)
            group_keys = [*table.pk_columns, "cdc$time"]
            obs = Observation(f"sink-status-{batch_id}")
            observed = corr.observe(
                obs,
                F.max("`cdc$time_us`").alias("max_ev"),
                F.count(F.when(~complete, F.lit(1))).alias("n_inc"),
            )
            env = build_envelopes(observed.filter(complete), cfg, table=table)
            # the ONE payload pass: scan → correlate → envelope → ordered
            # write (stats come off a pruned read-back inside _write_batch)
            phases: dict[str, float] = {}
            t_ph = time.time()
            n, shards, n_quar, n_dups = _write_batch(
                env, batch_id, cfg, table=table, stream_clustered=True
            )
            phases["envelope_write"] = round(time.time() - t_ph, 3)

            status = _obs_get(obs, {"max_ev": None, "n_inc": 0})
            max_ev, n_inc = status["max_ev"], status["n_inc"] or 0
            hwm = max(prev_hwm, max_ev or 0)

            # carry incomplete, unexpired groups; expired ones are dropped
            # like the reference's stale-task cleanup.  The extra pass
            # (slim status scan + payload-bearing semi-join, fused into
            # the single pending WRITE job) runs only when incomplete
            # groups actually exist, and stays fully distributed — no key
            # structs ever reach the driver; the carried-row count comes
            # off the written parquet footers, not a separate count job
            # (a per-micro-batch count action measured ~1 s/trigger).
            n_keep = 0
            pend = None
            n_extra_scans = 0
            if n_inc:
                inc_keys = _incomplete_group_keys(all_rows, cfg, table, hwm)
                # no broadcast hint: inc_keys is tiny for ordinary
                # boundary splits and AQE picks broadcast then, but a
                # poison all-incomplete batch must not be forced through
                # a driver-side broadcast build
                pend = all_rows.join(inc_keys, group_keys, "left_semi")
                n_extra_scans = 1  # the slim status scan
            if deferred is not None:
                # the budget cap is per shard, so a batch whose TOTAL
                # rows entering the ranking (new arrivals + carried
                # pending backlog) fit the budget provably deferred
                # nothing — skip the pending write + footer scan entirely
                # (no extra count() job; the proof rides the existing
                # observation + the carried dir's parquet footers)
                arrived = _obs_get(obs_in, {"n_arrived": None})["n_arrived"]
                if arrived is not None and arrived + n_carried <= budget:
                    deferred = None
            if deferred is not None:
                pend = (
                    pend.unionByName(deferred) if pend is not None else deferred
                )
            n_source_scans = 1
            t_ph = time.time()
            if pend is not None:
                if cached is None:
                    # the pend write re-reads the (uncached) batch input —
                    # recorded (with the slim status scan) so metrics can
                    # normalize numInputRows back to rows-arrived
                    n_source_scans = 2 + n_extra_scans
                out = pending_path(cfg, batch_id)
                pend.write.mode("overwrite").option(
                    "compression", cfg.output_compression
                ).option(
                    "parquet.block.size", str(cfg.output_row_group_bytes)
                ).parquet(out)
                import pyarrow.parquet as pq

                n_keep = sum(
                    pq.read_metadata(os.path.join(out, f)).num_rows
                    for f in os.listdir(out)
                    if f.endswith(".parquet")
                )
                phases["pending_write"] = round(time.time() - t_ph, 3)
        finally:
            if cached is not None:
                cached.unpersist()

        t_ph = time.time()
        heartbeat(spark, batch_id, n, shards)
        phases["heartbeat"] = round(time.time() - t_ph, 3)
        _commit_lineage(
            cfg,
            batch_id,
            {
                "batch_id": batch_id,
                "n_records": n,
                "n_quarantined": n_quar,
                "n_dup_pairs": n_dups,
                "shards": shards,
                "max_event_us": hwm,
                "has_pending": bool(n_keep),
                "n_source_scans": n_source_scans,
                "n_input_rows": _obs_get(obs_in, {"n_arrived": 0})[
                    "n_arrived"
                ],
                "committed_at_ms": int(time.time() * 1000),
                "sink_seconds": round(time.time() - t0, 3),
                # per-phase breakdown (observability; the unattributed
                # remainder is plan analysis + the budget-ranking persist)
                "sink_phase_seconds": phases,
            },
        )

    return sink


def _incomplete_group_keys(
    all_rows: DataFrame, cfg: EngineConfig, table: TableModel, hwm: int
) -> DataFrame:
    """Distributed metadata-only status plan: the group keys of
    correlation groups that are incomplete under cfg's include modes and
    not yet expired at the engine watermark `hwm`.

    Re-derives group completeness from the RAW batch input with a slim
    aggregation over (pk, cdc$time, cdc$operation, cdc$batch_seq_no,
    cdc$time_us) only — Catalyst prunes the payload columns from the
    scan, so the audio bytes are never read — then applies the SAME
    completion predicate as the envelope path (is_complete_expr, one
    source of truth) plus the stale-task TTL
    (ScyllaChangesConsumer.java:147-185).  Replaces the former
    per-group key collection through the Observation: key volume now
    scales on executors, never on the driver."""
    from scylla_cdc_source_connector_spark.operators.correlation import (
        is_complete_expr,
    )
    from scylla_cdc_source_connector_spark.schemas import (
        DELTA_OPS,
        OP_POST_IMAGE,
        OP_PRE_IMAGE,
    )

    op = F.col("`cdc$operation`")
    seq = F.col("`cdc$batch_seq_no`")
    is_delta = op.isin(list(DELTA_OPS))
    group_keys = [*table.pk_columns, "cdc$time"]
    st = all_rows.groupBy(*[f"`{c}`" for c in group_keys]).agg(
        F.count(F.when(op == OP_PRE_IMAGE, F.lit(1))).alias("__n_pre"),
        F.count(F.when(op == OP_POST_IMAGE, F.lit(1))).alias("__n_post"),
        # op of the LAST delta (by batch seq) — matches correlate_batch's
        # last-one-wins slot
        F.max_by(F.when(is_delta, op), F.when(is_delta, seq)).alias(
            "__delta_op"
        ),
        F.max("`cdc$time_us`").alias("__ev_us"),
    )
    done = is_complete_expr(
        cfg,
        op=F.col("__delta_op"),
        has_pre=F.col("__n_pre") > 0,
        has_post=F.col("__n_post") > 0,
    )
    ttl_floor = hwm - cfg.incomplete_task_timeout_ms * 1000
    return st.filter(~done & (F.col("__ev_us") >= F.lit(ttl_floor))).select(
        *[f"`{c}`" for c in group_keys]
    )


def _write_batch(
    env_df: DataFrame,
    batch_id: int,
    cfg: EngineConfig,
    table: TableModel = DEFAULT_TABLE,
    stream_clustered: bool = False,
) -> tuple[int, list[dict]]:
    """Idempotent per-batch output write + per-shard offset stats
    (shared by make_sink and make_correlating_sink).

    The envelope plan executes ONCE, on the ordered write itself; the
    per-shard offset stats then come from a column-pruned scan of the
    parquet just written (4 metadata columns out of a payload-bearing
    row — the read-back never touches the audio bytes), which doubles as
    the emptiness probe.  (Running isEmpty / write / stats as three
    separate actions re-executed the whole upstream plan — in vectorized
    mode that re-ran the correlation aggregation — three times per
    micro-batch; caching the envelope instead was measured WORSE: the
    before+after full images make the cache ~2× the payload, and
    materializing it cost more than the second pass it saved.)

    With cfg.audio_validation / normalize / dedup_index on, the verdict
    and resample columns are stamped into the plan BEFORE a persist and
    the derived outputs (quarantine, emit, index) all read the cache —
    those paths genuinely reuse the decoded verdict several times, which
    is what persist is for.  The stats .collect() itself is a per-shard
    aggregate, bounded by shard count."""
    shards: list[dict] = []
    n = 0
    n_quar = 0
    n_dups = 0
    gate = _audio_gate_exprs(env_df, cfg)
    if gate is not None:
        env_df = gate["df"]
    norm = _normalize_exprs(env_df, cfg)
    if norm is not None:
        env_df = norm["df"]

    def shard_stats(df: DataFrame) -> list:
        return (
            df.groupBy("`cdc$stream_id`", "generation")
            .agg(
                F.min("`cdc$time_us`").alias("window_start_us"),
                F.max("`cdc$time_us`").alias("window_end_us"),
                # single-pk tables record the raw id; composite keys a
                # pipe-joined rendering (lineage is a JSON progress record,
                # not a resume key — offsets live in the checkpoint)
                F.max_by(
                    F.concat_ws(
                        "|",
                        *[F.col(f"`{c}`").cast("string") for c in table.pk_columns],
                    ),
                    "`cdc$time_us`",
                ).alias("last_change_clip_id"),
                F.count("*").alias("n_records"),
                # per-op tallies ride the same pruned pass (value.op is a
                # nested-schema-pruned read) and land in lineage so the
                # Debezium streaming-metrics analog (metrics.
                # connector_metrics: TotalNumberOfCreate/Update/Delete
                # EventsSeen) is a driver-only fold, no rescan
                F.count(F.when(F.col("value.op") == "c", 1)).alias("n_creates"),
                F.count(F.when(F.col("value.op") == "u", 1)).alias("n_updates"),
                F.count(F.when(F.col("value.op") == "d", 1)).alias("n_deletes"),
            )
            .collect()
        )

    def ordered_write(df: DataFrame) -> None:
        # stream_clustered: the correlating sink already shuffled on
        # cdc$stream_id (correlate_batch cluster_by_stream), so the
        # envelopes are shard-clustered as-is and repartitioning again
        # would move the payload through a second exchange for nothing
        if not stream_clustered:
            df = df.repartition(F.col("`cdc$stream_id`"))
        (
            df.sortWithinPartitions("`cdc$time_us`", "`cdc$batch_seq_no`")
            .write.mode("overwrite")
            .option("compression", cfg.output_compression)
            .option("parquet.block.size", str(cfg.output_row_group_bytes))
            .parquet(batch_output_path(cfg, batch_id))
        )

    if gate is None and norm is None and not cfg.dedup_index:
        # fast path (no payload post-processing): one plan execution
        out = batch_output_path(cfg, batch_id)
        ordered_write(env_df)
        if not any(f.startswith("part-") for f in os.listdir(out)):
            shutil.rmtree(out, ignore_errors=True)  # empty batch: no output dir
            return n, shards, n_quar, n_dups
        stats = shard_stats(env_df.sparkSession.read.parquet(out))
        for r in stats:
            shards.append(
                {
                    "shard_id": r["cdc$stream_id"],
                    "generation": r["generation"],
                    "window_start_us": r["window_start_us"],
                    "window_end_us": r["window_end_us"],
                    "last_change_clip_id": r["last_change_clip_id"],
                    "n_records": r["n_records"],
                    "n_creates": r["n_creates"],
                    "n_updates": r["n_updates"],
                    "n_deletes": r["n_deletes"],
                }
            )
            n += r["n_records"]
        return n, shards, n_quar, n_dups

    persisted = env_df
    persisted.persist()
    try:
        if gate is not None:
            bad = persisted.filter(~gate["pass"])
            n_quar = bad.count()
            if n_quar:
                (
                    bad.withColumn("quarantine_reason", gate["reason"])
                    .drop("__audio_norm")
                    .write.mode("overwrite")
                    .option("compression", cfg.output_compression)
                    .option(
                        "parquet.block.size", str(cfg.output_row_group_bytes)
                    )
                    .parquet(quarantine_path(cfg, batch_id))
                )
            env_df = persisted.filter(gate["pass"]).drop("__audio_verdict")
        if norm is not None:
            env_df = norm["apply"](env_df)
        stats = shard_stats(env_df)
        if not stats:
            return n, shards, n_quar, n_dups
        ordered_write(env_df)
        if cfg.dedup_index:
            from scylla_cdc_source_connector_spark.streaming.dedup_index import (
                maintain_dedup_index,
            )

            # gated rows only: quarantined payloads never enter the index
            n_dups = maintain_dedup_index(env_df, batch_id, cfg)
    finally:
        persisted.unpersist()
    for r in stats:
        shards.append(
            {
                "shard_id": r["cdc$stream_id"],
                "generation": r["generation"],
                "window_start_us": r["window_start_us"],
                "window_end_us": r["window_end_us"],
                "last_change_clip_id": r["last_change_clip_id"],
                "n_records": r["n_records"],
                "n_creates": r["n_creates"],
                "n_updates": r["n_updates"],
                "n_deletes": r["n_deletes"],
            }
        )
        n += r["n_records"]
    return n, shards, n_quar, n_dups


def _audio_gate_exprs(env_df: DataFrame, cfg: EngineConfig):
    """Audio-validation gate pieces for _write_batch, or None when the
    gate is off or the envelope carries no post-image payload columns
    (metadata-only configs, adopted schemas without bytes/codec).

    Returns {"df": env+verdict column, "pass": Column, "reason": Column}.
    The verdict is ONE Arrow-vectorized pandas UDF over the post-image
    (audio.make_audio_verdict_udf) — grouped-LUT decode + segmented
    roundtrip-SNR, zero per-row numpy."""
    if not cfg.audio_validation:
        return None
    try:
        after = next(
            f for f in env_df.schema["value"].dataType.fields
            if f.name == "after"
        )
        names = {f.name for f in after.dataType.fields}
    except (KeyError, AttributeError, StopIteration):
        return None
    if not {"bytes", "codec"} <= names:
        return None

    from scylla_cdc_source_connector_spark import audio

    verdict = audio.make_audio_verdict_udf()
    df = env_df.withColumn(
        "__audio_verdict",
        verdict(F.col("value.after.bytes"), F.col("value.after.codec")),
    )
    v = F.col("__audio_verdict")
    # NaN guard: snr is NaN only for rows without a payload, which pass
    # via the isNull arm; failed decodes are caught by decode_ok
    ok = v["decode_ok"] & (
        F.col("value.after.bytes").isNull()
        | (v["roundtrip_snr_db"] >= F.lit(cfg.audio_min_snr_db))
    )
    reason = F.when(~v["decode_ok"], F.lit("decode_failed")).otherwise(
        F.lit(f"snr_below_{cfg.audio_min_snr_db:g}db")
    )
    return {"df": df, "pass": ok, "reason": reason}


def _normalize_exprs(env_df: DataFrame, cfg: EngineConfig):
    """Normalize-on-ingest pieces for _write_batch, or None when off or
    the envelope carries no (bytes, codec, sr_hz) post-image columns.

    Returns {"df": env + __audio_norm column, "apply": fn} — the column
    is stamped BEFORE the persist (one plan execution, like the verdict
    gate); "apply" rewrites value.after in place via withField for rows
    the kernel decoded, so emitted envelopes carry mono pcm_s16le at
    cfg.audio_normalize_sr while undecodable rows keep their original
    cells.  Quarantine output drops the column and dead-letters the
    ORIGINAL payload."""
    if not cfg.audio_normalize_sr:
        return None
    try:
        after = next(
            f for f in env_df.schema["value"].dataType.fields
            if f.name == "after"
        )
        names = {f.name for f in after.dataType.fields}
    except (KeyError, AttributeError, StopIteration):
        return None
    if not {"bytes", "codec", "sr_hz"} <= names:
        return None

    from scylla_cdc_source_connector_spark.audio_resample import (
        make_resample_udf,
    )

    rs = make_resample_udf(target_sr=cfg.audio_normalize_sr)
    df = env_df.withColumn(
        "__audio_norm",
        rs(
            F.col("value.after.bytes"),
            F.col("value.after.codec"),
            F.col("value.after.sr_hz"),
        ),
    )

    def apply(d: DataFrame) -> DataFrame:
        nm = F.col("__audio_norm")
        use = nm["ok"] & F.col("value.after.bytes").isNotNull()
        val = F.col("value")
        for fld in ("bytes", "codec", "sr_hz"):
            val = val.withField(
                f"after.{fld}",
                F.when(use, nm[fld]).otherwise(F.col(f"value.after.{fld}")),
            )
        return d.withColumn("value", val).drop("__audio_norm")

    return {"df": df, "apply": apply}


def expire_emitted(
    cfg: EngineConfig,
    *,
    keep_last: int,
    expire_quarantine: bool = False,
    keep_min_applied: bool = False,
) -> list[int]:
    """Emit-log retention — the Kafka broker's log-retention analog for
    the parquet record stream.  Deletes the OUTPUT payload dirs (and
    their `_records` wire-record siblings; `_quarantine` only when asked)
    of all committed batches except the newest `keep_last`, returning the
    expired batch ids.

    Lineage JSONs are never deleted: they are the offset/progress history
    (tiny), the resume path reads only the newest record, and
    `read_emitted`/`read_kafka_records` already skip ids whose dirs are
    gone — so expiry is invisible to every reader except that old rows
    stop being served, exactly like segment deletion on a Kafka topic.
    The newest batch is always kept (its pending-state dir may still be
    the next batch's carry-over input).

    Like Kafka retention vs consumer lag, expiry by default does NOT
    wait for downstream consumers (apply/corpus/records `_applied`
    markers) — those consumers detect the loss (apply.split_consumable
    warns and records {"expired": true}).  Pass keep_min_applied=True to
    refuse to expire any batch a REGISTERED consumer
    (apply.register_consumer — the apply/corpus/records maintainers
    register themselves) hasn't applied yet: the retention-honours-
    consumer-lag mode, guaranteeing no consumer ever loses a data-bearing
    batch."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the newest batch stays)")
    bids = committed_batch_ids(cfg)
    expired = []
    from scylla_cdc_source_connector_spark.operators.kafka_records import (
        records_path,
    )

    applied_by_all: set[int] | None = None
    if keep_min_applied:
        from scylla_cdc_source_connector_spark.streaming.apply import (
            applied_batch_ids,
            registered_consumers,
        )

        applied_by_all = set(bids)
        for _, target in sorted(registered_consumers(cfg).items()):
            applied_by_all &= set(applied_batch_ids(target))

    for bid in bids[:-keep_last] if len(bids) > keep_last else []:
        if applied_by_all is not None and bid not in applied_by_all:
            continue  # a lagging registered consumer still needs it
        doomed = [batch_output_path(cfg, bid), records_path(cfg, bid)]
        if expire_quarantine:
            doomed.append(quarantine_path(cfg, bid))
        for d in doomed:
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
        expired.append(bid)
    return expired


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


#: Writer properties for the production Iceberg emit path — the exact set
#: iceberg_emit applies (documented here because the sandbox carries no
#: Iceberg runtime jar; see engine.iceberg_available).
ICEBERG_SINK_OPTIONS = {
    # idempotent replay: stage the batch under a write-audit-publish id
    # derived from the micro-batch id; a replayed foreachBatch invocation
    # stages the SAME wap.id and the publish is a no-op (the Iceberg
    # analog of this sink's `batch_id` output dirs + lineage commit)
    "write.wap.id": None,  # filled with f"sccs-batch-{batch_id}"
    # cluster files per shard inside the commit, the parquet
    # repartition/sortWithinPartitions analog
    "write.distribution-mode": "hash",
    "sort-order": "cdc$stream_id, cdc$time_us, cdc$batch_seq_no",
}


def iceberg_emit(env_df: DataFrame, batch_id: int, cfg: EngineConfig, table: str):
    """Production emit seam: ONE atomic Iceberg append per micro-batch.

    Mapping from this sink's exactly-once mechanics to Iceberg:

    * `batch_output_path(batch_id)` dir    → one staged snapshot with
      `wap.id = sccs-batch-{batch_id}` (replay stages the same id; the
      publish step is idempotent, so a crash between write and publish
      re-runs harmlessly — same contract as the overwrite dirs here);
    * `_commit_lineage` JSON               → snapshot summary properties
      (the per-shard window stats ride `snapshot.summary.*` so consumers
      read progress from table metadata, not a side file);
    * `read_emitted` (committed ids only)  → plain reads of the table:
      Iceberg snapshots ARE the committed set, unpublished WAP snapshots
      are invisible.

    This container has no Iceberg runtime, so the seam raises the same
    documented blocker as the source seam rather than a classpath trace.
    """
    from scylla_cdc_source_connector_spark.streaming.engine import (
        iceberg_available,
    )

    if not iceberg_available(env_df.sparkSession):
        raise NotImplementedError(
            "Iceberg runtime not on the classpath in this container; "
            "production: add iceberg-spark-runtime and a catalog, then "
            "this seam writes env_df.writeTo(table).append() under "
            f"ICEBERG_SINK_OPTIONS with wap.id=sccs-batch-{batch_id}"
        )
    spark = env_df.sparkSession
    spark.conf.set("spark.wap.id", f"sccs-batch-{batch_id}")
    (
        env_df.repartition(F.col("`cdc$stream_id`"))
        .sortWithinPartitions("`cdc$time_us`", "`cdc$batch_seq_no`")
        .writeTo(table)
        .append()
    )
