"""The streaming CDC engine: source → watermark → stateful correlation →
envelope projection → exactly-once sink, sequenced per generation.

Lifecycle mirror of SURVEY §3.2:
  spark.readStream (changelog dir; Iceberg in production, parquet file
  source locally) → withWatermark(confidence window) → correlation state
  machine → envelope select → foreachBatch exactly-once sink (checkpointed).

Generation rollover (SURVEY §2.1 "Generation", ScyllaConnector.java:70-97 /
ScyllaMasterTransport.areTasksFullyConsumedUntil:50-70): the stream set is
fixed within a generation; generation N+1 may only start after every shard
of generation N is fully consumed.  Locally this is driver-side sequencing:
one availableNow run per generation, gated on the lineage high-water marks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig
from scylla_cdc_source_connector_spark.operators.projection import build_envelopes
from scylla_cdc_source_connector_spark.schemas import DEFAULT_TABLE, TableModel
from scylla_cdc_source_connector_spark.streaming.correlation_state import (
    correlate_stream,
    reassemble_correlated,
)
from scylla_cdc_source_connector_spark.streaming.sink import (
    make_correlating_sink,
    make_sink,
)


def generation_cfg(cfg: EngineConfig, generation: int) -> EngineConfig:
    """Per-generation sink namespaces: streaming batch_ids restart per
    query, so output/lineage dirs must not collide across generations."""
    import dataclasses

    return dataclasses.replace(
        cfg,
        output_dir=os.path.join(cfg.output_dir, f"gen-{generation}"),
        lineage_dir=os.path.join(cfg.lineage_dir, f"gen-{generation}"),
    )


def checkpoint_has_offsets(spark: SparkSession, checkpoint: str) -> bool:
    """True when the checkpoint already holds committed source offsets.

    Resolved through the Hadoop FileSystem of the checkpoint URI — not
    os.path — so HDFS/S3/abfs checkpoints (the production target) are
    detected too.  With a local-only check, every restart against a remote
    checkpoint looked like a fresh start and re-applied the initial
    lookback with a new wall-clock 'now', silently dropping replayed rows
    older than now - lookback (the reference applies lookback only when no
    stored offsets exist, ScyllaConnectorTask.java:197-210)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(checkpoint + "/offsets")
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return False
    # an offsets dir with no committed batch files is still a fresh start
    return len(fs.listStatus(path)) > 0


#: reader options for the production Iceberg changelog source — the exact
#: set run_stream applies with source_format="iceberg" (documented here as
#: the probe the sandbox cannot integration-test: no Iceberg runtime jar /
#: catalog is baked into this container, see iceberg_available()).
ICEBERG_STREAM_OPTIONS = {
    # never replay rows removed by snapshot expiry / compaction deletes
    "streaming-skip-delete-snapshots": "true",
    # compaction rewrites are not new data
    "streaming-skip-overwrite-snapshots": "true",
    # micro-batch admission (K1): files-per-trigger cap, like the parquet
    # file source's maxFilesPerTrigger
    "streaming-max-files-per-micro-batch": None,  # filled from the arg
    # S3 initial lookback: start from the snapshot at now - lookback
    "stream-from-timestamp": None,  # epoch ms, filled on fresh start
}


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg runtime is on the session's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


def read_changelog_stream(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_trigger: int | None = None,
    source_format: str = "parquet",
    from_timestamp_ms: int | None = None,
    table: TableModel = DEFAULT_TABLE,
) -> DataFrame:
    """S1 sharded windowed scan, Spark-native.

    source_format="parquet" (sandbox default): a parquet file-stream over
    a directory (each file ≙ one CDC time window of arrivals).

    source_format="iceberg" (production): `spark.readStream.format(
    "iceberg")` over the changelog table (`path` is then the catalog table
    name), with ICEBERG_STREAM_OPTIONS — skip-delete/overwrite snapshots,
    files-per-micro-batch admission, and stream-from-timestamp for the
    initial lookback.  Partition pruning on (bucket(clip_id, N),
    hours(cdc$time)) plays the role of the reference's `cdc$stream_id IN
    (...) AND cdc$time >= ... < ...` CQL pushdown (README.md:1357-1370).
    This container carries no Iceberg runtime jar, so the branch raises a
    clear error here and is exercised only up to option assembly in tests
    (tests/test_streaming.py::test_iceberg_source_seam)."""
    if source_format == "iceberg":
        if not iceberg_available(spark):
            raise NotImplementedError(
                "Iceberg runtime not on the classpath in this container; "
                "production: add iceberg-spark-runtime and a catalog, then "
                "this seam passes ICEBERG_STREAM_OPTIONS through unchanged"
            )
        reader = spark.readStream.format("iceberg")
        if max_files_per_trigger:
            reader = reader.option(
                "streaming-max-files-per-micro-batch", max_files_per_trigger
            )
        if from_timestamp_ms is not None:
            reader = reader.option("stream-from-timestamp", from_timestamp_ms)
        return (
            reader.option("streaming-skip-delete-snapshots", "true")
            .option("streaming-skip-overwrite-snapshots", "true")
            .load(path)
        )
    reader = spark.readStream.schema(table.changelog_schema())
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_envelopes(
    changelog: DataFrame, cfg: EngineConfig, impl: str = "apply"
) -> DataFrame:
    """Streaming plan: watermarked stateful correlation + projection.
    Dedup of exact duplicate log rows happens inside the correlation state
    (last-writer-wins slots) — the generation-aware stateful dedup join of
    the north_rule; images the config doesn't need are ignored by the
    state machine just like TaskInfo.Basic/Before/After no-op setters.

    impl="apply": applyInPandasWithState (correlation_state.py).
    impl="tws":   transformWithStateInPandas (correlation_tws.py) — same
    semantics on the Spark 4.x StatefulProcessor API (RocksDB-only state,
    explicit per-key event-time eviction timers)."""
    if impl == "tws":
        from scylla_cdc_source_connector_spark.streaming.correlation_tws import (
            correlate_stream_tws,
        )

        correlated = reassemble_correlated(correlate_stream_tws(changelog, cfg))
    else:
        correlated = reassemble_correlated(correlate_stream(changelog, cfg))
    return build_envelopes(correlated, cfg)


def run_stream(
    spark: SparkSession,
    cfg: EngineConfig,
    input_path: str,
    *,
    generation: int | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    mode: str = "vectorized",
    source_format: str = "parquet",
    state_store: str = "rocksdb",
    table: TableModel = DEFAULT_TABLE,
    adopt_schema: bool = False,
    dedup_within_watermark: bool = False,
):
    """Start one streaming query writing to the exactly-once sink.
    Returns the StreamingQuery (await it / stop it at the call site).

    adopt_schema=True: on (re)start, peek at the source directory's
    current parquet schema and ADOPT it (schema_evolution.adopt — the
    reference's ScyllaSchema.updateChangeSchema:467-472, latest observed
    schema wins, key structure must survive).  Files written before an
    ALTER TABLE ADD are read with nulls for the new columns by the
    parquet source itself; dropped columns vanish because the adopted
    schema no longer names them.  A restart from the same checkpoint
    resumes the file-source offsets with the new schema — the
    micro-batch analog of the per-row schema swap.

    mode="vectorized" (default): correlation runs as the codegen'd hash
    aggregation inside foreachBatch with an explicit pending-state table
    for cross-micro-batch waits (make_correlating_sink) — zero Python on
    the hot path, the 10^12-row configuration.
    mode="stateful": applyInPandasWithState correlation operator
    (streaming/correlation_state.py) — per-group Python; kept as the
    literal mapping of the reference's per-RowKey TaskInfo state machine.
    Its state store defaults to RocksDB (state_store="rocksdb"): at
    10^12 keys the HDFS-backed in-memory provider holds every key of a
    partition on-heap, while RocksDB spills to local SSD and checkpoints
    changelogs — pass "memory" to get the default provider back.
    mode="tws": the same state machine on Spark 4.x's
    transformWithStateInPandas (streaming/correlation_tws.py) — RocksDB
    state (required by the operator) + explicit per-key event-time
    eviction timers instead of GroupStateTimeout.
    """
    if mode not in ("vectorized", "stateful", "tws"):
        raise ValueError(f"unknown correlation mode: {mode!r}")
    if cfg.dedup_index or cfg.audio_normalize_sr:
        from scylla_cdc_source_connector_spark.config import IncludeMode

        if cfg.include_after is not IncludeMode.FULL:
            which = "dedup_index" if cfg.dedup_index else "audio_normalize_sr"
            raise ValueError(
                f"{which} needs include_after=FULL: the post-image "
                "payload must ride the envelope"
            )
    if adopt_schema:
        if source_format != "parquet":
            raise ValueError("adopt_schema requires the parquet source")
        from scylla_cdc_source_connector_spark.schema_evolution import adopt

        observed = (
            spark.read.option("mergeSchema", "true").parquet(input_path).schema
        )
        table = adopt(table, observed)
    if mode in ("stateful", "tws") and table is not DEFAULT_TABLE:
        raise ValueError(
            f"mode={mode!r} supports only the default table model; use "
            "the vectorized mode for generalized/adopted schemas"
        )
    if mode in ("stateful", "tws"):
        if mode == "tws":
            from scylla_cdc_source_connector_spark.streaming.correlation_tws import (
                tws_available,
            )

            if state_store != "rocksdb":
                raise ValueError(
                    "transformWithStateInPandas requires the RocksDB state "
                    "store"
                )
            if not tws_available():
                raise RuntimeError(
                    "mode='tws' needs the `protobuf` package (PySpark's "
                    "StatefulProcessor state-server protocol); it is not "
                    "installed in this runtime — use mode='stateful' or "
                    "'vectorized'"
                )
        provider = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
            if state_store == "rocksdb"
            else "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider"
        )
        # read once at query start and pinned into the checkpoint
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    changelog = read_changelog_stream(
        spark,
        input_path,
        max_files_per_trigger=max_files_per_trigger,
        source_format=source_format,
        table=table,
    )
    if generation is not None:
        changelog = changelog.filter(F.col("generation") == generation)
        checkpoint = os.path.join(cfg.checkpoint_dir, f"gen-{generation}")
        cfg = generation_cfg(cfg, generation)
    else:
        checkpoint = cfg.checkpoint_dir
    # refuse to resume a lineage namespace written by a different source
    # mode/location — the Iceberg-meta path numbers batches by snapshot
    # sequence (1-based), this path by checkpoint batch id (0-based)
    from scylla_cdc_source_connector_spark.streaming.sink import stamp_source

    stamp_source(
        cfg, f"file_stream:{source_format}:{os.path.abspath(input_path)}"
    )

    # S3 initial lookback (ScyllaConnectorConfig.java:199-213, applied
    # ScyllaConnectorTask.java:197-210): on FIRST start — no offsets/
    # checkpoint yet — begin at now - lookback instead of stream start.
    # Resumed starts keep the checkpoint's file-source offsets, so the
    # filter is attached only on the fresh-start path like the reference
    # (detected via the checkpoint URI's own FileSystem, not os.path).
    if cfg.initial_lookback_ms > 0 and not checkpoint_has_offsets(
        spark, checkpoint
    ):
        import time as _time

        floor_us = int(_time.time() * 1_000_000) - cfg.initial_lookback_ms * 1000
        changelog = changelog.filter(F.col("`cdc$time_us`") >= floor_us)

    # north_rule's literal stateful dedup join: exact replays of a
    # changelog row (same key + stream timestamp + op + batch seq —
    # e.g. an at-least-once upstream writer re-appending a window) are
    # dropped by Spark's dropDuplicatesWithinWatermark BEFORE correlation,
    # with state bounded by the confidence-window watermark.  The
    # correlation aggregation is last-writer-wins per slot, so this is a
    # correctness no-op — it exists to shed replayed bytes before they
    # ride the correlation shuffle (at 10^12 rows a 1% replay rate is
    # 10^10 rows of shuffle traffic saved).
    if dedup_within_watermark:
        changelog = changelog.withWatermark(
            "`cdc$time`", f"{cfg.confidence_window_ms} milliseconds"
        ).dropDuplicatesWithinWatermark(
            [
                *table.pk_columns,
                "cdc$time_us",
                "cdc$operation",
                "cdc$batch_seq_no",
            ]
        )
    if mode == "vectorized":
        out, sink_fn = changelog, make_correlating_sink(cfg, table=table)
    else:
        impl = "tws" if mode == "tws" else "apply"
        out, sink_fn = streaming_envelopes(changelog, cfg, impl=impl), make_sink(cfg)
    writer = (
        out.writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        # cfg.table disambiguates concurrent per-table queries of one
        # multi-table connector run (streaming/connector.py)
        .queryName(f"{cfg.connector_name}-{cfg.table}-gen{generation}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{cfg.query_window_ms} milliseconds")
    return writer.start()


def run_generations(
    spark: SparkSession,
    cfg: EngineConfig,
    input_path: str,
    generations: list[int],
    *,
    timeout_s: float = 600.0,
) -> list[int]:
    """Drain generations strictly in order (the generation gate).

    Each generation runs as an availableNow query to completion before the
    next starts — generation N+1's rows are never emitted before N is fully
    consumed, mirroring areTasksFullyConsumedUntil
    (ScyllaMasterTransport.java:50-70).  Returns emitted-count per
    generation."""
    from scylla_cdc_source_connector_spark.streaming.sink import read_lineage

    emitted = []
    for gen in sorted(generations):
        q = run_stream(spark, cfg, input_path, generation=gen, available_now=True)
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"generation {gen} did not drain in {timeout_s}s")
        n = sum(
            s["n_records"]
            for rec in read_lineage(generation_cfg(cfg, gen))
            for s in rec["shards"]
            if s["generation"] == gen
        )
        emitted.append(n)
    return emitted


def run_iceberg_meta_stream(
    spark: SparkSession,
    cfg: EngineConfig,
    table_location: str,
    *,
    table: TableModel = DEFAULT_TABLE,
    from_timestamp_ms: int | None = None,
    adopt_schema: bool = False,
    partition_ranges: dict[str, tuple] | None = None,
) -> dict:
    """Drain an Iceberg changelog table WITHOUT the runtime jar.

    `sources/iceberg_meta.py` resolves the table's metadata in pure Python
    (version-hint -> vN.metadata.json -> manifest list -> manifests) and
    this loop turns each unconsumed snapshot — in sequence-number order —
    into ONE ordered micro-batch through the SAME exactly-once foreachBatch
    sink the file-stream path uses (vectorized mode; snapshot == the
    reference's CDC query window, ScyllaStreamingChangeEventSource.java:
    53-103, with the snapshot sequence number playing the window offset).

    Exactly-once/resume: batch_id = the snapshot's sequence number, and the
    sink's lineage record is the commit marker (the sink is an idempotent
    no-op for an already-committed batch_id), so a crash anywhere leaves a
    consistent prefix and a rerun drains only the remainder — no extra
    ledger needed.  `from_timestamp_ms` is the initial-lookback analog (S3)
    applied to snapshot commit times on a fresh start; on resume the
    lineage, not the wall clock, decides (same rule as
    checkpoint_has_offsets on the file path).

    `partition_ranges` scopes the drain to a partition subset — the
    jarless analog of the reference's per-task `cdc$stream_id IN (...)`
    CQL scoping (ConfigSerializerUtil.java:39-52): manifests outside the
    ranges are skipped UNOPENED via the manifest-list field summaries and
    surviving entries are filtered on their partition tuples
    (iceberg_meta.added_files).  NOTE: a scoped drain and a full drain
    are different streams — the partition scope is part of the lineage
    identity, so one EngineConfig cannot alternate between scopes.

    Returns {"consumed": [snapshot ids run this call],
             "skipped": [snapshot ids already committed],
             "emitted_total": rows in the exactly-once view afterwards,
             "manifests_skipped": pruned-unopened manifest count,
             "files_skipped": entry-level pruned file count}.
    """
    from scylla_cdc_source_connector_spark.sources import iceberg_meta
    from scylla_cdc_source_connector_spark.streaming.sink import (
        committed_batch_ids,
        read_emitted,
        stamp_source,
    )

    scope = ""
    if partition_ranges:
        scope = ":" + ",".join(
            f"{k}=[{lo},{hi}]" for k, (lo, hi) in sorted(partition_ranges.items())
        )
    stamp_source(
        cfg, f"iceberg_meta:{os.path.abspath(table_location)}{scope}"
    )

    if adopt_schema:
        # ALTER TABLE dynamism without the jar: adopt the table's CURRENT
        # Iceberg schema (latest observed wins at (re)start, the same rule
        # the parquet path applies — ScyllaSchema.updateChangeSchema
        # analog); files from pre-evolution snapshots read with nulls for
        # the added columns via the explicit read schema
        from scylla_cdc_source_connector_spark.schema_evolution import adopt

        table = adopt(table, iceberg_meta.current_spark_schema(table_location))

    sink_fn = make_correlating_sink(cfg, table=table)
    committed = set(committed_batch_ids(cfg))
    lookback = from_timestamp_ms if not committed else None
    consumed, skipped = [], []
    manifests_skipped = files_skipped = 0
    for b in iceberg_meta.added_files(
        table_location,
        from_timestamp_ms=lookback,
        partition_ranges=partition_ranges,
    ):
        bid = b["sequence_number"]
        if bid in committed:
            skipped.append(b["snapshot_id"])
            continue
        manifests_skipped += b["manifests_skipped"]
        files_skipped += b["files_skipped"]
        if b["files"]:
            df = spark.read.schema(table.changelog_schema()).parquet(*b["files"])
        else:
            # empty snapshot = the heartbeat case: run the sink anyway so
            # lineage/offsets advance exactly like an empty CDC window (K4)
            df = spark.createDataFrame([], table.changelog_schema())
        sink_fn(df, bid)
        consumed.append(b["snapshot_id"])
    return {
        "consumed": consumed,
        "skipped": skipped,
        "emitted_total": read_emitted(spark, cfg).count(),
        "manifests_skipped": manifests_skipped,
        "files_skipped": files_skipped,
    }
