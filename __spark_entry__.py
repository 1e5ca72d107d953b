"""Driver contract for the spark-graft builder (PySpark target).

queries() exposes the engine's operators (SURVEY.md §2 + north_rule
streaming ops + training-data pipeline ops) over the driver's testdata
tables; oracle_sql() gives the DuckDB-equivalent for each (omitted only for
genuinely non-SQL-expressible stateful/LSH ops → rows-only check).

CDC operators run over a changelog PROXY derived deterministically from the
`events` table (clip_id from user_id, op from event_type) so the DuckDB
oracle can reproduce the same derivation; the REAL audio changelog pipeline
(images, correlation, exactly-once) is exercised by cdc_full_pipeline_*
(rows-only here) and extensively by tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# the driver loads this module by FILE PATH, so package imports inside the
# query functions depend on the repo root being importable; self-insert it
# so the contract works from any harness cwd
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# -- shared derivation: events → CDC changelog proxy ------------------------
#   clip_id = printf('clip-%012d', user_id)
#   op      = signup/click → c (insert), view/purchase → u, error → d
#   shard   = printf('s%04d', user_id % 8)
_OP_SQL = (
    "CASE WHEN event_type IN ('signup','click') THEN 'c' "
    "WHEN event_type IN ('view','purchase') THEN 'u' ELSE 'd' END"
)

_STOPWORDS_SQL = "('the','and','of','is','le','la','et','les','el','los','que','y','der','die','und','das')"


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _cached_changelog_path(spec) -> str:
    """Cached synthetic-changelog parquet for a FixtureSpec, keyed by the
    spec's CONTENT hash (+ generator version) — never just its sizes, so
    a fixture change can never silently feed stale payloads into checked
    queries (the commit-7bac807 bug class, structurally prevented)."""
    import os
    import tempfile

    from scylla_cdc_source_connector_spark.fixtures import (
        make_changelog,
        write_changelog_chunk,
    )

    path = os.path.join(
        tempfile.gettempdir(),
        f"sccs_changelog_{spec.n_events}_{spec.n_clips}_"
        f"{spec.content_hash()}.parquet",
    )
    if not os.path.exists(path):
        write_changelog_chunk(make_changelog(spec), path)
    return path


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events_iceberg(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic 4-snapshot jarless Iceberg table derived from the
    sf_dir `events` table (cached per sf row count), giving the round-5
    read surfaces ORACLE-CHECKABLE driver rows:

      snap 1  append   rows with event_id % 3 == 0   (ts 1000)
      snap 2  append   rows with event_id % 3 == 1   (ts 2000)
      snap 3  delete   position-delete event_id % 10 == 3   (ts 3000)
      snap 4  append   rows with event_id % 3 == 2   (ts 4000)

    Snapshot ids are deterministic (= sequence number, iceberg_meta
    _commit_snapshot), so plain SQL over `events` reproduces every read:
    time travel to snap 2 = %3 IN (0,1) with deleted rows resurrected;
    the current MoR read = all rows minus (%10==3 AND %3 IN (0,1)) —
    snap 4's rows post-date the delete and its position deletes can
    never name them; read_changes(after=1) = %3 IN (1,2) stamped with
    commit provenance (2,2,2000)/(4,4,4000)."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from scylla_cdc_source_connector_spark.sources import iceberg_meta

    src = f"{sf_dir}/events.parquet"
    tbl = pq.read_table(src)
    loc = os.path.join(
        tempfile.gettempdir(),
        f"sccs_events_iceberg_v1_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{tbl.num_rows}",
    )
    done = os.path.join(loc, "_BUILT")
    if os.path.exists(done):
        return loc
    shutil.rmtree(loc, ignore_errors=True)  # partial build from a crash
    iceberg_meta.create_table(loc, spark.read.parquet(src).schema)
    ev = tbl.column("event_id").to_numpy()
    chunks = {}
    for k in (0, 1, 2):
        p = os.path.join(loc, "data", f"bucket{k}.parquet")
        # .take preserves the source parquet schema exactly (no pandas
        # round-trip that could retype the timestamp column)
        pq.write_table(tbl.take(np.nonzero(ev % 3 == k)[0]), p)
        chunks[k] = p
    iceberg_meta.append_files(loc, [chunks[0]], timestamp_ms=1000)
    iceberg_meta.append_files(loc, [chunks[1]], timestamp_ms=2000)
    iceberg_meta.delete_where(
        spark, loc, "event_id % 10 = 3", timestamp_ms=3000
    )
    iceberg_meta.append_files(loc, [chunks[2]], timestamp_ms=4000)
    with open(done, "w") as fh:
        fh.write("ok")
    return loc


def _proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    # parquet naive timestamps read as TIMESTAMP_NTZ in Spark 4; with the
    # session TZ pinned to UTC this cast matches DuckDB's naive epoch_ms
    ev = _events(spark, sf_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    op = (
        F.when(F.col("event_type").isin("signup", "click"), F.lit("c"))
        .when(F.col("event_type").isin("view", "purchase"), F.lit("u"))
        .otherwise(F.lit("d"))
    )
    return ev.select(
        F.format_string("clip-%012d", F.col("user_id")).alias("clip_id"),
        F.col("ts"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        op.alias("op"),
        F.format_string("s%04d", F.pmod(F.col("user_id"), F.lit(8))).alias("shard_id"),
        F.col("value"),
        F.col("event_id"),
        F.col("user_id"),
    )


# ---------------------------------------------------------------------------
# CDC operator queries (proxy-backed, oracle-checked)
# ---------------------------------------------------------------------------
def q_cdc_change_typing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 operation classification (ScyllaChangeRecordEmitter.java:94-110)."""
    return _proxy(spark, sf_dir).groupBy("op").agg(F.count("*").alias("n"))


def q_cdc_envelope_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7/P11 flat envelope projection: topic routing + source ts."""
    return _proxy(spark, sf_dir).select(
        F.lit("cdc.audio.clips").alias("topic"),
        "clip_id",
        "op",
        F.col("ts_ms").alias("source_ts_ms"),
    )


def q_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized current-state view: last change per key (the dedup/
    latest semantics downstream consumers build from the CDC stream)."""
    p = _proxy(spark, sf_dir)
    w = Window.partitionBy("clip_id").orderBy(
        F.desc("ts_ms"), F.desc("event_id")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("clip_id", F.col("op").alias("last_op"), F.col("ts_ms").alias("last_ts_ms"))
    )


def q_cdc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate drop on (clip_id, ts, op) — batch analog of
    dropDuplicatesWithinWatermark."""
    return (
        _proxy(spark, sf_dir)
        .select("clip_id", "ts_ms", "op")
        .dropDuplicates(["clip_id", "ts_ms", "op"])
    )


def q_cdc_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute aggregate over change events (north_rule op)."""
    from scylla_cdc_source_connector_spark.operators.windows import tumbling_agg

    p = _proxy(spark, sf_dir)
    out = tumbling_agg(
        p,
        "ts",
        "5 minutes",
        ["op"],
        [
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        ],
    )
    return out.select(
        F.unix_millis("window_start").alias("window_start_ms"),
        "op",
        "n_events",
        "sum_value",
    )


def q_cdc_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 10-minute window, 5-minute slide."""
    from scylla_cdc_source_connector_spark.operators.windows import sliding_agg

    p = _proxy(spark, sf_dir)
    out = sliding_agg(
        p, "ts", "10 minutes", "5 minutes", [], [F.count("*").alias("n_events")]
    )
    return out.select(
        F.unix_millis("window_start").alias("window_start_ms"), "n_events"
    )


def q_cdc_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per key, 30-minute inactivity gap."""
    from scylla_cdc_source_connector_spark.operators.windows import session_agg

    p = _proxy(spark, sf_dir)
    out = session_agg(
        p, "ts", "30 minutes", ["clip_id"], [F.count("*").alias("n_events")]
    )
    return out.select(
        "clip_id",
        F.unix_millis("session_start").alias("session_start_ms"),
        F.unix_millis("session_end").alias("session_end_ms"),
        "n_events",
    )


def q_cdc_shard_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 per-shard offset/high-water tracking (SourceInfo.offset analog)."""
    return (
        _proxy(spark, sf_dir)
        .groupBy("shard_id")
        .agg(
            F.min("ts_ms").alias("window_start_ms"),
            F.max("ts_ms").alias("window_end_ms"),
            F.count("*").alias("n_records"),
        )
    )


def q_cdc_hot_keys_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-phase aggregation — hottest 10 keys."""
    from scylla_cdc_source_connector_spark.operators.skew import salted_agg

    p = _proxy(spark, sf_dir).withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    agg = salted_agg(
        p,
        ["clip_id"],
        {"n_events": ("count", ""), "sum_value": ("sum", "value_dec")},
        n_salt=8,
    ).withColumn("sum_value", F.col("sum_value").cast("double"))
    return agg.orderBy(F.desc("n_events"), F.asc("clip_id")).limit(10)


def q_cdc_confidence_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 confidence window, batch analog: hold back events fresher than
    max(ts) - 30 s."""
    p = _proxy(spark, sf_dir)
    mx = p.agg(F.max("ts_ms").alias("max_ts_ms"))
    kept = p.join(F.broadcast(mx)).filter(
        F.col("ts_ms") <= F.col("max_ts_ms") - 30_000
    )
    return kept.groupBy("op").agg(F.count("*").alias("n_kept"))


def q_cdc_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL engine end-to-end (rows-only check): synthetic audio changelog
    resolved as an Iceberg table WITHOUT the runtime jar (jarless v2
    metadata, sources/iceberg_meta.py) → correlation → completion →
    envelopes (include before/after = full).  Scale of the fixture tracks
    sf via the events row count."""
    import os

    from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
    from scylla_cdc_source_connector_spark.fixtures import FixtureSpec
    from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes
    from scylla_cdc_source_connector_spark.schemas import DEFAULT_TABLE
    from scylla_cdc_source_connector_spark.sources import iceberg_meta

    _utc(spark)
    n_events = _events(spark, sf_dir).count()
    spec = FixtureSpec(
        n_events=min(n_events, 20_000), n_clips=max(50, n_events // 10)
    )
    path = _cached_changelog_path(spec)
    # the changelog chunk committed as one snapshot of a jarless Iceberg
    # table (cache co-located with the spec-hashed fixture, so staleness
    # is impossible by the same key); the scan reads the metadata-resolved
    # ADDED files, exercising the production source shape in this row
    loc = path[: -len(".parquet")] + ".iceberg"
    if not os.path.exists(os.path.join(loc, "metadata", "version-hint.text")):
        iceberg_meta.create_table(loc, DEFAULT_TABLE.changelog_schema())
        iceberg_meta.append_files(loc, [path], timestamp_ms=1)
    files = [f for b in iceberg_meta.added_files(loc) for f in b["files"]]
    df = spark.read.parquet(*files)
    cfg = EngineConfig(
        include_before=IncludeMode.FULL, include_after=IncludeMode.FULL
    )
    env = cdc_envelopes(df, cfg, processing_ts_ms=F.lit(0))
    return env.select(
        "clip_id",
        F.col("`cdc$time_us`").alias("cdc_time_us"),
        F.col("value.op").alias("op"),
        F.col("value.before.transcript").alias("before_transcript"),
        F.col("value.after.transcript").alias("after_transcript"),
        F.col("value.after.sr_hz").alias("after_sr_hz"),
    )


def q_iceberg_latest_state_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 surface (rows-only): the COMPACTED latest-state Iceberg
    mirror end-to-end, jarless — changelog table (2 snapshots) →
    snapshot-incremental exactly-once drain → maintain_latest_state_mirror
    (UPDATE/DELETE as position-delete row-level ops, one overwrite
    snapshot per pass) → read_table (merge-on-read).  The second
    maintenance pass supersedes first-pass images, so the result carries
    real position deletes — which the round-5 maintenance pair then
    folds away (compact_table replace snapshot) and reclaims
    (expire_snapshots keep_last=1) with the read-back unchanged.
    Row-for-row parity with apply.materialize_latest is pinned by
    tests/test_iceberg_meta.py::test_latest_state_mirror; this row
    checks the full loop holds at the sf-scaled fixture."""
    import os

    import pyarrow.parquet as pq

    from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
    from scylla_cdc_source_connector_spark.fixtures import FixtureSpec
    from scylla_cdc_source_connector_spark.schemas import DEFAULT_TABLE
    from scylla_cdc_source_connector_spark.sources import iceberg_meta
    from scylla_cdc_source_connector_spark.streaming.engine import (
        run_iceberg_meta_stream,
    )

    _utc(spark)
    n_events = _events(spark, sf_dir).count()
    spec = FixtureSpec(
        n_events=min(n_events, 20_000), n_clips=max(50, n_events // 10)
    )
    path = _cached_changelog_path(spec)
    root = path[: -len(".parquet")] + ".lsmirror"
    loc, mir = os.path.join(root, "table"), os.path.join(root, "mirror")
    cfg = EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        checkpoint_dir=os.path.join(root, "ckpt"),
        output_dir=os.path.join(root, "out"),
        lineage_dir=os.path.join(root, "lineage"),
    )
    if not os.path.exists(os.path.join(loc, "metadata", "version-hint.text")):
        os.makedirs(os.path.join(loc, "data"), exist_ok=True)
        tbl = pq.read_table(path)
        half = tbl.num_rows // 2
        pq.write_table(tbl.slice(0, half), os.path.join(loc, "data", "c0.parquet"))
        pq.write_table(tbl.slice(half), os.path.join(loc, "data", "c1.parquet"))
        iceberg_meta.create_table(loc, DEFAULT_TABLE.changelog_schema())
    snaps = len(iceberg_meta.snapshots(loc))
    if snaps == 0:
        iceberg_meta.append_files(
            loc, [os.path.join(loc, "data", "c0.parquet")], timestamp_ms=1
        )
    # pass 1: first snapshot only -> pure-append mirror pass
    run_iceberg_meta_stream(spark, cfg, loc)
    c1 = iceberg_meta.maintain_latest_state_mirror(spark, cfg, mir)
    s1 = iceberg_meta.current_metadata(mir)["current-snapshot-id"]
    # pass 2: second snapshot arrives -> overwrite pass (position deletes)
    if len(iceberg_meta.snapshots(loc)) == 1:
        iceberg_meta.append_files(
            loc, [os.path.join(loc, "data", "c1.parquet")], timestamp_ms=2
        )
    run_iceberg_meta_stream(spark, cfg, loc)
    c2 = iceberg_meta.maintain_latest_state_mirror(spark, cfg, mir)
    if c1 == 1 and c2 == 1:
        # round-5 changelog leg (fresh runs — cached reruns have expired
        # history): the mirror serves row-level changes BACK to
        # downstream consumers; applying its own changelog over pass-1
        # state must reproduce pass-2 state exactly (CDC in == CDC out)
        cl = iceberg_meta.read_changelog(
            spark, mir, after_snapshot_id=s1, identifier_columns=["clip_id"]
        ).select("clip_id", "__ts_us", "_change_type")
        agg = {
            r["_change_type"]: r["n"]
            for r in cl.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
        }
        if agg.get("UPDATE_BEFORE", 0) != agg.get("UPDATE_AFTER", 0):
            raise AssertionError(f"unpaired mirror changelog updates: {agg}")
        key = lambda df: {  # noqa: E731
            (r["clip_id"], r["__ts_us"])
            for r in df.select("clip_id", "__ts_us").collect()
        }
        base = key(iceberg_meta.read_table(spark, mir, snapshot_id=s1))
        now = key(iceberg_meta.read_table(spark, mir))
        rows = cl.collect()
        removed = {
            (r["clip_id"], r["__ts_us"])
            for r in rows
            if r["_change_type"] in ("DELETE", "UPDATE_BEFORE")
        }
        added = {
            (r["clip_id"], r["__ts_us"])
            for r in rows
            if r["_change_type"] in ("INSERT", "UPDATE_AFTER")
        }
        if (base - removed) | added != now:
            raise AssertionError("mirror changelog does not replay to current state")
    # round-5 maintenance pair: fold the overwrite pass's delete files
    # into the data (replace snapshot) and reclaim everything only the
    # expired snapshots referenced — the result must be unchanged
    iceberg_meta.compact_table(spark, mir)
    iceberg_meta.expire_snapshots(mir, keep_last=1)
    # round-5 bootstrap leg: a FRESH consumer backfills op='r' envelopes
    # from this mirror and hands off to the changelog stream at the
    # mirror's applied hwm (run_initial_snapshot_then_stream) — every
    # live mirror row must arrive exactly once
    from scylla_cdc_source_connector_spark.streaming import sink as sink_mod
    from scylla_cdc_source_connector_spark.streaming.engine import (
        run_initial_snapshot_then_stream,
    )

    cfg_boot = EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        checkpoint_dir=os.path.join(root, "boot", "ckpt"),
        output_dir=os.path.join(root, "boot", "out"),
        lineage_dir=os.path.join(root, "boot", "lineage"),
    )
    run_initial_snapshot_then_stream(spark, cfg_boot, mir, loc, n_chunks=4)
    state = iceberg_meta.read_table(spark, mir)
    r_rows = (
        sink_mod.read_emitted(spark, cfg_boot).where("value.op = 'r'").count()
    )
    if r_rows != state.count():
        raise AssertionError(
            f"bootstrap backfill emitted {r_rows} 'r' rows for "
            f"{state.count()} live mirror rows"
        )
    return state.select(
        "clip_id",
        F.col("__ts_us").alias("last_ts_us"),
        "transcript",
        "sr_hz",
    )


def q_iceberg_mor_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two point-in-time reads of the _events_iceberg table in one
    oracle row (union-tagged by read_kind; the driver caps queries() at
    50, so closely-paired surfaces share an entry):
    - 'asof2' — time travel (VERSION AS OF snapshot 2): the two appended
      buckets with the rows snapshot 3 later position-deleted
      RESURRECTED (data, delete files and schema resolve from THAT
      snapshot's manifest list);
    - 'current' — the merge-on-read current view: the position-delete
      snapshot (event_id%10==3) suppresses exactly the rows live when it
      committed — bucket-2 rows appended AFTER it are untouched even
      where they match the predicate, because position deletes name
      (file, pos) targets, not predicates."""
    from scylla_cdc_source_connector_spark.sources import iceberg_meta

    _utc(spark)
    loc = _events_iceberg(spark, sf_dir)
    cols = [
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        "value",
    ]
    asof = iceberg_meta.read_table(spark, loc, snapshot_id=2).select(
        F.lit("asof2").alias("read_kind"), *cols
    )
    cur = iceberg_meta.read_table(spark, loc).select(
        F.lit("current").alias("read_kind"), *cols
    )
    return asof.unionAll(cur)


def q_iceberg_read_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both incremental read shapes in one oracle row (union-tagged by
    read_kind; the driver caps queries() at 50):
    - 'appended' — read_changes(after=1), the start-snapshot-id analog:
      rows APPENDED after snapshot 1 with commit provenance; the delete
      snapshot (3) contributes nothing (row-level deletes are not new
      data, the streaming-path skip rule);
    - 'changelog' — read_changelog() over the full history, the
      create_changelog_view analog: every LOGICAL change — snap 1/2/4's
      rows as INSERTs at ordinals 0/1/3, and snap 3's position-deleted
      rows (event_id%10==3 within the first two buckets) re-surfaced as
      DELETE rows with their full content at ordinal 2.  Both legs are
      reproduced by plain SQL over `events` because the fixture's
      snapshot ids/ordinals are deterministic."""
    from scylla_cdc_source_connector_spark.sources import iceberg_meta

    _utc(spark)
    loc = _events_iceberg(spark, sf_dir)
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms")
    ap = iceberg_meta.read_changes(spark, loc, after_snapshot_id=1).select(
        F.lit("appended").alias("read_kind"),
        "event_id",
        "user_id",
        ts_ms,
        "value",
        F.lit("APPEND").alias("change_type"),
        F.lit(None).cast("int").alias("change_ordinal"),
        F.col("_snapshot_id").alias("commit_snapshot_id"),
        F.col("_sequence_number").alias("commit_sequence_number"),
        F.col("_commit_timestamp_ms").alias("commit_timestamp_ms"),
    )
    cl = iceberg_meta.read_changelog(spark, loc).select(
        F.lit("changelog").alias("read_kind"),
        "event_id",
        "user_id",
        ts_ms,
        "value",
        F.col("_change_type").alias("change_type"),
        F.col("_change_ordinal").alias("change_ordinal"),
        F.col("_commit_snapshot_id").alias("commit_snapshot_id"),
        F.col("_sequence_number").alias("commit_sequence_number"),
        F.col("_commit_timestamp_ms").alias("commit_timestamp_ms"),
    )
    return ap.unionAll(cl)


def _events_iceberg_bucketed(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic bucket[8](user_id) jarless Iceberg table derived
    from the sf_dir `events` table (cached per sf row count): one
    bucket-pure file per non-empty bucket, one append snapshot.  The
    hot-key scatter layout the north rule needs at 10^12-clip scale —
    a point lookup maps to ONE bucket and opens ~1/8 of the files."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from scylla_cdc_source_connector_spark.sources import iceberg_meta

    src = f"{sf_dir}/events.parquet"
    tbl = pq.read_table(src)
    loc = os.path.join(
        tempfile.gettempdir(),
        f"sccs_events_iceberg_bucketed_v1_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{tbl.num_rows}",
    )
    done = os.path.join(loc, "_BUILT")
    if os.path.exists(done):
        return loc
    shutil.rmtree(loc, ignore_errors=True)
    iceberg_meta.create_table(
        loc,
        spark.read.parquet(src).schema,
        partition_by=[("user_id", "bucket[8]")],
    )
    buckets = iceberg_meta.bucket_values(
        tbl.column("user_id").to_numpy(), "long", 8
    )
    import numpy as np

    files = []
    for b in sorted(set(buckets.tolist())):
        p = os.path.join(loc, "data", f"b{b}.parquet")
        pq.write_table(tbl.take(np.nonzero(buckets == b)[0]), p)
        files.append(p)
    iceberg_meta.append_files(loc, files, timestamp_ms=1000)
    with open(done, "w") as fh:
        fh.write("ok")
    return loc


def q_iceberg_pruned_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both metadata-pruned read shapes in one oracle row (union-tagged
    by read_kind; the driver caps queries() at 50):
    - 'bucket' — point lookup on a bucket[8](user_id)-partitioned table:
      partition_filter_for computes the spec Appendix B murmur3 bucket
      of the literal, so the scan opens only the key's bucket (jar
      analog: storage-partitioned filter pushdown);
    - 'clustered' — range scan over a sort-clustered table: the sorted
      rewrite's disjoint per-file bounds let column_ranges skip files.
    Both hard-assert the pruning actually happened (strictly fewer files
    opened than the table holds); the oracle proves pruning never
    changes answers."""
    from scylla_cdc_source_connector_spark.sources import iceberg_meta

    _utc(spark)
    cols = lambda: [  # noqa: E731
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        "value",
    ]

    bloc = _events_iceberg_bucketed(spark, sf_dir)
    ranges = iceberg_meta.partition_filter_for(bloc, {"user_id": 7})
    plan = iceberg_meta.scan_files(bloc, partition_ranges=ranges)
    full = iceberg_meta.scan_files(bloc)
    if not plan["files"] or len(plan["files"]) >= len(full["files"]):
        raise AssertionError(
            f"bucket pruning ineffective: {len(plan['files'])} of "
            f"{len(full['files'])} files opened"
        )
    bucket = (
        iceberg_meta.read_table(spark, bloc, partition_ranges=ranges)
        .where(F.col("user_id") == 7)
        .select(F.lit("bucket").alias("read_kind"), *cols())
    )

    cloc = _events_iceberg_clustered(spark, sf_dir)
    lo, hi = 1000, 1400
    cplan = iceberg_meta.scan_files(cloc, column_ranges={"event_id": (lo, hi)})
    if cplan["files_total"] > 1 and not cplan["files_skipped_stats"]:
        raise AssertionError(
            f"clustered scan skipped nothing: {cplan['files_total']} files"
        )
    clustered = (
        iceberg_meta.read_table(
            spark, cloc, column_ranges={"event_id": (lo, hi)}
        )
        .where(F.col("event_id").between(lo, hi))
        .select(F.lit("clustered").alias("read_kind"), *cols())
    )
    return bucket.unionAll(clustered)


def _events_iceberg_clustered(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic SORT-CLUSTERED jarless Iceberg table from `events`
    (cached per sf row count): three shuffled appends (every file spans
    the whole event_id range — bounds skipping useless), then
    compact_table(sort_by=["event_id"]) so the rewrite carries disjoint
    per-file event_id bounds and a narrow scan opens O(1) files."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from scylla_cdc_source_connector_spark.sources import iceberg_meta

    src = f"{sf_dir}/events.parquet"
    tbl = pq.read_table(src)
    loc = os.path.join(
        tempfile.gettempdir(),
        f"sccs_events_iceberg_clustered_v1_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{tbl.num_rows}",
    )
    done = os.path.join(loc, "_BUILT")
    if os.path.exists(done):
        return loc
    shutil.rmtree(loc, ignore_errors=True)
    iceberg_meta.create_table(loc, spark.read.parquet(src).schema)
    ev = tbl.column("event_id").to_numpy()
    for k in (0, 1, 2):  # striped: every file spans the full id range
        p = os.path.join(loc, "data", f"stripe{k}.parquet")
        pq.write_table(tbl.take(np.nonzero(ev % 3 == k)[0]), p)
        iceberg_meta.append_files(loc, [p], timestamp_ms=(k + 1) * 1000)
    iceberg_meta.compact_table(
        spark,
        loc,
        sort_by=["event_id"],
        target_file_mb=0.5,
        timestamp_ms=5000,
    )
    with open(done, "w") as fh:
        fh.write("ok")
    return loc


def q_cdc_audio_quality_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-shaped quality telemetry (rows-only): per (shard,
    1-minute tumbling window) aggregates of the vectorized audio verdict
    over post-images — validated count, share passing the SNR floor, mean
    rms.  The same plan a monitoring sink would attach to the change
    stream; decode is not SQL-expressible, stats pinned by
    tests/test_audio.py."""
    import os
    import tempfile

    from scylla_cdc_source_connector_spark import audio
    from scylla_cdc_source_connector_spark.fixtures import (
        FixtureSpec,
        make_changelog,
        write_changelog_chunk,
    )
    from scylla_cdc_source_connector_spark.operators.windows import tumbling_agg

    _utc(spark)
    n_events = _events(spark, sf_dir).count()
    spec = FixtureSpec(
        n_events=min(n_events, 20_000), n_clips=max(50, n_events // 10)
    )
    path = _cached_changelog_path(spec)
    df = spark.read.parquet(path)
    post = df.where("`cdc$operation` = 9").select(
        "clip_id", "`cdc$stream_id`", "`cdc$time`", "bytes", "codec"
    )
    stats = post.withColumn(
        "v",
        audio.make_audio_verdict_udf()(F.col("bytes"), F.col("codec")),
    ).select(
        "`cdc$stream_id`",
        "`cdc$time`",
        F.col("v.decode_ok").alias("decode_ok"),
        F.col("v.roundtrip_snr_db").alias("snr_db"),
    )
    out = tumbling_agg(
        stats,
        "cdc$time",
        "1 minute",
        ["cdc$stream_id"],
        [
            F.count("*").alias("n_clips"),
            F.sum(F.col("decode_ok").cast("long")).alias("n_decoded"),
            F.sum(
                (F.col("decode_ok") & (F.col("snr_db") >= 30.0))
                .cast("long")
            ).alias("n_snr_ok"),
        ],
    )
    return out.select(
        # window_start is TIMESTAMP_NTZ here (fixture cdc$time); route
        # through TIMESTAMP (session tz pinned to UTC) for the epoch
        F.unix_millis(F.col("window_start").cast("timestamp")).alias(
            "window_start_ms"
        ),
        F.col("`cdc$stream_id`").alias("shard_id"),
        "n_clips",
        "n_decoded",
        "n_snr_ok",
    ).orderBy("window_start_ms", "shard_id")





def q_cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema dynamism END-TO-END (ScyllaSchema.updateChangeSchema:467-472):
    a two-era changelog — era 1 written before `ALTER TABLE ADD transcript`
    (no such column), era 2 after — is conformed to the adopted (latest)
    model and driven through the REAL correlation → envelope pipeline.
    Pre-ALTER rows surface transcript=NULL in the after image."""
    from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
    from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes
    from scylla_cdc_source_connector_spark.schema_evolution import conform_changelog
    from scylla_cdc_source_connector_spark.schemas import (
        OP_POST_IMAGE,
        OP_ROW_INSERT,
        TableModel,
    )

    _utc(spark)
    model = TableModel(
        columns=(("clip_id", "string"), ("val", "double"), ("transcript", "string"))
    )
    ev = _events(spark, sf_dir).withColumn("ts", F.col("ts").cast("timestamp"))

    def era(df: DataFrame, with_transcript: bool) -> DataFrame:
        cols = [
            F.format_string(
                "s%04d", F.pmod(F.col("user_id"), F.lit(8))
            ).alias("cdc$stream_id"),
            F.col("ts").alias("cdc$time"),
            F.unix_micros(F.col("ts")).alias("cdc$time_us"),
            F.col("__op").alias("cdc$operation"),
            F.col("__seq").alias("cdc$batch_seq_no"),
            F.lit(0).alias("generation"),
            F.format_string("ev-%012d", F.col("event_id")).alias("clip_id"),
            F.col("value").alias("val"),
        ]
        if with_transcript:
            cols.append(F.col("event_type").alias("transcript"))
        # INSERT delta + POST_IMAGE per event (Scylla write order)
        both = df.selectExpr(
            "*",
            f"stack(2, {OP_ROW_INSERT}, 0, {OP_POST_IMAGE}, 1) AS (__op, __seq)",
        )
        return conform_changelog(both.select(*cols), model)

    changelog = era(ev.filter(F.col("event_id") % 2 == 0), False).unionByName(
        era(ev.filter(F.col("event_id") % 2 == 1), True)
    )
    cfg = EngineConfig(
        include_before=IncludeMode.NONE, include_after=IncludeMode.FULL
    )
    env = cdc_envelopes(changelog, cfg, processing_ts_ms=F.lit(0), table=model)
    return env.select(
        "clip_id",
        F.col("value.op").alias("op"),
        F.col("value.after.val").alias("val"),
        F.col("value.after.transcript").alias("transcript"),
    )


def q_cdc_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstones-on-delete through the REAL pipeline (Debezium
    tombstones.on.delete, pinned by CdcPerRowTtlDeleteIT step 3): each
    delete envelope is followed by a same-key NULL-value record; here
    flattened as op=NULL."""
    from scylla_cdc_source_connector_spark.config import EngineConfig
    from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes
    from scylla_cdc_source_connector_spark.schemas import (
        OP_ROW_DELETE,
        OP_ROW_INSERT,
        OP_ROW_UPDATE,
        TableModel,
    )

    _utc(spark)
    model = TableModel(columns=(("clip_id", "string"),))
    ev = _events(spark, sf_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    op_int = (
        F.when(F.col("event_type").isin("signup", "click"), F.lit(OP_ROW_INSERT))
        .when(F.col("event_type").isin("view", "purchase"), F.lit(OP_ROW_UPDATE))
        .otherwise(F.lit(OP_ROW_DELETE))
    )
    changelog = ev.select(
        F.format_string("s%04d", F.pmod(F.col("user_id"), F.lit(8))).alias(
            "cdc$stream_id"
        ),
        F.col("ts").alias("cdc$time"),
        F.unix_micros(F.col("ts")).alias("cdc$time_us"),
        op_int.alias("cdc$operation"),
        F.lit(0).alias("cdc$batch_seq_no"),
        F.lit(0).alias("generation"),
        F.format_string("ev-%012d", F.col("event_id")).alias("clip_id"),
    )
    env = cdc_envelopes(
        changelog,
        EngineConfig(tombstones_on_delete=True),
        processing_ts_ms=F.lit(0),
        table=model,
    )
    return env.select(
        "clip_id",
        F.col("value.op").alias("op"),
        F.col("`cdc$batch_seq_no`").alias("seq"),
    )


def q_cdc_legacy_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy-format pipeline (rows-only): Cell-wrapped envelopes over the
    synthetic audio changelog + ScyllaExtractNewRecordState unwrap
    (P9 + T1; tri-state semantics pytest-verified in
    tests/test_legacy_golden.py)."""
    import os
    import tempfile

    from scylla_cdc_source_connector_spark.config import EngineConfig
    from scylla_cdc_source_connector_spark.fixtures import (
        FixtureSpec,
        make_changelog,
        write_changelog_chunk,
    )
    from scylla_cdc_source_connector_spark.operators.smt import (
        extract_new_record_state,
    )
    from scylla_cdc_source_connector_spark.plans.pipeline import (
        cdc_legacy_envelopes,
    )

    _utc(spark)
    n_events = _events(spark, sf_dir).count()
    spec = FixtureSpec(
        n_events=min(n_events, 20_000), n_clips=max(50, n_events // 10)
    )
    path = _cached_changelog_path(spec)
    df = spark.read.parquet(path)
    env = cdc_legacy_envelopes(df, EngineConfig(), processing_ts_ms=F.lit(0))
    return extract_new_record_state(env).select(
        "clip_id", "sr_hz", "dur_ms", "codec", "transcript"
    )


def q_cdc_before_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 before-struct reconstruction analog
    (ScyllaChangeRecordEmitter.java:529-575): for each UPDATE the 'before'
    value of an unmodified column is the key's previous state — here
    recovered per key with lag() ordered by (ts, event_id)."""
    p = _proxy(spark, sf_dir)
    w = Window.partitionBy("clip_id").orderBy("ts_ms", "event_id")
    return (
        p.withColumn("before_value", F.lag("value").over(w))
        .filter((F.col("op") == "u") & F.col("before_value").isNotNull())
        .select(
            "clip_id",
            "ts_ms",
            "event_id",
            "before_value",
            F.col("value").alias("after_value"),
        )
    )


def q_cdc_op_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key change-type bigrams (c→u, u→d, ...) — the CEP-style pattern
    count over the ordered change stream."""
    p = _proxy(spark, sf_dir)
    w = Window.partitionBy("clip_id").orderBy("ts_ms", "event_id")
    return (
        p.withColumn("prev_op", F.lag("op").over(w))
        .filter(F.col("prev_op").isNotNull())
        .groupBy("prev_op", "op")
        .agg(F.count("*").alias("n"))
    )


def q_cdc_heartbeat_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 heartbeat semantics (ScyllaWorkerTransport.moveStateToNextWindow:
    58-79): per shard, how many 30 s scan windows in [min, max] carried no
    data — exactly the windows whose offsets only advance via heartbeat."""
    p = _proxy(spark, sf_dir).withColumn(
        "slot", F.floor(F.col("ts_ms") / F.lit(30_000)).cast("long")
    )
    return p.groupBy("shard_id").agg(
        F.count_distinct("slot").alias("n_active_windows"),
        (
            (F.max("slot") - F.min("slot") + F.lit(1))
            - F.count_distinct("slot")
        ).alias("n_heartbeat_windows"),
    )


def q_cdc_modified_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 modified-column detection (ScyllaChangeRecordEmitter.java:361-398):
    column modified iff value non-null OR cdc$deleted_<col>.  Proxy: value
    nulled on event_id%5==0, deleted flag on event_id%7==0."""
    p = _proxy(spark, sf_dir)
    value_mod = F.when(F.col("event_id") % 5 != 0, F.col("value"))
    deleted = F.col("event_id") % 7 == 0
    modified = value_mod.isNotNull() | deleted
    return p.groupBy("op").agg(
        F.sum(modified.cast("long")).alias("n_modified"),
        F.sum((~modified).cast("long")).alias("n_unmodified"),
        F.sum(deleted.cast("long")).alias("n_deleted_flag"),
    )


def q_cdc_only_updated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 only-updated projection (fillStructWithOnlyUpdatedColumns,
    ScyllaChangeRecordEmitter.java:435-460): modified columns keep the
    image value, unmodified become null; PKs always present."""
    p = _proxy(spark, sf_dir)
    value_mod = F.when(F.col("event_id") % 5 != 0, F.col("value"))
    deleted = F.col("event_id") % 7 == 0
    modified = value_mod.isNotNull() | deleted
    return p.filter(F.col("op") == "u").select(
        "clip_id",
        "ts_ms",
        "event_id",
        F.when(modified, value_mod).alias("after_value"),
    )


def q_cdc_task_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 task planning (TaskConfigBuilder.java:19-46): sorted shard streams
    chunked into <= maxTasks tasks of ceil(n/maxTasks) each; here
    maxTasks=3 over the 8 proxy shards (plans/task_planner.plan_tasks)."""
    from scylla_cdc_source_connector_spark.plans.task_planner import plan_tasks

    p = _proxy(spark, sf_dir)
    shards = p.groupBy("shard_id").agg(F.count("*").alias("n_records"))
    return (
        plan_tasks(shards, max_tasks=3, order_cols=["shard_id"])
        .groupBy("task_id")
        .agg(
            F.count("*").alias("n_shards"),
            F.sum("n_records").alias("n_records"),
            F.min("shard_id").alias("first_shard"),
            F.max("shard_id").alias("last_shard"),
        )
    )


def q_cdc_task_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 worker assignment: every change row stamped with its planned
    task via a broadcast join of the metadata-sized plan
    (plans/task_planner.assign_tasks — the data never shuffles to meet
    the plan); per-task record counts and time extents."""
    from scylla_cdc_source_connector_spark.plans.task_planner import (
        assign_tasks,
        plan_tasks,
    )

    p = _proxy(spark, sf_dir)
    plan = plan_tasks(
        p.select("shard_id").distinct(), max_tasks=3, order_cols=["shard_id"]
    )
    stamped = assign_tasks(p, plan, ["shard_id"])
    return stamped.groupBy("task_id").agg(
        F.count("*").alias("n_records"),
        F.min("ts_ms").alias("min_ts_ms"),
        F.max("ts_ms").alias("max_ts_ms"),
        F.count_distinct("clip_id").alias("n_clips"),
    )


def q_cdc_initial_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 initial lookback (ScyllaConnectorConfig.java:199-213): on first
    start, begin at now - lookback instead of stream start — batch analog
    keeps only the trailing 1 h of the stream."""
    p = _proxy(spark, sf_dir)
    mx = p.agg(F.max("ts_ms").alias("max_ts_ms"))
    return (
        p.join(F.broadcast(mx))
        .filter(F.col("ts_ms") >= F.col("max_ts_ms") - 3_600_000)
        .groupBy("shard_id")
        .agg(F.count("*").alias("n_records"), F.min("ts_ms").alias("first_ts_ms"))
    )


def q_smt_extract_new_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 ScyllaExtractNewRecordState (transforms/
    ScyllaExtractNewRecordState.java:74-117): envelope -> flat after.* row,
    tombstones (delete envelopes) dropped."""
    p = _proxy(spark, sf_dir)
    env = p.select(
        "clip_id",
        "op",
        F.struct(
            F.col("value").alias("value"), F.col("user_id").alias("user_id")
        ).alias("after"),
        "ts_ms",
    )
    return env.filter(F.col("op") != "d").select(
        "clip_id", "op", F.col("after.value").alias("value"),
        F.col("after.user_id").alias("user_id"), "ts_ms",
    )


def q_cdc_generation_rollover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation accounting (ScyllaMasterTransport.
    areTasksFullyConsumedUntil:50-70): generation = epoch half of the
    stream; per (generation, shard) high-water marks — gen N+1 may start
    only when every shard's high water passed gen N's end, which the
    boundary construction makes checkable."""
    p = _proxy(spark, sf_dir)
    bounds = p.agg(
        F.min("ts_ms").alias("mn"), F.max("ts_ms").alias("mx")
    )
    gen = F.when(
        F.col("ts_ms") < (F.col("mn") + F.col("mx")) / 2, F.lit(0)
    ).otherwise(F.lit(1))
    return (
        p.join(F.broadcast(bounds))
        .withColumn("generation", gen)
        .groupBy("generation", "shard_id")
        .agg(
            F.count("*").alias("n_records"),
            F.max("ts_ms").alias("high_water_ts_ms"),
        )
    )


def q_topk_per_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per shard (row_number top-k — the bounded
    per-partition pattern used for per-shard hot-item reports)."""
    p = _proxy(spark, sf_dir)
    w = Window.partitionBy("shard_id").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        p.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("shard_id", "rank", "event_id", "value")
    )


# ---------------------------------------------------------------------------
# Training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------
def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folded text-analysis surface — token counting, quality metrics,
    marker-lexicon language ID and the rolling-hash (winnowing-style)
    document fingerprint in ONE narrow pass over documents.  All four
    constituent operators (functions/text.py token_count/quality_metrics/
    lang_id + the gram fingerprint) remain individually pytest-pinned;
    folding them here freed driver-registry slots for the round-5
    Iceberg read surfaces while keeping every text op oracle-checked.
    Pure codegen: no UDF, no shuffle (per-row expressions only).

    Round-5 fold: PII scrub (functions/text.pii_scrub).  The synthetic
    documents carry no PII, so a deterministic suffix (email + IPv4 +
    SSN + intl phone derived from doc_id) is synthesized per row in BOTH
    engines; per-category counts AND the md5 of the cascaded-redaction
    output are oracle-hashed — a real cross-engine check of the Java vs
    RE2 regex semantics the scrubber relies on.  Also folded: the
    Gopher/C4-style repetition metrics (functions/text.repetition_metrics
    — dup-word/dup-line/top-bigram ‰, per-row array arithmetic, the
    bigram max via sorted-array run-fold vs DuckDB's list_max-of-counts:
    two independent algorithms hash-matched)."""
    from scylla_cdc_source_connector_spark.functions.text import (
        lang_id,
        pii_scrub,
        quality_metrics,
        repetition_metrics,
    )

    docs = _docs(spark, sf_dir)
    pii_suffix = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 ssn 123-45-6789 call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("-1234"),
    )
    docs = pii_scrub(
        docs.withColumn("pii_text", F.concat(F.col("text"), pii_suffix)),
        "pii_text",
    )
    docs = repetition_metrics(docs)
    n = F.greatest(F.length("text") - F.lit(7), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.md5(F.substr(F.col("text"), i, F.lit(8))),
    )
    return lang_id(quality_metrics(docs)).select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "n_stopwords",
        "n_distinct_tokens",
        "mean_token_len_x100",
        "lang_pred",
        F.array_min(grams).alias("fp_min"),
        F.array_max(grams).alias("fp_max"),
        "n_pii_email",
        "n_pii_ssn",
        "n_pii_ipv4",
        "n_pii_phone",
        "n_pii",
        F.md5("pii_text_redacted").alias("pii_redacted_md5"),
        "dup_word_frac_x1000",
        "dup_line_frac_x1000",
        "top_bigram_frac_x1000",
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scylla_cdc_source_connector_spark.functions.dedup import dedup_exact

    return dedup_exact(_docs(spark, sf_dir)).select(
        "doc_fingerprint", "doc_id", "n_dups"
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-Jaccard near-dup pairs on a doc subset (exact pairwise —
    the verification oracle for the LSH variants)."""
    from scylla_cdc_source_connector_spark.functions.dedup import dedup_ngram_jaccard

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    out = dedup_ngram_jaccard(docs, threshold=0.5, shingle_n=1)
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate GROUPS: alternating large-star/small-star
    connected components over the exact-Jaccard pair graph; cluster_id is
    the minimum member doc_id (functions/graph.py — the keep-one-per-group
    step every dedup family needs)."""
    from scylla_cdc_source_connector_spark.functions.dedup import dedup_ngram_jaccard
    from scylla_cdc_source_connector_spark.functions.graph import dedup_clusters

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    pairs = dedup_ngram_jaccard(docs, threshold=0.5, shingle_n=1)
    return dedup_clusters(pairs)


def q_dedup_approx_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three approximate near-dup pair families in ONE checked entry
    (rows-only: banding/quantization aren't SQL-practical; each method's
    recall vs its exact oracle is pytest-pinned in tests/test_functions.py).
    Per-method wall times are attributed in bench extra
    ("dedup_approx_methods"); the round-3 16 s composite was dominated by
    embedding_lsh's interpreted hyperplane/cosine expression trees, now
    vectorized (similarity._bucket_udf / pair_cosine_udf) — the full
    embedding table stays in scope deliberately: it is the method's
    realistic input and runs ~3 s warm at sf0.1.
      method='minhash_lsh'   — MinHash + banded LSH on token shingles
                               (functions/dedup.dedup_minhash_lsh), score=jaccard
      method='simhash'       — SimHash + pigeonhole block banding, complete
                               at the Hamming radius (dedup.dedup_simhash),
                               score=hamming distance
      method='embedding_lsh' — banded hyperplane LSH over embeddings +
                               exact-cosine verify
                               (similarity.cosine_near_dup_pairs), score=cosine;
                               the exact variant embedding_near_dup is the
                               oracle-checked baseline"""
    from scylla_cdc_source_connector_spark.functions.dedup import (
        dedup_minhash_lsh,
        dedup_simhash,
    )
    from scylla_cdc_source_connector_spark.functions.similarity import (
        cosine_near_dup_pairs,
    )

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    mh = dedup_minhash_lsh(docs, threshold=0.5).select(
        F.lit("minhash_lsh").alias("method"),
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("jaccard", 4).cast("double").alias("score"),
    )
    sh = dedup_simhash(docs, max_hamming=8).select(
        F.lit("simhash").alias("method"),
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("double").alias("score"),
    )
    el = cosine_near_dup_pairs(_emb(spark, sf_dir), threshold=0.35).select(
        F.lit("embedding_lsh").alias("method"),
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("cosine", 4).cast("double").alias("score"),
    )
    return mh.unionByName(sh).unionByName(el)


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 for 5 query vectors."""
    from scylla_cdc_source_connector_spark.functions.similarity import (
        brute_force_topk,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id", "rank"
    )


def q_ann_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both approximate-nearest-neighbor scale paths in ONE checked entry
    (rows-only: quantization/banding aren't SQL-practical; recall vs the
    oracle-checked brute-force ann_cosine_topk is pytest-pinned):
      method='lsh' — banded hyperplane LSH, OR-of-bands candidates +
                     exact-cosine rerank (similarity.lsh_topk, recall ≥ 0.8)
      method='ivf' — IVF coarse quantization, zero-shuffle centroid argmax
                     + n_probe cell scan (similarity.ivf_topk)"""
    from scylla_cdc_source_connector_spark.functions.similarity import (
        ivf_topk,
        lsh_topk,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    lsh = lsh_topk(emb, queries, k=10).select(
        F.lit("lsh").alias("method"), "query_id", "neighbor_id", "rank"
    )
    ivf = ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=6).select(
        F.lit("ivf").alias("method"), "query_id", "neighbor_id", "rank"
    )
    return lsh.unionByName(ivf)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine pairs above threshold on a subset."""
    from scylla_cdc_source_connector_spark.functions.similarity import cosine_expr

    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 300)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= 0.35)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


def q_multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payload -> mapInPandas feature
    extraction (decode kernel is the documented deterministic fake; see
    functions/multimodal.py).  Payload derives from the documents table so
    the oracle can reproduce the metadata arithmetic."""
    from scylla_cdc_source_connector_spark.functions.multimodal import (
        IMAGE_FEATURES_SCHEMA,
        image_features_batches,
    )

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("item_id"),
        F.encode(F.md5("text"), "utf-8").alias("payload"),
    )
    out = docs.mapInPandas(image_features_batches, IMAGE_FEATURES_SCHEMA)
    return out.select("item_id", "width", "height", "n_channels", "decode_ok")


def q_multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: deterministic binary-PPM payloads
    (constant-color, dimensions derived from doc_id) are encoded then
    decoded by the pure-numpy P6 codec (functions/multimodal.decode_image)
    — no stub on this path; the oracle recomputes the dimensions and the
    exact constant-image mean luma in SQL."""
    from scylla_cdc_source_connector_spark.functions.multimodal import (
        IMAGE_FEATURES_SCHEMA,
        encode_ppm,
        image_features_batches,
    )

    def make_ppm(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"].values:
                h, w, v = 4 + doc_id % 4, 4 + doc_id % 5, doc_id % 256
                img = np.full((int(h), int(w), 3), int(v), dtype=np.uint8)
                ids.append(str(doc_id))
                payloads.append(encode_ppm(img))
            yield pd.DataFrame({"item_id": ids, "payload": payloads})

    docs = _docs(spark, sf_dir).select("doc_id")
    ppm = docs.mapInPandas(make_ppm, "item_id string, payload binary")
    out = ppm.mapInPandas(image_features_batches, IMAGE_FEATURES_SCHEMA)
    return out.select(
        "item_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_channels").cast("long").alias("n_channels"),
        "mean_luma",
        "decode_ok",
    )


def q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling: 1->N row fan-out over fixed-size byte
    windows of an opaque payload (stub for ffmpeg frame extraction), md5
    frame fingerprints."""
    from scylla_cdc_source_connector_spark.functions.multimodal import (
        VIDEO_FRAMES_SCHEMA,
        video_frame_sample_batches,
    )

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("item_id"),
        F.encode(F.repeat(F.md5("text"), 20), "utf-8").alias("payload"),
    )
    out = docs.mapInPandas(
        video_frame_sample_batches(sample_every=1, frame_bytes=256),
        VIDEO_FRAMES_SCHEMA,
    )
    return out.select("item_id", "frame_index", "frame_fingerprint")


# ---------------------------------------------------------------------------
# audio payload operators (audio_fingerprint.py) — rows-only: spectral
# fingerprints need FFTs, which the DuckDB oracle cannot express; the
# kernel's invariants (transcoding collision, content separation, gain
# invariance) are pinned by tests/test_audio_fingerprint.py instead
# ---------------------------------------------------------------------------
def _fixture_clips(spark: SparkSession, sf_dir: str, n_clips: int):
    """Deterministic audio base table sized from the sf (cached parquet)."""
    import os
    import tempfile

    from scylla_cdc_source_connector_spark.fixtures import FixtureSpec, make_clips

    spec = FixtureSpec(n_events=n_clips, n_clips=n_clips)
    # cache keyed by the spec CONTENT (+ generator version), never just
    # the clip count — a fixture change can't silently feed stale payloads
    path = os.path.join(
        tempfile.gettempdir(),
        f"sccs_clips_{n_clips}_{spec.content_hash()}.parquet",
    )
    if not os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = make_clips(spec)
        tbl = pa.Table.from_pandas(
            pdf[["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]],
            preserve_index=False,
        )
        pq.write_table(tbl, path)
    return spark.read.parquet(path)


def q_audio_dup_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio duplicate detection at BOTH granularities in one checked
    entry (rows-only: the spectral fingerprint needs FFTs the DuckDB
    oracle cannot express; collision/separation invariants are pinned by
    tests/test_audio_fingerprint.py and tests/test_audio_containment.py):

      kind='near_dup'    — clip-level codec-transcoding near-dups: each
                           clip re-encoded under a second G.711 codec must
                           pair with its original (Haitsma-Kalker-style
                           fingerprint + pigeonhole Hamming banding,
                           audio_fingerprint.audio_near_dup); score =
                           Hamming distance
      kind='containment' — partial-dup detection: a hop-aligned transcoded
                           200 ms excerpt must surface as (container,
                           contained) (segment → per-segment fingerprint →
                           banding join → coverage,
                           audio_fingerprint.audio_containment); score =
                           coverage
      kind='alignment'   — offset estimation (audio_align.align_clip_pairs):
                           amplitude-modulated clips with a transcoded
                           500 ms excerpt planted at +250 ms; score = the
                           estimated offset_ms (envelope FFT-NCC, ±5 ms at
                           fps=200)

    Dup/excerpt synthesis runs INSIDE mapInPandas stages — the checked
    plan is distributed end-to-end, no driver-side payload loops."""
    from scylla_cdc_source_connector_spark.audio_fingerprint import (
        audio_containment,
        audio_near_dup,
    )

    clips = _fixture_clips(spark, sf_dir, 100).limit(60)

    def transcode_dups(batches):
        import pandas as pd

        from scylla_cdc_source_connector_spark import audio as audio_mod

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                raw, codec = bytes(r.bytes), r.codec
                rows.append((f"{r.clip_id}-orig", raw, codec))
                alt = "ulaw" if codec != "ulaw" else "alaw"
                pcm16 = (
                    (audio_mod.decode(raw, codec) * 32768.0)
                    .clip(-32768, 32767)
                    .astype("int16")
                )
                rows.append((f"{r.clip_id}-dup", audio_mod.encode(pcm16, alt), alt))
            yield pd.DataFrame(rows, columns=["clip_id", "bytes", "codec"])

    dup_corpus = clips.select("clip_id", "bytes", "codec").mapInPandas(
        transcode_dups, "clip_id string, bytes binary, codec string"
    )
    near = audio_near_dup(dup_corpus).select(
        F.lit("near_dup").alias("kind"),
        F.col("id_a"),
        F.col("id_b"),
        F.col("hamming").cast("double").alias("score"),
    )

    window_ms, hop_ms = 100, 50

    def excerpts(batches):
        import pandas as pd

        from scylla_cdc_source_connector_spark import audio as audio_mod

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                raw, codec, sr = bytes(r.bytes), r.codec, int(r.sr_hz)
                rows.append((r.clip_id, raw, codec, sr))
                pcm = audio_mod.decode(raw, codec)
                hop = sr * hop_ms // 1000
                ex = pcm[hop : hop + 4 * hop]  # hop-aligned 200 ms excerpt
                if len(ex) < 2 * hop:
                    continue
                ex16 = (ex * 32768.0).clip(-32768, 32767).astype("int16")
                rows.append(
                    (f"ex-{r.clip_id}", audio_mod.encode(ex16, "ulaw"), "ulaw", sr)
                )
            yield pd.DataFrame(rows, columns=["clip_id", "bytes", "codec", "sr_hz"])

    ex_corpus = (
        _fixture_clips(spark, sf_dir, 100)
        .limit(40)
        .select("clip_id", "bytes", "codec", "sr_hz")
        .mapInPandas(
            excerpts, "clip_id string, bytes binary, codec string, sr_hz int"
        )
    )
    cont = audio_containment(ex_corpus, window_ms=window_ms, hop_ms=hop_ms).select(
        F.lit("containment").alias("kind"),
        F.col("container_id").alias("id_a"),
        F.col("contained_id").alias("id_b"),
        F.round("coverage", 4).cast("double").alias("score"),
    )

    # kind='alignment' — WHERE the shared content sits (audio_align):
    # fixture clips are stationary sines (flat envelopes — degenerate for
    # envelope NCC), so this leg amplitude-modulates them INSIDE an Arrow
    # stage and plants a transcoded 500 ms excerpt at exactly +250 ms;
    # score = estimated offset_ms, deterministically 250 when the
    # FFT-NCC alignment locks (tests/test_audio_align.py pins tolerance)
    from scylla_cdc_source_connector_spark.audio_align import align_clip_pairs

    def modulated_pairs(batches):
        import zlib

        import numpy as np
        import pandas as pd

        from scylla_cdc_source_connector_spark import audio as audio_mod

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                raw, codec, sr = bytes(r.bytes), r.codec, int(r.sr_hz)
                pcm = audio_mod.decode(raw, codec)
                t = np.arange(len(pcm)) / sr
                f_m = 1.5 + (zlib.crc32(r.clip_id.encode()) % 5) * 0.7
                # chirp modulation (f_m -> f_m + 3.4*dur Hz): an APERIODIC
                # envelope — a pure-tone envelope would alias the NCC peak
                # at multiples of its period
                env = 0.35 + 0.3 * np.sin(2 * np.pi * (f_m * t + 1.7 * t * t))
                m16 = (
                    (pcm * env * 32768.0).clip(-32768, 32767).astype("int16")
                )
                ex = m16[sr // 4 : sr // 4 + sr // 2]  # +250 ms, 500 ms long
                if len(ex) < sr // 2:
                    continue
                rows.append(
                    (
                        f"al-{r.clip_id}",
                        audio_mod.encode(m16, "pcm_s16le"),
                        "pcm_s16le",
                        sr,
                    )
                )
                rows.append(
                    (f"al-ex-{r.clip_id}", audio_mod.encode(ex, "ulaw"), "ulaw", sr)
                )
            yield pd.DataFrame(rows, columns=["clip_id", "bytes", "codec", "sr_hz"])

    al_base = _fixture_clips(spark, sf_dir, 100).filter(F.col("dur_ms") >= 900)
    al_corpus = al_base.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        modulated_pairs, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    al_pairs = al_base.select(
        F.concat(F.lit("al-"), "clip_id").alias("id_a"),
        F.concat(F.lit("al-ex-"), "clip_id").alias("id_b"),
    )
    ali = align_clip_pairs(
        al_pairs, al_corpus, fps=200, min_overlap_s=0.1
    ).select(
        F.lit("alignment").alias("kind"),
        "id_a",
        "id_b",
        F.col("offset_ms").cast("double").alias("score"),
    )
    return near.unionByName(cont).unionByName(ali).orderBy("kind", "id_a", "id_b")


def q_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-energy VAD + single-pass silence trim + sample-rate
    normalization in one checked entry (rows-only; decode is not
    SQL-expressible): per clip speech ratio, speech-span trim offsets,
    the trimmed payload length — VAD and the payload slice happen in
    ONE Arrow pass (audio_vad.trim_clips; frame arithmetic and
    slice-vs-offset equality pinned by tests/test_audio_vad.py) — plus
    the resampler's (audio_resample.py) mono pcm_s16le @ 16 kHz output
    length per clip, 1:1-joined on clip_id (grouped flat-lerp kernel;
    kernel equality + SNR ≥ 30 dB floors pinned by
    tests/test_audio_resample.py).  A third of the clips are re-wrapped
    into WAV (RIFF) containers INSIDE a mapInPandas stage (no driver-side
    synthesis) to exercise the real container-parse path.  Round 5 folds
    in the spectral quality features (audio_features.extract_features —
    one batched rFFT per Arrow batch, segmented reduceat aggregation;
    physics pinned by tests/test_audio_features.py): centroid/flatness/
    voice-band ratio + clipping/DC, 1:1-joined on clip_id.  Round 5 also
    folds in the R128 loudness gate (audio_loudness.extract_loudness —
    BS.1770-4 K-weighted gated LUFS + 4x-oversampled true peak, spec
    coefficient table + 997 Hz anchor pinned by
    tests/test_audio_loudness.py), 1:1-joined on clip_id."""
    from scylla_cdc_source_connector_spark.audio_features import (
        extract_features,
    )
    from scylla_cdc_source_connector_spark.audio_loudness import (
        extract_loudness,
    )
    from scylla_cdc_source_connector_spark.audio_resample import resample_clips
    from scylla_cdc_source_connector_spark.audio_vad import trim_clips

    def wav_wrap(batches):
        import zlib

        import pandas as pd

        from scylla_cdc_source_connector_spark import audio as audio_mod

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                raw, codec, sr = bytes(r.bytes), r.codec, int(r.sr_hz)
                if zlib.crc32(r.clip_id.encode()) % 3 == 0:
                    pcm16 = (
                        (audio_mod.decode(raw, codec) * 32768.0)
                        .clip(-32768, 32767)
                        .astype("int16")
                    )
                    raw = audio_mod.wav_encode(pcm16, sr, "pcm_s16le")
                    codec = "wav"
                rows.append((r.clip_id, raw, codec, sr))
            yield pd.DataFrame(
                rows, columns=["clip_id", "bytes", "codec", "sr_hz"]
            )

    df = (
        _fixture_clips(spark, sf_dir, 300)
        .select("clip_id", "bytes", "codec", "sr_hz")
        .mapInPandas(
            wav_wrap, "clip_id string, bytes binary, codec string, sr_hz int"
        )
    )
    out = trim_clips(df)
    # resample the ORIGINAL (pre-WAV-wrap) clips — same fixture, 1:1 on
    # clip_id; payload dropped from the checked result (metadata only)
    res = resample_clips(
        _fixture_clips(spark, sf_dir, 300).select(
            "clip_id", "bytes", "codec", "sr_hz"
        ),
        target_sr=16_000,
    ).select(
        "clip_id",
        F.col("decode_ok").alias("resample_ok"),
        F.col("n_samples").alias("resampled_n_samples"),
    )
    # spectral quality features over the WAV-wrapped fixture (same Arrow
    # batch discipline; exercises the container + stereo-free path)
    feats = extract_features(df).select(
        "clip_id",
        F.col("n_frames").alias("spec_frames"),
        F.round("spectral_centroid_hz", 2).alias("spectral_centroid_hz"),
        F.round("spectral_flatness", 4).alias("spectral_flatness"),
        F.round("band_mid_ratio", 4).alias("voice_band_ratio"),
        F.round("clipping_ratio", 4).alias("clipping_ratio"),
        F.round("zcr", 4).alias("zcr"),
    )
    # R128 loudness over the same WAV-wrapped fixture (metadata only)
    loud = extract_loudness(df).select(
        "clip_id",
        F.col("n_blocks").alias("r128_blocks"),
        F.round("lufs_integrated", 2).alias("lufs_integrated"),
        F.round("true_peak_dbtp", 2).alias("true_peak_dbtp"),
    )
    # round-5 final-session legs: utterance splitting (span count +
    # speech duration per clip; zero-span clips kept via left join) and
    # loudness normalization to -23 LUFS / -1 dBTP (gain + cap metadata)
    from scylla_cdc_source_connector_spark.audio_loudness import (
        normalize_loudness,
    )
    from scylla_cdc_source_connector_spark.audio_vad import split_speech_spans

    spans = (
        split_speech_spans(df)
        .where("span_idx >= 0")
        .groupBy("clip_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(
                F.col("span_end_ms") - F.col("span_start_ms")
            ).alias("span_speech_ms"),
        )
    )
    norm = normalize_loudness(df).select(
        "clip_id",
        F.round("gain_db", 2).alias("norm_gain_db"),
        F.col("peak_limited").alias("norm_peak_limited"),
    )
    return (
        out.select(
            "clip_id",
            "decode_ok",
            F.round("speech_ratio", 4).alias("speech_ratio"),
            F.round("snr_db", 2).alias("vad_snr_db"),
            "trim_start_ms",
            "trim_end_ms",
            F.octet_length("bytes").alias("trimmed_bytes"),
            "codec",
        )
        .join(res, "clip_id")
        .join(feats, "clip_id")
        .join(loud, "clip_id")
        .join(spans, "clip_id", "left")
        .join(norm, "clip_id")
        .withColumn("n_spans", F.coalesce("n_spans", F.lit(0)))
        .withColumn(
            "span_speech_ms", F.coalesce("span_speech_ms", F.lit(0))
        )
        .orderBy("clip_id")
    )


def q_audio_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window audio segmentation (audio_segment.py): the training-
    data chunking fan-out, pure JVM (sequence+explode+substring, zero
    Python).  The payload here derives from the documents table —
    encode(md5(text)) is 32 one-byte 'samples' at 8 kHz ulaw — so the
    oracle reproduces the exact window arithmetic by slicing the same
    md5 hex string; real-audio segmentation (alignment, reconstruction)
    is pinned by tests/test_audio_segment.py."""
    from scylla_cdc_source_connector_spark.audio_segment import segment_clips

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("item_id"),
        F.encode(F.md5("text"), "utf-8").alias("bytes"),
        F.lit(8000).alias("sr_hz"),
        F.lit("ulaw").alias("codec"),
    )
    # window 2 ms = 16 samples/bytes, hop 1 ms = 8 bytes over 32 bytes
    # -> exactly 3 full windows per document
    seg = segment_clips(docs, window_ms=2, hop_ms=1)
    return seg.select(
        "item_id",
        "seg_idx",
        "seg_start_ms",
        F.decode(F.col("seg_bytes"), "utf-8").alias("seg_text"),
        "seg_n_samples",
    ).orderBy("item_id", "seg_idx")


def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end training-data recipe (rows-only; decode
    not SQL-expressible): changelog → envelopes → latest live state →
    decode/SNR gate → silence trim → fixed-window segmentation →
    exact-fingerprint dedup (plans/training_pipeline.py; dedup/liveness
    invariants pinned by tests/test_training_pipeline.py)."""
    import os
    import tempfile

    from scylla_cdc_source_connector_spark.fixtures import (
        FixtureSpec,
        make_changelog,
        write_changelog_chunk,
    )
    from scylla_cdc_source_connector_spark.plans.training_pipeline import (
        training_corpus,
    )

    _utc(spark)
    n_events = min(_events(spark, sf_dir).count(), 20_000)
    spec = FixtureSpec(n_events=n_events, n_clips=max(50, n_events // 10))
    path = _cached_changelog_path(spec)
    corpus = training_corpus(spark.read.parquet(path))
    return corpus.select(
        "clip_id", "seg_idx", "seg_start_ms", "seg_n_samples", "fingerprint"
    ).orderBy("clip_id", "seg_idx")


def q_training_corpus_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus maintenance off the change stream (rows-only):
    stream the fixture changelog in two halves through the exactly-once
    sink, maintain the corpus log after each, return the resolved corpus
    (streaming/corpus.py; update/delete/re-insert semantics pinned by
    tests/test_corpus.py)."""
    import os
    import tempfile

    from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
    from scylla_cdc_source_connector_spark.fixtures import (
        FixtureSpec,
        make_changelog,
        write_changelog_chunk,
    )
    from scylla_cdc_source_connector_spark.streaming.corpus import (
        maintain_corpus,
        read_corpus,
    )
    from scylla_cdc_source_connector_spark.streaming.engine import run_stream

    _utc(spark)
    n_events = min(_events(spark, sf_dir).count(), 5_000)
    root = os.path.join(tempfile.gettempdir(), f"sccs_corpus_{n_events}")
    cfg = EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        checkpoint_dir=f"{root}/ckpt",
        output_dir=f"{root}/out",
        lineage_dir=f"{root}/lineage",
    )
    target = f"{root}/target"
    if not os.path.isdir(f"{root}/in"):
        pdf = make_changelog(
            FixtureSpec(n_events=n_events, n_clips=max(50, n_events // 10))
        ).sort_values("cdc$time_us", kind="stable")
        os.makedirs(f"{root}/in", exist_ok=True)
        half = len(pdf) // 2
        for i, chunk in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
            write_changelog_chunk(chunk, f"{root}/in/chunk-{i:03d}.parquet")
            q = run_stream(spark, cfg, f"{root}/in", available_now=True)
            q.awaitTermination(300)
            maintain_corpus(spark, cfg, target_dir=target)
    return (
        read_corpus(spark, target)
        .select("clip_id", "seg_idx", "seg_start_ms", "seg_n_samples", "fingerprint")
        .orderBy("clip_id", "seg_idx")
    )








# ---------------------------------------------------------------------------
# CEP operators over the ordered change stream (operators/cep.py)
# ---------------------------------------------------------------------------
def q_cep_match_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern match (MATCH_RECOGNIZE-lite): per clip the
    cdc-ordered op symbols form a string; count insert->update+->delete
    episodes (`cu+d`) with one hash aggregation + codegen regex."""
    from scylla_cdc_source_connector_spark.operators.cep import match_pattern

    p = _proxy(spark, sf_dir)
    out = match_pattern(
        p, ["clip_id"], ["ts_ms", "event_id"], F.col("op"), "cu+d"
    )
    return out.select(
        "clip_id",
        F.col("seq_len").cast("long").alias("seq_len"),
        F.col("n_matches").cast("long").alias("n_matches"),
    )


def q_cep_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each delete picks up the latest prior (or
    equal-ts) upsert's value for its clip — union + last(ignorenulls)
    window, a single per-key sort exchange."""
    from scylla_cdc_source_connector_spark.operators.cep import asof_join

    p = _proxy(spark, sf_dir)
    left = p.where("op = 'd'").select("clip_id", "event_id", "ts_ms")
    right = (
        p.where("op <> 'd'")
        .groupBy("clip_id", "ts_ms")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    return asof_join(left, right, ["clip_id"], "ts_ms", "ts_ms", ["value"])


def q_cep_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table state reconstructed as of the stream's midpoint timestamp:
    per-clip last-writer-wins at the cutoff, deletes absent — one max_by
    hash aggregation, no window sort."""
    from scylla_cdc_source_connector_spark.operators.cep import snapshot_asof

    p = _proxy(spark, sf_dir).select("clip_id", "ts_ms", "op", "value", "event_id")
    row = p.agg(F.min("ts_ms").alias("mn"), F.max("ts_ms").alias("mx")).first()
    cutoff = (int(row["mn"]) + int(row["mx"])) // 2
    snap = snapshot_asof(p, ["clip_id"], "ts_ms", ["event_id"], "op", cutoff)
    return snap.select("clip_id", "ts_ms", "op", "value")


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the real CDC pipeline over a synthetic audio changelog
    sized from sf0.001, emitting envelope rows."""
    return q_cdc_full_pipeline(spark, "/root/testdata/sf0.001")


def q_cdc_types_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 CQL type-matrix translation + AVRO ROUND-TRIP, oracle-checked
    (flattened to scalars so the DuckDB hash compares values, not
    container encodings): map→sorted {key,value} entries, non-frozen
    list (map<timeuuid,V>)→insertion-ordered values, tuple→field_N
    struct, empty-UDT→NULL, TIME ns→µs (ScyllaSchema.java:297-430,
    ScyllaChangeRecordEmitter.java:620-795).  The flattened row then
    passes through the pure-Python Avro binary encoder AND decoder
    (functions/avro.py — the Kafka Connect Avro converter analog,
    ScyllaTypesAllAvroConnectorIT): the oracle hash matches only if
    from_avro(to_avro(row)) == row for every value of the matrix.  The
    end-to-end pipeline variant (through correlation→envelope) is pinned
    by tests/test_types_matrix.py; byte-level spec conformance by
    tests/test_avro.py."""
    from scylla_cdc_source_connector_spark.functions.types import (
        empty_udt_to_null,
        map_to_entries,
        nonfrozen_list_values,
        time_to_micros,
        tuple_to_struct,
    )

    p = _proxy(spark, sf_dir).filter(F.col("event_id") < 1000)
    iv = F.floor(F.col("value")).cast("int")
    uid = F.col("user_id").cast("int")
    typed = p.select(
        "event_id",
        F.create_map(
            F.format_string("t%da", F.pmod(iv, F.lit(3))), iv,
            F.format_string("t%db", F.pmod(uid, F.lit(3))), uid,
        ).alias("tags"),
        # non-frozen list encoding: keys are time-ordered ids
        F.create_map(
            F.format_string("%03dv", F.pmod(iv, F.lit(7))), F.lit("v"),
            F.format_string("%03du", F.pmod(uid, F.lit(9))), F.lit("u"),
        ).alias("track"),
        tuple_to_struct(iv, F.col("op")).alias("coords"),
        F.struct(
            F.when(F.pmod(iv, F.lit(5)) != 0, iv).alias("a"),
            F.when(F.pmod(uid, F.lit(4)) != 0, F.col("op")).alias("b"),
        ).alias("meta"),
        (iv.cast("long") * 1_000_000).alias("time_ns"),
    )
    ent = map_to_entries(F.col("tags"))
    lst = nonfrozen_list_values(F.col("track"))
    meta = empty_udt_to_null(F.col("meta"), ["a", "b"])
    flat = typed.select(
        "event_id",
        F.element_at(ent, 1)["key"].alias("tag_key_1"),
        F.element_at(ent, 1)["value"].alias("tag_val_1"),
        F.element_at(ent, 2)["key"].alias("tag_key_2"),
        F.element_at(ent, 2)["value"].alias("tag_val_2"),
        F.element_at(lst, 1).alias("track_first"),
        F.element_at(lst, 2).alias("track_last"),
        F.col("coords")["field_0"].alias("tuple_f0"),
        F.col("coords")["field_1"].alias("tuple_f1"),
        meta.isNull().alias("meta_is_null"),
        meta["a"].alias("meta_a"),
        time_to_micros(F.col("time_ns")).alias("time_us"),
    )
    # Avro round-trip: every checked value travels through the binary
    # encoding and back; a codec defect breaks the oracle hash
    from scylla_cdc_source_connector_spark.functions.avro import (
        from_avro_udf,
        to_avro_udf,
    )

    row_t = flat.select(F.struct(*flat.columns).alias("r")).schema["r"].dataType
    enc, dec = to_avro_udf(row_t), from_avro_udf(row_t)
    return (
        flat.select(dec(enc(F.struct(*flat.columns))).alias("r"))
        .select(*[F.col(f"r.{c}").alias(c) for c in flat.columns])
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries, ORACLE-CHECKABLE FIRST: the driver's
    correctness run is capped at 50 queries, so the 40 entries with an
    oracle_sql() row lead and the 10 rows-only entries follow — every
    registered query gets a driver CORRECTNESS row.  Former standalone
    rows-only entries were folded, not dropped (each constituent operator
    still executes inside its composite):
      audio_trim               → audio_vad (VAD + trim, one Arrow pass)
      audio_resample           → audio_vad (round 5: resampled length
        1:1-joined per clip, freeing the 50th slot for
        iceberg_latest_state_mirror)
      text_token_count,
      text_quality,
      text_lang_id,
      text_fingerprint         → text_metrics (round 5: one narrow pass,
        all columns; freed 3 oracle-checked slots for the Iceberg read
        surfaces iceberg_mor_reads (time travel + MoR current, union-tagged) /
        iceberg_read_changes (appended-rows incremental scan + the
        read_changelog row-level CDC view, union-tagged) over the
        deterministic _events_iceberg 4-snapshot table)
      audio_fingerprint,
      audio_near_dup,
      audio_containment        → audio_dup_detect (kind column)
      dedup_minhash_lsh,
      dedup_simhash,
      embedding_near_dup_lsh   → dedup_approx_pairs (method column)
      ann_lsh_topk, ann_ivf_topk → ann_approx_topk (method column)
      cdc_apply_latest         → retired as a driver entry; the apply
        protocol runs end-to-end in tests/test_apply.py and inside
        training_corpus_incremental's committed-batch consumption."""
    return {
        # -- oracle-checked block (40) --------------------------------
        "cdc_change_typing": q_cdc_change_typing,
        "cdc_envelope_flat": q_cdc_envelope_flat,
        "cdc_latest_state": q_cdc_latest_state,
        "cdc_dedup_exact": q_cdc_dedup_exact,
        "cdc_tumbling_window": q_cdc_tumbling_window,
        "cdc_sliding_window": q_cdc_sliding_window,
        "cdc_session_window": q_cdc_session_window,
        "cdc_shard_offsets": q_cdc_shard_offsets,
        "cdc_hot_keys_salted": q_cdc_hot_keys_salted,
        "cdc_confidence_window": q_cdc_confidence_window,
        "cdc_before_after": q_cdc_before_after,
        "cdc_op_transitions": q_cdc_op_transitions,
        "cdc_heartbeat_windows": q_cdc_heartbeat_windows,
        "cdc_modified_columns": q_cdc_modified_columns,
        "cdc_only_updated": q_cdc_only_updated,
        "cdc_task_planning": q_cdc_task_planning,
        "cdc_task_assignment": q_cdc_task_assignment,
        "cdc_initial_lookback": q_cdc_initial_lookback,
        "smt_extract_new_state": q_smt_extract_new_state,
        "cdc_generation_rollover": q_cdc_generation_rollover,
        "topk_per_shard": q_topk_per_shard,
        "cdc_types_matrix": q_cdc_types_matrix,
        "cep_match_pattern": q_cep_match_pattern,
        "cep_asof_join": q_cep_asof_join,
        "cep_snapshot_asof": q_cep_snapshot_asof,
        "cdc_schema_evolution": q_cdc_schema_evolution,
        "cdc_tombstones": q_cdc_tombstones,
        "text_metrics": q_text_metrics,
        "iceberg_mor_reads": q_iceberg_mor_reads,
        "iceberg_read_changes": q_iceberg_read_changes,
        "iceberg_pruned_reads": q_iceberg_pruned_reads,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_clusters": q_dedup_clusters,
        "ann_cosine_topk": q_ann_cosine_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "audio_segment": q_audio_segment,
        "multimodal_image_meta": q_multimodal_image_meta,
        "multimodal_image_decode": q_multimodal_image_decode,
        "multimodal_video_frames": q_multimodal_video_frames,
        # -- rows-only block (11) -------------------------------------
        "training_pipeline": q_training_pipeline,
        "iceberg_latest_state_mirror": q_iceberg_latest_state_mirror,
        "training_corpus_incremental": q_training_corpus_incremental,
        "cdc_audio_quality_windows": q_cdc_audio_quality_windows,
        "cdc_full_pipeline": q_cdc_full_pipeline,
        "cdc_legacy_pipeline": q_cdc_legacy_pipeline,
        "dedup_approx_pairs": q_dedup_approx_pairs,
        "ann_approx_topk": q_ann_approx_topk,
        "audio_dup_detect": q_audio_dup_detect,
        "audio_vad": q_audio_vad,
    }


_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_TOKS_L = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


def oracle_sql() -> dict[str, str]:
    proxy = f"""
      SELECT printf('clip-%012d', user_id) AS clip_id,
             ts,
             epoch_ms(ts) AS ts_ms,
             {_OP_SQL} AS op,
             printf('s%04d', user_id % 8) AS shard_id,
             value, event_id, user_id
      FROM events
    """
    lang_hits = {
        "en": "('the','and','of','is')",
        "fr": "('le','la','et','les')",
        "es": "('el','los','que','y')",
        "de": "('der','die','und','das')",
    }
    hits_l_sql = ", ".join(
        f"len(list_filter(list_transform(t, x -> lower(x)), "
        f"x -> x IN {ws})) AS h_{lang}"
        for lang, ws in lang_hits.items()
    )
    # PII fold (text_metrics): same patterns, same order as
    # functions/text.PII_PATTERNS — counts on the raw synthesized text,
    # redaction cascaded, 'g' for Spark's replace-all semantics
    from scylla_cdc_source_connector_spark.functions.text import PII_PATTERNS

    pii_text_sql = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.7 ssn 123-45-6789 call +1-555-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-1234'"
    )
    pii_count_sql = ", ".join(
        f"len(regexp_extract_all(pii_text, '{pat}')) AS n_pii_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    pii_red_sql = "pii_text"
    for _, pat, placeholder in PII_PATTERNS:
        pii_red_sql = f"regexp_replace({pii_red_sql}, '{pat}', '{placeholder}', 'g')"
    return {
        "cdc_change_typing": f"SELECT op, count(*) AS n FROM ({proxy}) GROUP BY op",
        "cdc_envelope_flat": (
            f"SELECT 'cdc.audio.clips' AS topic, clip_id, op, ts_ms AS source_ts_ms "
            f"FROM ({proxy})"
        ),
        "cdc_latest_state": f"""
            SELECT clip_id, op AS last_op, ts_ms AS last_ts_ms FROM (
              SELECT clip_id, op, ts_ms,
                     row_number() OVER (PARTITION BY clip_id
                                        ORDER BY ts_ms DESC, event_id DESC) AS rn
              FROM ({proxy})
            ) WHERE rn = 1
        """,
        "cdc_dedup_exact": f"SELECT DISTINCT clip_id, ts_ms, op FROM ({proxy})",
        "cdc_schema_evolution": """
            SELECT printf('ev-%012d', event_id) AS clip_id, 'c' AS op,
                   value AS val,
                   CASE WHEN event_id % 2 = 1 THEN event_type END AS transcript
            FROM events
        """,
        "cdc_tombstones": f"""
            SELECT printf('ev-%012d', event_id) AS clip_id, {_OP_SQL} AS op,
                   0 AS seq
            FROM events
            UNION ALL
            SELECT printf('ev-%012d', event_id) AS clip_id, NULL AS op,
                   1 AS seq
            FROM events WHERE {_OP_SQL} = 'd'
        """,
        "cdc_tumbling_window": f"""
            SELECT (epoch_ms(ts) // 300000) * 300000 AS window_start_ms, op,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM ({proxy}) GROUP BY 1, 2
        """,
        "cdc_sliding_window": f"""
            SELECT ws AS window_start_ms, count(*) AS n_events FROM (
              SELECT (epoch_ms(ts) // 300000) * 300000 - k.k * 300000 AS ws,
                     epoch_ms(ts) AS e
              FROM ({proxy}), (VALUES (0), (1)) k(k)
            ) WHERE e >= ws AND e < ws + 600000 AND ws >= 0
            GROUP BY ws
        """,
        "cdc_session_window": f"""
            WITH flagged AS (
              SELECT clip_id, ts, ts_ms,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY clip_id ORDER BY ts)
                               >= INTERVAL 30 MINUTE
                          OR lag(ts) OVER (PARTITION BY clip_id ORDER BY ts) IS NULL
                          THEN 1 ELSE 0 END AS new_s
              FROM ({proxy})
            ), sessions AS (
              SELECT clip_id, ts_ms,
                     sum(new_s) OVER (PARTITION BY clip_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM flagged
            )
            SELECT clip_id, min(ts_ms) AS session_start_ms,
                   max(ts_ms) + 1800000 AS session_end_ms,
                   count(*) AS n_events
            FROM sessions GROUP BY clip_id, sid
        """,
        "cdc_shard_offsets": f"""
            SELECT shard_id, min(ts_ms) AS window_start_ms,
                   max(ts_ms) AS window_end_ms, count(*) AS n_records
            FROM ({proxy}) GROUP BY shard_id
        """,
        "cdc_hot_keys_salted": f"""
            SELECT clip_id, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM ({proxy}) GROUP BY clip_id
            ORDER BY n_events DESC, clip_id ASC LIMIT 10
        """,
        "cdc_confidence_window": f"""
            SELECT op, count(*) AS n_kept FROM ({proxy})
            WHERE ts_ms <= (SELECT max(ts_ms) - 30000 FROM ({proxy}))
            GROUP BY op
        """,
        "cdc_before_after": f"""
            SELECT clip_id, ts_ms, event_id, before_value, after_value FROM (
              SELECT clip_id, ts_ms, event_id, op,
                     lag(value) OVER (PARTITION BY clip_id
                                      ORDER BY ts_ms, event_id) AS before_value,
                     value AS after_value
              FROM ({proxy})
            ) WHERE op = 'u' AND before_value IS NOT NULL
        """,
        "cdc_op_transitions": f"""
            SELECT prev_op, op, count(*) AS n FROM (
              SELECT op, lag(op) OVER (PARTITION BY clip_id
                                       ORDER BY ts_ms, event_id) AS prev_op
              FROM ({proxy})
            ) WHERE prev_op IS NOT NULL GROUP BY prev_op, op
        """,
        "cdc_heartbeat_windows": f"""
            SELECT shard_id,
                   count(DISTINCT slot) AS n_active_windows,
                   (max(slot) - min(slot) + 1) - count(DISTINCT slot)
                     AS n_heartbeat_windows
            FROM (SELECT shard_id, ts_ms // 30000 AS slot FROM ({proxy}))
            GROUP BY shard_id
        """,
        "topk_per_shard": f"""
            SELECT shard_id, rank, event_id, value FROM (
              SELECT shard_id, event_id, value,
                     row_number() OVER (PARTITION BY shard_id
                                        ORDER BY value DESC, event_id ASC)
                       AS rank
              FROM ({proxy})
            ) WHERE rank <= 3
        """,
        "cdc_modified_columns": f"""
            SELECT op,
                   CAST(sum(CASE WHEN modified THEN 1 ELSE 0 END) AS BIGINT) AS n_modified,
                   CAST(sum(CASE WHEN modified THEN 0 ELSE 1 END) AS BIGINT) AS n_unmodified,
                   CAST(sum(CASE WHEN deleted THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted_flag
            FROM (
              SELECT op,
                     (CASE WHEN event_id % 5 <> 0 THEN value END) IS NOT NULL
                       OR (event_id % 7 = 0) AS modified,
                     event_id % 7 = 0 AS deleted
              FROM ({proxy})
            ) GROUP BY op
        """,
        "cdc_only_updated": f"""
            SELECT clip_id, ts_ms, event_id,
                   CASE WHEN (CASE WHEN event_id % 5 <> 0 THEN value END)
                             IS NOT NULL OR event_id % 7 = 0
                        THEN (CASE WHEN event_id % 5 <> 0 THEN value END)
                   END AS after_value
            FROM ({proxy}) WHERE op = 'u'
        """,
        "cdc_task_planning": f"""
            WITH shards AS (
              SELECT shard_id, count(*) AS n_records
              FROM ({proxy}) GROUP BY shard_id
            ), ranked AS (
              SELECT shard_id, n_records,
                     row_number() OVER (ORDER BY shard_id) AS rk,
                     count(*) OVER () AS n_total
              FROM shards
            )
            SELECT CAST(floor((rk - 1) / ceil(n_total / 3.0)) AS INT) AS task_id,
                   count(*) AS n_shards, CAST(sum(n_records) AS BIGINT) AS n_records,
                   min(shard_id) AS first_shard, max(shard_id) AS last_shard
            FROM ranked GROUP BY 1
        """,
        "cdc_task_assignment": f"""
            WITH plan AS (
              SELECT shard_id,
                     CAST(floor((row_number() OVER (ORDER BY shard_id) - 1)
                          / ceil(count(*) OVER () / 3.0)) AS INT) AS task_id
              FROM (SELECT DISTINCT shard_id FROM ({proxy}))
            )
            SELECT task_id, count(*) AS n_records,
                   min(ts_ms) AS min_ts_ms, max(ts_ms) AS max_ts_ms,
                   count(DISTINCT clip_id) AS n_clips
            FROM ({proxy}) p JOIN plan USING (shard_id)
            GROUP BY task_id
        """,
        "cdc_initial_lookback": f"""
            SELECT shard_id, count(*) AS n_records, min(ts_ms) AS first_ts_ms
            FROM ({proxy})
            WHERE ts_ms >= (SELECT max(ts_ms) - 3600000 FROM ({proxy}))
            GROUP BY shard_id
        """,
        "cdc_types_matrix": f"""
            WITH t AS (
              SELECT event_id,
                     't' || CAST(CAST(floor(value) AS INT) % 3 AS VARCHAR)
                         || 'a' AS ka,
                     CAST(floor(value) AS INT) AS va,
                     't' || CAST(user_id % 3 AS VARCHAR) || 'b' AS kb,
                     CAST(user_id AS INT) AS vb,
                     printf('%03dv', CAST(floor(value) AS INT) % 7) AS la,
                     printf('%03du', CAST(user_id % 9 AS INT)) AS lb,
                     CAST(floor(value) AS INT) AS iv,
                     CAST(user_id AS INT) AS uid,
                     op
              FROM ({proxy}) WHERE event_id < 1000
            ), m AS (
              SELECT *,
                     CASE WHEN iv % 5 <> 0 THEN iv END AS udt_a,
                     CASE WHEN uid % 4 <> 0 THEN op END AS udt_b
              FROM t
            )
            SELECT event_id,
                   CASE WHEN ka < kb THEN ka ELSE kb END AS tag_key_1,
                   CASE WHEN ka < kb THEN va ELSE vb END AS tag_val_1,
                   CASE WHEN ka < kb THEN kb ELSE ka END AS tag_key_2,
                   CASE WHEN ka < kb THEN vb ELSE va END AS tag_val_2,
                   CASE WHEN la < lb THEN 'v' ELSE 'u' END AS track_first,
                   CASE WHEN la < lb THEN 'u' ELSE 'v' END AS track_last,
                   iv AS tuple_f0,
                   op AS tuple_f1,
                   (udt_a IS NULL AND udt_b IS NULL) AS meta_is_null,
                   CASE WHEN udt_a IS NOT NULL OR udt_b IS NOT NULL
                        THEN udt_a END AS meta_a,
                   CAST(iv AS BIGINT) * 1000 AS time_us
            FROM m
        """,
        "cep_match_pattern": f"""
            WITH seqs AS (
              SELECT clip_id,
                     string_agg(op, '' ORDER BY ts_ms, event_id) AS seq
              FROM ({proxy}) GROUP BY clip_id
            )
            SELECT clip_id, CAST(length(seq) AS BIGINT) AS seq_len,
                   CAST(len(regexp_extract_all(seq, 'cu+d')) AS BIGINT)
                       AS n_matches
            FROM seqs
            WHERE len(regexp_extract_all(seq, 'cu+d')) > 0
        """,
        "cep_asof_join": f"""
            WITH p AS ({proxy}),
            lefts AS (
              SELECT clip_id, event_id, ts_ms FROM p WHERE op = 'd'
            ),
            rights AS (
              SELECT clip_id, ts_ms, arg_max(value, event_id) AS value
              FROM p WHERE op <> 'd' GROUP BY clip_id, ts_ms
            )
            SELECT l.clip_id, l.event_id, l.ts_ms,
                   r.value AS asof_value, r.ts_ms AS asof_ts
            FROM lefts l ASOF LEFT JOIN rights r
              ON l.clip_id = r.clip_id AND l.ts_ms >= r.ts_ms
        """,
        "cep_snapshot_asof": f"""
            WITH p AS ({proxy}),
            cut AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS c FROM p)
            SELECT clip_id, ts_ms, op, value FROM (
              SELECT clip_id, ts_ms, op, value,
                     row_number() OVER (PARTITION BY clip_id
                                        ORDER BY ts_ms DESC, event_id DESC)
                         AS rn
              FROM p, cut WHERE ts_ms <= c
            ) WHERE rn = 1 AND op <> 'd'
        """,
        "smt_extract_new_state": f"""
            SELECT clip_id, op, value, user_id, ts_ms
            FROM ({proxy}) WHERE op <> 'd'
        """,
        "cdc_generation_rollover": f"""
            SELECT CASE WHEN ts_ms < (SELECT (min(ts_ms) + max(ts_ms)) / 2
                                      FROM ({proxy}))
                        THEN 0 ELSE 1 END AS generation,
                   shard_id, count(*) AS n_records,
                   max(ts_ms) AS high_water_ts_ms
            FROM ({proxy}) GROUP BY 1, 2
        """,
        "multimodal_image_decode": """
            SELECT CAST(doc_id AS VARCHAR) AS item_id,
                   4 + doc_id % 5 AS width,
                   4 + doc_id % 4 AS height,
                   CAST(3 AS BIGINT) AS n_channels,
                   CAST(doc_id % 256 AS DOUBLE) AS mean_luma,
                   TRUE AS decode_ok
            FROM documents
        """,
        "multimodal_image_meta": """
            SELECT CAST(doc_id AS VARCHAR) AS item_id,
                   8 + ascii(substring(md5(text), 2, 1)) % 8 AS width,
                   8 + ascii(substring(md5(text), 1, 1)) % 8 AS height,
                   3 AS n_channels, TRUE AS decode_ok
            FROM documents
        """,
        "multimodal_video_frames": """
            SELECT CAST(doc_id AS VARCHAR) AS item_id,
                   f.i AS frame_index,
                   md5(substring(repeat(md5(text), 20), f.i * 256 + 1, 256))
                     AS frame_fingerprint
            FROM documents, (VALUES (0), (1)) f(i)
        """,
        # 32-byte md5 payload at 8 kHz ulaw (1 byte/sample): window 2 ms =
        # 16 bytes, hop 1 ms = 8 bytes -> segments at hex offsets 0/8/16
        "audio_segment": """
            SELECT CAST(doc_id AS VARCHAR) AS item_id,
                   CAST(s.i AS BIGINT) AS seg_idx,
                   CAST(s.i AS BIGINT) AS seg_start_ms,
                   substring(md5(text), s.i * 8 + 1, 16) AS seg_text,
                   CAST(16 AS BIGINT) AS seg_n_samples
            FROM documents, (VALUES (0), (1), (2)) s(i)
        """,
        "text_metrics": f"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(t) AS n_tokens,
                   len(list_filter(t, x -> lower(x) IN {_STOPWORDS_SQL})) AS n_stopwords,
                   len(list_distinct(t)) AS n_distinct_tokens,
                   CAST(list_sum(list_transform(t, x -> length(x))) * 100
                        // greatest(len(t), 1) AS BIGINT) AS mean_token_len_x100,
                   CASE WHEN m = 0 THEN 'und'
                        WHEN h_fr = m THEN 'fr'
                        WHEN h_es = m THEN 'es'
                        WHEN h_en = m THEN 'en'
                        ELSE 'de' END AS lang_pred,
                   list_aggregate(g, 'min') AS fp_min,
                   list_aggregate(g, 'max') AS fp_max,
                   {pii_count_sql},
                   n_pii_email + n_pii_ssn + n_pii_ipv4 + n_pii_phone AS n_pii,
                   md5({pii_red_sql}) AS pii_redacted_md5,
                   CAST(floor((len(t) - len(list_distinct(t))) * 1000
                        / greatest(len(t), 1)) AS BIGINT) AS dup_word_frac_x1000,
                   CAST(floor((len(l) - len(list_distinct(l))) * 1000
                        / greatest(len(l), 1)) AS BIGINT) AS dup_line_frac_x1000,
                   CAST(floor(
                     (CASE WHEN len(t) >= 2 THEN
                        list_max(list_transform(list_distinct(bg),
                                 x -> len(list_filter(bg, y -> y = x))))
                      ELSE 0 END) * 1000 / greatest(len(bg), 1)
                   ) AS BIGINT) AS top_bigram_frac_x1000
            FROM (
              SELECT doc_id, text, pii_text, t, h_en, h_fr, h_es, h_de,
                     greatest(h_en, h_fr, h_es, h_de) AS m,
                     list_transform(
                       range(1, greatest(length(text) - 7, 1) + 1),
                       i -> md5(text[i : i + 7])
                     ) AS g,
                     list_filter(string_split(text, chr(10)),
                                 x -> trim(x) <> '') AS l,
                     list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                                    i -> t[i] || ' ' || t[i + 1]) AS bg
              FROM (SELECT doc_id, text, {pii_text_sql} AS pii_text,
                           {_TOKS} AS t, {hits_l_sql}
                    FROM documents)
            )
        """,
        # the three iceberg_* rows read the deterministic 4-snapshot
        # _events_iceberg table (see its docstring for the snapshot plan);
        # snapshot ids == sequence numbers, so plain SQL over `events`
        # reproduces each surface exactly
        "iceberg_mor_reads": """
            SELECT 'asof2' AS read_kind, event_id, user_id, event_type,
                   epoch_ms(ts) AS ts_ms, value
            FROM events WHERE event_id % 3 IN (0, 1)
            UNION ALL
            SELECT 'current' AS read_kind, event_id, user_id, event_type,
                   epoch_ms(ts) AS ts_ms, value
            FROM events
            WHERE NOT (event_id % 10 = 3 AND event_id % 3 IN (0, 1))
        """,
        "iceberg_pruned_reads": """
            SELECT 'bucket' AS read_kind, event_id, user_id, event_type,
                   epoch_ms(ts) AS ts_ms, value
            FROM events WHERE user_id = 7
            UNION ALL
            SELECT 'clustered' AS read_kind, event_id, user_id, event_type,
                   epoch_ms(ts) AS ts_ms, value
            FROM events WHERE event_id BETWEEN 1000 AND 1400
        """,
        "iceberg_read_changes": """
            SELECT 'appended' AS read_kind, event_id, user_id,
                   epoch_ms(ts) AS ts_ms, value,
                   'APPEND' AS change_type,
                   CAST(NULL AS INTEGER) AS change_ordinal,
                   CAST(CASE WHEN event_id % 3 = 1 THEN 2 ELSE 4 END
                        AS BIGINT) AS commit_snapshot_id,
                   CAST(CASE WHEN event_id % 3 = 1 THEN 2 ELSE 4 END
                        AS BIGINT) AS commit_sequence_number,
                   CAST(CASE WHEN event_id % 3 = 1 THEN 2000 ELSE 4000 END
                        AS BIGINT) AS commit_timestamp_ms
            FROM events WHERE event_id % 3 IN (1, 2)
            UNION ALL
            SELECT 'changelog', event_id, user_id, epoch_ms(ts), value,
                   'INSERT',
                   CAST(CASE event_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 1
                        ELSE 3 END AS INTEGER),
                   CAST(CASE event_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2
                        ELSE 4 END AS BIGINT),
                   CAST(CASE event_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2
                        ELSE 4 END AS BIGINT),
                   CAST(CASE event_id % 3 WHEN 0 THEN 1000 WHEN 1 THEN 2000
                        ELSE 4000 END AS BIGINT)
            FROM events
            UNION ALL
            SELECT 'changelog', event_id, user_id, epoch_ms(ts), value,
                   'DELETE', CAST(2 AS INTEGER), CAST(3 AS BIGINT),
                   CAST(3 AS BIGINT), CAST(3000 AS BIGINT)
            FROM events
            WHERE event_id % 10 = 3 AND event_id % 3 IN (0, 1)
        """,
        "dedup_exact": r"""
            SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                     AS doc_fingerprint,
                   min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "dedup_ngram_jaccard": f"""
            WITH sh AS (
              SELECT doc_id,
                     CASE WHEN len(t) >= 1 THEN list_distinct(t)
                          ELSE [array_to_string(t, ' ')] END AS s
              FROM (SELECT doc_id, {_TOKS_L} AS t
                    FROM documents WHERE doc_id < 200)
            ), ex AS (
              SELECT doc_id, unnest(s) AS g, len(s) AS n FROM sh
            ), pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS inter,
                     any_value(a.n) AS na, any_value(b.n) AS nb
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(inter / greatest(na + nb - inter, 1), 4) AS jaccard
            FROM pairs
            WHERE inter / greatest(na + nb - inter, 1) >= 0.5
        """,
        # min-label reachability: the component minimum m propagates along
        # every edge (m < target always holds for non-min nodes), so
        # min(label) per node is exactly the Spark large-star/small-star
        # result; the r.label < e.v guard only prunes non-minimal labels.
        "dedup_clusters": f"""
            WITH RECURSIVE sh AS (
              SELECT doc_id,
                     CASE WHEN len(t) >= 1 THEN list_distinct(t)
                          ELSE [array_to_string(t, ' ')] END AS s
              FROM (SELECT doc_id, {_TOKS_L} AS t
                    FROM documents WHERE doc_id < 200)
            ), ex AS (
              SELECT doc_id, unnest(s) AS g, len(s) AS n FROM sh
            ), pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS inter,
                     any_value(a.n) AS na, any_value(b.n) AS nb
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), jp AS (
              SELECT id_a, id_b FROM pairs
              WHERE inter / greatest(na + nb - inter, 1) >= 0.5
            ), edges AS (
              SELECT id_a AS u, id_b AS v FROM jp
              UNION
              SELECT id_b, id_a FROM jp
            ), reach(node, label) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
              UNION
              SELECT e.v, r.label FROM reach r
              JOIN edges e ON e.u = r.node WHERE r.label < e.v
            )
            SELECT node AS doc_id, min(label) AS cluster_id
            FROM reach GROUP BY node
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_sum(list_transform(range(1, 65),
                       i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
                     / greatest(
                         sqrt(list_sum(list_transform(range(1, 65),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                       * sqrt(list_sum(list_transform(range(1, 65),
                           i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))),
                         1e-30) AS cosine
              FROM embeddings e, q WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id, rank FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM scored
            ) WHERE rank <= 10
        """,
        "embedding_near_dup": """
            WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
            scored AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_sum(list_transform(range(1, 65),
                       i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                     / greatest(
                         sqrt(list_sum(list_transform(range(1, 65),
                           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
                       * sqrt(list_sum(list_transform(range(1, 65),
                           i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))),
                         1e-30) AS cosine
              FROM v a JOIN v b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(cosine, 4) AS cosine
            FROM scored WHERE cosine >= 0.35
        """,
    }
