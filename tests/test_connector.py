"""Multi-table orchestration (streaming/connector.py): one connector run
over a list of tables — per-table topics, independent per-shard offsets,
merged lineage, exactly-once per table across a crash/restart.

Reference parity: `scylla.table.names` list
(ScyllaConnectorConfig.java:130-139), per-table topics
(ScyllaTopicSelector.java:12-24), merged task groupings
(ScyllaMasterTransport.java:102-122)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
from scylla_cdc_source_connector_spark.fixtures import (
    FixtureSpec,
    make_changelog,
    write_changelog_chunk,
)
from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes
from scylla_cdc_source_connector_spark.streaming import sink as sink_mod
from scylla_cdc_source_connector_spark.streaming.connector import (
    TableSpec,
    await_tables,
    connector_lineage,
    read_table_emitted,
    run_tables,
    table_cfg,
)


def _cfg(tmp) -> EngineConfig:
    return EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        checkpoint_dir=f"{tmp}/conn/ckpt",
        output_dir=f"{tmp}/conn/out",
        lineage_dir=f"{tmp}/conn/lineage",
    )


def _chunks(pdf, d: str, n: int) -> None:
    os.makedirs(d, exist_ok=True)
    size = (len(pdf) + n - 1) // n
    for i in range(n):
        write_changelog_chunk(
            pdf.iloc[i * size : (i + 1) * size], f"{d}/chunk-{i:03d}.parquet"
        )


@pytest.fixture(scope="module")
def two_tables(tmp_root):
    a = make_changelog(FixtureSpec(n_events=600, n_clips=80, n_shards=4))
    b = make_changelog(FixtureSpec(n_events=400, n_clips=50, n_shards=2))
    da, db = f"{tmp_root}/conn_a", f"{tmp_root}/conn_b"
    _chunks(a.sort_values("cdc$time_us", kind="stable"), da, 2)
    _chunks(b.sort_values("cdc$time_us", kind="stable"), db, 2)
    return (a, da), (b, db)


def test_two_tables_two_topics_merged_lineage(spark, tmp_root, two_tables):
    (pa, da), (pb, db) = two_tables
    cfg = _cfg(tmp_root)
    specs = [TableSpec(da, name="clips_a"), TableSpec(db, name="clips_b")]
    qs = run_tables(spark, cfg, specs, max_files_per_trigger=1)
    assert set(qs) == {"clips_a", "clips_b"}
    await_tables(qs)

    # per-table emitted rows match the batch reference, on per-table topics
    for spec, d in ((specs[0], da), (specs[1], db)):
        got = read_table_emitted(spark, cfg, spec)
        ref = cdc_envelopes(
            spark.read.parquet(d),
            table_cfg(cfg, spec.name),
            processing_ts_ms=F.lit(0),
        )
        assert got.count() == ref.count(), spec.name
        topics = {r["topic"] for r in got.select("topic").distinct().collect()}
        assert topics == {f"cdc.audio.{spec.name}"}, spec.name

    # merged lineage: every record carries its table; per-shard offsets
    # stay independent per table (table A has 4 shards, B has 2)
    merged = connector_lineage(cfg, specs)
    by_table = {}
    for rec in merged:
        for s in rec["shards"]:
            by_table.setdefault(rec["table"], set()).add(s["shard_id"])
    assert len(by_table["clips_a"]) == 4
    assert len(by_table["clips_b"]) == 2

    # duplicate table names refuse up front
    with pytest.raises(ValueError, match="duplicate"):
        run_tables(spark, cfg, [TableSpec(da, name="x"), TableSpec(db, name="x")])


def test_exactly_once_across_restart_per_table(spark, tmp_root, two_tables):
    """Crash table B between output write and commit, feed BOTH tables
    more data, restart the whole connector: replay is idempotent per
    table — no loss, no dupes, and table A is untouched by B's crash."""
    (pa, da), (pb, db) = two_tables
    cfg = _cfg(tmp_root)
    specs = [TableSpec(da, name="clips_a"), TableSpec(db, name="clips_b")]
    cfg_b = table_cfg(cfg, "clips_b")

    # simulate the crash on table B's most recent batch
    bids = sink_mod.committed_batch_ids(cfg_b)
    assert bids, "first run must have committed (runs after the first test)"
    last = bids[-1]
    os.remove(sink_mod.lineage_path(cfg_b, last))
    for p in (
        os.path.join(cfg_b.checkpoint_dir, "commits", str(last)),
        os.path.join(cfg_b.checkpoint_dir, "commits", f".{last}.crc"),
    ):
        if os.path.exists(p):
            os.remove(p)

    # more data for both tables, then restart the connector
    extra_a = make_changelog(FixtureSpec(n_events=200, n_clips=30, n_shards=4))
    extra_b = make_changelog(FixtureSpec(n_events=150, n_clips=20, n_shards=2))
    write_changelog_chunk(extra_a, f"{da}/chunk-late.parquet")
    write_changelog_chunk(extra_b, f"{db}/chunk-late.parquet")
    qs = run_tables(spark, cfg, specs, max_files_per_trigger=1)
    await_tables(qs)

    for spec, d in ((specs[0], da), (specs[1], db)):
        got = read_table_emitted(spark, cfg, spec)
        ref = cdc_envelopes(
            spark.read.parquet(d),
            table_cfg(cfg, spec.name),
            processing_ts_ms=F.lit(0),
        )
        assert got.count() == ref.count(), spec.name
        keys = [
            (r["clip_id"], r["cdc$time_us"], r["op"])
            for r in got.select(
                "clip_id", "`cdc$time_us`", F.col("value.op").alias("op")
            ).collect()
        ]
        assert len(keys) == len(set(keys)), f"duplicate emissions in {spec.name}"
