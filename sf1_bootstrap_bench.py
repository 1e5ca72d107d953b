#!/usr/bin/env python
"""Initial-snapshot bootstrap at sf1 scale (BENCH_sf1_bootstrap.json).

The round-5 final-session surface `run_initial_snapshot_then_stream`
(streaming/engine.py — Debezium `snapshot.mode=initial` for a finite-
retention changelog) was validated at sf0.1 in the closing suite; this
campaign drives the full bootstrap STORY at the sf1 scale the round's
credibility rests on (same 2.21M-row / 15.9 GB input as scale10_bench):

  1. commit chunks 1-7 as a 7-snapshot jarless Iceberg changelog and
     drain them through the exactly-once sink (consumer A);
  2. maintain the compacted latest-state mirror — its `_applied`
     markers now record hwm = 7;
  3. commit chunks 8-10 (the changelog advances past the mirror);
  4. consumer A catches up (8..10) so its materialized state is the
     full-history truth;
  5. a FRESH consumer B bootstraps: op='r' backfill of every live
     mirror row in idempotent negative-batch-id chunks, then the
     exact sequence-number handoff streams ONLY snapshots 8..10;
  6. a rerun of the bootstrap is a no-op (nothing re-emitted);
  7. parity: materialize_latest over B's emitted stream (backfill +
     tail) must equal materialize_latest over A's full-history drain —
     same live keys, same per-row content hash.

Parity is the point: it proves a consumer that NEVER saw snapshots 1-7
converges to the identical final state through the mirror handoff —
the reference connector cannot do this at all (its snapshot source is
a no-op, ScyllaSnapshotChangeEventSource.java:24-48; a new consumer of
an expired-retention topic is simply stuck).

Input on tmpfs, all sink/mirror output on real disk (/tmp), local[32]
(scale10_bench conventions).  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale10_bench import IN_DIR, _session, prepare_input  # noqa: E402

ICE_LOC = os.environ.get(
    "SPARK_GRAFT_SF1_BOOT_ICE", "/dev/shm/sccs_sf1_boot_iceberg"
)
ROOT = os.environ.get("SPARK_GRAFT_SF1_BOOT_ROOT", "/tmp/sccs_sf1_boot")
SPLIT = 7  # snapshots committed before the mirror is cut


def main() -> None:
    from pyspark.sql import functions as F

    from scylla_cdc_source_connector_spark.config import (
        EngineConfig,
        IncludeMode,
    )
    from scylla_cdc_source_connector_spark.schemas import DEFAULT_TABLE
    from scylla_cdc_source_connector_spark.sources import iceberg_meta
    from scylla_cdc_source_connector_spark.streaming import apply as apply_mod
    from scylla_cdc_source_connector_spark.streaming.engine import (
        run_iceberg_meta_stream,
        run_initial_snapshot_then_stream,
    )
    from scylla_cdc_source_connector_spark.streaming.sink import read_emitted

    _, rows = prepare_input()
    chunks = sorted(
        os.path.join(IN_DIR, f)
        for f in os.listdir(IN_DIR)
        if f.endswith(".parquet")
    )

    shutil.rmtree(ICE_LOC, ignore_errors=True)
    shutil.rmtree(ROOT, ignore_errors=True)
    iceberg_meta.create_table(ICE_LOC, DEFAULT_TABLE.changelog_schema())
    for i, f in enumerate(chunks[:SPLIT]):
        iceberg_meta.append_files(ICE_LOC, [f], timestamp_ms=(i + 1) * 1000)

    spark = _session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    def cfg_for(name: str) -> EngineConfig:
        return EngineConfig(
            include_before=IncludeMode.FULL,
            include_after=IncludeMode.FULL,
            checkpoint_dir=f"{ROOT}/{name}/ck",
            output_dir=f"{ROOT}/{name}/out",
            lineage_dir=f"{ROOT}/{name}/lin",
        )

    out: dict = {
        "metric": "sf1 initial-snapshot bootstrap + handoff",
        "input_rows": rows,
        "split_at_snapshot": SPLIT,
    }
    t: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        r = fn()
        t[name] = round(time.time() - t0, 3)
        print(f"[sf1-boot] {name}: {t[name]}s", file=sys.stderr, flush=True)
        return r

    cfg_a = cfg_for("a")
    res7 = timed(
        "drain_1_to_7", lambda: run_iceberg_meta_stream(spark, cfg_a, ICE_LOC)
    )
    out["snapshots_1_to_7"] = len(res7["consumed"])
    emitted_a_7 = read_emitted(spark, cfg_a).count()
    out["a_emitted_1_to_7"] = emitted_a_7

    mirror = f"{ROOT}/mirror"
    timed(
        "mirror_maintain",
        lambda: iceberg_meta.maintain_latest_state_mirror(
            spark, cfg_a, mirror
        ),
    )
    live_at_hwm = iceberg_meta.read_table(spark, mirror).count()
    out["mirror_live_rows_at_hwm"] = live_at_hwm

    for i, f in enumerate(chunks[SPLIT:], start=SPLIT):
        iceberg_meta.append_files(ICE_LOC, [f], timestamp_ms=(i + 1) * 1000)
    tail_rows = (
        spark.read.parquet(*chunks[SPLIT:]).count()
    )
    out["tail_rows_8_to_10"] = tail_rows

    res_rest = timed(
        "drain_8_to_10_consumer_a",
        lambda: run_iceberg_meta_stream(spark, cfg_a, ICE_LOC),
    )
    out["snapshots_8_to_10"] = len(res_rest["consumed"])
    emitted_a_total = read_emitted(spark, cfg_a).count()
    tail_envelopes = emitted_a_total - emitted_a_7
    out["a_emitted_total"] = emitted_a_total
    out["tail_envelopes_8_to_10"] = tail_envelopes

    cfg_b = cfg_for("b")
    boot = timed(
        "bootstrap_consumer_b",
        lambda: run_initial_snapshot_then_stream(
            spark, cfg_b, mirror, ICE_LOC
        ),
    )
    out["snapshot_rows"] = boot["snapshot_rows"]
    out["handoff_sequence"] = boot["snapshot_hwm"]
    b_emitted = read_emitted(spark, cfg_b).count()
    out["b_emitted_total"] = b_emitted
    out["b_emitted_expected"] = live_at_hwm + tail_envelopes
    assert boot["snapshot_rows"] == live_at_hwm, (
        boot["snapshot_rows"],
        live_at_hwm,
    )
    assert b_emitted == live_at_hwm + tail_envelopes, (
        b_emitted,
        live_at_hwm,
        tail_envelopes,
    )

    boot2 = timed(
        "bootstrap_rerun_noop",
        lambda: run_initial_snapshot_then_stream(
            spark, cfg_b, mirror, ICE_LOC
        ),
    )
    b_emitted2 = read_emitted(spark, cfg_b).count()
    out["rerun_snapshot_rows"] = boot2["snapshot_rows"]
    out["rerun_emitted_total"] = b_emitted2
    assert b_emitted2 == b_emitted, (b_emitted2, b_emitted)

    # Parity: both consumers materialize to the identical final state.
    def latest_fingerprint(cfg: EngineConfig, name: str):
        tgt = f"{ROOT}/{name}/latest"
        apply_mod.materialize_latest(spark, cfg, target_dir=tgt)
        lat = apply_mod.read_latest(spark, tgt)
        cols = [
            c
            for c in lat.columns
            if not c.startswith("__") and c != "bucket"
        ]
        row = lat.select(
            F.count("*").alias("n"),
            F.expr(
                "bit_xor(xxhash64({}))".format(
                    ", ".join(f"`{c}`" for c in sorted(cols))
                )
            ).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"])

    n_a, h_a = timed("materialize_a", lambda: latest_fingerprint(cfg_a, "a"))
    n_b, h_b = timed("materialize_b", lambda: latest_fingerprint(cfg_b, "b"))
    out["latest_rows_a"] = n_a
    out["latest_rows_b"] = n_b
    out["latest_hash_match"] = bool(n_a == n_b and h_a == h_b)
    assert out["latest_hash_match"], (n_a, h_a, n_b, h_b)

    out["timings_sec"] = t
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
