"""Connect router SMT analogs (operators/smt.py): RegexRouter whole-
string matching + capture rewrites, TimestampRouter templating, NULL
safety, and shuffle-free plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.operators.smt import (
    route_topic_regex,
    route_topic_timestamp,
)


def _records(spark):
    rows = [
        ("prefix.ks.clips", "k1", 1_700_000_000_000),
        ("prefix.ks.transcripts", "k2", 1_700_086_400_000),
        ("other.ks.clips", "k3", None),
    ]
    return spark.createDataFrame(
        [(t, k, {"ts_ms": ts}) for t, k, ts in rows],
        "topic string, key string, value struct<ts_ms: long>",
    )


def test_regex_router_whole_string_and_captures(spark):
    out = {
        r["key"]: r["topic"]
        for r in route_topic_regex(
            _records(spark), r"prefix\.(.*)", "cdc.$1"
        ).collect()
    }
    assert out["k1"] == "cdc.ks.clips"
    assert out["k2"] == "cdc.ks.transcripts"
    # Connect semantics: pattern must match the ENTIRE topic
    assert out["k3"] == "other.ks.clips"
    # a substring match alone must not rewrite (anchoring pinned)
    sub = {
        r["key"]: r["topic"]
        for r in route_topic_regex(_records(spark), r"ks", "X").collect()
    }
    assert sub["k1"] == "prefix.ks.clips"


def test_timestamp_router_template_and_null_ts(spark):
    out = {
        r["key"]: r["topic"]
        for r in route_topic_timestamp(
            _records(spark),
            topic_format="${topic}-${timestamp}",
            timestamp_format="yyyyMMdd",
        ).collect()
    }
    assert out["k1"] == "prefix.ks.clips-20231114"
    assert out["k2"] == "prefix.ks.transcripts-20231115"
    # NULL timestamp: row passes through (documented streaming-safe choice)
    assert out["k3"] == "other.ks.clips"
    # arbitrary template order / literals
    out2 = {
        r["key"]: r["topic"]
        for r in route_topic_timestamp(
            _records(spark),
            topic_format="dt=${timestamp}/t=${topic}",
            timestamp_format="yyyy-MM-dd",
        ).collect()
    }
    assert out2["k1"] == "dt=2023-11-14/t=prefix.ks.clips"


def test_routers_add_no_exchange(spark):
    df = _records(spark)
    for routed in (
        route_topic_regex(df, r"prefix\.(.*)", "cdc.$1"),
        route_topic_timestamp(df),
    ):
        plan = routed._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_routers_compose_with_extract_smt(spark):
    """RegexRouter chained after the envelope-unwrap SMT, the standard
    Connect transform chain shape."""
    env = spark.createDataFrame(
        [
            (
                "prefix.ks.clips",
                "k1",
                {"op": "c", "ts_ms": 1_700_000_000_000, "after": {"clip_id": "a"}},
            )
        ],
        "topic string, key string, "
        "value struct<op: string, ts_ms: long, after: struct<clip_id: string>>",
    )
    from scylla_cdc_source_connector_spark.operators.smt import (
        extract_new_record_state,
    )

    flat = extract_new_record_state(env)
    routed = route_topic_regex(flat, r"prefix\.ks\.(.*)", "train.$1")
    row = routed.collect()[0]
    assert row["topic"] == "train.clips" and row["clip_id"] == "a"


def _env_with_delete(spark):
    return spark.createDataFrame(
        [
            (
                "t",
                "k1",
                {
                    "op": "c",
                    "ts_ms": 5,
                    "source": {"ts_ms": 3},
                    "after": {"clip_id": "a", "transcript": "hi"},
                },
            ),
            (
                "t",
                "k2",
                {
                    "op": "d",
                    "ts_ms": 9,
                    "source": {"ts_ms": 7},
                    "after": None,
                },
            ),
        ],
        "topic string, key string, value struct<op: string, ts_ms: long, "
        "source: struct<ts_ms: long>, "
        "after: struct<clip_id: string, transcript: string>>",
    )


def test_extract_delete_handling_modes(spark):
    from scylla_cdc_source_connector_spark.operators.smt import (
        extract_new_record_state,
    )

    env = _env_with_delete(spark)
    # drop (default): delete rows removed
    assert extract_new_record_state(env).count() == 1
    # none: kept as null-filled rows, no marker column
    kept = extract_new_record_state(env, delete_handling="none")
    assert kept.count() == 2 and "__deleted" not in kept.columns
    # rewrite: kept + Debezium's STRING __deleted marker
    rw = {
        r["key"]: r
        for r in extract_new_record_state(
            env, delete_handling="rewrite"
        ).collect()
    }
    assert rw["k1"]["__deleted"] == "false" and rw["k1"]["clip_id"] == "a"
    assert rw["k2"]["__deleted"] == "true" and rw["k2"]["clip_id"] is None
    import pytest as _p

    with _p.raises(ValueError):
        extract_new_record_state(env, delete_handling="bogus")


def test_extract_add_fields_and_headers(spark):
    from scylla_cdc_source_connector_spark.operators.smt import (
        extract_new_record_state,
    )

    env = _env_with_delete(spark)
    out = extract_new_record_state(
        env,
        add_fields=("op:operation", "ts_ms", "source.ts_ms"),
        add_headers=("op",),
        delete_handling="rewrite",
    )
    rows = {r["key"]: r for r in out.collect()}
    r1 = rows["k1"]
    # Debezium naming: __<alias>, dots -> underscores
    assert r1["__operation"] == "c" and r1["__ts_ms"] == 5
    assert r1["__source_ts_ms"] == 3
    assert r1["headers"][0]["key"] == "__op" and r1["headers"][0]["value"] == "c"
    assert rows["k2"]["__operation"] == "d" and rows["k2"]["__deleted"] == "true"


def test_heartbeat_kafka_records(spark, tmp_path):
    """Heartbeat parquet -> Debezium heartbeat-topic wire rows: topic
    __debezium-heartbeat.<prefix>, serverName key, {ts_ms} value,
    progress metadata in headers."""
    import json as _json
    import os

    from scylla_cdc_source_connector_spark.config import (
        EngineConfig,
        IncludeMode,
    )
    from scylla_cdc_source_connector_spark.operators.kafka_records import (
        heartbeat_kafka_records,
    )
    from scylla_cdc_source_connector_spark.streaming.sink import (
        HEARTBEAT_SCHEMA,
    )

    cfg = EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_dir=str(tmp_path / "out"),
        lineage_dir=str(tmp_path / "lineage"),
    )
    hb_dir = os.path.join(cfg.output_dir, "_heartbeat", "batch_id=3")
    spark.createDataFrame(
        [("cdc.ks.clips", "s-1", 0, 123_456, 3, 42, 1_700_000_000_000)],
        HEARTBEAT_SCHEMA,
    ).write.mode("overwrite").parquet(hb_dir)
    rows = heartbeat_kafka_records(spark, cfg).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["topic"] == "__debezium-heartbeat.cdc"
    assert _json.loads(bytes(r["key"]).decode()) == {"serverName": "cdc"}
    assert _json.loads(bytes(r["value"]).decode()) == {
        "ts_ms": 1_700_000_000_000
    }
    hdrs = {h["key"]: bytes(h["value"]).decode() for h in r["headers"]}
    assert hdrs["shard_id"] == "s-1" and hdrs["batch_id"] == "3"
    # empty heartbeat dir: empty wire stream, stable schema
    cfg2 = EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        checkpoint_dir=str(tmp_path / "c2"),
        output_dir=str(tmp_path / "o2"),
        lineage_dir=str(tmp_path / "l2"),
    )
    empty = heartbeat_kafka_records(spark, cfg2)
    assert empty.count() == 0
    assert [c for c in empty.columns] == ["topic", "key", "value", "headers"]
