"""Kafka wire-record serialization of envelope rows.

The engine's envelopes are Kafka-record-SHAPED (topic, key struct, value
struct, headers — north_rule); the reference hands the equivalent
SourceRecords to Kafka Connect, whose converter serializes key/value to
JSON or Avro(+Schema Registry) bytes before the producer writes them
(README.md:613-750 shows both outputs).  This module is that converter:
it turns envelope rows into the exact column contract of Spark's Kafka
sink — `topic: string, key: binary, value: binary, headers:
array<struct<key:string, value:binary>>` — so the production emit is
literally

    kafka_records(env, fmt=...).write.format("kafka")
        .option("kafka.bootstrap.servers", ...).option("topic", ...)

(or writeStream; the Kafka sink reads those column names).  No Kafka
broker or kafka-sql jar ships in this container, so tests pin the column
contract + byte round-trips instead of a broker integration.

fmt="json": pure-JVM `to_json` (whole-stage codegen, zero Python).
fmt="avro": the pure-Python spec encoder (functions/avro.py) with
optional Confluent Schema-Registry wire framing — the analog of the
reference's Avro converter ITs (ScyllaTypesAllAvroConnectorIT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the Spark Kafka sink's expected columns (spark-kafka-sql contract)
KAFKA_SINK_COLUMNS = ("topic", "key", "value", "headers")


def kafka_records(
    env: DataFrame,
    *,
    fmt: str = "json",
    key_schema_id: int | None = None,
    value_schema_id: int | None = None,
) -> DataFrame:
    """Envelope rows → Kafka-sink-ready rows (KAFKA_SINK_COLUMNS plus the
    cdc$stream_id passthrough, kept so a custom partitioner / sorted
    write can preserve per-shard ordering like the sink's ordered emit).

    Null key structs (kafka-key placement off) serialize to null key
    bytes — a valid Kafka record (log-compaction semantics simply don't
    apply), matching the Connect converter."""
    if fmt not in ("json", "avro"):
        raise ValueError(f"unknown kafka record format: {fmt!r}")
    key_dt = env.schema["key"].dataType
    value_dt = env.schema["value"].dataType
    if fmt == "json":
        key_bytes = F.when(
            F.col("key").isNotNull(), F.encode(F.to_json("key"), "utf-8")
        )
        value_bytes = F.encode(F.to_json("value"), "utf-8")
    else:
        from scylla_cdc_source_connector_spark.functions.avro import (
            to_avro_udf,
        )

        key_enc = to_avro_udf(key_dt, schema_id=key_schema_id)
        value_enc = to_avro_udf(value_dt, schema_id=value_schema_id)
        key_bytes = F.when(F.col("key").isNotNull(), key_enc(F.col("key")))
        value_bytes = value_enc(F.col("value"))
    headers = F.when(
        F.col("headers").isNotNull(),
        F.transform(
            F.col("headers"),
            lambda h: F.struct(
                h["k"].alias("key"), F.encode(h["v"], "utf-8").alias("value")
            ),
        ),
    )
    return env.select(
        "topic",
        key_bytes.alias("key"),
        value_bytes.alias("value"),
        headers.alias("headers"),
        F.col("`cdc$stream_id`"),
        F.col("`cdc$time_us`"),
        F.col("`cdc$batch_seq_no`"),
    )


def records_path(cfg, batch_id: int) -> str:
    import os

    return os.path.join(cfg.output_dir, "_records", f"batch_id={batch_id}")


def maintain_kafka_records(
    spark,
    cfg,
    *,
    fmt: str = "json",
    key_schema_id: int | None = None,
    value_schema_id: int | None = None,
) -> int:
    """Exactly-once Kafka-record emission: serialize every committed-but-
    unconverted envelope batch to wire records under
    `output_dir/_records/batch_id=N`, mirroring the sink's own protocol —
    only committed batches are consumed, each record dir is an idempotent
    overwrite keyed by the SINK batch id, and `_applied` markers
    (apply.py protocol) commit progress afterwards, so a crash anywhere
    re-converges.  Returns records written this pass.

    This is the converter stage Kafka Connect runs between the
    SourceRecord and the producer; with a broker present the same
    DataFrame goes to `.write.format("kafka")` instead of parquet — the
    column contract is identical (KAFKA_SINK_COLUMNS), and per-shard
    ordering is preserved by writing each batch sorted within its shard
    clustering like the sink's ordered emit."""
    import os

    from scylla_cdc_source_connector_spark.streaming import sink as sink_mod
    from scylla_cdc_source_connector_spark.streaming.apply import (
        _mark_applied,
        applied_batch_ids,
    )

    target = os.path.join(cfg.output_dir, "_records")
    done = set(applied_batch_ids(target))
    n_total = 0
    for bid in sink_mod.committed_batch_ids(cfg):
        if bid in done:
            continue
        out_dir = sink_mod.batch_output_path(cfg, bid)
        if not os.path.isdir(out_dir):  # empty/heartbeat batch
            _mark_applied(target, [bid], 0)
            continue
        env = spark.read.parquet(out_dir)
        rec = kafka_records(
            env,
            fmt=fmt,
            key_schema_id=key_schema_id,
            value_schema_id=value_schema_id,
        )
        (
            rec.sortWithinPartitions("`cdc$time_us`", "`cdc$batch_seq_no`")
            .write.mode("overwrite")
            .option("compression", cfg.output_compression)
            .parquet(records_path(cfg, bid))
        )
        import pyarrow.parquet as pq

        n = sum(
            pq.read_metadata(os.path.join(records_path(cfg, bid), f)).num_rows
            for f in os.listdir(records_path(cfg, bid))
            if f.endswith(".parquet")
        )
        _mark_applied(target, [bid], n)
        n_total += n
    return n_total


def read_kafka_records(spark, cfg):
    """All committed wire records (only batches whose conversion was
    marked applied — exactly-once like the emit stream)."""
    import os

    from scylla_cdc_source_connector_spark.streaming.apply import (
        applied_batch_ids,
    )

    target = os.path.join(cfg.output_dir, "_records")
    paths = [
        records_path(cfg, bid)
        for bid in applied_batch_ids(target)
        if os.path.isdir(records_path(cfg, bid))
    ]
    if not paths:
        return spark.createDataFrame(
            [],
            "topic string, key binary, value binary, "
            "headers array<struct<key:string,value:binary>>, "
            "`cdc$stream_id` string, `cdc$time_us` long, "
            "`cdc$batch_seq_no` int",
        )
    return spark.read.parquet(*paths)
