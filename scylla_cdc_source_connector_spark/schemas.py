"""Schemas and operation codes for the CDC changelog and output envelope.

Mirrors the reference's data model:
- CDC operation byte values: reference test
  CdcBatchPreimageMisalignmentIT.java:57-62 (PRE_IMAGE=0, ROW_UPDATE=1,
  ROW_INSERT=2, POST_IMAGE=9); ROW_DELETE / PARTITION_DELETE are consumed as
  enum cases at ScyllaChangesConsumer.java:207,212 — fixture codes 4 and 5
  per FIXTURES.md.
- Envelope shape {source, before, after, op, ts_ms}: built at
  ScyllaChangeRecordEmitter.java:577-610, schema ScyllaSchema.java:79-112.
- Input columns per BASELINE.json input_hint: clip_id, bytes, sr_hz, dur_ms,
  codec, transcript + cdc$ metadata columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# --- CDC operation codes (CdcBatchPreimageMisalignmentIT.java:57-62) -------
OP_PRE_IMAGE = 0
OP_ROW_UPDATE = 1
OP_ROW_INSERT = 2
OP_ROW_DELETE = 4
OP_PARTITION_DELETE = 5
OP_POST_IMAGE = 9

#: operations that represent a delta (dispatchable change), as opposed to an
#: image row.  Reference: the consume() switch ScyllaChangesConsumer.java:187-249.
DELTA_OPS = (OP_ROW_UPDATE, OP_ROW_INSERT, OP_ROW_DELETE, OP_PARTITION_DELETE)

#: Debezium Envelope.Operation codes (ScyllaChangeRecordEmitter.java:94-110)
OP_CODE_CREATE = "c"
OP_CODE_UPDATE = "u"
OP_CODE_DELETE = "d"

# --- base (payload) columns, per BASELINE.json input_hint -------------------
BASE_COLUMNS = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
#: primary-key columns of the audio_clips table (partition key only — no
#: clustering key, so partition deletes are single-row:
#: ScyllaChangesConsumer.isSinglePartitionDelete:271-283)
PK_COLUMNS = ["clip_id"]
NON_PK_COLUMNS = [c for c in BASE_COLUMNS if c not in PK_COLUMNS]


def _base_fields() -> list[T.StructField]:
    return [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
    ]


def changelog_schema() -> T.StructType:
    """Schema of the append-only changelog table (FIXTURES.md F2).

    One row per CDC log entry: metadata columns + base columns +
    cdc$deleted_<col> tri-state markers (ScyllaChangeRecordEmitter.java:42-47).
    """
    fields = [
        T.StructField("cdc$stream_id", T.StringType(), False),
        T.StructField("cdc$time", T.TimestampType(), False),
        T.StructField("cdc$time_us", T.LongType(), False),
        T.StructField("cdc$operation", T.IntegerType(), False),
        T.StructField("cdc$batch_seq_no", T.IntegerType(), False),
        T.StructField("generation", T.IntegerType(), False),
    ]
    fields += _base_fields()
    fields += [
        T.StructField(f"cdc$deleted_{c}", T.BooleanType(), True)
        for c in NON_PK_COLUMNS
    ]
    return T.StructType(fields)


def image_struct() -> T.StructType:
    """The before/after image struct: full base row (nullable columns)."""
    return T.StructType(_base_fields())


def key_struct() -> T.StructType:
    """Kafka key struct: PK columns in key-schema order
    (ScyllaSchema.computeKeySchema:155-184)."""
    return T.StructType([T.StructField("clip_id", T.StringType(), False)])


def source_struct() -> T.StructType:
    """Source metadata struct (ScyllaSourceInfoStructMaker.java:13-35)."""
    return T.StructType(
        [
            T.StructField("version", T.StringType(), False),
            T.StructField("connector", T.StringType(), False),
            T.StructField("name", T.StringType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField("ts_us", T.LongType(), False),
            T.StructField("snapshot", T.StringType(), False),
            T.StructField("db", T.StringType(), False),
            T.StructField("keyspace_name", T.StringType(), False),
            T.StructField("table_name", T.StringType(), False),
        ]
    )


def envelope_schema() -> T.StructType:
    """Kafka-record-shaped output row (SURVEY §1.1 "Output record";
    envelope fields per ScyllaChangeRecordEmitter.java:577-610)."""
    return T.StructType(
        [
            T.StructField("topic", T.StringType(), False),
            T.StructField("key", key_struct(), False),
            T.StructField(
                "value",
                T.StructType(
                    [
                        T.StructField("source", source_struct(), False),
                        T.StructField("before", image_struct(), True),
                        T.StructField("after", image_struct(), True),
                        T.StructField("op", T.StringType(), False),
                        T.StructField("ts_ms", T.LongType(), False),
                    ]
                ),
                False,
            ),
            T.StructField(
                "headers",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("k", T.StringType(), False),
                            T.StructField("v", T.StringType(), False),
                        ]
                    )
                ),
                True,
            ),
        ]
    )
