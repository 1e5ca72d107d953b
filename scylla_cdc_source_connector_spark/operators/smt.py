"""Post-transforms (SMT ports, SURVEY §2.6).

- extract_new_record_state ≙ transforms/ScyllaExtractNewRecordState.java:
  74-117 — unwrap the envelope to the row's new state (after.*), unwrapping
  legacy `.Cell` structs ({value: v} → v, :168-184); advanced mode values
  pass through.  Deletes become tombstones (null state) and are dropped by
  default like Debezium's drop.tombstones=true.
- flatten_columns ≙ transforms/ScyllaFlattenColumns.java:39-96 — unwrap
  Cell structs inside before/after only, keep the rest of the envelope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T



def _is_cell(field_type: T.DataType) -> bool:
    return (
        isinstance(field_type, T.StructType)
        and len(field_type.fields) == 1
        and field_type.fields[0].name == "value"
    )


def _unwrapped(col: Column, struct_type: T.StructType) -> Column:
    fields = []
    for f in struct_type.fields:
        if _is_cell(f.dataType):
            fields.append(col[f.name]["value"].alias(f.name))
        else:
            fields.append(col[f.name].alias(f.name))
    return F.when(col.isNotNull(), F.struct(*fields))


def extract_new_record_state(
    envelopes: DataFrame,
    *,
    drop_tombstones: bool = True,
    delete_handling: str = "drop",
    add_fields: tuple[str, ...] = (),
    add_headers: tuple[str, ...] = (),
) -> DataFrame:
    """Envelope rows → flat new-state rows (one column per base column).
    Cell structs are unwrapped.

    The underlying Debezium transform's standard options (the reference
    calls `io.debezium.transforms.ExtractNewRecordState` underneath,
    `transforms/ScyllaExtractNewRecordState.java:74-117`):

    - `drop_tombstones` / `delete_handling` — what happens to op='d'
      envelopes (one envelope here covers Debezium's delete-record +
      tombstone pair): "drop" removes them, "none" keeps them as rows
      with all non-key columns null, "rewrite" keeps them AND adds a
      `__deleted` string column ("true"/"false" — Debezium's rewrite
      marker is a string, not a boolean).
    - `add_fields` — copy envelope metadata into the flat record as
      `__`-prefixed columns: each entry is an envelope value field path
      ("op", "ts_ms", "source.ts_ms") with an optional ":alias" rename
      ("op:operation" -> column `__operation`); dots become underscores
      (`__source_ts_ms`), exactly Debezium's naming.
    - `add_headers` — same paths, but emitted as a Kafka `headers`
      array<struct<key,value>> column (values stringified), composing
      with kafka_records' header serialization.
    """
    if delete_handling not in ("drop", "none", "rewrite"):
        raise ValueError(f"unknown delete_handling: {delete_handling!r}")
    after_t = None
    for f in envelopes.schema["value"].dataType.fields:
        if f.name == "after":
            after_t = f.dataType

    def _meta(spec: str):
        path, _, alias = spec.partition(":")
        name = "__" + (alias or path.replace(".", "_"))
        return F.col(f"value.{path}"), name

    out_cols = [F.col("topic"), F.col("key"), F.col("value.op").alias("op")]
    for f in after_t.fields:
        src = F.col(f"value.after.{f.name}")
        if _is_cell(f.dataType):
            src = src["value"]
        out_cols.append(src.alias(f.name))
    out_cols += [col.alias(name) for col, name in map(_meta, add_fields)]
    if add_headers:
        out_cols.append(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("key"),
                        col.cast("string").alias("value"),
                    )
                    for col, name in map(_meta, add_headers)
                ]
            ).alias("headers")
        )
    if delete_handling == "rewrite":
        out_cols.append(
            F.when(F.col("value.op") == "d", F.lit("true"))
            .otherwise(F.lit("false"))
            .alias("__deleted")
        )
    out = envelopes.select(*out_cols)
    if drop_tombstones and delete_handling == "drop":
        out = out.filter(F.col("op") != "d")
    return out.drop("op")


def flatten_columns(envelopes: DataFrame) -> DataFrame:
    """Unwrap Cell structs inside value.before / value.after, preserving the
    rest of the envelope (no-op for advanced-format envelopes)."""
    value_t: T.StructType = envelopes.schema["value"].dataType
    new_value_fields = []
    for f in value_t.fields:
        col = F.col(f"value.{f.name}")
        if f.name in ("before", "after") and isinstance(f.dataType, T.StructType):
            if any(_is_cell(sf.dataType) for sf in f.dataType.fields):
                col = _unwrapped(col, f.dataType)
        new_value_fields.append(col.alias(f.name))
    return envelopes.withColumn("value", F.struct(*new_value_fields))


def route_topic_regex(
    records: DataFrame, regex: str, replacement: str, *, topic_col: str = "topic"
) -> DataFrame:
    """Kafka Connect's standard `RegexRouter` SMT as a codegen column
    rewrite: when the ENTIRE topic matches `regex`, rewrite it with
    `replacement` ($1-style capture references, Java regex semantics —
    the same engine Connect uses); otherwise the row passes through
    unchanged.  Connect matches with `Pattern.matcher(topic).matches()`
    (whole-string), which the anchored `^(?:...)$` wrapper reproduces.

    Deployment analog: the reference emits `prefix.keyspace.table`
    topics (`ScyllaTopicSelector.java:12-24`) and its SMT chapter
    (`/root/reference/README.md:263,1156`) documents chaining Connect
    transforms downstream — RegexRouter is the stock Connect transform
    every such chain uses for topic renames; here it composes with
    `kafka_records` / `extract_new_record_state` on the same DataFrame.
    Zero shuffle — a projection over whatever plan produced the records.
    """
    anchored = f"^(?:{regex})$"
    t = F.col(topic_col)
    return records.withColumn(
        topic_col,
        F.when(
            t.rlike(anchored), F.regexp_replace(t, anchored, replacement)
        ).otherwise(t),
    )


def route_topic_timestamp(
    records: DataFrame,
    *,
    topic_format: str = "${topic}-${timestamp}",
    timestamp_format: str = "yyyyMMdd",
    ts_col: str = "value.ts_ms",
    topic_col: str = "topic",
) -> DataFrame:
    """Kafka Connect's `TimestampRouter` SMT: suffix (or otherwise
    template) the topic with the record timestamp — the standard daily-
    topic fan-out for retention tiering.  `topic_format` takes the
    Connect placeholders ${topic} and ${timestamp}; `timestamp_format`
    is a date pattern applied to the record's epoch-millis timestamp
    (Connect uses SimpleDateFormat; Spark's date_format covers the same
    yyyy/MM/dd/HH... fields used in practice).  Rows with a NULL
    timestamp keep their topic (Connect would NPE; passing through is
    the streaming-safe choice, documented here).  Zero shuffle.
    """
    stamp = F.date_format(
        F.timestamp_millis(F.col(ts_col).cast("long")), timestamp_format
    )
    parts: list = []
    rest = topic_format
    while rest:
        i_t, i_s = rest.find("${topic}"), rest.find("${timestamp}")
        nxt = min(x for x in (i_t, i_s) if x >= 0) if max(i_t, i_s) >= 0 else -1
        if nxt < 0:
            parts.append(F.lit(rest))
            break
        if nxt > 0:
            parts.append(F.lit(rest[:nxt]))
        if rest[nxt:].startswith("${topic}"):
            parts.append(F.col(topic_col))
            rest = rest[nxt + len("${topic}"):]
        else:
            parts.append(stamp)
            rest = rest[nxt + len("${timestamp}"):]
    routed = F.concat(*parts) if parts else F.col(topic_col)
    return records.withColumn(
        topic_col,
        F.when(F.col(ts_col).isNotNull(), routed).otherwise(F.col(topic_col)),
    )
