"""CQL → Spark type translation helpers (SURVEY §1.2 / operator P10).

The engine's own input table (input_hint) uses only scalars + binary, but
the reference translates the full CQL type matrix
(ScyllaSchema.computeColumnSchema, ScyllaSchema.java:297-430; value
conversion ScyllaChangeRecordEmitter.java:620-795).  These helpers pin the
non-trivial rules as reusable columnar expressions so a changelog carrying
collection/UDT columns gets the same record shapes the reference emits:

| CQL                       | rule                                            | reference |
|---------------------------|--------------------------------------------------|-----------|
| MAP<K,V>                  | array of {key, value} structs (NOT a Spark map — supports non-string keys like Connect's array encoding) | ScyllaSchema.java:351-389 |
| non-frozen LIST<V>        | stored as MAP<timeuuid, V>; emit values sorted by key (insertion order) | :357-368; emitter :687-717 |
| TUPLE<...>                | struct with Avro-safe field names field_0..field_N | :390-406; emitter :749-764 |
| UDT                       | named struct; all-null/empty → NULL              | :407-426; emitter :766-792 |
| DECIMAL/VARINT/DURATION/UUID/TIMEUUID/INET | stringified                     | :330-339; emitter :636-667 |
| TIME                      | int64 MICROSECONDS (deliberately not ms/int32)   | :304-310 |
| DATE                      | date (UTC calendar)                              | :302-303; emitter :656-663 |

All pure expression trees — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scalar CQL type → Spark SQL type name (ScyllaSchema.java:297-339)
CQL_SCALAR_TO_SPARK = {
    "ascii": "string",
    "text": "string",
    "varchar": "string",
    "int": "int",
    "bigint": "bigint",
    "counter": "bigint",
    "smallint": "smallint",
    "tinyint": "tinyint",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "blob": "binary",
    "timestamp": "timestamp",
    "date": "date",
    "time": "bigint",  # µs precision, NOT Connect Time (ScyllaSchema.java:304-310)
    "decimal": "string",  # stringified — lossless (ScyllaSchema.java:330-339)
    "varint": "string",
    "duration": "string",
    "uuid": "string",
    "timeuuid": "string",
    "inet": "string",
}


def map_to_entries(m: Column) -> Column:
    """MAP<K,V> → array<struct<key,value>> (the Connect encoding that
    supports non-string keys, ScyllaSchema.java:351-389).  Entry order is
    made deterministic by sorting on key."""
    return F.array_sort(
        F.transform(
            F.map_entries(m),
            lambda e: F.struct(e["key"].alias("key"), e["value"].alias("value")),
        )
    )


def nonfrozen_list_values(m: Column) -> Column:
    """Non-frozen LIST<V> arrives in the CDC log as MAP<timeuuid, V>; the
    reference emits the VALUES sorted by the timeuuid key = insertion
    order (ScyllaChangeRecordEmitter.java:687-717).  The key column here
    must sort in insertion order (time-ordered id); pass e.g. the
    timeuuid's timestamp component."""
    return F.transform(
        F.array_sort(
            F.map_entries(m),
            lambda a, b: F.when(a["key"] < b["key"], -1)
            .when(a["key"] > b["key"], 1)
            .otherwise(0),
        ),
        lambda e: e["value"],
    )


def tuple_to_struct(*elements: Column) -> Column:
    """TUPLE → struct with Avro-safe names field_0..field_N
    (ScyllaSchema.java:390-406)."""
    return F.struct(
        *[e.alias(f"field_{i}") for i, e in enumerate(elements)]
    )


def empty_udt_to_null(udt: Column, field_names: list[str]) -> Column:
    """UDT with every field null (Scylla's 'empty' value) → NULL struct
    (ScyllaChangeRecordEmitter.java:766-792)."""
    if not field_names:
        raise ValueError("empty_udt_to_null: field_names must be non-empty")
    any_set = F.lit(False)
    for f in field_names:
        any_set = any_set | udt[f].isNotNull()
    return F.when(udt.isNotNull() & any_set, udt)


def stringify(col: Column) -> Column:
    """DECIMAL / VARINT / DURATION / UUID / TIMEUUID / INET → string
    (lossless transport, ScyllaChangeRecordEmitter.java:636-667)."""
    return col.cast("string")


def time_to_micros(time_ns: Column) -> Column:
    """CQL TIME (ns since midnight) → int64 MICROSECONDS — the reference
    deliberately keeps µs precision instead of Connect Time's int32 ms
    (ScyllaSchema.java:304-310)."""
    return (time_ns / 1000).cast("bigint")
