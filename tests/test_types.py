"""CQL → Spark type-translation helper tests (SURVEY §1.2 / P10) — pins
the reference's non-trivial translation rules (map→entry-array,
non-frozen-list ordering, tuple field naming, empty-UDT nulling,
stringification, TIME µs precision)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.functions.types import (
    CQL_SCALAR_TO_SPARK,
    empty_udt_to_null,
    map_to_entries,
    nonfrozen_list_values,
    stringify,
    time_to_micros,
    tuple_to_struct,
)


def test_map_to_entries_sorted_nonstring_keys(spark):
    df = spark.createDataFrame(
        [({3: "c", 1: "a", 2: "b"},)], "m map<int,string>"
    )
    row = df.select(map_to_entries(F.col("m")).alias("e")).first()
    assert [(e["key"], e["value"]) for e in row["e"]] == [
        (1, "a"), (2, "b"), (3, "c"),
    ]


def test_nonfrozen_list_insertion_order(spark):
    # CDC log stores non-frozen LIST as map<timeuuid, V>; keys here stand
    # in as time-ordered ids — values must come out in key (insertion) order
    df = spark.createDataFrame(
        [({20: "second", 10: "first", 30: "third"},)], "m map<bigint,string>"
    )
    row = df.select(nonfrozen_list_values(F.col("m")).alias("l")).first()
    assert row["l"] == ["first", "second", "third"]


def test_tuple_field_names(spark):
    df = spark.createDataFrame([(1, "x", 2.5)], "a int, b string, c double")
    out = df.select(
        tuple_to_struct(F.col("a"), F.col("b"), F.col("c")).alias("t")
    )
    t = out.schema["t"].dataType
    assert [f.name for f in t.fields] == ["field_0", "field_1", "field_2"]
    row = out.first()["t"]
    assert (row["field_0"], row["field_1"], row["field_2"]) == (1, "x", 2.5)


def test_empty_udt_to_null(spark):
    df = spark.createDataFrame(
        [((None, None),), ((1, None),), (None,)],
        "u struct<x:int,y:string>",
    )
    rows = df.select(
        empty_udt_to_null(F.col("u"), ["x", "y"]).alias("u")
    ).collect()
    assert rows[0]["u"] is None  # all-null UDT -> null
    assert rows[1]["u"] == (1, None)
    assert rows[2]["u"] is None


def test_stringify_decimal_lossless(spark):
    df = spark.createDataFrame([("123456789012345678.87654321",)], "s string")
    dec = df.select(F.col("s").cast("decimal(28,8)").alias("d"))
    out = dec.select(stringify(F.col("d")).alias("s")).first()["s"]
    assert out == "123456789012345678.87654321"


def test_time_micros_precision(spark):
    # 12:34:56.123456789 since midnight in ns -> µs (ns truncated, ms NOT)
    ns = ((12 * 3600 + 34 * 60 + 56) * 1_000_000_000) + 123_456_789
    df = spark.createDataFrame([(ns,)], "t bigint")
    out = df.select(time_to_micros(F.col("t")).alias("us")).first()["us"]
    assert out == ((12 * 3600 + 34 * 60 + 56) * 1_000_000) + 123_456


def test_scalar_mapping_table_applies(spark):
    """Every scalar rule in the §1.2 table must be a valid Spark cast."""
    df = spark.createDataFrame([("1",)], "v string")
    for cql, spark_t in CQL_SCALAR_TO_SPARK.items():
        df.select(F.col("v").cast(spark_t))  # raises on invalid type name
