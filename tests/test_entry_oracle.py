"""Driver-mimic harness: run every queries() entry in Spark at sf0.01 and
its oracle_sql() in DuckDB on the same parquet, compare row count + schema
column names + order-insensitive values — the same gate the round driver
applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        # (is-null, repr-keyed value) keeps None sortable against any type
        tuple((r[i] is None, str(_norm(r[i]))) for i in order) for r in rows
    ), [cols[i] for i in order]


#: Spark simpleString dtype → numpy-ish kind, for the driver-faithful
#: dtype check ('i' int, 'f' float, 'b' bool, 'M' timestamp, 'O' other)
_SPARK_KIND = {
    "tinyint": "i", "smallint": "i", "int": "i", "bigint": "i",
    "float": "f", "double": "f", "boolean": "b", "timestamp": "M",
    "timestamp_ntz": "M", "date": "M",
}


def _dtype_kinds_match(sdf, duck_pdf):
    """The round driver hashes values AFTER Arrow/pandas conversion, where
    DuckDB HUGEINT (sum over INT) becomes float64 while Spark bigint stays
    int64 — '3854.0' vs '3854' hash-mismatches even though fetchall() shows
    identical python ints.  Compare dtype *kinds* per column to catch that
    class locally.  Columns with nulls are skipped (pandas upcasts nullable
    ints to float64, which the driver's hash tolerates via the null path).
    """
    spark_kinds = {
        f.name: _SPARK_KIND.get(f.dataType.simpleString(), "O")
        for f in sdf.schema.fields
    }
    problems = []
    for col in duck_pdf.columns:
        if duck_pdf[col].isnull().any():
            continue
        dk = duck_pdf[col].dtype.kind
        dk = {"u": "i"}.get(dk, dk)
        sk = spark_kinds.get(col, "O")
        if {sk, dk} == {"i", "f"}:
            problems.append((col, sk, dk))
    return problems


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(entry_mod.oracle_sql()[name])
    duck_cols = res.columns
    duck_pdf = res.df()
    duck_rows = duck.sql(entry_mod.oracle_sql()[name]).fetchall()

    dtype_problems = _dtype_kinds_match(sdf, duck_pdf)
    assert not dtype_problems, (
        name,
        "int/float dtype-kind mismatch — the driver's value hash will "
        "differ even if fetchall values look identical; CAST the oracle "
        "aggregate (DuckDB sum(INT) returns HUGEINT→float64)",
        dtype_problems,
    )

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        name, len(spark_rows), len(duck_rows),
    )
    s_ms, cols = _rows_to_multiset(spark_cols, spark_rows)
    d_ms, _ = _rows_to_multiset(duck_cols, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(s_ms, d_ms) if a != b
    ]
    assert not mismatches, (name, cols, mismatches[:3])


def test_rows_only_queries_run(spark):
    """Entries without an oracle still must run and return rows with a
    stable schema."""
    oracled = set(entry_mod.oracle_sql())
    for name, q in entry_mod.queries().items():
        if name in oracled:
            continue
        df = q(spark, SF_DIR)
        n = df.count()
        assert n >= 0, name
        assert len(df.columns) > 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "op" in df.columns
