"""CEP operators: pattern matching over the ordered per-key symbol
sequence, as-of (point-in-time) join, and snapshot reconstruction.

Reference parity: the reference consumes each stream's changes strictly
ordered per key (ScyllaChangesConsumer.java — one ordered consumer per
stream/key range); these operators lift that ordering into first-class
pattern/point-in-time queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.operators.cep import (
    asof_join,
    match_pattern,
    snapshot_asof,
    symbol_sequence,
)


def _mk_events(spark, rows):
    return spark.createDataFrame(rows, "key string, ts long, seq long, op string")


def test_symbol_sequence_orders_within_key(spark):
    df = _mk_events(
        spark,
        [
            ("a", 30, 0, "d"),
            ("a", 10, 0, "c"),
            ("a", 20, 0, "u"),
            ("b", 5, 0, "c"),
            ("b", 5, 1, "u"),  # ts tie broken by seq
        ],
    )
    out = symbol_sequence(df, ["key"], ["ts", "seq"], F.col("op"))
    got = {r["key"]: r["seq"] for r in out.collect()}
    assert got == {"a": "cud", "b": "cu"}


def test_match_pattern_counts_and_position(spark):
    # key a: c u u d c u d  -> two cu+d episodes, first at position 1
    # key b: u u u          -> no match, dropped
    # key c: u c u d        -> one episode starting at position 2
    rows = []
    for i, op in enumerate("cuudcud"):
        rows.append(("a", i * 10, 0, op))
    for i, op in enumerate("uuu"):
        rows.append(("b", i * 10, 0, op))
    for i, op in enumerate("ucud"):
        rows.append(("c", i * 10, 0, op))
    out = match_pattern(
        _mk_events(spark, rows), ["key"], ["ts", "seq"], F.col("op"), "cu+d"
    )
    got = {r["key"]: r for r in out.collect()}
    assert set(got) == {"a", "c"}
    assert got["a"]["n_matches"] == 2
    assert got["a"]["first_match_pos"] == 1
    assert got["a"]["seq_len"] == 7
    assert got["c"]["n_matches"] == 1
    assert got["c"]["first_match_pos"] == 2


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [("k", 15, "l1"), ("k", 20, "l2"), ("k", 5, "l0"), ("x", 50, "l3")],
        "key string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("k", 10, 1.0), ("k", 20, 2.0), ("k", 30, 3.0)],
        "key string, ts long, v double",
    )
    out = asof_join(left, right, ["key"], "ts", "ts", ["v"])
    got = {r["tag"]: (r["asof_v"], r["asof_ts"]) for r in out.collect()}
    assert got["l0"] == (None, None)  # nothing at-or-before ts=5
    assert got["l1"] == (1.0, 10)
    assert got["l2"] == (2.0, 20)  # equal ts matches (<= semantics)
    assert got["l3"] == (None, None)  # key never on the right


def test_asof_join_strict_excludes_equal_ts(spark):
    left = spark.createDataFrame([("k", 20, "l")], "key string, ts long, tag string")
    right = spark.createDataFrame(
        [("k", 10, 1.0), ("k", 20, 2.0)], "key string, ts long, v double"
    )
    out = asof_join(left, right, ["key"], "ts", "ts", ["v"], strict=True)
    [r] = out.collect()
    assert (r["asof_v"], r["asof_ts"]) == (1.0, 10)


def test_snapshot_asof_applies_deletes_and_cutoff(spark):
    df = _mk_events(
        spark,
        [
            ("live", 10, 0, "c"),
            ("live", 20, 1, "u"),
            ("live", 90, 2, "u"),  # beyond cutoff: not visible at 50
            ("gone", 10, 3, "c"),
            ("gone", 30, 4, "d"),  # deleted before cutoff: absent
            ("back", 10, 5, "d"),
            ("back", 40, 6, "c"),  # re-inserted before cutoff: present
            ("future", 60, 7, "c"),  # created after cutoff: absent
        ],
    )
    snap = snapshot_asof(df, ["key"], "ts", ["seq"], "op", as_of_ms=50)
    got = {r["key"]: r["ts"] for r in snap.collect()}
    assert got == {"live": 20, "back": 40}
