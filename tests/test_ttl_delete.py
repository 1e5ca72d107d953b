"""Per-row-TTL expiry deletes + tombstone records.

Port of the reference's CdcPerRowTtlDeleteIT.java (241 LoC): a table
`(id int PRIMARY KEY, text_col text, expiration timestamp TTL)` with
preimage+postimage enabled.  Scylla's background TTL thread deletes the
expired row and the CDC log carries an ordinary ROW_DELETE with a
preimage — so from the engine's view a TTL expiry IS a delete; these
tests pin that end-to-end:

  1. INSERT with near-future expiration, then background DELETE →
     op sequence c, d; the d's before == the inserted row; after null
     (CdcPerRowTtlDeleteIT expected sequence steps 1-2).
  2. null expiration → never expires → only c.
  3. explicit DELETE of a TTL-carrying row → identical d record shape.
  4. tombstone record (null value, same key) directly after each d when
     cfg.tombstones_on_delete (expected-sequence step 3; Debezium
     tombstones.on.delete inherited by the reference).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes
from scylla_cdc_source_connector_spark.schemas import (
    OP_POST_IMAGE,
    OP_PRE_IMAGE,
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    TableModel,
)

#: the IT's table shape; `expiration` is an ordinary timestamp column in
#: the CDC log (the TTL designation lives in the DDL, not the data)
TTL_TABLE = TableModel(
    columns=(
        ("id", "int"),
        ("text_col", "string"),
        ("expiration", "timestamp"),
    ),
    partition_key=("id",),
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _row(op, seq, ts_s, id_, text=None, exp=None):
    t = T0 + dt.timedelta(seconds=ts_s)
    return {
        "cdc$stream_id": "s01",
        "cdc$time": t,
        "cdc$time_us": int(t.timestamp() * 1_000_000),
        "cdc$operation": op,
        "cdc$batch_seq_no": seq,
        "generation": 0,
        "id": id_,
        "text_col": text,
        "expiration": exp,
        "cdc$deleted_text_col": None,
        "cdc$deleted_expiration": None,
    }


EXP = T0 + dt.timedelta(seconds=5)


@pytest.fixture(scope="module")
def changelog(spark):
    rows = [
        # id=1: INSERT with near-future expiration; the TTL background
        # thread later deletes it — ROW_DELETE with preimage
        _row(OP_ROW_INSERT, 0, 0, 1, text="expiring", exp=EXP),
        _row(OP_POST_IMAGE, 1, 0, 1, text="expiring", exp=EXP),
        _row(OP_PRE_IMAGE, 0, 6, 1, text="expiring", exp=EXP),
        _row(OP_ROW_DELETE, 1, 6, 1),
        # id=2: null expiration — no TTL, never expires
        _row(OP_ROW_INSERT, 0, 1, 2, text="persistent", exp=None),
        _row(OP_POST_IMAGE, 1, 1, 2, text="persistent", exp=None),
        # id=3: explicit DELETE of a row that carried a TTL
        _row(OP_ROW_INSERT, 0, 2, 3, text="doomed", exp=EXP),
        _row(OP_POST_IMAGE, 1, 2, 3, text="doomed", exp=EXP),
        _row(OP_PRE_IMAGE, 0, 4, 3, text="doomed", exp=EXP),
        _row(OP_ROW_DELETE, 1, 4, 3),
    ]
    return spark.createDataFrame(rows, TTL_TABLE.changelog_schema())


def _env(spark, changelog, **cfg_kw):
    cfg = EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        **cfg_kw,
    )
    return cdc_envelopes(
        changelog, cfg, processing_ts_ms=F.lit(0), table=TTL_TABLE
    )


def test_ttl_expiry_produces_insert_then_delete(spark, changelog):
    env = _env(spark, changelog)
    seq = [
        (r["op"], r["before"], r["after"])
        for r in env.filter(F.col("id") == 1)
        .orderBy("`cdc$time_us`", "`cdc$batch_seq_no`")
        .select(
            F.col("value.op").alias("op"),
            F.col("value.before").alias("before"),
            F.col("value.after").alias("after"),
        )
        .collect()
    ]
    assert [s[0] for s in seq] == ["c", "d"]
    c, d = seq
    assert c[2]["text_col"] == "expiring" and c[2]["expiration"] == EXP
    # the TTL delete carries the full preimage, after is null
    assert d[1]["text_col"] == "expiring" and d[1]["expiration"] == EXP
    assert d[2] is None


def test_null_expiration_never_expires(spark, changelog):
    ops = [
        r["op"]
        for r in _env(spark, changelog)
        .filter(F.col("id") == 2)
        .select(F.col("value.op").alias("op"))
        .collect()
    ]
    assert ops == ["c"]


def test_explicit_delete_same_shape_as_ttl_delete(spark, changelog):
    env = _env(spark, changelog)
    d3 = (
        env.filter((F.col("id") == 3) & (F.col("value.op") == "d"))
        .select("value.before", "value.after")
        .first()
    )
    assert d3["before"]["text_col"] == "doomed"
    assert d3["after"] is None


def test_tombstone_follows_each_delete(spark, changelog):
    env = _env(spark, changelog, tombstones_on_delete=True)
    rows = (
        env.filter(F.col("id") == 1)
        .orderBy("`cdc$time_us`", "`cdc$batch_seq_no`")
        .select("value", "key")
        .collect()
    )
    # c, d, tombstone — tombstone has the SAME key and a null value
    assert [r["value"]["op"] if r["value"] else None for r in rows] == [
        "c", "d", None,
    ]
    assert rows[2]["key"]["id"] == 1
    # non-delete keys get no tombstone
    assert (
        env.filter((F.col("id") == 2) & F.col("value").isNull()).count() == 0
    )
