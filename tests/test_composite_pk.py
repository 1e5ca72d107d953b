"""Composite partition + clustering key golden tests.

Ports the expectations of the reference's ScyllaCompositePkBase.java
(table PRIMARY KEY ((pk1, pk2), pk3, pk4)): insert/update/delete envelopes
carry all four key columns in key-schema order (partition keys then
clustering keys — ScyllaSchema.computeKeySchema:155-184, RowKey.java:48-58),
and PARTITION_DELETE is inadmissible for a table WITH a clustering key
(ScyllaChangesConsumer.isSinglePartitionDelete:271-283)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import (
    EngineConfig,
    IncludeMode,
    PkPlacement,
)
from scylla_cdc_source_connector_spark.operators.correlation import (
    complete_only,
    correlate_batch,
)
from scylla_cdc_source_connector_spark.operators.projection import build_envelopes
from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes
from scylla_cdc_source_connector_spark.schemas import (
    OP_PARTITION_DELETE,
    OP_POST_IMAGE,
    OP_PRE_IMAGE,
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    TableModel,
)

#: the reference composite test table (ScyllaCompositePkBase.createTableCql):
#: PRIMARY KEY ((pk1, pk2), pk3, pk4); uuid transported stringified
COMPOSITE = TableModel(
    columns=(
        ("pk1", "int"),
        ("pk2", "string"),
        ("pk3", "string"),
        ("pk4", "int"),
        ("value_text", "string"),
        ("value_int", "int"),
    ),
    partition_key=("pk1", "pk2"),
    clustering_key=("pk3", "pk4"),
)

PK3 = "11111111-1111-1111-1111-111111111111"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _row(op, seq, ts_s, pk1, *, vt=None, vi=None, d_vt=None, d_vi=None):
    t = T0 + dt.timedelta(seconds=ts_s)
    return {
        "cdc$stream_id": "s01",
        "cdc$time": t,
        "cdc$time_us": int(t.timestamp() * 1_000_000),
        "cdc$operation": op,
        "cdc$batch_seq_no": seq,
        "generation": 0,
        "pk1": pk1,
        "pk2": "alpha",
        "pk3": PK3,
        "pk4": 10,
        "value_text": vt,
        "value_int": vi,
        "cdc$deleted_value_text": d_vt,
        "cdc$deleted_value_int": d_vi,
    }


@pytest.fixture(scope="module")
def changelog(spark):
    rows = [
        # pk1=1: INSERT (delta + postimage)
        _row(OP_ROW_INSERT, 0, 0, 1, vt="first", vi=100),
        _row(OP_POST_IMAGE, 1, 0, 1, vt="first", vi=100),
        # pk1=2: INSERT then UPDATE value_text only (pre carries OLD value
        # of the modified column; post carries the new full row)
        _row(OP_ROW_INSERT, 0, 10, 2, vt="first", vi=100),
        _row(OP_POST_IMAGE, 1, 10, 2, vt="first", vi=100),
        _row(OP_PRE_IMAGE, 0, 20, 2, vt="first"),
        _row(OP_ROW_UPDATE, 1, 20, 2, vt="second"),
        _row(OP_POST_IMAGE, 2, 20, 2, vt="second", vi=100),
        # pk1=3: ROW DELETE with preimage
        _row(OP_PRE_IMAGE, 0, 30, 3, vt="first", vi=100),
        _row(OP_ROW_DELETE, 1, 30, 3),
        # pk1=4: PARTITION DELETE — inadmissible (clustering key exists)
        _row(OP_PARTITION_DELETE, 0, 40, 4),
    ]
    return spark.createDataFrame(rows, COMPOSITE.changelog_schema())


@pytest.fixture(scope="module")
def envelopes(spark, changelog):
    cfg = EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        pk_placements=(
            PkPlacement.KAFKA_KEY,
            PkPlacement.PAYLOAD_AFTER,
            PkPlacement.PAYLOAD_BEFORE,
            PkPlacement.KAFKA_HEADERS,
        ),
    )
    env = cdc_envelopes(
        changelog, cfg, processing_ts_ms=F.lit(0), table=COMPOSITE
    )
    return {r["pk1"]: r for r in env.collect()}


def test_partition_delete_suppressed(envelopes):
    """F2: table WITH clustering key → PARTITION_DELETE never dispatches."""
    assert set(envelopes) == {1, 2, 3}


def test_key_struct_ordering(envelopes):
    """Key fields in key-schema order: partition keys then clustering keys."""
    key = envelopes[1]["key"]
    assert key.asDict() == {"pk1": 1, "pk2": "alpha", "pk3": PK3, "pk4": 10}
    assert list(key.asDict().keys()) == ["pk1", "pk2", "pk3", "pk4"]


def test_insert_envelope(envelopes):
    r = envelopes[1]
    v = r["value"]
    assert v["op"] == "c"
    assert v["before"] is None
    after = v["after"].asDict()
    assert after == {
        "pk1": 1,
        "pk2": "alpha",
        "pk3": PK3,
        "pk4": 10,
        "value_text": "first",
        "value_int": 100,
    }


def test_update_envelope_merges_before(envelopes):
    """fillBeforeStructForUpdate: modified column from preimage, unchanged
    from postimage, PKs from postimage."""
    v = envelopes[2]["value"]
    assert v["op"] == "u"
    before = v["before"].asDict()
    after = v["after"].asDict()
    assert before["value_text"] == "first"  # OLD value (modified)
    assert before["value_int"] == 100  # unchanged → from postimage
    assert before["pk1"] == 2 and before["pk4"] == 10
    assert after["value_text"] == "second" and after["value_int"] == 100


def test_delete_envelope(envelopes):
    v = envelopes[3]["value"]
    assert v["op"] == "d"
    assert v["after"] is None
    before = v["before"].asDict()
    assert before["value_text"] == "first" and before["value_int"] == 100
    assert before["pk2"] == "alpha" and before["pk3"] == PK3


def test_headers_per_pk_column(envelopes):
    hdrs = {h["k"]: h["v"] for h in envelopes[1]["headers"]}
    assert hdrs == {
        "pk.pk1": "1",
        "pk.pk2": "alpha",
        "pk.pk3": PK3,
        "pk.pk4": "10",
    }


def test_clustering_rows_correlate_separately(spark):
    """Two rows sharing the partition key but differing in clustering key
    are distinct RowKeys — they must produce two envelopes."""
    rows = []
    for pk4 in (10, 20):
        base = _row(OP_ROW_INSERT, 0, 0, 7, vt="x", vi=1)
        post = _row(OP_POST_IMAGE, 1, 0, 7, vt="x", vi=1)
        base["pk4"] = post["pk4"] = pk4
        rows += [base, post]
    df = spark.createDataFrame(rows, COMPOSITE.changelog_schema())
    cfg = EngineConfig(include_after=IncludeMode.FULL)
    corr = complete_only(correlate_batch(df, table=COMPOSITE), cfg)
    env = build_envelopes(corr, cfg, processing_ts_ms=F.lit(0), table=COMPOSITE)
    out = env.select("pk4", "value.op").collect()
    assert sorted(r["pk4"] for r in out) == [10, 20]
    assert {r["op"] for r in out} == {"c"}
