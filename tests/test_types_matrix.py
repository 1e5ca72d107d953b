"""CQL type matrix driven END-TO-END through correlation → envelope.

Round 1 carried the translation rules only as unit-tested helpers
(functions/types.py); this module runs an EXTENDED table — map, non-frozen
list (map<timeuuid,V> encoding), set-as-array, tuple, UDT — through the
real pipeline with golden expectations ported from the reference's
ScyllaTypesAllBase.java (schema rules ScyllaSchema.java:297-430, value
conversion ScyllaChangeRecordEmitter.java:620-795), plus the
cdc$deleted_elements_<col> modified-column rule (:361-398)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
from scylla_cdc_source_connector_spark.functions.types import (
    empty_udt_to_null,
    map_to_entries,
    nonfrozen_list_values,
)
from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes
from scylla_cdc_source_connector_spark.schemas import (
    OP_POST_IMAGE,
    OP_PRE_IMAGE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    TableModel,
)

#: extended table: every non-scalar family of ScyllaSchema.computeColumnSchema.
#: CQL → transport mapping per functions/types.py:
#:   map<text,int>       → MapType, emitted as sorted {key,value} entries
#:   non-frozen list<text> → arrives as map<timeuuid,text>; timeuuid is
#:                           transported stringified, time-ordered ids
#:   set<text>           → array<string>
#:   tuple<int,text>     → struct<field_0:int, field_1:string>
#:   UDT {a int, b text} → struct<a:int, b:string>, empty → NULL
EXTENDED = TableModel(
    columns=(
        ("ext_id", "string"),
        ("tags", "map<string,int>"),
        ("track", "map<string,string>"),  # non-frozen list encoding
        ("genres", "array<string>"),
        ("coords", "struct<field_0:int,field_1:string>"),
        ("meta", "struct<a:int,b:string>"),
    ),
    partition_key=("ext_id",),
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

# timeuuid stand-ins that sort by insertion time when compared as strings
TU1, TU2, TU3 = "00000001-aaaa", "00000002-aaaa", "00000003-aaaa"


def _row(op, seq, ts_s, ext_id, **cols):
    t = T0 + dt.timedelta(seconds=ts_s)
    base = {
        "cdc$stream_id": "s01",
        "cdc$time": t,
        "cdc$time_us": int(t.timestamp() * 1_000_000),
        "cdc$operation": op,
        "cdc$batch_seq_no": seq,
        "generation": 0,
        "ext_id": ext_id,
        "tags": None,
        "track": None,
        "genres": None,
        "coords": None,
        "meta": None,
        "cdc$deleted_tags": None,
        "cdc$deleted_track": None,
        "cdc$deleted_genres": None,
        "cdc$deleted_coords": None,
        "cdc$deleted_meta": None,
        "cdc$deleted_elements_tags": None,
        "cdc$deleted_elements_track": None,
        "cdc$deleted_elements_genres": None,
    }
    base.update(cols)
    return base


@pytest.fixture(scope="module")
def envelopes(spark):
    rows = [
        # e1: INSERT with every collection populated (unsorted map entries,
        # out-of-order non-frozen-list timeuuids)
        _row(
            OP_ROW_INSERT, 0, 0, "e1",
            tags={"zeta": 2, "alpha": 1},
            track={TU2: "second", TU1: "first", TU3: "third"},
            genres=["jazz", "ambient"],
            coords={"field_0": 42, "field_1": "foo"},
            meta={"a": 7, "b": "x"},
        ),
        _row(
            OP_POST_IMAGE, 1, 0, "e1",
            tags={"zeta": 2, "alpha": 1},
            track={TU2: "second", TU1: "first", TU3: "third"},
            genres=["jazz", "ambient"],
            coords={"field_0": 42, "field_1": "foo"},
            meta={"a": 7, "b": "x"},
        ),
        # e2: INSERT with an EMPTY UDT (all fields null → NULL struct)
        _row(
            OP_ROW_INSERT, 0, 10, "e2",
            meta={"a": None, "b": None},
        ),
        _row(
            OP_POST_IMAGE, 1, 10, "e2",
            meta={"a": None, "b": None},
        ),
        # e3: UPDATE deleting two elements of `tags` — the delta carries NO
        # value for tags, only cdc$deleted_elements_tags; the postimage has
        # the surviving entries.  Modified-column detection must fire off
        # the deleted-elements set alone (ScyllaChangeRecordEmitter:391-396).
        _row(OP_PRE_IMAGE, 0, 20, "e3", tags={"alpha": 1, "beta": 2, "gamma": 3}),
        _row(
            OP_ROW_UPDATE, 1, 20, "e3",
            **{"cdc$deleted_elements_tags": ["alpha", "gamma"]},
        ),
        _row(OP_POST_IMAGE, 2, 20, "e3", tags={"beta": 2}),
    ]
    df = spark.createDataFrame(rows, EXTENDED.changelog_schema())
    cfg = EngineConfig(
        include_before=IncludeMode.ONLY_UPDATED,
        include_after=IncludeMode.ONLY_UPDATED,
    )
    env = cdc_envelopes(df, cfg, processing_ts_ms=F.lit(0), table=EXTENDED)
    # transport translation of the image structs (P10): applied as the last
    # projection over the envelope — still one Catalyst tree, no Python
    after = F.col("value.after")
    translated = env.select(
        "ext_id",
        F.col("value.op").alias("op"),
        F.col("value.before").alias("before"),
        map_to_entries(after["tags"]).alias("tags_entries"),
        nonfrozen_list_values(after["track"]).alias("track_values"),
        F.array_sort(after["genres"]).alias("genres_sorted"),
        after["coords"].alias("coords"),
        empty_udt_to_null(after["meta"], ["a", "b"]).alias("meta"),
    )
    return {r["ext_id"]: r for r in translated.collect()}


def test_map_to_sorted_entries(envelopes):
    """MAP → array of {key,value} structs sorted by key
    (ScyllaSchema.java:351-389)."""
    entries = [(e["key"], e["value"]) for e in envelopes["e1"]["tags_entries"]]
    assert entries == [("alpha", 1), ("zeta", 2)]


def test_nonfrozen_list_in_insertion_order(envelopes):
    """non-frozen LIST (map<timeuuid,V>) → values sorted by timeuuid =
    insertion order (ScyllaChangeRecordEmitter.java:687-717)."""
    assert envelopes["e1"]["track_values"] == ["first", "second", "third"]


def test_set_as_array(envelopes):
    assert envelopes["e1"]["genres_sorted"] == ["ambient", "jazz"]


def test_tuple_field_names(envelopes):
    """TUPLE → struct field_0..field_N (ScyllaSchema.java:390-406)."""
    coords = envelopes["e1"]["coords"]
    assert coords.asDict() == {"field_0": 42, "field_1": "foo"}


def test_populated_udt_passes_through(envelopes):
    assert envelopes["e1"]["meta"].asDict() == {"a": 7, "b": "x"}


def test_empty_udt_becomes_null(envelopes):
    """UDT with all fields null = Scylla 'empty' → NULL struct
    (ScyllaChangeRecordEmitter.java:766-792)."""
    assert envelopes["e2"]["meta"] is None


def test_deleted_elements_marks_column_modified(envelopes):
    """e3's delta has tags=null but cdc$deleted_elements_tags non-empty:
    only-updated AFTER must include tags (the surviving postimage map) —
    without the deleted-elements rule the column would be dropped as
    unmodified."""
    r = envelopes["e3"]
    assert r["op"] == "u"
    assert [(e["key"], e["value"]) for e in r["tags_entries"]] == [("beta", 2)]
    # only-updated BEFORE carries the old (pre-delete) value of tags
    before_tags = dict(r["before"]["tags"])
    assert before_tags == {"alpha": 1, "beta": 2, "gamma": 3}
