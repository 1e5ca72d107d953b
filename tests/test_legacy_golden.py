"""Legacy-format golden tests: Cell-wrapped envelopes + SMT unwrapping.

Pins the tri-state column semantics of the reference's legacy format
(README.md:203-246 of the reference; ScyllaChangeRecordEmitterLegacy
.fillStructWithChange:222-245):
  - cell absent (null struct)      => column NOT modified
  - cell == {value: null}          => column explicitly set to NULL
  - cell == {value: v}             => column set to v
and the SMT transforms (ScyllaExtractNewRecordState.java:74-117 cell
detection :168-184; ScyllaFlattenColumns.java:39-96)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig
from scylla_cdc_source_connector_spark.fixtures import write_changelog_chunk
from scylla_cdc_source_connector_spark.operators.smt import (
    extract_new_record_state,
    flatten_columns,
)
from scylla_cdc_source_connector_spark.plans.pipeline import cdc_legacy_envelopes
from scylla_cdc_source_connector_spark.schemas import NON_PK_COLUMNS

BASE_US = 1_700_000_000_000_000


def _row(clip, t_s, op, seq=0, transcript=None, sr_hz=None,
         deleted_transcript=False, pre_transcript=None):
    r = {
        "cdc$stream_id": "s0000",
        "cdc$time": dt.datetime(2023, 11, 14) + dt.timedelta(seconds=t_s),
        "cdc$time_us": BASE_US + t_s * 1_000_000,
        "cdc$operation": op,
        "cdc$batch_seq_no": seq,
        "generation": 0,
        "clip_id": clip,
        "bytes": None,
        "sr_hz": sr_hz,
        "dur_ms": None,
        "codec": None,
        "transcript": transcript,
    }
    for c in NON_PK_COLUMNS:
        r[f"cdc$deleted_{c}"] = False
    r["cdc$deleted_transcript"] = deleted_transcript
    return r


@pytest.fixture(scope="module")
def legacy_df(spark, tmp_path_factory):
    rows = [
        # insert: transcript + sr_hz set
        _row("ins", 0, 2, transcript="hello", sr_hz=8000),
        # update setting transcript only (sr_hz cell must be ABSENT)
        _row("upd", 1, 1, transcript="world"),
        # update explicitly NULLing transcript ({value: null} cell)
        _row("nul", 2, 1, deleted_transcript=True),
        # delete (before from delta, after null)
        _row("del", 3, 4, transcript=None),
        # update with an experimental preimage available
        _row("pre", 4, 0, seq=0, transcript="old", sr_hz=16000),
        _row("pre", 4, 1, seq=1, transcript="new"),
    ]
    p = str(tmp_path_factory.mktemp("legacy") / "cl.parquet")
    write_changelog_chunk(pd.DataFrame(rows), p)
    return spark.read.parquet(p)


def _by_clip(env):
    return {r["clip_id"]: r for r in env.collect()}

def test_legacy_cells_tri_state(spark, legacy_df):
    env = cdc_legacy_envelopes(
        legacy_df, EngineConfig(), processing_ts_ms=F.lit(0)
    )
    recs = _by_clip(env)

    ins = recs["ins"]["value"]
    assert ins["op"] == "c"
    assert ins["after"]["transcript"]["value"] == "hello"
    assert ins["after"]["sr_hz"]["value"] == 8000
    assert ins["after"]["dur_ms"] is None  # absent cell = not modified
    assert ins["before"] is None

    upd = recs["upd"]["value"]
    assert upd["op"] == "u"
    assert upd["after"]["transcript"]["value"] == "world"
    assert upd["after"]["sr_hz"] is None  # unmodified -> absent
    assert upd["before"] is None  # no preimages without the experimental flag

    nul = recs["nul"]["value"]
    assert nul["op"] == "u"
    # set-to-NULL: cell PRESENT with value null (the tri-state third arm)
    assert nul["after"]["transcript"] is not None
    assert nul["after"]["transcript"]["value"] is None

    dele = recs["del"]["value"]
    assert dele["op"] == "d"
    assert dele["after"] is None
    assert dele["before"] is not None  # cells from delta
    assert dele["before"]["clip_id"] == "del"


def test_legacy_experimental_preimages(spark, legacy_df):
    env = cdc_legacy_envelopes(
        legacy_df,
        EngineConfig(),
        processing_ts_ms=F.lit(0),
        experimental_preimages=True,
    )
    pre = _by_clip(env)["pre"]["value"]
    assert pre["op"] == "u"
    assert pre["after"]["transcript"]["value"] == "new"
    # before cells filled from the preimage; deleted markers still read
    # from the delta
    assert pre["before"]["transcript"]["value"] == "old"
    assert pre["before"]["sr_hz"]["value"] == 16000


def test_extract_new_record_state_unwraps_cells(spark, legacy_df):
    env = cdc_legacy_envelopes(
        legacy_df, EngineConfig(), processing_ts_ms=F.lit(0)
    )
    flat = extract_new_record_state(env)
    rows = {r["clip_id"]: r for r in flat.collect()}
    assert "del" not in rows  # tombstone dropped
    assert rows["ins"]["transcript"] == "hello"
    assert rows["ins"]["sr_hz"] == 8000
    assert rows["upd"]["transcript"] == "world"
    assert rows["nul"]["transcript"] is None


def test_flatten_columns_preserves_envelope(spark, legacy_df):
    env = cdc_legacy_envelopes(
        legacy_df, EngineConfig(), processing_ts_ms=F.lit(0)
    )
    flat = flatten_columns(env)
    recs = _by_clip(flat)
    ins = recs["ins"]["value"]
    assert ins["op"] == "c"  # envelope kept
    assert ins["after"]["transcript"] == "hello"  # cell unwrapped in place
    assert ins["after"]["sr_hz"] == 8000
    assert ins["after"]["dur_ms"] is None  # absent and set-to-null collapse
    # advanced-format envelopes pass through unchanged
    from scylla_cdc_source_connector_spark.config import IncludeMode
    from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes

    adv_cfg = EngineConfig(include_after=IncludeMode.FULL)
    adv = cdc_envelopes(legacy_df, adv_cfg, processing_ts_ms=F.lit(0))
    assert flatten_columns(adv).schema == adv.schema
