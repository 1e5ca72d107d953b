"""Schema dynamism (VERDICT round-1 gap #6): adopt an ALTERed base-table
schema at runtime, reference ScyllaSchema.updateChangeSchema
(ScyllaSchema.java:467-472) + ScyllaInconsistentSchemaHandler.java:13-53.

Covers: derive/adopt round-trips, null-fill for pre-ALTER-ADD rows,
drop for post-ALTER-DROP history, lossless widenings, the un-adoptable
cases (PK change, lossy cast, missing cdc$ metadata), a mixed-era
directory in one batch pass, and a STREAM RESTART that adopts the new
schema from the same checkpoint."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes
from scylla_cdc_source_connector_spark.schema_evolution import (
    SchemaInconsistencyError,
    adopt,
    conform_changelog,
    model_from_changelog_schema,
)
from scylla_cdc_source_connector_spark.schemas import (
    DEFAULT_TABLE,
    OP_POST_IMAGE,
    OP_ROW_INSERT,
    TableModel,
)
from scylla_cdc_source_connector_spark.streaming import sink as sink_mod
from scylla_cdc_source_connector_spark.streaming.engine import run_stream

#: the table BEFORE `ALTER TABLE audio_clips ADD transcript text`
V1 = TableModel(
    columns=(
        ("clip_id", "string"),
        ("bytes", "binary"),
        ("sr_hz", "int"),
        ("dur_ms", "int"),
        ("codec", "string"),
    )
)

#: after a second ALTER ADD (speaker) — a superset of the default table
V3 = TableModel(columns=(*DEFAULT_TABLE.columns, ("speaker", "string")))

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _rows(model: TableModel, ids: list[str], ts_s: int = 0, **extra):
    """INSERT + POST_IMAGE pair per id, minimal non-null base values."""
    out = []
    for i, cid in enumerate(ids):
        t = T0 + dt.timedelta(seconds=ts_s + i)
        base = {
            "cdc$stream_id": "s01",
            "cdc$time": t,
            "cdc$time_us": int(t.timestamp() * 1_000_000),
            "cdc$batch_seq_no": 0,
            "generation": 0,
            "clip_id": cid,
            "bytes": b"\x00\x01",
            "sr_hz": 8000,
            "dur_ms": 10,
            "codec": "pcm_s16le",
        }
        for c in model.base_columns:
            base.setdefault(c, None)
        for c in model.non_pk_columns:
            base[f"cdc$deleted_{c}"] = None
        base.update(extra)
        ins = dict(base, **{"cdc$operation": OP_ROW_INSERT})
        post = dict(base, **{"cdc$operation": OP_POST_IMAGE, "cdc$batch_seq_no": 1})
        out += [ins, post]
    return out


CFG = EngineConfig(
    include_before=IncludeMode.NONE, include_after=IncludeMode.FULL
)


def test_derive_adopt_roundtrip():
    m = model_from_changelog_schema(DEFAULT_TABLE.changelog_schema())
    assert m == DEFAULT_TABLE
    # adoption of a superset schema picks up the new column, latest wins
    adopted = adopt(DEFAULT_TABLE, V3.changelog_schema())
    assert adopted == V3
    # adoption of the PRE-alter schema drops the column again (the
    # reference replaces, never merges: cdcRowSchemas.put)
    assert adopt(V3, V1.changelog_schema()) == V1


def test_unadoptable_schemas_raise():
    import pyspark.sql.types as T

    # not a changelog: cdc$ metadata missing
    with pytest.raises(SchemaInconsistencyError, match="metadata"):
        model_from_changelog_schema(T.StructType([T.StructField("x", T.StringType())]))
    # PK column gone
    no_pk = TableModel(columns=(("other", "string"),), partition_key=("other",))
    with pytest.raises(SchemaInconsistencyError, match="key column"):
        adopt(DEFAULT_TABLE, no_pk.changelog_schema())
    # PK type changed
    int_pk = TableModel(columns=(("clip_id", "int"),))
    with pytest.raises(SchemaInconsistencyError, match="changed type"):
        adopt(DEFAULT_TABLE, int_pk.changelog_schema())


def test_conform_fills_pre_alter_rows_and_runs_pipeline(spark):
    v1_df = spark.createDataFrame(_rows(V1, ["a", "b"]), V1.changelog_schema())
    conformed = conform_changelog(v1_df, DEFAULT_TABLE)
    assert conformed.schema == DEFAULT_TABLE.changelog_schema()
    env = cdc_envelopes(conformed, CFG, processing_ts_ms=F.lit(0))
    got = env.select("clip_id", "value.after.transcript").collect()
    assert sorted(r["clip_id"] for r in got) == ["a", "b"]
    assert all(r["transcript"] is None for r in got)


def test_conform_widens_and_drops(spark):
    widened = TableModel(
        columns=tuple(
            (n, "bigint" if n == "sr_hz" else t) for n, t in V3.columns
        )
    )
    v3_df = spark.createDataFrame(
        _rows(V3, ["c"], speaker="alice"), V3.changelog_schema()
    )
    # widen sr_hz int→bigint, keep speaker
    out = conform_changelog(v3_df, widened)
    row = out.select("sr_hz", "speaker").first()
    assert row["sr_hz"] == 8000 and row["speaker"] == "alice"
    # conform DOWN to the default model: speaker dropped (ALTER DROP path)
    assert "speaker" not in conform_changelog(v3_df, DEFAULT_TABLE).columns
    # lossy narrowing refuses
    narrowed = TableModel(
        columns=tuple(
            (n, "smallint" if n == "sr_hz" else t) for n, t in DEFAULT_TABLE.columns
        )
    )
    with pytest.raises(SchemaInconsistencyError, match="losslessly"):
        conform_changelog(v3_df, narrowed)


def test_mixed_era_directory_one_pass(spark, tmp_path):
    d = str(tmp_path / "mixed")
    spark.createDataFrame(_rows(V1, ["a", "b"]), V1.changelog_schema()).write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(
        _rows(V3, ["c"], ts_s=100, speaker="alice"), V3.changelog_schema()
    ).write.mode("append").parquet(d)

    observed = spark.read.option("mergeSchema", "true").parquet(d)
    model = adopt(DEFAULT_TABLE, observed.schema)
    env = cdc_envelopes(
        conform_changelog(observed, model), CFG,
        processing_ts_ms=F.lit(0), table=model,
    )
    got = {r["clip_id"]: r["speaker"] for r in
           env.select("clip_id", "value.after.speaker").collect()}
    assert got == {"a": None, "b": None, "c": "alice"}


def test_stream_restart_adopts_new_schema(spark, tmp_path):
    """The micro-batch analog of updateChangeSchema: run the stream over
    pre-ALTER files, ALTER (new files carry `speaker`), restart from the
    SAME checkpoint with adopt_schema=True — only the new files are
    processed (offsets resume) and their envelopes carry the new column;
    the merged emitted view null-fills the old batches."""
    d = str(tmp_path / "in")
    cfg = EngineConfig(
        include_before=IncludeMode.NONE,
        include_after=IncludeMode.FULL,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_dir=str(tmp_path / "out"),
        lineage_dir=str(tmp_path / "lineage"),
    )
    spark.createDataFrame(_rows(V1, ["a", "b"]), V1.changelog_schema()).write.mode(
        "append"
    ).parquet(d)
    q = run_stream(spark, cfg, d, available_now=True, adopt_schema=True)
    q.awaitTermination(300)
    first = sink_mod.read_emitted(spark, cfg)
    assert first.count() == 2
    assert "speaker" not in first.select("value.after.*").columns

    # ALTER TABLE ADD speaker: later files carry the new column
    spark.createDataFrame(
        _rows(V3, ["c", "e"], ts_s=100, speaker="alice"), V3.changelog_schema()
    ).write.mode("append").parquet(d)
    q = run_stream(spark, cfg, d, available_now=True, adopt_schema=True)
    q.awaitTermination(300)

    merged = sink_mod.read_emitted(spark, cfg, merge_schema=True)
    got = {r["clip_id"]: r["speaker"] for r in
           merged.select("clip_id", "value.after.speaker").collect()}
    assert got == {"a": None, "b": None, "c": "alice", "e": "alice"}
    # offsets resumed: the restart processed only the new files (old
    # batch outputs were not rewritten)
    n_batches = len(
        glob.glob(os.path.join(cfg.output_dir, "batch_id=*"))
    )
    assert n_batches == 2
