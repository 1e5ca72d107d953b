"""Normalize-on-ingest (cfg.audio_normalize_sr): emitted post-images are
resampled to mono pcm_s16le at the target rate inside the exactly-once
write path, bit-identical to the pinned resample_linear reference;
undecodable payloads keep their original cells and quarantined rows
dead-letter the ORIGINAL payload."""

from __future__ import annotations

import os

import numpy as np
import pytest

from scylla_cdc_source_connector_spark import audio
from scylla_cdc_source_connector_spark.audio_resample import resample_linear
from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
from scylla_cdc_source_connector_spark.fixtures import (
    FixtureSpec,
    make_changelog,
    write_changelog_chunk,
)
from scylla_cdc_source_connector_spark.schemas import OP_POST_IMAGE
from scylla_cdc_source_connector_spark.streaming.engine import run_stream
from scylla_cdc_source_connector_spark.streaming.sink import read_emitted

TARGET = 16_000


@pytest.fixture(scope="module")
def norm_run(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("audio_norm"))
    pdf = make_changelog(FixtureSpec(n_events=200, n_clips=30, n_shards=4))
    d = f"{tmp}/in"
    os.makedirs(d)
    write_changelog_chunk(pdf, f"{d}/c0.parquet")
    cfg = EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        checkpoint_dir=f"{tmp}/ckpt",
        output_dir=f"{tmp}/out",
        lineage_dir=f"{tmp}/lineage",
        audio_normalize_sr=TARGET,
    )
    q = run_stream(spark, cfg, d, available_now=True)
    q.awaitTermination(300)
    return cfg, pdf


def test_emitted_payloads_normalized(spark, norm_run):
    cfg, pdf = norm_run
    rows = (
        read_emitted(spark, cfg)
        .where("value.after.bytes IS NOT NULL")
        .select(
            "clip_id",
            "value.after.bytes",
            "value.after.codec",
            "value.after.sr_hz",
            "value.after.dur_ms",
        )
        .collect()
    )
    assert rows, "no emitted post-image payloads"
    for r in rows:
        assert r["codec"] == "pcm_s16le"
        assert r["sr_hz"] == TARGET


def test_normalized_bytes_match_reference_kernel(spark, norm_run):
    cfg, pdf = norm_run
    # reference: the source post-image at the emitted row's exact
    # (clip_id, cdc$time_us), resampled by the pinned single-clip kernel
    src = pdf[
        (pdf["cdc$operation"] == OP_POST_IMAGE) & pdf["bytes"].notna()
    ].set_index(["clip_id", "cdc$time_us"])
    rows = (
        read_emitted(spark, cfg)
        .where("value.after.bytes IS NOT NULL")
        .selectExpr(
            "clip_id", "`cdc$time_us` AS t_us", "value.after.bytes AS bytes"
        )
        .collect()
    )
    checked = 0
    for r in rows:
        key = (r["clip_id"], r["t_us"])
        if key not in src.index:
            continue
        s = src.loc[key]
        pcm = audio.decode(bytes(s["bytes"]), s["codec"])
        want = resample_linear(pcm, int(s["sr_hz"]), TARGET)
        want16 = np.clip(
            np.round(want.astype(np.float64) * 32768.0), -32768, 32767
        ).astype("<i2")
        got = np.frombuffer(bytes(r["bytes"]), dtype="<i2")
        assert np.array_equal(got, want16), r["clip_id"]
        checked += 1
        if checked >= 12:
            break
    assert checked > 0


def test_quarantine_keeps_original_payload(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("audio_norm_q"))
    pdf = make_changelog(FixtureSpec(n_events=120, n_clips=20, n_shards=2))
    # corrupt one clip's payloads to an undecodable codec
    victim = pdf.loc[pdf["bytes"].notna(), "clip_id"].iloc[0]
    sel = (pdf["clip_id"] == victim) & pdf["bytes"].notna()
    pdf.loc[sel, "codec"] = "opus"
    d = f"{tmp}/in"
    os.makedirs(d)
    write_changelog_chunk(pdf, f"{d}/c0.parquet")
    cfg = EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        checkpoint_dir=f"{tmp}/ckpt",
        output_dir=f"{tmp}/out",
        lineage_dir=f"{tmp}/lineage",
        audio_normalize_sr=TARGET,
        audio_validation=True,
    )
    q = run_stream(spark, cfg, d, available_now=True)
    q.awaitTermination(300)
    quar_dirs = [
        p
        for p in os.listdir(cfg.output_dir)
        if p.startswith("_quarantine")
    ]
    assert quar_dirs
    quar = spark.read.parquet(
        os.path.join(cfg.output_dir, "_quarantine")
    ).where("value.after.bytes IS NOT NULL")
    qrows = quar.select(
        "clip_id", "value.after.codec", "quarantine_reason"
    ).collect()
    victim_rows = [r for r in qrows if r["clip_id"] == victim]
    assert victim_rows
    # dead-letter carries the ORIGINAL (unnormalized) payload cells
    assert all(r["codec"] == "opus" for r in victim_rows)
    # emitted stream: everything normalized, victim absent
    good = (
        read_emitted(spark, cfg)
        .where("value.after.bytes IS NOT NULL")
        .select("clip_id", "value.after.codec")
        .collect()
    )
    assert all(r["codec"] == "pcm_s16le" for r in good)
    assert all(r["clip_id"] != victim for r in good)


def test_normalize_requires_full_postimage(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("audio_norm_bad"))
    cfg = EngineConfig(
        checkpoint_dir=f"{tmp}/ckpt",
        output_dir=f"{tmp}/out",
        lineage_dir=f"{tmp}/lineage",
        audio_normalize_sr=TARGET,
    )
    with pytest.raises(ValueError, match="include_after=FULL"):
        run_stream(spark, cfg, tmp, available_now=True)
