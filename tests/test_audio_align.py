"""Pairwise audio alignment tests: FFT-NCC offset estimation over energy
envelopes — excerpt offset recovery, container (negative) offsets,
codec-transcode invariance, WAV/stereo unwrap, and the unrelated-pair
rejection the overlap penalty buys."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark import audio
from scylla_cdc_source_connector_spark.audio_align import (
    align_clip_pairs,
    energy_envelopes,
)

SR = 8000


def _sig(seed: int, secs: float, mod_hz: float) -> np.ndarray:
    """Amplitude-modulated noise (int16) — envelopes carry the modulation,
    so alignment has structure to lock onto."""
    rng = np.random.default_rng(seed)
    n = int(secs * SR)
    t = np.arange(n) / SR
    x = np.clip(
        rng.standard_normal(n) * (0.3 + 0.25 * np.sin(2 * np.pi * mod_hz * t)),
        -1,
        1,
    )
    return (x * 32767).astype(np.int16)


@pytest.fixture(scope="module")
def clips_df(spark):
    x = _sig(7, 2.0, 1.3)
    rows = [
        ("full", audio.encode(x, "pcm_s16le"), "pcm_s16le", SR),
        # excerpt: content of `full` starting at +500 ms
        (
            "excerpt",
            audio.encode(x[SR // 2 : SR // 2 + SR], "pcm_s16le"),
            "pcm_s16le",
            SR,
        ),
        # container: `full` embedded at +300 ms
        (
            "container",
            audio.encode(
                np.concatenate([np.zeros(3 * SR // 10, np.int16), x]),
                "pcm_s16le",
            ),
            "pcm_s16le",
            SR,
        ),
        ("transcoded", audio.encode(x, "ulaw"), "ulaw", SR),
        (
            "stereo_wav",
            audio.wav_encode(
                np.column_stack([x, x]).reshape(-1), SR, "pcm_s16le", n_channels=2
            ),
            "wav",
            SR,
        ),
        ("unrelated", audio.encode(_sig(99, 2.0, 0.7), "pcm_s16le"), "pcm_s16le", SR),
        ("broken", b"\x00" * 10, "opus", SR),
    ]
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )


def test_envelope_pass(clips_df):
    env = {r["clip_id"]: r for r in energy_envelopes(clips_df).collect()}
    assert env["full"]["env_ok"] and env["full"]["n_frames"] == 200
    assert len(env["full"]["env"]) == 200
    # RMS of the modulated signal sits around its 0.3 carrier amplitude
    assert 0.05 < float(np.mean(env["full"]["env"])) < 0.6
    assert not env["broken"]["env_ok"] and env["broken"]["n_frames"] == 0
    # stereo WAV unwraps + downmixes: same frame count as the mono source
    assert env["stereo_wav"]["env_ok"] and env["stereo_wav"]["n_frames"] == 200


def test_align_offsets_and_scores(spark, clips_df):
    pairs = spark.createDataFrame(
        [
            ("full", "excerpt"),
            ("full", "container"),
            ("full", "transcoded"),
            ("full", "stereo_wav"),
            ("full", "unrelated"),
        ],
        "id_a string, id_b string",
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in align_clip_pairs(pairs, clips_df).collect()
    }
    assert len(out) == 5

    exc = out[("full", "excerpt")]
    assert abs(exc["offset_ms"] - 500) <= 10 and exc["peak_corr"] > 0.85

    con = out[("full", "container")]
    assert abs(con["offset_ms"] - (-300)) <= 10 and con["peak_corr"] > 0.9

    tra = out[("full", "transcoded")]
    assert tra["offset_ms"] == 0 and tra["peak_corr"] > 0.99

    ste = out[("full", "stereo_wav")]
    assert ste["offset_ms"] == 0 and ste["peak_corr"] > 0.99

    unr = out[("full", "unrelated")]
    assert unr["peak_corr"] < 0.7
    # true pairs separate cleanly from the unrelated one
    assert min(exc["peak_corr"], con["peak_corr"]) > unr["peak_corr"] + 0.2


def test_align_skips_undecodable_and_prunes(spark, clips_df):
    pairs = spark.createDataFrame(
        [("full", "broken"), ("full", "excerpt")], "id_a string, id_b string"
    )
    rows = align_clip_pairs(pairs, clips_df).collect()
    # the broken-codec pair drops (no envelope), the good one survives
    assert [(r["id_a"], r["id_b"]) for r in rows] == [("full", "excerpt")]


def test_align_duplicate_keyed_clips(spark, clips_df):
    """A clips table with duplicate clip_ids (e.g. raw changelog
    postimages) must yield exactly one output row per pair, not a
    cross-product of the duplicates."""
    dup_clips = clips_df.unionByName(clips_df)
    pairs = spark.createDataFrame([("full", "excerpt")], "id_a string, id_b string")
    rows = align_clip_pairs(pairs, dup_clips).collect()
    assert len(rows) == 1
    assert abs(rows[0]["offset_ms"] - 500) <= 10


def test_align_short_clip_not_ok(spark):
    """Pairs shorter than the minimum overlap report align_ok=False
    rather than a garbage offset."""
    tiny = _sig(3, 0.05, 5.0)  # 5 frames at fps=100 < min_overlap
    clips = spark.createDataFrame(
        [
            ("t1", audio.encode(tiny, "pcm_s16le"), "pcm_s16le", SR),
            ("t2", audio.encode(tiny, "pcm_s16le"), "pcm_s16le", SR),
        ],
        "clip_id string, bytes binary, codec string, sr_hz int",
    )
    pairs = clips.select(
        F.lit("t1").alias("id_a"), F.lit("t2").alias("id_b")
    ).limit(1)
    rows = align_clip_pairs(pairs, clips).collect()
    assert len(rows) == 1 and not rows[0]["align_ok"]
    assert rows[0]["peak_corr"] == 0.0
