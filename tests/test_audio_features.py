"""Spectral feature extraction (audio_features.py): physics pins on
constructed signals, batch-boundary safety, container/stereo handling,
and the Spark mapInPandas integration."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from scylla_cdc_source_connector_spark import audio
from scylla_cdc_source_connector_spark.audio_features import (
    AUDIO_FEATURES_SCHEMA,
    HOP,
    WIN,
    _features_one,
    extract_features,
)

SR = 8000
_HZ_PER_BIN = SR / WIN  # 15.625 Hz at 8 kHz


def _tone(n, freq=440.0, amp=0.5, sr=SR):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)


def _pdf(rows):
    return pd.DataFrame(rows, columns=["clip_id", "bytes", "codec", "sr_hz"])


def _run(rows):
    out = _features_one(_pdf(rows))
    return {r["clip_id"]: r for _, r in out.iterrows()}


def test_pure_tone_physics():
    """440 Hz sine: centroid at the tone (±1 bin), tiny flatness, zcr
    2f/sr, all energy in the voice band, no clipping, no DC."""
    pcm = _tone(SR * 2, freq=440.0)
    r = _run([("t", audio.encode(pcm, "pcm_s16le"), "pcm_s16le", SR)])["t"]
    assert r["decode_ok"] and r["n_frames"] == 1 + (SR * 2 - WIN) // HOP
    assert abs(r["spectral_centroid_hz"] - 440.0) < 2 * _HZ_PER_BIN
    assert abs(r["spectral_rolloff_hz"] - 440.0) < 2 * _HZ_PER_BIN
    assert r["spectral_bandwidth_hz"] < 100.0
    assert r["spectral_flatness"] < 0.01
    assert abs(r["zcr"] - 2 * 440.0 / SR) < 0.005
    assert r["band_mid_ratio"] > 0.99
    assert r["clipping_ratio"] == 0.0
    assert abs(r["dc_offset"]) < 1e-3


def test_white_noise_and_dc_and_clipping():
    rng = np.random.default_rng(7)
    noise = (rng.uniform(-0.5, 0.5, SR) * 32767).astype(np.int16)
    dc = np.full(SR, int(0.25 * 32767), dtype=np.int16)
    clipped = np.where(
        _tone(SR, 100, amp=1.0) > 0, np.int16(32767), np.int16(-32768)
    )
    rows = [
        ("noise", audio.encode(noise, "pcm_s16le"), "pcm_s16le", SR),
        ("dc", audio.encode(dc, "pcm_s16le"), "pcm_s16le", SR),
        ("clip", clipped.astype("<i2").tobytes(), "pcm_s16le", SR),
    ]
    r = _run(rows)
    # white noise: flat-ish spectrum, centroid near sr/4
    assert r["noise"]["spectral_flatness"] > 0.2
    assert abs(r["noise"]["spectral_centroid_hz"] - SR / 4) < 0.15 * SR / 4
    # constant: DC offset measured, zero crossings
    assert abs(r["dc"]["dc_offset"] - 0.25) < 0.01
    assert r["dc"]["zcr"] == 0.0
    # square wave at full scale: every sample clips
    assert r["clip"]["clipping_ratio"] > 0.99


def test_batch_boundary_no_leakage():
    """Features of clips computed together == computed alone (the
    concatenated-decode segmentation leaks nothing across clips),
    including 1-sample clips between them."""
    a = _tone(WIN * 4, 500)
    b = _tone(WIN * 3, 1800)
    rows_all = [
        ("a", audio.encode(a, "pcm_s16le"), "pcm_s16le", SR),
        ("one", audio.encode(_tone(1), "pcm_s16le"), "pcm_s16le", SR),
        ("b", audio.encode(b, "pcm_s16le"), "pcm_s16le", SR),
    ]
    together = _run(rows_all)
    for cid, row in (("a", rows_all[0]), ("b", rows_all[2])):
        alone = _run([row])[cid]
        for col in together[cid].index:
            if col == "clip_id":
                continue
            va, vt = alone[col], together[cid][col]
            assert va == vt or (
                isinstance(va, float) and abs(va - vt) < 1e-9
            ), (cid, col, va, vt)
    assert together["one"]["n_frames"] == 0
    assert together["one"]["zcr"] == 0.0
    assert np.isnan(together["one"]["spectral_centroid_hz"])


def test_g711_and_wav_and_stereo():
    """µ-law/A-law groups agree with PCM on tone physics; a stereo WAV
    downmixes and matches the mono mix's centroid."""
    pcm = _tone(SR, 700)
    rows = [
        ("u", audio.encode(pcm, "ulaw"), "ulaw", SR),
        ("a", audio.encode(pcm, "alaw"), "alaw", SR),
        ("w", audio.wav_encode(pcm, SR, "pcm_s16le"), "wav", 999),
    ]
    left, right = _tone(SR, 440), _tone(SR, 880)
    inter = np.empty(2 * SR, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    rows.append(
        ("st", audio.wav_encode(inter, SR, "pcm_s16le", n_channels=2), "wav", 0)
    )
    mono_mix = ((left.astype(np.int32) + right) // 2).astype(np.int16)
    rows.append(("mix", audio.encode(mono_mix, "pcm_s16le"), "pcm_s16le", SR))
    r = _run(rows)
    for cid in ("u", "a", "w"):
        assert r[cid]["decode_ok"]
        want = 700.0 if cid != "w" else 700.0
        assert abs(r[cid]["spectral_centroid_hz"] - want) < 3 * _HZ_PER_BIN
    # stereo wav (sr from the container, not the bogus column value)
    assert r["st"]["decode_ok"]
    assert (
        abs(r["st"]["spectral_centroid_hz"] - r["mix"]["spectral_centroid_hz"])
        < 0.01  # downmix rounding (mean-truncate vs floor-div) only
    )


def test_invalid_rows():
    r = _run(
        [
            ("null", None, "pcm_s16le", SR),
            ("empty", b"", "ulaw", SR),
            ("odd", b"\x01\x02\x03", "pcm_s16le", SR),
            ("opus", b"\x00" * 100, "opus", SR),
            ("badwav", b"RIFFxxxx", "wav", SR),
            ("nosr", audio.encode(_tone(100), "ulaw"), "ulaw", None),
            ("good", audio.encode(_tone(WIN), "ulaw"), "ulaw", SR),
        ]
    )
    for cid in ("null", "empty", "odd", "opus", "badwav", "nosr"):
        assert not r[cid]["decode_ok"], cid
        assert np.isnan(r[cid]["spectral_centroid_hz"])
    assert r["good"]["decode_ok"] and r["good"]["n_frames"] == 1


def test_spark_integration(spark):
    """extract_features over a constructed DataFrame: schema + values
    match the local kernel, one narrow stage (no Exchange)."""
    pcm = _tone(SR, 440)
    rows = [
        ("s1", bytearray(audio.encode(pcm, "pcm_s16le")), "pcm_s16le", SR),
        ("s2", bytearray(audio.encode(pcm, "ulaw")), "ulaw", SR),
        ("s3", None, "pcm_s16le", SR),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    out = extract_features(df)
    assert out.schema.simpleString() == (
        "struct<" + AUDIO_FEATURES_SCHEMA.replace(", ", ",").replace(" ", ":")
        + ">"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["clip_id"]: r for r in out.collect()}
    assert got["s1"]["decode_ok"] and got["s2"]["decode_ok"]
    assert not got["s3"]["decode_ok"]
    assert abs(got["s1"]["spectral_centroid_hz"] - 440.0) < 2 * _HZ_PER_BIN
    local = _run([("s1", audio.encode(pcm, "pcm_s16le"), "pcm_s16le", SR)])
    assert (
        abs(got["s1"]["spectral_flatness"] - local["s1"]["spectral_flatness"])
        < 1e-12
    )
