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


# ---------------------------------------------------------------------------
# log-mel / MFCC
# ---------------------------------------------------------------------------

from scylla_cdc_source_connector_spark.audio_features import (  # noqa: E402
    MEL_FEATURES_SCHEMA,
    _hz_to_mel,
    _mel_one,
    _mel_to_hz,
    _mel_weights,
    extract_mel_features,
)

N_MELS, N_MFCC = 40, 13


def _run_mel(rows):
    out = _mel_one(_pdf(rows), N_MELS, N_MFCC)
    return {r["clip_id"]: r for _, r in out.iterrows()}


def _mel_centers_hz(sr):
    edges = _mel_to_hz(np.linspace(0.0, _hz_to_mel(sr / 2.0), N_MELS + 2))
    return edges[1:-1]


def test_mel_tone_lands_in_nearest_filter_multi_sr():
    """A pure tone's energy peaks in the mel filter whose center is
    nearest the tone, for 8 kHz and 16 kHz clips batched together (the
    per-sample-rate filterbank split)."""
    rows = []
    for sr, f in ((8000, 700.0), (16000, 3000.0)):
        rows.append(
            (f"t{sr}", audio.encode(_tone(sr, f, sr=sr), "pcm_s16le"),
             "pcm_s16le", sr)
        )
    r = _run_mel(rows)
    for sr, f in ((8000, 700.0), (16000, 3000.0)):
        row = r[f"t{sr}"]
        assert row["decode_ok"] and row["n_frames"] > 0
        lm = np.asarray(row["log_mel"])
        assert len(lm) == N_MELS
        centers = _mel_centers_hz(sr)
        peak, nearest = int(np.argmax(lm)), int(np.argmin(np.abs(centers - f)))
        assert abs(peak - nearest) <= 1, (sr, f, peak, nearest)


def test_mel_amplitude_moves_only_c0():
    """Scaling the waveform by g adds log(g^2) to every log-mel band, so
    after the orthonormal DCT only coefficient 0 moves — an exact
    property of log + DCT that pins the whole kernel chain."""
    rng = np.random.default_rng(11)
    base = rng.uniform(-0.4, 0.4, SR)
    loud = np.clip(base * 2.0, -1, 1)
    rows = [
        ("soft", audio.encode((base * 32767).astype(np.int16), "pcm_s16le"),
         "pcm_s16le", SR),
        ("loud", audio.encode((loud * 32767).astype(np.int16), "pcm_s16le"),
         "pcm_s16le", SR),
    ]
    r = _run_mel(rows)
    lm_soft = np.asarray(r["soft"]["log_mel"], dtype=np.float64)
    lm_loud = np.asarray(r["loud"]["log_mel"], dtype=np.float64)
    shift = lm_loud - lm_soft
    assert np.allclose(shift, np.log(4.0), atol=0.02)  # log(g^2), g=2
    mm_soft = np.asarray(r["soft"]["mfcc_mean"], dtype=np.float64)
    mm_loud = np.asarray(r["loud"]["mfcc_mean"], dtype=np.float64)
    assert mm_loud[0] > mm_soft[0] + 1.0  # c0 carries the gain
    assert np.allclose(mm_loud[1:], mm_soft[1:], atol=0.05)


def test_mel_filterbank_covers_spectrum():
    """Filterbank sanity: weights in [0, 1], every filter catches at
    least one FFT bin at half height (narrow low-mel triangles sampled on
    the discrete grid peak below 1 — that is expected), wide upper
    filters peak at ~1, and interior FFT bins are covered by at least one
    filter (no spectral holes)."""
    w = _mel_weights(16000, N_MELS)
    assert w.shape == (N_MELS, WIN // 2 + 1)
    assert (w >= 0).all() and (w <= 1.0).all()
    assert (w.max(axis=1) > 0.5).all()
    # wide upper filters land a bin near the peak (grid quantization only)
    assert (w[N_MELS // 2 :].max(axis=1) > 0.9).all()
    interior = w[:, 2:-2].sum(axis=0)
    assert (interior > 0).all()


def test_mel_stereo_wav_and_short_and_invalid():
    pcm = _tone(SR, 440)
    left, right = _tone(SR, 440), _tone(SR, 880)
    inter = np.empty(2 * SR, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    rows = [
        ("mono", audio.encode(pcm, "pcm_s16le"), "pcm_s16le", SR),
        ("st", audio.wav_encode(inter, SR, "pcm_s16le", n_channels=2), "wav", 0),
        ("short", audio.encode(_tone(WIN - 1), "pcm_s16le"), "pcm_s16le", SR),
        ("opus", b"\x00" * 64, "opus", SR),
    ]
    r = _run_mel(rows)
    assert r["mono"]["decode_ok"] and r["st"]["decode_ok"]
    # short clip decodes but fills no frame: features are null
    assert r["short"]["decode_ok"] and r["short"]["n_frames"] == 0
    assert r["short"]["log_mel"] is None and r["short"]["mfcc_mean"] is None
    assert not r["opus"]["decode_ok"]
    # stereo downmix keeps a 440+880 mix: peak within the 400-900 Hz mels
    lm = np.asarray(r["st"]["log_mel"])
    centers = _mel_centers_hz(SR)
    assert 350.0 < centers[int(np.argmax(lm))] < 1000.0


def test_mel_spark_integration(spark):
    """extract_mel_features: schema, no Exchange, values match the local
    kernel bit-for-bit (same code path through Arrow)."""
    pcm = _tone(SR, 700)
    df = spark.createDataFrame(
        [("m1", bytearray(audio.encode(pcm, "pcm_s16le")), "pcm_s16le", SR),
         ("m2", None, "pcm_s16le", SR)],
        "clip_id string, bytes binary, codec string, sr_hz int",
    )
    out = extract_mel_features(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["clip_id"]: r for r in out.collect()}
    assert got["m1"]["decode_ok"] and not got["m2"]["decode_ok"]
    local = _run_mel([("m1", audio.encode(pcm, "pcm_s16le"), "pcm_s16le", SR)])
    assert np.allclose(
        np.asarray(got["m1"]["mfcc_mean"]),
        np.asarray(local["m1"]["mfcc_mean"]),
        atol=1e-6,
    )
    assert len(got["m1"]["log_mel"]) == 40 and len(got["m1"]["mfcc_std"]) == 13


# ---------------------------------------------------------------------------
# pitch / voicing
# ---------------------------------------------------------------------------

from scylla_cdc_source_connector_spark.audio_features import (  # noqa: E402
    _pitch_one,
    extract_pitch,
)


def _run_pitch(rows):
    out = _pitch_one(_pdf(rows))
    return {r["clip_id"]: r for _, r in out.iterrows()}


def _pulse_train(n, f0, sr, amp=0.6):
    """Harmonic-rich periodic signal (speech-like glottal excitation)."""
    period = int(round(sr / f0))
    x = np.zeros(n)
    x[::period] = 1.0
    # one-pole smoothing so the pulse has energy spread like a formant
    y = np.empty(n)
    acc = 0.0
    for i in range(n):
        acc = 0.97 * acc + x[i]
        y[i] = acc
    y = y - y.mean()
    y /= np.abs(y).max()
    return (amp * y * 32767).astype(np.int16)


def test_pitch_tone_and_pulse_train_multi_sr():
    """A sine tracks its own frequency as F0; a 200 Hz pulse train tracks
    its period; both for 8 k and 16 k clips batched together; std near 0
    for stationary sources."""
    rows = [
        ("sine8", audio.encode(_tone(SR * 2, 220.0), "pcm_s16le"),
         "pcm_s16le", SR),
        ("pulse8", audio.encode(_pulse_train(SR * 2, 200.0, SR), "pcm_s16le"),
         "pcm_s16le", SR),
        ("sine16", audio.encode(_tone(32000, 330.0, sr=16000), "pcm_s16le"),
         "pcm_s16le", 16000),
    ]
    r = _run_pitch(rows)
    for cid, want, sr in (
        ("sine8", 220.0, SR), ("pulse8", 200.0, SR), ("sine16", 330.0, 16000)
    ):
        row = r[cid]
        assert row["decode_ok"] and row["voiced_ratio"] > 0.9, cid
        # lag quantization: F0 resolution is sr/lag vs sr/(lag±1)
        lag = round(sr / want)
        tol = max(sr / (lag - 1) - sr / lag, 3.0)
        assert abs(row["f0_mean_hz"] - want) < tol + 1e-9, (cid, row["f0_mean_hz"])
        assert row["f0_std_hz"] < 10.0, cid


def test_pitch_noise_unvoiced_and_invalid():
    rng = np.random.default_rng(3)
    noise = (rng.uniform(-0.5, 0.5, SR * 2) * 32767).astype(np.int16)
    rows = [
        ("noise", audio.encode(noise, "pcm_s16le"), "pcm_s16le", SR),
        ("short", audio.encode(_tone(WIN - 1), "pcm_s16le"), "pcm_s16le", SR),
        ("opus", b"\x00" * 64, "opus", SR),
    ]
    r = _run_pitch(rows)
    assert r["noise"]["decode_ok"] and r["noise"]["voiced_ratio"] < 0.3
    assert r["short"]["decode_ok"] and r["short"]["n_frames"] == 0
    assert np.isnan(r["short"]["voiced_ratio"])
    assert not r["opus"]["decode_ok"]


def test_pitch_spark_integration(spark):
    pcm = _tone(SR * 2, 220.0)
    df = spark.createDataFrame(
        [("p1", bytearray(audio.encode(pcm, "pcm_s16le")), "pcm_s16le", SR)],
        "clip_id string, bytes binary, codec string, sr_hz int",
    )
    out = extract_pitch(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    row = out.collect()[0]
    local = _run_pitch([("p1", audio.encode(pcm, "pcm_s16le"), "pcm_s16le", SR)])
    assert abs(row["f0_mean_hz"] - local["p1"]["f0_mean_hz"]) < 1e-9
    assert row["voiced_ratio"] > 0.9
