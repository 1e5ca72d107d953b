"""Sample-rate normalization (linear resampler) tests.

The grouped flat kernel must match the pinned single-clip reference
exactly; fidelity is bounded via SNR against analytically-sampled sines."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from scylla_cdc_source_connector_spark import audio
from scylla_cdc_source_connector_spark.audio_resample import (
    RESAMPLE_SCHEMA,
    resample_batches,
    resample_clips,
    resample_linear,
)

SR = 8000


def _sine(n, freq=440.0, amp=0.5, sr=SR):
    return (amp * np.sin(2 * np.pi * freq * np.arange(n) / sr) * 32767).astype(
        np.int16
    )


def test_group_kernel_matches_reference_kernel():
    """Five random-length µ-law clips resampled as one group == per-clip
    resample_linear, to within one PCM16 quantization step."""
    rng = np.random.default_rng(7)
    clips = []
    for i in range(5):
        n = int(rng.integers(100, 4000))
        pcm = 0.4 * np.sin(2 * np.pi * 300 * np.arange(n) / SR)
        pcm = pcm + 0.05 * rng.standard_normal(n)
        clips.append(
            (f"c{i}", np.clip(pcm * 32767, -32768, 32767).astype(np.int16))
        )
    rows = pd.DataFrame(
        {
            "clip_id": [c for c, _ in clips],
            "bytes": [audio.encode(p, "ulaw") for _, p in clips],
            "codec": ["ulaw"] * 5,
            "sr_hz": [SR] * 5,
        }
    )
    (out,) = list(resample_batches(16_000)(iter([rows])))
    for (cid, p16), (_, r) in zip(clips, out.iterrows()):
        src = audio.decode(audio.encode(p16, "ulaw"), "ulaw")
        ref = resample_linear(src, SR, 16_000)
        got = np.frombuffer(r["bytes"], dtype="<i2").astype(np.float32) / 32768.0
        assert len(got) == len(ref) == r["n_samples"]
        assert np.abs(got - ref).max() <= 1.0 / 32768.0 + 1e-6


@pytest.mark.parametrize("sr_to", [16_000, 22_050, 4_000])
def test_resample_sine_fidelity(sr_to):
    """Resampled 440 Hz sine vs the analytically-sampled sine at the
    target rate: SNR >= 30 dB (the pipeline floor) up and down."""
    sine8 = _sine(SR)  # 1 s
    out = resample_linear(sine8.astype(np.float32) / 32768.0, SR, sr_to)
    assert len(out) == round(SR * sr_to / SR * (sr_to / sr_to))  # sanity
    t = np.arange(len(out)) / sr_to
    ref = 0.5 * np.sin(2 * np.pi * 440.0 * t) * (32767 / 32768)
    assert audio.snr_db(ref, out) >= 30.0


def test_identity_and_empty():
    sine = _sine(1000)
    f = sine.astype(np.float32) / 32768.0
    np.testing.assert_array_equal(resample_linear(f, SR, SR), f)
    assert len(resample_linear(np.empty(0, np.float32), SR, 16_000)) == 0


def test_batch_edge_cases():
    """Empty payload (0 samples, ok), stereo WAV (downmix then resample),
    odd-length pcm16 (decode_ok=False), missing sr (decode_ok=False)."""
    sine = _sine(400)
    stereo = np.ravel(np.column_stack([sine, sine]))
    rows = pd.DataFrame(
        {
            "clip_id": ["empty", "stereo", "corrupt", "nosr"],
            "bytes": [
                b"",
                audio.wav_encode(stereo, SR, "pcm_s16le", n_channels=2),
                b"\x01\x02\x03",
                _sine(100).tobytes(),
            ],
            "codec": ["pcm_s16le", "wav", "pcm_s16le", "pcm_s16le"],
            "sr_hz": [SR, SR, SR, None],
        }
    )
    (out,) = list(resample_batches(16_000)(iter([rows])))
    out = out.set_index("clip_id")
    assert out.loc["empty", "decode_ok"] and out.loc["empty", "n_samples"] == 0
    assert out.loc["stereo", "n_samples"] == 800
    assert not out.loc["corrupt", "decode_ok"]
    assert not out.loc["nosr", "decode_ok"]
    # downmixed stereo == mono source resampled
    mono_ref = resample_linear(sine.astype(np.float32) / 32768.0, SR, 16_000)
    got = (
        np.frombuffer(out.loc["stereo", "bytes"], dtype="<i2").astype(np.float32)
        / 32768.0
    )
    assert np.abs(got - mono_ref).max() <= 1.0 / 32768.0 + 1e-6


def test_resample_clips_spark(spark):
    """DataFrame surface: mixed codecs/rates normalize to one
    (pcm_s16le, target_sr) corpus; output decodes with the stock path."""
    sine = _sine(2000)
    pdf = pd.DataFrame(
        {
            "clip_id": ["u", "a", "p"],
            "bytes": [
                audio.encode(sine, "ulaw"),
                audio.encode(sine, "alaw"),
                audio.encode(sine, "pcm_s16le"),
            ],
            "codec": ["ulaw", "alaw", "pcm_s16le"],
            "sr_hz": [SR] * 3,
        }
    )
    out = resample_clips(spark.createDataFrame(pdf), target_sr=16_000)
    rows = {r["clip_id"]: r for r in out.collect()}
    assert set(rows) == {"u", "a", "p"}
    for r in rows.values():
        assert r["decode_ok"] and r["codec"] == "pcm_s16le"
        assert r["sr_hz"] == 16_000 and r["n_samples"] == 4000
        pcm = audio.decode(bytes(r["bytes"]), "pcm_s16le")
        t = np.arange(len(pcm)) / 16_000
        ref = 0.5 * np.sin(2 * np.pi * 440.0 * t) * (32767 / 32768)
        assert audio.snr_db(ref, pcm) >= 30.0
