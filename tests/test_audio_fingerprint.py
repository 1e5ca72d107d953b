"""Spectral audio fingerprinting: codec-transcoding-robust identity.

The invariant under test: the SAME audio content stored under different
codecs (pcm_s16le / G.711 ulaw / alaw) collides within the Hamming
radius, while DIFFERENT content stays far outside it."""

from __future__ import annotations

import numpy as np
import pytest

from scylla_cdc_source_connector_spark import audio
from scylla_cdc_source_connector_spark.audio_fingerprint import (
    audio_near_dup,
    fingerprint_clips,
    _fingerprint_group,
)


def _clip(i: int, n: int = 4000) -> np.ndarray:
    rng = np.random.default_rng(100 + i)
    t = np.arange(n) / 8000.0
    f = 150.0 * (i + 1)
    x = (
        0.4 * np.sin(2 * np.pi * f * t)
        + 0.2 * np.sin(2 * np.pi * 2.3 * f * t)
        + 0.02 * rng.standard_normal(n)
    )
    return (np.clip(x, -1, 1) * 32767).astype(np.int16)


def _ham(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & (2**64 - 1)).count("1")


def test_kernel_transcoding_robust_and_content_distinct():
    pcms = [_clip(i) for i in range(8)]
    fp_s16, _, _ = _fingerprint_group(
        [audio.encode(p, "pcm_s16le") for p in pcms], "pcm_s16le"
    )
    fp_ulaw, _, _ = _fingerprint_group(
        [audio.encode(p, "ulaw") for p in pcms], "ulaw"
    )
    fp_alaw, _, _ = _fingerprint_group(
        [audio.encode(p, "alaw") for p in pcms], "alaw"
    )
    for a, b, c in zip(fp_s16, fp_ulaw, fp_alaw):
        assert _ham(a, b) <= 8
        assert _ham(a, c) <= 8
    cross = [
        _ham(fp_s16[i], fp_s16[j]) for i in range(8) for j in range(i + 1, 8)
    ]
    assert min(cross) > 8  # different content never inside the radius


def test_wav_container_unwrapped_in_fingerprint(spark):
    """A WAV-wrapped payload must fingerprint to the RAW payload's
    fingerprint (the container is unwrapped like audio._stats_one does) —
    a wav-codec stream feeding the dedup index must index real bits, not
    fp_ok=false rows."""
    import pandas as pd

    from scylla_cdc_source_connector_spark.audio_fingerprint import (
        audio_fingerprint_batches,
    )

    pcms = [_clip(i) for i in range(4)]
    pdf = pd.DataFrame(
        {
            "clip_id": [f"raw-{i}" for i in range(4)]
            + [f"wav-{i}" for i in range(4)]
            + ["bad-wav"],
            "bytes": [audio.encode(p, "pcm_s16le") for p in pcms]
            + [audio.wav_encode(p, 8000, "pcm_s16le") for p in pcms]
            + [b"RIFFxxxxWAVE"],
            "codec": ["pcm_s16le"] * 4 + ["wav"] * 5,
        }
    )
    out = next(audio_fingerprint_batches(iter([pdf]))).set_index("clip_id")
    for i in range(4):
        assert out.loc[f"wav-{i}", "fp_ok"]
        assert (
            out.loc[f"wav-{i}", "fingerprint"]
            == out.loc[f"raw-{i}", "fingerprint"]
        )
    assert not out.loc["bad-wav", "fp_ok"]


def test_stereo_wav_downmixed_matches_mono_raw():
    """A multichannel WAV must fingerprint to the MONO downmix (the
    audio.decode contract), not the interleaved L/R stream: the same
    content stored as stereo WAV and mono raw must be an exact duplicate,
    and n_samples must count frames."""
    import pandas as pd

    from scylla_cdc_source_connector_spark.audio_fingerprint import (
        audio_fingerprint_batches,
    )

    pcms = [_clip(i) for i in range(3)]
    stereo = []
    for p in pcms:
        inter = np.empty(2 * len(p), dtype=np.int16)
        inter[0::2] = p  # L == R == mono content
        inter[1::2] = p
        stereo.append(audio.wav_encode(inter, 8000, "pcm_s16le", 2))
    pdf = pd.DataFrame(
        {
            "clip_id": [f"raw-{i}" for i in range(3)]
            + [f"st-{i}" for i in range(3)],
            "bytes": [audio.encode(p, "pcm_s16le") for p in pcms] + stereo,
            "codec": ["pcm_s16le"] * 3 + ["wav"] * 3,
        }
    )
    out = next(audio_fingerprint_batches(iter([pdf]))).set_index("clip_id")
    for i in range(3):
        assert out.loc[f"st-{i}", "fp_ok"]
        assert (
            out.loc[f"st-{i}", "fingerprint"]
            == out.loc[f"raw-{i}", "fingerprint"]
        )
        # frames, not interleaved samples
        assert out.loc[f"st-{i}", "n_samples"] == len(pcms[i])


def test_banding_splits_occupied_bits_only():
    """The Hamming banding must split FP_BITS (46), not the full int64:
    every block must carry real signature bits (a block over the
    constant-zero high bits would put ALL rows in one bucket)."""
    from pyspark.sql import functions as F

    from scylla_cdc_source_connector_spark.audio_fingerprint import FP_BITS
    from scylla_cdc_source_connector_spark.functions.dedup import (
        hamming_band_blocks,
    )

    assert FP_BITS == 46
    for radius in (3, 8):
        blocks = hamming_band_blocks("fingerprint", radius, FP_BITS)
        assert len(blocks) == radius + 1
    with pytest.raises(ValueError):
        hamming_band_blocks("fingerprint", 63, FP_BITS)

    # total shifted width covers exactly FP_BITS: reconstructing the
    # signature from its blocks must be lossless for any 46-bit value
    import random

    random.seed(7)
    for radius in (3, 8):
        n_tables = radius + 1
        base, extra = divmod(FP_BITS, n_tables)
        widths = [base + (1 if t < extra else 0) for t in range(n_tables)]
        assert sum(widths) == FP_BITS
        for _ in range(20):
            v = random.getrandbits(FP_BITS)
            parts, off = [], 0
            for w in widths:
                parts.append((v >> off) & ((1 << w) - 1))
                off += w
            rebuilt = 0
            for w, p in zip(reversed(widths), reversed(parts)):
                rebuilt = (rebuilt << w) | p
            assert rebuilt == v


def test_kernel_deterministic_and_gain_invariant():
    p = _clip(3)
    raw = audio.encode(p, "pcm_s16le")
    a, _, _ = _fingerprint_group([raw], "pcm_s16le")
    b, _, _ = _fingerprint_group([raw], "pcm_s16le")
    assert a[0] == b[0]
    # half gain: every energy scales by the same factor -> same sign bits
    quiet = audio.encode((p // 2).astype(np.int16), "pcm_s16le")
    c, _, _ = _fingerprint_group([quiet], "pcm_s16le")
    assert _ham(a[0], c[0]) <= 4


def test_fingerprint_independent_of_batch_composition():
    """A clip's fingerprint must be a pure function of (bytes, codec) —
    not of which other clips share the Arrow batch (the incremental
    dedup index compares fingerprints computed in different batches).
    Regression: group-max padding made the FFT length depend on the
    longest co-batched clip."""
    raw = audio.encode(_clip(2, n=3000), "alaw")
    long_raw = audio.encode(_clip(5, n=50_000), "alaw")
    alone, _, _ = _fingerprint_group([raw], "alaw")
    batched, _, _ = _fingerprint_group([long_raw, raw, long_raw], "alaw")
    assert alone[0] == batched[1]


def test_invalid_and_short_clips_flagged(spark):
    rows = [
        ("empty", b"", "pcm_s16le"),
        ("odd", b"\x01\x02\x03", "pcm_s16le"),
        ("short", audio.encode(_clip(0, n=20), "pcm_s16le"), "pcm_s16le"),
        ("unsup", b"\x00" * 500, "opus"),
        ("good", audio.encode(_clip(1), "ulaw"), "ulaw"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r["clip_id"]: r for r in fingerprint_clips(df).collect()}
    assert not got["empty"]["fp_ok"]
    assert not got["odd"]["fp_ok"]
    assert not got["short"]["fp_ok"]
    assert not got["unsup"]["fp_ok"]
    assert got["good"]["fp_ok"] and got["good"]["fingerprint"] != 0


def test_near_dup_finds_exactly_the_transcoded_pairs(spark):
    rows = []
    for i in range(6):
        p = _clip(i)
        rows.append((f"c{i}-s16", audio.encode(p, "pcm_s16le"), "pcm_s16le"))
        rows.append((f"c{i}-ulaw", audio.encode(p, "ulaw"), "ulaw"))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    pairs = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in audio_near_dup(df).collect()
    }
    want = {tuple(sorted((f"c{i}-s16", f"c{i}-ulaw"))) for i in range(6)}
    assert pairs == want
