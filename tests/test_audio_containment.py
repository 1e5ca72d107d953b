"""Partial-duplicate / containment detection
(audio_fingerprint.audio_containment): a transcoded excerpt of a long
clip must be reported as contained with high coverage; unrelated clips
must not pair."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark import audio
from scylla_cdc_source_connector_spark.audio_fingerprint import (
    audio_containment,
)

SR = 8000
WINDOW_MS = 250
HOP_MS = 125


def _broadband_clip(idx: int, n: int) -> np.ndarray:
    """Deterministic broadband signal (shaped noise + slow envelope) —
    the realistic case for spectral fingerprints.  Narrow-band pure-tone
    synthetics are a known-degenerate input (most bands hold only the
    noise floor, so the sign bits collapse); real speech/audio is
    broadband, which is what the fixture clips and this generator model.
    Independent noise per clip index makes different clips unrelated."""
    rng = np.random.default_rng(1000 + idx)
    w = rng.standard_normal(n + 8)
    taps = rng.uniform(-1, 1, 8)  # random FIR = clip-specific spectrum
    sig = np.convolve(w, taps, mode="valid")[:n]
    t = np.arange(n) / SR
    sig *= 1.0 + 0.5 * np.sin(
        2 * np.pi * rng.uniform(0.5, 3.0) * t + rng.uniform(0, 6)
    )
    # audio.encode takes int16 PCM samples
    return (sig / np.abs(sig).max() * 0.7 * 32767).astype(np.int16)


@pytest.fixture(scope="module")
def corpus(spark):
    hop_samples = SR * HOP_MS // 1000
    rows = []
    excerpts = []
    for i in range(6):
        n = SR * 3  # 3 s container clips
        pcm = _broadband_clip(i, n)
        rows.append(
            (f"long-{i}", audio.encode(pcm, "pcm_s16le"), "pcm_s16le", SR)
        )
        # hop-aligned 1 s excerpt, TRANSCODED to ulaw (the caveat case the
        # operator guarantees: offset is a multiple of hop)
        off = 4 * hop_samples
        ex = pcm[off : off + SR]
        rows.append((f"ex-{i}", audio.encode(ex, "ulaw"), "ulaw", SR))
        excerpts.append((f"long-{i}", f"ex-{i}"))
    pdf = pd.DataFrame(rows, columns=["clip_id", "bytes", "codec", "sr_hz"])
    df = spark.createDataFrame(pdf)
    # operator DEFAULTS (radius 5, min_coverage 0.6): measured broadband
    # separation is aligned-excerpt coverage 1.00 vs best cross-clip 0.00
    # at radius 5 (0.35 even at radius 7) — wide margin both sides
    got = audio_containment(df, window_ms=WINDOW_MS, hop_ms=HOP_MS).toPandas()
    return got, excerpts


def test_excerpts_detected_as_contained(corpus):
    got, excerpts = corpus
    found = {
        (r["container_id"], r["contained_id"]) for _, r in got.iterrows()
    }
    hits = [pair for pair in excerpts if pair in found]
    # fingerprints are heuristic; require the large majority, not luck
    assert len(hits) >= len(excerpts) - 1, (found, excerpts)
    for cont, ex in hits:
        row = got[(got.container_id == cont) & (got.contained_id == ex)]
        assert float(row["coverage"].iloc[0]) >= 0.7


def test_no_cross_clip_false_pairs(corpus):
    got, excerpts = corpus
    legit = set()
    for a, b in excerpts:
        legit.add((a, b))
        legit.add((b, a))  # reverse direction may also clear 50% by luck
        # full-duplicate-ish symmetric matches between a clip and its own
        # excerpt are the only acceptable rows
    for _, r in got.iterrows():
        assert (r["container_id"], r["contained_id"]) in legit, r


def test_counts_and_coverage_shape(corpus):
    got, _ = corpus
    assert (got["n_matched_segments"] <= got["n_segments_contained"]).all()
    assert ((got["coverage"] > 0) & (got["coverage"] <= 1.0)).all()


def test_misaligned_excerpt_detected_with_offset_sweep(spark):
    """A 200 ms excerpt at an ARBITRARY (non-hop-multiple) offset must be
    detected with offset_sweep: window 96 ms / hop 48 ms / sweep 4 bounds
    the per-segment shift at 6 ms (6% of the window), inside the
    fingerprint's Hamming radius for broadband content."""
    window_ms, hop_ms, sweep = 96, 48, 4
    rows = []
    expected = []
    for i in range(4):
        n = SR * 2
        pcm = _broadband_clip(50 + i, n)
        rows.append(
            (f"long-{i}", audio.encode(pcm, "pcm_s16le"), "pcm_s16le", SR)
        )
        # 37 ms offset: not a multiple of hop (48), nor of hop/sweep (12)
        off = SR * 37 // 1000
        ex = pcm[off : off + SR * 200 // 1000]
        rows.append((f"ex-{i}", audio.encode(ex, "ulaw"), "ulaw", SR))
        expected.append((f"long-{i}", f"ex-{i}"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "bytes", "codec", "sr_hz"])
    )
    got = audio_containment(
        df,
        window_ms=window_ms,
        hop_ms=hop_ms,
        offset_sweep=sweep,
        min_matched_segments=1,
        min_coverage=0.5,
    ).toPandas()
    found = {
        (r["container_id"], r["contained_id"]) for _, r in got.iterrows()
    }
    hits = [p for p in expected if p in found]
    assert len(hits) >= len(expected) - 1, (found, expected)
    # no cross-clip pollution from the finer grid
    legit = {p for pair in expected for p in (pair, pair[::-1])}
    assert found <= legit, found

    with pytest.raises(ValueError, match="offset_sweep"):
        audio_containment(df, window_ms=96, hop_ms=48, offset_sweep=5)
