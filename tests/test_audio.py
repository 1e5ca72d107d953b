"""Audio codec + Spark plumbing tests (input_hint invariant: decoded-PCM
SNR >= 30 dB, transcript equality)."""

from __future__ import annotations

import numpy as np
import pytest

from scylla_cdc_source_connector_spark import audio, fixtures


def _test_pcm(n=8000, sr=8000):
    rng = np.random.default_rng(7)
    t = np.arange(n) / sr
    sig = 18000 * np.sin(2 * np.pi * 300 * t) + 400 * rng.standard_normal(n)
    return np.clip(sig, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("codec", audio.SUPPORTED_CODECS)
def test_roundtrip_snr(codec):
    pcm = _test_pcm()
    ref = pcm.astype(np.float32) / 32768.0
    dec = audio.decode(audio.encode(pcm, codec), codec)
    assert len(dec) == len(pcm)
    assert audio.snr_db(ref, dec) >= 30.0


def test_pcm16_lossless():
    pcm = _test_pcm()
    dec = audio.decode(audio.encode(pcm, "pcm_s16le"), "pcm_s16le")
    assert np.array_equal((dec * 32768.0).astype(np.int16), pcm)


def test_ulaw_known_values():
    # silence encodes near 0xFF / 0x7F (G.711: +0 → 0xFF)
    enc = audio.ulaw_encode(np.array([0], dtype=np.int16))
    assert enc[0] in (0xFF, 0x7F)
    # monotone: larger magnitude → larger decoded magnitude
    pcm = np.array([100, 1000, 10000, 30000], dtype=np.int16)
    dec = audio.ulaw_decode(audio.ulaw_encode(pcm))
    assert np.all(np.diff(dec.astype(np.int32)) > 0)


def test_alaw_sign_symmetry():
    pcm = np.array([-20000, -100, 100, 20000], dtype=np.int16)
    dec = audio.alaw_decode(audio.alaw_encode(pcm))
    assert np.all(np.sign(dec) == np.sign(pcm))


def test_unsupported_codec_raises():
    with pytest.raises(audio.UnsupportedCodecError):
        audio.decode(b"xx", "opus")
    with pytest.raises(audio.UnsupportedCodecError):
        audio.encode(np.zeros(4, dtype=np.int16), "mp3")


def test_clip_reference_pcm_deterministic():
    a = fixtures.clip_reference_pcm(5, 8000, 1600)
    b = fixtures.clip_reference_pcm(5, 8000, 1600)
    c = fixtures.clip_reference_pcm(6, 8000, 1600)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_fixture_clips_decode_to_reference_pcm(small_spec):
    """End-invariant at generator level: decode(bytes, codec) ≈ reference
    waveform with SNR >= 30 dB for every codec."""
    clips = fixtures.make_clips(
        fixtures.FixtureSpec(n_events=10, n_clips=30, seed=small_spec.seed)
    )
    for _, row in clips.iterrows():
        n_samples = int(row["sr_hz"]) * int(row["dur_ms"]) // 1000
        ref = (
            fixtures.clip_reference_pcm(int(row["clip_index"]), int(row["sr_hz"]), n_samples)
            .astype(np.float32)
            / 32768.0
        )
        dec = audio.decode(row["bytes"], row["codec"])
        assert audio.snr_db(ref, dec) >= 30.0, row["codec"]


def test_stats_group_empty_payload_does_not_truncate_neighbor():
    """Regression: a zero-length payload as the LAST row of a codec group
    must not steal the previous clip's final sample (the old reduceat
    clamp handed pcm[-1] to the masked empty segment)."""
    pcm = np.array([30000, -25000, 29000], dtype=np.int16)
    raw = audio.encode(pcm, "pcm_s16le")
    ref = pcm.astype(np.float32) / 32768.0
    exp_rms = float(np.sqrt(np.mean((ref.astype(np.float64)) ** 2)))
    exp_peak = float(np.max(np.abs(ref)))

    for group in ([raw, b""], [b"", raw], [b"", raw, b""], [raw]):
        pos = group.index(raw)
        ns, rms, peak, snr = audio._stats_codec_group(group, "pcm_s16le")
        assert ns[pos] == 3
        assert rms[pos] == pytest.approx(exp_rms, rel=1e-6), group
        assert peak[pos] == pytest.approx(exp_peak, rel=1e-6), group
        assert snr[pos] == np.inf
        for i in range(len(group)):
            if i != pos:
                assert ns[i] == 0 and rms[i] == 0.0 and peak[i] == 0.0
                assert snr[i] == np.inf

    # all-empty group is the fixed point
    ns, rms, peak, snr = audio._stats_codec_group([b"", b""], "ulaw")
    assert (ns == 0).all() and (rms == 0).all() and (peak == 0).all()
    assert (snr == np.inf).all()

    # lossy codec path: empty neighbor must not perturb SNR segmentation
    enc = audio.encode(pcm, "ulaw")
    ns, rms, peak, snr = audio._stats_codec_group([enc, b""], "ulaw")
    solo_ns, solo_rms, solo_peak, solo_snr = audio._stats_codec_group([enc], "ulaw")
    assert ns[0] == solo_ns[0]
    assert rms[0] == pytest.approx(solo_rms[0])
    assert peak[0] == pytest.approx(solo_peak[0])
    assert snr[0] == pytest.approx(solo_snr[0])


def test_audio_stats_mapinpandas(spark, changelog_df):
    """Spark-side plumbing: mapInPandas decode over POST_IMAGE rows."""
    src = changelog_df.where("`cdc$operation` = 9").select(
        "clip_id", "bytes", "codec"
    ).limit(200)
    stats = src.mapInPandas(audio.audio_stats_batches, audio.AUDIO_STATS_SCHEMA)
    pdf = stats.toPandas()
    assert len(pdf) == src.count()
    ok = pdf[pdf["decode_ok"]]
    assert len(ok) == len(pdf)  # all fixture codecs decodable
    assert (ok["n_samples"] > 0).all()
    assert (ok["roundtrip_snr_db"] >= 30.0).all()
