"""WAV container decode + VAD/silence segmentation tests.

The WAV path is a REAL container decode (RIFF chunk walk, fmt-tag
dispatch onto the vectorized G.711/PCM16 decoders) — not a stubbed
kernel.  VAD is validated on constructed silence|tone|silence signals
with known frame arithmetic."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from scylla_cdc_source_connector_spark import audio
from scylla_cdc_source_connector_spark.audio_vad import (
    VAD_SCHEMA,
    vad_stats,
    vad_stats_batches,
)

SR = 8000


def _tone(n, freq=440.0, amp=0.5, sr=SR):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)


def _silence(n):
    return np.zeros(n, dtype=np.int16)


# -------------------------------------------------------------- WAV ------


def test_wav_roundtrip_pcm16():
    pcm = _tone(1600)
    blob = audio.wav_encode(pcm, SR, "pcm_s16le")
    codec, ch, sr, payload = audio.wav_parse(blob)
    assert (codec, ch, sr) == ("pcm_s16le", 1, SR)
    out = audio.decode(blob, "wav")
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0)


@pytest.mark.parametrize("inner", ["ulaw", "alaw"])
def test_wav_g711_inner(inner):
    pcm = _tone(800)
    blob = audio.wav_encode(pcm, SR, inner)
    out = audio.decode(blob, "wav")
    ref = audio.decode(audio.encode(pcm, inner), inner)
    np.testing.assert_array_equal(out, ref)
    assert audio.snr_db(pcm / 32768.0, out) >= 30.0


def test_wav_stereo_downmix():
    left, right = _tone(400, 440), _tone(400, 880)
    inter = np.empty(800, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    blob = audio.wav_encode(inter, SR, "pcm_s16le", n_channels=2)
    out = audio.decode(blob, "wav")
    assert len(out) == 400
    ref = (left.astype(np.float32) + right) / 2.0 / 32768.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_wav_malformed_and_unsupported():
    with pytest.raises(audio.MalformedContainerError):
        audio.wav_parse(b"RIFFxxxxNOPE")
    with pytest.raises(audio.MalformedContainerError):
        audio.wav_parse(b"OGGS" + b"\x00" * 40)
    # IEEE-float format tag 3 → unsupported, not a crash
    pcm = _tone(100)
    blob = bytearray(audio.wav_encode(pcm, SR, "pcm_s16le"))
    blob[20:22] = (3).to_bytes(2, "little")
    with pytest.raises(audio.UnsupportedCodecError):
        audio.wav_parse(bytes(blob))


def test_wav_rows_in_stats_batches():
    """WAV rows ride the same vectorized group pass; corrupt WAVs flag
    decode_ok=False without disturbing neighbors."""
    pcm = _tone(1600)
    rows = pd.DataFrame(
        {
            "clip_id": ["w1", "w2", "bad", "raw"],
            "bytes": [
                audio.wav_encode(pcm, SR, "pcm_s16le"),
                audio.wav_encode(pcm, SR, "ulaw"),
                b"RIFF\x00\x00\x00\x00WAVEjunk",
                audio.encode(pcm, "pcm_s16le"),
            ],
            "codec": ["wav", "wav", "wav", "pcm_s16le"],
        }
    )
    (out,) = list(audio.audio_stats_batches(iter([rows])))
    out = out.set_index("clip_id")
    assert bool(out.loc["w1", "decode_ok"]) and bool(out.loc["w2", "decode_ok"])
    assert not bool(out.loc["bad", "decode_ok"])
    # container stats == raw-payload stats for the same samples
    assert out.loc["w1", "n_samples"] == out.loc["raw", "n_samples"] == 1600
    assert out.loc["w1", "rms"] == pytest.approx(out.loc["raw", "rms"])
    assert out.loc["w2", "roundtrip_snr_db"] >= 30.0


# -------------------------------------------------------------- VAD ------


def _vad_one(pcm16, codec="pcm_s16le", sr=SR, frame_ms=20, thr=-40.0,
             blob=None):
    rows = pd.DataFrame(
        {
            "clip_id": ["c"],
            "bytes": [blob if blob is not None else audio.encode(pcm16, codec)],
            "codec": [codec],
            "sr_hz": [sr],
        }
    )
    (out,) = list(vad_stats_batches(frame_ms, thr)(iter([rows])))
    return out.iloc[0]


def test_vad_silence_tone_silence():
    """300 ms silence | 500 ms tone | 200 ms silence at 8 kHz, 20 ms
    frames: speech span = frames 15..39 → trim [300 ms, 800 ms)."""
    sig = np.concatenate(
        [_silence(2400), _tone(4000), _silence(1600)]
    )
    r = _vad_one(sig)
    assert r["decode_ok"] and r["n_frames"] == 50
    assert r["speech_frames"] == 25
    assert r["trim_start_ms"] == 300 and r["trim_end_ms"] == 800
    assert r["speech_ratio"] == pytest.approx(0.5)
    # byte offsets are sample-aligned (2 B/sample pcm16)
    assert r["trim_start_b"] == 2400 * 2 and r["trim_end_b"] == 6400 * 2


def test_vad_all_silence_and_all_speech():
    r = _vad_one(_silence(4000))
    assert r["speech_frames"] == 0 and r["speech_ratio"] == 0.0
    assert r["trim_start_ms"] == 0 and r["trim_end_ms"] == 0
    r = _vad_one(_tone(4000))
    assert r["speech_frames"] == r["n_frames"] == 25
    assert r["trim_end_ms"] == 500


def test_vad_ulaw_and_wav_groups_match_pcm():
    sig = np.concatenate([_silence(1600), _tone(3200), _silence(800)])
    r_pcm = _vad_one(sig)
    r_ulaw = _vad_one(sig, codec="ulaw")
    r_wav = _vad_one(sig, codec="wav", blob=audio.wav_encode(sig, SR, "alaw"))
    for r in (r_ulaw, r_wav):
        assert r["trim_start_ms"] == r_pcm["trim_start_ms"]
        assert r["trim_end_ms"] == r_pcm["trim_end_ms"]
        assert r["speech_frames"] == r_pcm["speech_frames"]
    # G.711 byte offsets are 1 B/sample
    assert r_ulaw["trim_start_b"] == r_pcm["trim_start_b"] // 2


def test_vad_empty_and_corrupt_rows_do_not_disturb_neighbors():
    sig = np.concatenate([_silence(1600), _tone(1600)])
    rows = pd.DataFrame(
        {
            "clip_id": ["a", "empty", "odd", "b"],
            "bytes": [
                audio.encode(sig, "pcm_s16le"),
                b"",
                b"\x01\x02\x03",  # odd-length pcm16 → corrupt
                audio.encode(sig, "pcm_s16le"),
            ],
            "codec": ["pcm_s16le"] * 4,
            "sr_hz": [SR] * 4,
        }
    )
    (out,) = list(vad_stats_batches(20, -40.0)(iter([rows])))
    out = out.set_index("clip_id")
    assert bool(out.loc["a", "decode_ok"]) and bool(out.loc["b", "decode_ok"])
    assert not bool(out.loc["odd", "decode_ok"])
    assert out.loc["a", "trim_start_ms"] == 200
    assert (out.loc["a"] == out.loc["b"]).all()


def test_vad_spark_and_jvm_side_trim(spark):
    """End-to-end: vad_stats over a DataFrame, then the documented
    JVM-side substring trim — the trimmed payload decodes to exactly the
    speech span (payload never re-enters Python for the slice)."""
    from pyspark.sql import functions as F

    sig = np.concatenate([_silence(2400), _tone(4000), _silence(1600)])
    pdf = pd.DataFrame(
        {
            "clip_id": ["c1"],
            "bytes": [audio.encode(sig, "pcm_s16le")],
            "codec": ["pcm_s16le"],
            "sr_hz": [SR],
        }
    )
    df = spark.createDataFrame(pdf)
    v = vad_stats(df)
    joined = df.join(v.select("clip_id", "trim_start_b", "trim_end_b"), "clip_id")
    trimmed = joined.select(
        "clip_id",
        F.expr(
            "substring(bytes, cast(1 + trim_start_b as int), "
            "cast(trim_end_b - trim_start_b as int))"
        ).alias("speech_bytes"),
    ).first()
    got = np.frombuffer(trimmed["speech_bytes"], dtype="<i2")
    np.testing.assert_array_equal(got, sig[2400:6400])


def test_trim_clips_single_pass(spark):
    """trim_clips: the emitted slice equals bytes[trim_start_b:trim_end_b]
    of the (unwrapped) payload, silence-only rows come back empty, and
    re-running VAD on a trimmed clip finds speech spanning ~everything."""
    import numpy as np
    import pandas as pd

    from scylla_cdc_source_connector_spark import audio
    from scylla_cdc_source_connector_spark.audio_vad import (
        trim_clips,
        vad_stats,
    )

    sr = 8000
    t = np.arange(sr) / sr
    speech = (np.sin(2 * np.pi * 440 * t) * 0.5 * 32767).astype(np.int16)
    silence = np.zeros(sr // 2, dtype=np.int16)
    pcm = np.concatenate([silence, speech, silence])
    rows = [
        ("padded", audio.encode(pcm, "pcm_s16le"), "pcm_s16le", sr),
        ("silent", audio.encode(np.zeros(sr, np.int16), "pcm_s16le"),
         "pcm_s16le", sr),
        ("wavpad", audio.wav_encode(pcm, sr, "pcm_s16le"), "wav", sr),
        ("badcodec", b"\x01\x02\x03", "opus", sr),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "bytes", "codec", "sr_hz"])
    )
    got = trim_clips(df).toPandas().set_index("clip_id")

    padded = got.loc["padded"]
    raw = bytes(rows[0][1])
    assert bytes(padded["bytes"]) == raw[
        int(padded["trim_start_b"]) : int(padded["trim_end_b"])
    ]
    # trimmed clip is mostly speech: ~1 s kept of the 2 s input
    assert 0.8 * sr * 2 <= len(padded["bytes"]) <= 1.3 * sr * 2

    assert len(bytes(got.loc["silent"]["bytes"])) == 0

    wavpad = got.loc["wavpad"]
    assert wavpad["codec"] == "pcm_s16le"  # unwrapped
    assert len(bytes(wavpad["bytes"])) == len(bytes(padded["bytes"]))

    bad = got.loc["badcodec"]
    assert not bad["decode_ok"]
    assert bytes(bad["bytes"]) == b"\x01\x02\x03"  # passthrough untrimmed

    # idempotence-ish: VAD on the trimmed clip sees speech start at 0
    again = vad_stats(
        spark.createDataFrame(
            pd.DataFrame(
                [("padded2", bytes(padded["bytes"]), "pcm_s16le", sr)],
                columns=["clip_id", "bytes", "codec", "sr_hz"],
            )
        )
    ).toPandas().iloc[0]
    assert again["trim_start_ms"] == 0
    assert again["speech_ratio"] >= 0.9


# ---------------------------------------------------- spans + SNR --------


def test_vad_snr_estimate():
    """VAD-referenced SNR: a -6 dBFS tone over near-digital silence reads
    a large positive SNR; adding a known noise floor brings it near the
    constructed ratio; one-sided clips (all speech / all silence) are
    NaN."""
    rng = np.random.RandomState(3)
    tone = _tone(4000, amp=0.5)
    noise = (rng.randn(4000) * 0.005 * 32767).astype(np.int16)
    sig = np.concatenate([noise, tone, noise])
    r = _vad_one(sig)
    # speech power ~ amp^2/2 = 0.125; noise power ~ 2.5e-5 -> ~37 dB
    assert 30.0 < r["snr_db"] < 45.0
    louder = (rng.randn(4000) * 0.05 * 32767).astype(np.int16)
    r2 = _vad_one(np.concatenate([louder, tone, louder]), thr=-20.0)
    assert r2["snr_db"] < r["snr_db"] - 10.0
    assert np.isnan(_vad_one(_tone(4000))["snr_db"])  # all speech
    assert np.isnan(_vad_one(_silence(4000))["snr_db"])  # all silence


def test_split_speech_spans_merging_and_gates():
    """Utterance splitting: two tones separated by a short pause MERGE
    into one span; a long pause splits; sub-min_speech blips drop; the
    payload slice reconstructs each span byte-exactly; undecodable rows
    pass through with span_idx=-1; all-silence clips emit nothing."""
    from scylla_cdc_source_connector_spark.audio_vad import (
        SPANS_SCHEMA,
        speech_spans_batches,
        split_speech_spans,  # noqa: F401 (DataFrame wrapper imported)
    )

    # 8 kHz, 20 ms frames. Layout (ms):
    #   0-300 silence | 300-700 tone | 700-800 silence(100: < 200 merge)
    #   | 800-1100 tone | 1100-1600 silence(500: split) | 1600-1640
    #   tone(40: isolated by >=200 ms both sides -> < 100 ms drops)
    #   | 1640-1940 silence | 1940-2240 tone
    def ms(x):
        return x * 8  # samples at 8 kHz

    sig = np.concatenate(
        [
            _silence(ms(300)), _tone(ms(400)), _silence(ms(100)),
            _tone(ms(300)), _silence(ms(500)), _tone(ms(40)),
            _silence(ms(300)), _tone(ms(300)),
        ]
    )
    rows = pd.DataFrame(
        {
            "clip_id": ["c", "quiet", "bad"],
            "bytes": [
                audio.encode(sig, "pcm_s16le"),
                audio.encode(_silence(ms(400)), "pcm_s16le"),
                b"\x00\x01",
            ],
            "codec": ["pcm_s16le", "pcm_s16le", "opus"],
            "sr_hz": [SR, SR, SR],
        }
    )
    (out,) = list(
        speech_spans_batches(20, -40.0, min_silence_ms=200, min_speech_ms=100)(
            iter([rows])
        )
    )
    c = out[out["clip_id"] == "c"].sort_values("span_idx")
    assert list(c["span_idx"]) == [0, 1] and list(c["n_spans"]) == [2, 2]
    assert list(c["span_start_ms"]) == [300, 1940]
    assert list(c["span_end_ms"]) == [1100, 2240]
    # byte-exact slices
    raw = audio.encode(sig, "pcm_s16le").tobytes() if hasattr(
        audio.encode(sig, "pcm_s16le"), "tobytes"
    ) else bytes(audio.encode(sig, "pcm_s16le"))
    got0 = c.iloc[0]["bytes"]
    assert got0 == raw[ms(300) * 2 : ms(1100) * 2]
    assert c.iloc[1]["bytes"] == raw[ms(1940) * 2 : ms(2240) * 2]
    # quiet clip: no spans -> zero rows; bad codec: one passthrough row
    assert (out["clip_id"] == "quiet").sum() == 0
    bad = out[out["clip_id"] == "bad"]
    assert len(bad) == 1 and bad.iloc[0]["span_idx"] == -1
    assert not bad.iloc[0]["decode_ok"]
    assert bytes(bad.iloc[0]["bytes"]) == b"\x00\x01"
    assert len(SPANS_SCHEMA.split(",")) == 10


def test_split_speech_spans_spark_and_wav(spark):
    """DataFrame wrapper: WAV rows unwrap (container sr wins), spans
    re-VAD as all-speech, multi-clip batch keeps clips separate."""
    from scylla_cdc_source_connector_spark.audio_vad import split_speech_spans

    def ms(x):
        return x * 8

    sig = np.concatenate(
        [_silence(ms(300)), _tone(ms(400)), _silence(ms(500)), _tone(ms(300))]
    )
    rows = [
        ("raw", bytes(audio.encode(sig, "pcm_s16le")), "pcm_s16le", SR),
        ("wav", bytes(audio.wav_encode(sig, SR, "ulaw")), "wav", 0),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    out = split_speech_spans(df).toPandas().set_index(["clip_id", "span_idx"])
    for cid, codec in (("raw", "pcm_s16le"), ("wav", "ulaw")):
        assert out.loc[(cid, 0)]["span_start_ms"] == 300
        assert out.loc[(cid, 0)]["span_end_ms"] == 700
        assert out.loc[(cid, 1)]["span_start_ms"] == 1200
        assert out.loc[(cid, 1)]["span_end_ms"] == 1500
        assert out.loc[(cid, 0)]["codec"] == codec
        assert out.loc[(cid, 0)]["sr_hz"] == SR


# ---------------------------------------------------- IMA ADPCM ----------


def test_adpcm_ima_roundtrip_snr():
    """IMA ADPCM encode→decode reconstructs a tone at the codec's
    expected fidelity (4-bit differential: SNR well above 15 dB after
    the per-block adaptation), and decode is bit-deterministic."""
    sig = _tone(8000, amp=0.5)
    payload = audio.adpcm_ima_encode(sig, samples_per_block=505)
    # 4 bits/sample + 4 B/block header ~ 0.51 B/sample
    assert len(payload) < len(sig)  # < 2 B/sample of pcm16
    out = audio.adpcm_ima_decode(payload, block_align=4 + 504 // 2)
    assert len(out) >= len(sig)
    got = out[: len(sig)].astype(np.float32) / 32768.0
    ref = sig.astype(np.float32) / 32768.0
    assert audio.snr_db(ref, got) >= 15.0
    assert np.array_equal(
        out, audio.adpcm_ima_decode(payload, block_align=256)
    )


def test_adpcm_wav_container_and_pipeline():
    """A tag-0x11 WAV parses to pcm_s16le (fact chunk trims the tail
    padding), flows through VAD with the same trim as the PCM original,
    and malformed/multichannel ADPCM raise the typed errors."""
    sig = np.concatenate([_silence(2400), _tone(4000), _silence(1600)])
    blob = audio.wav_encode_adpcm(sig, SR)
    codec, ch, sr, payload = audio.wav_parse(blob)
    assert (codec, ch, sr) == ("pcm_s16le", 1, SR)
    dec = np.frombuffer(payload, dtype="<i2")
    assert len(dec) == len(sig)  # fact-trimmed exactly
    assert (
        audio.snr_db(
            sig.astype(np.float32) / 32768.0,
            dec.astype(np.float32) / 32768.0,
        )
        >= 15.0
    )
    r_pcm = _vad_one(sig)
    r_adpcm = _vad_one(sig, codec="wav", blob=blob)
    assert r_adpcm["trim_start_ms"] == r_pcm["trim_start_ms"]
    assert r_adpcm["trim_end_ms"] == r_pcm["trim_end_ms"]
    # decode(codec="wav") dispatches too
    f = audio.decode(blob, "wav")
    assert len(f) == len(sig)

    # trailing fragment shorter than a block header -> malformed
    with pytest.raises(audio.MalformedContainerError):
        audio.adpcm_ima_decode(b"\x00" * 3, block_align=256)
    # stereo ADPCM is refused with the typed unsupported error
    bad = bytearray(blob)
    bad[22:24] = (2).to_bytes(2, "little")  # nChannels = 2
    with pytest.raises(audio.UnsupportedCodecError):
        audio.wav_parse(bytes(bad))
    # wrong bits-per-sample -> malformed
    bad2 = bytearray(blob)
    bad2[34:36] = (8).to_bytes(2, "little")
    with pytest.raises(audio.MalformedContainerError):
        audio.wav_parse(bytes(bad2))
