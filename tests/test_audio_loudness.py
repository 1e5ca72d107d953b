"""R128/BS.1770 loudness (audio_loudness.py): spec-table coefficient
reproduction, the 997 Hz full-scale anchor, two-stage gating, true-peak
inter-sample recovery, LRA behavior, batch-boundary safety, and the
Spark mapInPandas integration."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from scylla_cdc_source_connector_spark import audio
from scylla_cdc_source_connector_spark.audio_loudness import (
    AUDIO_LOUDNESS_SCHEMA,
    _deman_highpass,
    _deman_highshelf,
    _loudness_one,
    extract_loudness,
    k_weight_mag2,
)

SR = 16000


def _tone(n, freq, amp, sr=SR, phase=0.0):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t + phase) * 32767).astype("<i2")


def _pdf(rows):
    return pd.DataFrame(rows, columns=["clip_id", "bytes", "codec", "sr_hz"])


def _run(rows):
    out = _loudness_one(_pdf(rows))
    return {r["clip_id"]: r for _, r in out.iterrows()}


def test_k_filter_reproduces_bs1770_48k_table():
    """At 48 kHz the derived biquads must equal the coefficient table
    printed in BS.1770-4 itself (the pinned public spec vectors)."""
    b, a = _deman_highshelf(48000.0)
    np.testing.assert_allclose(
        b, [1.53512485958697, -2.69169618940638, 1.19839281085285], atol=1e-10
    )
    np.testing.assert_allclose(
        a, [1.0, -1.69065929318241, 0.73248077421585], atol=1e-10
    )
    bh, ah = _deman_highpass(48000.0)
    np.testing.assert_allclose(bh, [1.0, -2.0, 1.0], atol=0)
    np.testing.assert_allclose(
        ah, [1.0, -1.99004745483398, 0.99007225036621], atol=1e-10
    )
    # the -0.691 LUFS offset is the K-gain at 997 Hz: ~ +0.691 dB at 48k
    m2 = k_weight_mag2(48000, 48000)
    assert abs(10 * np.log10(m2[997]) - 0.691) < 0.01


@pytest.mark.parametrize("sr", [8000, 16000, 48000])
def test_full_scale_997hz_anchor(sr):
    """Full-scale 997 Hz sine reads -3.01 LUFS (the textbook anchor the
    -0.691 constant exists for), within 0.1 LU at every sample rate."""
    r = _run([(f"t{sr}", _tone(sr * 5, 997.0, 1.0, sr).tobytes(), "pcm_s16le", sr)])
    row = r[f"t{sr}"]
    assert row["decode_ok"] and row["n_blocks"] == 1 + (5 * sr - int(0.4 * sr)) // int(0.1 * sr)
    assert abs(row["lufs_integrated"] - (-3.01)) < 0.1
    # steady tone: no loudness range, peak at full scale
    assert row["lra_lu"] < 0.1
    assert abs(row["true_peak_dbtp"]) < 0.1


def test_level_linearity():
    """-6.02 dB of amplitude is exactly -6.02 LU of loudness."""
    r = _run(
        [
            ("a", _tone(SR * 3, 997.0, 1.0).tobytes(), "pcm_s16le", SR),
            ("b", _tone(SR * 3, 997.0, 0.5).tobytes(), "pcm_s16le", SR),
        ]
    )
    assert abs((r["a"]["lufs_integrated"] - r["b"]["lufs_integrated"]) - 6.0206) < 0.05


def test_absolute_gate_excludes_silence():
    """1 s tone + 9 s digital silence: silence blocks fall below the
    -70 LUFS absolute gate, so integrated loudness stays near the
    tone-only value instead of averaging the silence in (which would
    read ~10 dB lower)."""
    tone = _tone(SR, 997.0, 0.25)
    padded = np.concatenate([tone, np.zeros(SR * 9, dtype="<i2")])
    r = _run(
        [
            ("padded", padded.tobytes(), "pcm_s16le", SR),
            ("alone", tone.tobytes(), "pcm_s16le", SR),
        ]
    )
    # boundary-straddling blocks legitimately pull it down ~1 LU
    assert abs(r["padded"]["lufs_integrated"] - r["alone"]["lufs_integrated"]) < 1.5
    # full silence: nothing survives the gate
    s = _run([("sil", np.zeros(SR, dtype="<i2").tobytes(), "pcm_s16le", SR)])
    assert np.isnan(s["sil"]["lufs_integrated"])


def test_relative_gate_excludes_quiet_tail():
    """Loud tone followed by a tone 30 LU quieter: the quiet half passes
    the absolute gate but sits >10 LU below the mean, so the relative
    gate drops it — integrated tracks the loud half."""
    loud = _tone(SR * 4, 997.0, 0.5)
    quiet = _tone(SR * 4, 997.0, 0.5 * 10 ** (-30 / 20))
    r = _run(
        [
            ("both", np.concatenate([loud, quiet]).tobytes(), "pcm_s16le", SR),
            ("loud", loud.tobytes(), "pcm_s16le", SR),
        ]
    )
    assert abs(r["both"]["lufs_integrated"] - r["loud"]["lufs_integrated"]) < 1.0


def test_true_peak_recovers_intersample_overshoot():
    """Sine at sr/4 with phase pi/4: every sample lands at |x| = a/sqrt(2)
    (sample peak reads 3.01 dB low) but the true peak is a — the 4x
    oversampler must recover it within 0.2 dB."""
    a = 0.5
    pcm = _tone(SR * 2, SR / 4, a, phase=np.pi / 4)
    r = _run([("tp", pcm.tobytes(), "pcm_s16le", SR)])["tp"]
    assert abs(pcm).max() / 32767 < a * 0.72  # sample domain really is low
    assert abs(r["true_peak_dbtp"] - 20 * np.log10(a)) < 0.2


def test_lra_spread_vs_steady():
    """Alternating -10/-30 LU 4 s segments produce a large LRA; a steady
    tone produces ~0."""
    seg_loud = _tone(SR * 4, 997.0, 0.3)
    seg_soft = _tone(SR * 4, 997.0, 0.3 * 10 ** (-15 / 20))
    prog = np.concatenate([seg_loud, seg_soft, seg_loud, seg_soft])
    r = _run(
        [
            ("prog", prog.tobytes(), "pcm_s16le", SR),
            ("steady", _tone(SR * 16, 997.0, 0.3).tobytes(), "pcm_s16le", SR),
        ]
    )
    assert r["prog"]["lra_lu"] > 5.0
    assert r["steady"]["lra_lu"] < 0.1
    # short clip (< 3 s): LRA undefined, integrated still present
    s = _run([("short", _tone(SR, 997.0, 0.3).tobytes(), "pcm_s16le", SR)])
    assert np.isnan(s["short"]["lra_lu"])
    assert np.isfinite(s["short"]["lufs_integrated"])


def test_batch_boundary_no_leakage():
    """Together == alone for every output (concat segmentation leaks
    nothing), including a sub-block clip between them."""
    # fade the sub-block clip's edges: an abrupt cut makes the (correct)
    # band-limited interpolator ring above the tone amplitude (Gibbs)
    tiny = _tone(100, 440.0, 0.9).astype(np.float64)
    ramp = np.minimum(np.arange(100), np.arange(100)[::-1]) / 10.0
    tiny = (tiny * np.minimum(ramp, 1.0)).astype("<i2")
    rows = [
        ("x", _tone(SR * 2, 440.0, 0.4).tobytes(), "pcm_s16le", SR),
        ("tiny", tiny.tobytes(), "pcm_s16le", SR),
        ("y", _tone(SR * 2, 997.0, 0.1).tobytes(), "pcm_s16le", SR),
    ]
    together = _run(rows)
    for row in rows:
        alone = _run([row])[row[0]]
        for col in ("n_blocks", "lufs_integrated", "lra_lu", "true_peak_dbtp"):
            a, b = alone[col], together[row[0]][col]
            assert (pd.isna(a) and pd.isna(b)) or a == b, (row[0], col, a, b)
    # the sub-block clip: no gating block, but true peak still measured
    t = together["tiny"]
    assert t["n_blocks"] == 0 and np.isnan(t["lufs_integrated"])
    assert abs(t["true_peak_dbtp"] - 20 * np.log10(0.9)) < 0.3


def test_containers_codecs_and_invalid_rows():
    """WAV (incl. stereo downmix) and ulaw inputs run; undecodable rows
    come back decode_ok=False with NaNs."""
    mono = _tone(SR * 2, 997.0, 0.5)
    stereo = np.empty(SR * 4, dtype="<i2")
    stereo[0::2] = mono
    stereo[1::2] = mono
    rows = [
        ("wav", audio.wav_encode(mono, SR, "pcm_s16le"), "wav", SR),
        ("wav2", audio.wav_encode(stereo, SR, "pcm_s16le", n_channels=2), "wav", SR),
        ("ulaw", audio.encode(mono, "ulaw"), "ulaw", SR),
        ("bad", b"\x01\x02\x03", "opus", SR),
        ("null", None, "pcm_s16le", SR),
    ]
    r = _run(rows)
    for cid in ("wav", "wav2", "ulaw"):
        assert r[cid]["decode_ok"]
        assert abs(r[cid]["lufs_integrated"] - (-9.0)) < 1.0
    # identical L/R downmixed to mono reads the same as the mono clip
    assert abs(r["wav"]["lufs_integrated"] - r["wav2"]["lufs_integrated"]) < 0.05
    for cid in ("bad", "null"):
        assert not r[cid]["decode_ok"]
        assert np.isnan(r[cid]["lufs_integrated"])


def test_extract_loudness_spark(spark):
    """End-to-end through mapInPandas: schema, one row per clip, values
    equal the local kernel's."""
    rows = [
        ("s1", _tone(SR * 2, 997.0, 1.0).tobytes(), "pcm_s16le", SR),
        ("s2", _tone(SR * 2, 997.0, 0.25).tobytes(), "pcm_s16le", SR),
        ("s3", None, "pcm_s16le", SR),
    ]
    df = spark.createDataFrame(
        _pdf(rows), "clip_id string, bytes binary, codec string, sr_hz int"
    )
    out = extract_loudness(df)
    assert out.schema.simpleString() == (
        "struct<" + AUDIO_LOUDNESS_SCHEMA.replace(", ", ",").replace(" ", ":") + ">"
    )
    got = {r["clip_id"]: r for r in out.collect()}
    assert len(got) == 3 and not got["s3"]["decode_ok"]
    assert abs(got["s1"]["lufs_integrated"] - (-3.01)) < 0.1
    assert abs(got["s2"]["lufs_integrated"] - (-15.05)) < 0.1


# ------------------------------------------------- normalization ---------


def test_normalize_loudness_hits_target_and_ceiling():
    """Normalizing a tone moves its measured loudness to the target; when
    the needed gain would push the true peak past the ceiling the gain
    caps (peak_limited) and the output's measured peak stays at/below the
    ceiling; re-measuring the output reads the target LUFS."""
    import pandas as pd

    from scylla_cdc_source_connector_spark.audio_loudness import (
        _loudness_one,
        normalize_loudness_batches,
    )

    sr = 8000
    t = np.arange(sr * 2) / sr
    # quiet tone: 997 Hz at -26 dBFS amplitude -> integrated ~ -29 LUFS
    quiet = (0.05 * np.sin(2 * np.pi * 997.0 * t) * 32767).astype(np.int16)
    # loud tone: 0.5 amplitude
    loud = (0.5 * np.sin(2 * np.pi * 997.0 * t) * 32767).astype(np.int16)
    pdf = pd.DataFrame(
        {
            "clip_id": ["quiet", "loud", "bad"],
            "bytes": [quiet.tobytes(), loud.tobytes(), b"\x00"],
            "codec": ["pcm_s16le", "pcm_s16le", "opus"],
            "sr_hz": [sr, sr, sr],
        }
    )
    (out,) = list(
        normalize_loudness_batches(target_lufs=-23.0, ceiling_dbtp=-1.0)(
            iter([pdf])
        )
    )
    out = out.set_index("clip_id")
    assert bool(out.loc["quiet", "decode_ok"]) and bool(
        out.loc["loud", "decode_ok"]
    )
    assert not bool(out.loc["bad", "decode_ok"])
    assert bytes(out.loc["bad", "bytes"]) == b"\x00"

    # re-measure the normalized outputs through the meter itself
    out2 = out.loc[["quiet", "loud"]].reset_index()
    meas = _loudness_one(
        out2[["clip_id", "bytes", "codec", "sr_hz"]]
    ).set_index("clip_id")
    assert meas.loc["quiet", "lufs_integrated"] == pytest.approx(-23.0, abs=0.2)
    assert meas.loc["quiet", "true_peak_dbtp"] <= -0.8
    # the loud tone cannot reach -23 without passing -1 dBTP? it can:
    # -23 target from ~-6 LUFS means ~-17 dB gain (downward) -> never
    # limited.  Build a LIMITED case: target -3 LUFS from the quiet tone
    (out3,) = list(
        normalize_loudness_batches(target_lufs=-3.0, ceiling_dbtp=-1.0)(
            iter([pdf[pdf["clip_id"] == "quiet"]])
        )
    )
    r = out3.iloc[0]
    assert bool(r["peak_limited"])
    meas3 = _loudness_one(
        out3[["clip_id", "bytes", "codec", "sr_hz"]]
    ).iloc[0]
    # capped: peak lands at the ceiling (within meter tolerance), LUFS
    # falls SHORT of the -3 target
    assert meas3["true_peak_dbtp"] == pytest.approx(-1.0, abs=0.3)
    assert meas3["lufs_integrated"] < -3.5


def test_normalize_loudness_silence_and_wav_passthrough(spark):
    """Digital silence (below the absolute gate) passes at unit gain with
    lufs_in NaN; WAV rows come back unwrapped as pcm_s16le; the Spark
    wrapper runs shuffle-free."""
    from scylla_cdc_source_connector_spark import audio
    from scylla_cdc_source_connector_spark.audio_loudness import (
        normalize_loudness,
    )

    sr = 8000
    sil = np.zeros(sr, dtype=np.int16)
    tone = (0.25 * np.sin(2 * np.pi * 997.0 * np.arange(sr) / sr) * 32767).astype(
        np.int16
    )
    rows = [
        ("sil", sil.tobytes(), "pcm_s16le", sr),
        ("wav", bytes(audio.wav_encode(tone, sr, "ulaw")), "wav", 0),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    res = normalize_loudness(df)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    out = {r["clip_id"]: r for r in res.collect()}
    v = out["sil"]["lufs_in"]  # NaN crosses Arrow as null
    assert v is None or np.isnan(v)
    assert bytes(out["sil"]["bytes"]) == sil.tobytes()  # unit gain
    assert out["wav"]["codec"] == "pcm_s16le"
    assert out["wav"]["sr_hz"] == sr
    assert out["wav"]["decode_ok"] and out["wav"]["gain_db"] is not None
