"""Spectral feature extraction over audio payloads — one batched rFFT.

The training-data pipeline's audio quality gate needs more than the
decode/SNR verdict (`audio.py`): band-limited or resampled-up content,
hum/DC offset, hard clipping, and tone-vs-noise character are invisible
to RMS/peak stats but decide whether a clip is usable.  This module
computes the standard spectral descriptors per clip:

- time domain: zero-crossing rate, clipping ratio (|x| >= 0.999),
  DC offset;
- frequency domain (Hann-windowed 512-sample frames, hop 256, mean power
  spectrum per clip): spectral centroid / bandwidth / 85 %-rolloff in Hz,
  spectral flatness, and low/voice/high band energy ratios
  (< 300 Hz / 300-3400 Hz / > 3400 Hz — the G.711 voice band).

Reference analog: the connector validates payloads only structurally
(cell presence, `ScyllaChangesConsumer.java`); the SNR >= 30 dB per-row
invariant (BASELINE input_hint) lives in `audio.py` — these features are
the engine-extension quality axis on top.

Scale shape (the 100-TB rule): everything is `mapInPandas` over Arrow
batches with ZERO per-row Python in the raw-codec path — each same-codec
group decodes as ONE concatenated numpy array, every frame of every clip
goes through ONE `np.fft.rfft` call, and per-clip aggregation is
segmented `np.*.reduceat`.  Python-per-row happens only for WAV
containers (O(1) header parse, same policy as `audio.py`) and stereo
downmix.  Audio bytes never cross a shuffle: the features land in the
same narrow stage that scanned them.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from scylla_cdc_source_connector_spark.audio import (
    _ALAW_DECODE_LUT,
    _ULAW_DECODE_LUT,
    MalformedContainerError,
    UnsupportedCodecError,
    wav_parse,
)

#: analysis frame: 512 samples, 50 % overlap — 64 ms @ 8 kHz, 32 ms @ 16 kHz
WIN, HOP = 512, 256
_N_BINS = WIN // 2 + 1
_HANN = np.hanning(WIN).astype(np.float32)
_ROLLOFF_PCT = 0.85
#: G.711 voice band (Hz): below = rumble/hum, above = presence/noise
_BAND_LOW_HZ, _BAND_HIGH_HZ = 300.0, 3400.0

AUDIO_FEATURES_SCHEMA = (
    "clip_id string, decode_ok boolean, n_frames int, "
    "zcr double, clipping_ratio double, dc_offset double, "
    "spectral_centroid_hz double, spectral_bandwidth_hz double, "
    "spectral_rolloff_hz double, spectral_flatness double, "
    "band_low_ratio double, band_mid_ratio double, band_high_ratio double"
)

_FEATURE_COLS = [
    "zcr",
    "clipping_ratio",
    "dc_offset",
    "spectral_centroid_hz",
    "spectral_bandwidth_hz",
    "spectral_rolloff_hz",
    "spectral_flatness",
    "band_low_ratio",
    "band_mid_ratio",
    "band_high_ratio",
]


def _decode_concat(raws: list[bytes], codec: str):
    """Same-codec group -> (concatenated float32 PCM, per-clip lengths)."""
    enc = np.frombuffer(b"".join(raws), dtype=np.uint8)
    lens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=len(raws))
    if codec == "pcm_s16le":
        pcm = enc.view("<i2").astype(np.float32) * np.float32(1.0 / 32768.0)
        return pcm, lens // 2
    lut = _ULAW_DECODE_LUT if codec == "ulaw" else _ALAW_DECODE_LUT
    pcm = lut[enc].astype(np.float32) * np.float32(1.0 / 32768.0)
    return pcm, lens


def _frame_power_spectra(
    pcm: np.ndarray, starts: np.ndarray, n_samples: np.ndarray
):
    """Hann-windowed framing + ONE rFFT for every frame of every clip in
    a concatenated group.  Returns (n_frames per clip, indices of clips
    with >=1 frame, frames per such clip, first-frame offsets, power
    spectra (F, bins) float64) — spec is None when no clip fills a frame.
    Shared by the spectral-descriptor and log-mel/MFCC paths."""
    n_frames = np.where(n_samples >= WIN, 1 + (n_samples - WIN) // HOP, 0)
    total_f = int(n_frames.sum())
    if total_f == 0:
        return n_frames, None, None, None, None
    has = np.flatnonzero(n_frames > 0)
    reps = n_frames[has]
    clip_of_frame = np.repeat(np.arange(len(has)), reps)
    f0 = np.zeros(len(has), dtype=np.int64)
    np.cumsum(reps[:-1], out=f0[1:])
    k = np.arange(total_f, dtype=np.int64) - f0[clip_of_frame]
    fstarts = starts[has][clip_of_frame] + k * HOP
    frames = pcm[fstarts[:, None] + np.arange(WIN)[None, :]]
    frames *= _HANN
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (F, bins) float64
    return n_frames, has, reps, f0, spec


def _group_features(pcm: np.ndarray, n_samples: np.ndarray, srs: np.ndarray):
    """Per-clip features for ONE concatenated group.

    pcm: float32 concat of every clip, n_samples: per-clip sample counts
    (all > 0), srs: per-clip sample rates.  Returns (n_frames int64,
    features dict[str, float64 array])."""
    c = len(n_samples)
    starts = np.zeros(c, dtype=np.int64)
    np.cumsum(n_samples[:-1], out=starts[1:])
    feats = {k: np.full(c, np.nan) for k in _FEATURE_COLS}

    # ---- time domain (segmented reductions over the concat array) ----
    sums = np.add.reduceat(pcm, starts, dtype=np.float64)
    feats["dc_offset"] = sums / n_samples
    clip_hits = (np.abs(pcm) >= np.float32(0.999)).astype(np.float32)
    feats["clipping_ratio"] = (
        np.add.reduceat(clip_hits, starts, dtype=np.float64) / n_samples
    )
    sb = np.signbit(pcm)
    if len(pcm) > 1:
        crossings = (sb[1:] != sb[:-1]).astype(np.float32)
        # reduceat over [start_i, start_{i+1}) includes the spurious
        # boundary crossing between clip i and clip i+1 — subtract it
        cross = np.add.reduceat(
            crossings, np.minimum(starts, len(crossings) - 1), dtype=np.float64
        )
        if c > 1:
            cross[:-1] -= crossings[starts[1:] - 1]
        feats["zcr"] = np.where(
            n_samples > 1, cross / np.maximum(n_samples - 1, 1), 0.0
        )
    else:
        feats["zcr"] = np.zeros(c)

    # ---- framing: every frame of every clip, one gather + one rFFT ----
    n_frames, has, reps, f0, spec = _frame_power_spectra(pcm, starts, n_samples)
    if spec is None:
        return n_frames, feats

    # mean power spectrum per clip: (C', bins)
    mean_p = np.add.reduceat(spec, f0, axis=0) / reps[:, None]
    tot = mean_p.sum(axis=1)
    safe_tot = np.where(tot > 0, tot, 1.0)
    bins = np.arange(_N_BINS, dtype=np.float64)
    hz_per_bin = srs[has].astype(np.float64) / WIN

    centroid_b = (mean_p * bins).sum(axis=1) / safe_tot
    feats["spectral_centroid_hz"][has] = np.where(
        tot > 0, centroid_b * hz_per_bin, 0.0
    )
    var_b = (mean_p * (bins[None, :] - centroid_b[:, None]) ** 2).sum(
        axis=1
    ) / safe_tot
    feats["spectral_bandwidth_hz"][has] = np.where(
        tot > 0, np.sqrt(var_b) * hz_per_bin, 0.0
    )
    cum = np.cumsum(mean_p, axis=1)
    roll_idx = np.argmax(cum >= (_ROLLOFF_PCT * tot)[:, None], axis=1)
    feats["spectral_rolloff_hz"][has] = np.where(
        tot > 0, roll_idx * hz_per_bin, 0.0
    )
    eps = 1e-12
    feats["spectral_flatness"][has] = np.where(
        tot > 0,
        np.exp(np.log(mean_p + eps).mean(axis=1)) / (mean_p.mean(axis=1) + eps),
        0.0,
    )
    bin_hz = bins[None, :] * hz_per_bin[:, None]
    for name, mask in (
        ("band_low_ratio", bin_hz < _BAND_LOW_HZ),
        (
            "band_mid_ratio",
            (bin_hz >= _BAND_LOW_HZ) & (bin_hz <= _BAND_HIGH_HZ),
        ),
        ("band_high_ratio", bin_hz > _BAND_HIGH_HZ),
    ):
        feats[name][has] = np.where(
            tot > 0, (mean_p * mask).sum(axis=1) / safe_tot, 0.0
        )
    return n_frames, feats


#: codecs the concat-decode path accepts directly (WAV resolves to one)
_RAW_CODECS = ("pcm_s16le", "ulaw", "alaw")


def _resolve_effective(pdf: pd.DataFrame):
    """Container/codec resolution shared by every feature path: WAV
    headers parsed (O(1) Python per WAV row), multi-channel downmixed to
    mono, undecodable rows marked invalid.  Returns (effective raw bytes
    list, effective codec array, effective sample-rate array, valid
    mask)."""
    n = len(pdf)
    codecs = np.asarray(pdf["codec"].values, dtype=object)
    raws = pdf["bytes"].values
    srs = (
        pd.to_numeric(pdf["sr_hz"], errors="coerce")
        .fillna(0)
        .astype(np.int64)
        .values
    )
    eff_codec = codecs.copy()
    eff_raw: list = list(raws)
    eff_sr = srs.copy()
    for i in np.flatnonzero(codecs == "wav"):
        if raws[i] is None:
            eff_codec[i] = None
            continue
        try:
            inner, ch, sr, payload = wav_parse(bytes(raws[i]))
        except (MalformedContainerError, UnsupportedCodecError):
            eff_codec[i] = None
            continue
        eff_sr[i] = sr
        if ch > 1:
            # spectral features are per mono stream: downmix interleaved
            # channels (same policy as the fingerprint path)
            if inner == "pcm_s16le":
                pcm16 = np.frombuffer(payload, dtype="<i2")
            else:
                lut = _ULAW_DECODE_LUT if inner == "ulaw" else _ALAW_DECODE_LUT
                pcm16 = lut[np.frombuffer(payload, dtype=np.uint8)]
            usable = (len(pcm16) // ch) * ch
            mono = (
                pcm16[:usable]
                .reshape(-1, ch)
                .mean(axis=1)
                .astype("<i2")
            )
            eff_codec[i] = "pcm_s16le"
            eff_raw[i] = mono.tobytes()
        else:
            eff_codec[i] = inner
            eff_raw[i] = payload

    valid = np.fromiter(
        (
            r is not None
            and c in _RAW_CODECS
            and len(r) > 0
            and sr > 0
            and not (c == "pcm_s16le" and len(r) % 2)
            for r, c, sr in zip(eff_raw, eff_codec, eff_sr)
        ),
        dtype=bool,
        count=n,
    )
    return eff_raw, eff_codec, eff_sr, valid


def _features_one(pdf: pd.DataFrame) -> pd.DataFrame:
    n = len(pdf)
    ok = np.zeros(n, dtype=bool)
    n_frames = np.zeros(n, dtype=np.int64)
    out = {k: np.full(n, np.nan) for k in _FEATURE_COLS}
    eff_raw, eff_codec, eff_sr, valid = _resolve_effective(pdf)
    for codec in _RAW_CODECS:
        sel = valid & (eff_codec == codec)
        if not sel.any():
            continue
        pos = np.flatnonzero(sel)
        pcm, lens = _decode_concat([bytes(eff_raw[i]) for i in pos], codec)
        nf, feats = _group_features(pcm, lens, eff_sr[pos])
        n_frames[pos] = nf
        for k in _FEATURE_COLS:
            out[k][pos] = feats[k]
        ok[pos] = True

    return pd.DataFrame(
        {
            "clip_id": pdf["clip_id"].values,
            "decode_ok": ok,
            "n_frames": n_frames.astype("int32"),
            **{k: out[k] for k in _FEATURE_COLS},
        }
    )


def audio_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body; input columns: clip_id, bytes, codec, sr_hz."""
    for pdf in batches:
        yield _features_one(pdf)


def extract_features(df):
    """Spectral features per clip: df(clip_id, bytes, codec, sr_hz) ->
    AUDIO_FEATURES_SCHEMA.  One narrow Arrow stage — no shuffle, the
    payload column is consumed where it is scanned."""
    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        audio_features_batches, AUDIO_FEATURES_SCHEMA
    )


# --------------------------------------------------------------------------
# Log-mel filterbank + MFCC — the standard ASR/TTS utterance representation
# --------------------------------------------------------------------------
#
# Per clip: the mean log-mel energy vector over frames (n_mels) plus the
# per-clip mean and standard deviation of the frame MFCCs (DCT-II of the
# log-mel energies, n_mfcc coefficients) — the classic utterance-level
# summary used for corpus filtering, clustering, and as the embedding
# column feeding the near-dup / ANN operators.
#
# Same scale shape as the descriptors above: one concat decode per
# same-codec group, one rFFT for every frame, and the mel projection is
# ONE matmul per distinct sample rate in the group (the filterbank
# depends on sr; distinct rates in a corpus are few).  Reference analog:
# none — the connector never looks inside payload cells; this is the
# engine-extension feature axis over the input_hint's audio payload.

#: HTK mel scale
def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def _mel_weights(sr: int, n_mels: int) -> np.ndarray:
    """Triangular mel filterbank (n_mels, _N_BINS) for WIN-sample frames
    at sample rate sr — HTK-style band edges, peak-normalized to 1."""
    f_max = sr / 2.0
    edges_hz = _mel_to_hz(np.linspace(0.0, _hz_to_mel(f_max), n_mels + 2))
    bin_hz = np.arange(_N_BINS, dtype=np.float64) * (sr / WIN)
    lo, ctr, hi = edges_hz[:-2, None], edges_hz[1:-1, None], edges_hz[2:, None]
    up = (bin_hz[None, :] - lo) / np.maximum(ctr - lo, 1e-9)
    down = (hi - bin_hz[None, :]) / np.maximum(hi - ctr, 1e-9)
    return np.clip(np.minimum(up, down), 0.0, 1.0)


def _dct2_ortho(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_out, n_in) — c = M @ log_mel."""
    k = np.arange(n_out, dtype=np.float64)[:, None]
    i = np.arange(n_in, dtype=np.float64)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n_in)) * np.sqrt(2.0 / n_in)
    m[0] /= np.sqrt(2.0)
    return m


_LOG_EPS = 1e-10


def _group_mel(
    pcm: np.ndarray,
    n_samples: np.ndarray,
    srs: np.ndarray,
    n_mels: int,
    n_mfcc: int,
):
    """Per-clip (n_frames, log_mel mean, mfcc mean, mfcc std) for one
    concatenated same-codec group."""
    c = len(n_samples)
    starts = np.zeros(c, dtype=np.int64)
    np.cumsum(n_samples[:-1], out=starts[1:])
    log_mel = np.full((c, n_mels), np.nan)
    mfcc_mean = np.full((c, n_mfcc), np.nan)
    mfcc_std = np.full((c, n_mfcc), np.nan)
    n_frames, has, reps, f0, spec = _frame_power_spectra(pcm, starts, n_samples)
    if spec is None:
        return n_frames, log_mel, mfcc_mean, mfcc_std
    dct = _dct2_ortho(n_mfcc, n_mels)
    # mel projection per distinct sample rate: one matmul each
    srs_has = srs[has]
    frame_sr = np.repeat(srs_has, reps)
    mel_frames = np.empty((spec.shape[0], n_mels))
    for sr in np.unique(srs_has):
        sel = frame_sr == sr
        mel_frames[sel] = spec[sel] @ _mel_weights(int(sr), n_mels).T
    log_frames = np.log(mel_frames + _LOG_EPS)  # (F, n_mels)
    mfcc_frames = log_frames @ dct.T  # (F, n_mfcc)
    counts = reps[:, None].astype(np.float64)
    log_mel[has] = np.add.reduceat(log_frames, f0, axis=0) / counts
    mu = np.add.reduceat(mfcc_frames, f0, axis=0) / counts
    mfcc_mean[has] = mu
    sq = np.add.reduceat(mfcc_frames**2, f0, axis=0) / counts
    mfcc_std[has] = np.sqrt(np.maximum(sq - mu**2, 0.0))
    return n_frames, log_mel, mfcc_mean, mfcc_std


def _mel_one(pdf: pd.DataFrame, n_mels: int, n_mfcc: int) -> pd.DataFrame:
    n = len(pdf)
    ok = np.zeros(n, dtype=bool)
    n_frames = np.zeros(n, dtype=np.int64)
    lm = np.full((n, n_mels), np.nan)
    mm = np.full((n, n_mfcc), np.nan)
    ms = np.full((n, n_mfcc), np.nan)
    eff_raw, eff_codec, eff_sr, valid = _resolve_effective(pdf)
    for codec in _RAW_CODECS:
        sel = valid & (eff_codec == codec)
        if not sel.any():
            continue
        pos = np.flatnonzero(sel)
        pcm, lens = _decode_concat([bytes(eff_raw[i]) for i in pos], codec)
        nf, g_lm, g_mm, g_ms = _group_mel(
            pcm, lens, eff_sr[pos], n_mels, n_mfcc
        )
        n_frames[pos] = nf
        lm[pos], mm[pos], ms[pos] = g_lm, g_mm, g_ms
        ok[pos] = True

    def rows(a: np.ndarray) -> list:
        return [
            None if np.isnan(r).all() else r.astype(np.float32).tolist()
            for r in a
        ]

    return pd.DataFrame(
        {
            "clip_id": pdf["clip_id"].values,
            "decode_ok": ok,
            "n_frames": n_frames.astype("int32"),
            "log_mel": rows(lm),
            "mfcc_mean": rows(mm),
            "mfcc_std": rows(ms),
        }
    )


MEL_FEATURES_SCHEMA = (
    "clip_id string, decode_ok boolean, n_frames int, "
    "log_mel array<float>, mfcc_mean array<float>, mfcc_std array<float>"
)


def extract_mel_features(df, *, n_mels: int = 40, n_mfcc: int = 13):
    """Log-mel + MFCC utterance features per clip:
    df(clip_id, bytes, codec, sr_hz) -> MEL_FEATURES_SCHEMA.

    One narrow Arrow stage, no shuffle; `mfcc_mean` is directly usable as
    the `embedding` column for functions.similarity / dedup's ANN and
    near-dup operators (content-based audio clustering without a model).
    """

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _mel_one(pdf, n_mels, n_mfcc)

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        body, MEL_FEATURES_SCHEMA
    )


# --------------------------------------------------------------------------
# Pitch (F0) + voicing — the speech-specific quality gate
# --------------------------------------------------------------------------
#
# Frame-level autocorrelation pitch tracking: the power spectra the framing
# pass already computed ARE the FFT of each frame's circular autocorrelation
# (Wiener–Khinchin), so per-frame autocorr costs one irFFT — no new framing,
# no new gather.  Per clip: voiced-frame ratio (normalized autocorr peak >
# threshold inside the plausible pitch-lag band) and mean/std F0 over voiced
# frames.  A TTS/ASR corpus gate: voiced_ratio ~ 0 flags noise/music/silence
# rows, near-zero f0_std flags synthetic monotone speech.
#
# Circular (not zero-padded linear) autocorrelation is used deliberately —
# the peak lag of a periodic signal is unchanged and the shared spectra are
# reused; the symmetric alias r[N-l] == r[l] caps the search at WIN//2 lags,
# so the detectable floor is sr/(WIN/2) (31 Hz at 8 kHz, 62 Hz at 16 kHz —
# below the human pitch floor at telephone rates and at the F0_MIN clamp).

#: plausible speech F0 band (Hz) and the voicing decision threshold
F0_MIN_HZ, F0_MAX_HZ = 50.0, 400.0
VOICED_AUTOCORR = 0.5

PITCH_SCHEMA = (
    "clip_id string, decode_ok boolean, n_frames int, "
    "voiced_ratio double, f0_mean_hz double, f0_std_hz double"
)


def _group_pitch(pcm: np.ndarray, n_samples: np.ndarray, srs: np.ndarray):
    """Per-clip (n_frames, voiced_ratio, f0_mean, f0_std) for one
    concatenated same-codec group."""
    c = len(n_samples)
    starts = np.zeros(c, dtype=np.int64)
    np.cumsum(n_samples[:-1], out=starts[1:])
    voiced_ratio = np.full(c, np.nan)
    f0_mean = np.full(c, np.nan)
    f0_std = np.full(c, np.nan)
    n_frames, has, reps, f0_off, spec = _frame_power_spectra(
        pcm, starts, n_samples
    )
    if spec is None:
        return n_frames, voiced_ratio, f0_mean, f0_std
    # Wiener–Khinchin: circular autocorrelation per frame, one irFFT
    ac = np.fft.irfft(spec, n=WIN, axis=1)  # (F, WIN)
    energy = ac[:, 0].copy()
    energy[energy <= 0] = 1.0
    ac /= energy[:, None]
    srs_has = srs[has]
    frame_sr = np.repeat(srs_has, reps)
    total_f = ac.shape[0]
    peak_val = np.zeros(total_f)
    peak_f0 = np.zeros(total_f)
    for sr in np.unique(srs_has):
        sel = frame_sr == sr
        lag_lo = max(int(np.ceil(sr / F0_MAX_HZ)), 1)
        lag_hi = min(int(sr / F0_MIN_HZ), WIN // 2)
        if lag_hi <= lag_lo:
            continue
        band = ac[sel, lag_lo : lag_hi + 1]
        idx = np.argmax(band, axis=1)
        peak_val[sel] = band[np.arange(band.shape[0]), idx]
        peak_f0[sel] = sr / (idx + lag_lo).astype(np.float64)
    voiced = peak_val > VOICED_AUTOCORR
    counts = reps.astype(np.float64)
    n_voiced = np.add.reduceat(voiced.astype(np.float64), f0_off)
    voiced_ratio[has] = n_voiced / counts
    vf0 = np.where(voiced, peak_f0, 0.0)
    sum_f0 = np.add.reduceat(vf0, f0_off)
    sum_f0sq = np.add.reduceat(vf0**2, f0_off)
    safe_n = np.maximum(n_voiced, 1.0)
    mu = sum_f0 / safe_n
    f0_mean[has] = np.where(n_voiced > 0, mu, np.nan)
    f0_std[has] = np.where(
        n_voiced > 0, np.sqrt(np.maximum(sum_f0sq / safe_n - mu**2, 0.0)), np.nan
    )
    return n_frames, voiced_ratio, f0_mean, f0_std


def _pitch_one(pdf: pd.DataFrame) -> pd.DataFrame:
    n = len(pdf)
    ok = np.zeros(n, dtype=bool)
    n_frames = np.zeros(n, dtype=np.int64)
    vr = np.full(n, np.nan)
    fm = np.full(n, np.nan)
    fs = np.full(n, np.nan)
    eff_raw, eff_codec, eff_sr, valid = _resolve_effective(pdf)
    for codec in _RAW_CODECS:
        sel = valid & (eff_codec == codec)
        if not sel.any():
            continue
        pos = np.flatnonzero(sel)
        pcm, lens = _decode_concat([bytes(eff_raw[i]) for i in pos], codec)
        nf, g_vr, g_fm, g_fs = _group_pitch(pcm, lens, eff_sr[pos])
        n_frames[pos] = nf
        vr[pos], fm[pos], fs[pos] = g_vr, g_fm, g_fs
        ok[pos] = True
    return pd.DataFrame(
        {
            "clip_id": pdf["clip_id"].values,
            "decode_ok": ok,
            "n_frames": n_frames.astype("int32"),
            "voiced_ratio": vr,
            "f0_mean_hz": fm,
            "f0_std_hz": fs,
        }
    )


def extract_pitch(df):
    """Pitch/voicing gate per clip: df(clip_id, bytes, codec, sr_hz) ->
    PITCH_SCHEMA.  One narrow Arrow stage, no shuffle."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _pitch_one(pdf)

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        body, PITCH_SCHEMA
    )
