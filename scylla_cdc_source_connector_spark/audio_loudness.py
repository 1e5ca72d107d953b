"""ITU-R BS.1770-4 / EBU R128 loudness over audio payloads.

The corpus-QC gates in `audio_features.py` (spectral descriptors) and
`audio.py` (decode/SNR verdict) say nothing about *perceived level* —
the axis every speech-corpus spec actually writes down ("normalize to
-23 LUFS", "reject clips peaking above -1 dBTP").  This module computes
the three published R128 measurements per clip:

- **integrated loudness (LUFS)**: K-weighted mean-square over 400 ms
  gating blocks (75 % overlap), two-stage gated per BS.1770-4 — an
  absolute gate at -70 LUFS, then a relative gate 10 LU below the
  absolute-gated mean;
- **loudness range (LRA, LU)**: EBU Tech 3342 — the p95 - p10 spread of
  the short-term (3 s) loudness distribution, absolute gate -70 LUFS and
  relative gate 20 LU below the absolute-gated mean;
- **true peak (dBTP)**: 4x oversampled peak (FFT interpolation), the
  inter-sample overshoot a plain `max(abs(x))` misses.

Implementation notes (all public spec / textbook DSP):

- The K-weighting filter is specified as two biquads (high-shelf
  f0=1681.97 Hz +4 dB, high-pass f0=38.14 Hz); coefficients for any
  sample rate come from De Man's published tan-warped re-derivation of
  the spec's 48 kHz table ("Evaluation of implementations of the ITU-R
  BS.1770 loudness algorithm", reproduced bit-for-bit at 48 kHz by a
  test).  We apply the weighting in
  the FREQUENCY domain: a gating block's K-weighted mean square equals
  (by Parseval) the block's power spectrum dotted with |H(w)|^2.  This
  avoids the sequential IIR recurrence (unvectorizable in numpy) and is
  exact for content stationary within a 400 ms block; the 997 Hz
  full-scale sine anchor (-3.01 LUFS) is pinned by tests to 0.1 LU.
- Short-term (3 s) loudness is composited from the 400 ms block powers
  (mean of the 27 blocks whose 100 ms hops tile the window) — a
  documented approximation with a slight taper at window edges.
- True peak uses non-overlapping 400 ms coverage blocks with a 32-sample
  margin on each side (clamped to the clip, zero outside), FFT-zero-pad
  4x upsampling, max over the interior — so block edges never create
  wrap-around artifacts and neighbouring clips never leak in.

Reference analog: none — the connector never looks inside payload cells
(`ScyllaChangesConsumer.java` validates structurally); this is the
engine-extension quality axis over the BASELINE input_hint's audio
payload, next to `audio_features.extract_features`.

Scale shape (the 100-TB rule): identical to `audio_features.py` — one
`mapInPandas` narrow stage, one concat decode per same-codec group, one
batched rFFT per (codec, sample-rate) subgroup, per-clip aggregation via
segmented `reduceat`; the payload never crosses a shuffle.  Python-per-
row happens only for WAV container parsing (shared `_resolve_effective`).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from scylla_cdc_source_connector_spark.audio_features import (
    _RAW_CODECS,
    _decode_concat,
    _resolve_effective,
)

#: BS.1770-4 K-weighting prototype parameters (stage 1 high-shelf,
#: stage 2 high-pass) — published filter spec, sample-rate independent.
_SHELF_F0, _SHELF_GAIN_DB, _SHELF_Q = 1681.9744509742, 3.99984385397, 0.7071752369
_HP_F0, _HP_Q = 38.13547087602, 0.50032703732
#: gating per BS.1770-4 §10 / EBU Tech 3342
_ABS_GATE_LUFS = -70.0
_REL_GATE_LU = 10.0
_LRA_REL_GATE_LU = 20.0
_LUFS_OFFSET = -0.691
#: gating block = 400 ms, hop = 100 ms (75 % overlap); short-term = 3 s
_BLOCK_S, _HOP_S, _ST_S = 0.4, 0.1, 3.0
#: true-peak oversampling factor + edge margin (samples per side)
_TP_OVER, _TP_PAD = 4, 32

AUDIO_LOUDNESS_SCHEMA = (
    "clip_id string, decode_ok boolean, n_blocks int, "
    "lufs_integrated double, lra_lu double, true_peak_dbtp double"
)


#: the shelf's band-gain exponent from De Man's published re-derivation
#: of the BS.1770 coefficients (Vb = Vh^0.4997.. reproduces the spec's
#: 48 kHz table bit-for-bit; plain RBJ does not)
_SHELF_VB_EXP = 0.4996667741545416


def _deman_highshelf(sr: float):
    """BS.1770 stage-1 high-shelf for any sample rate (De Man's
    tan-warped parameterization; at 48 kHz this reproduces the
    coefficient table printed in BS.1770-4 itself)."""
    K = np.tan(np.pi * _SHELF_F0 / sr)
    Vh = 10.0 ** (_SHELF_GAIN_DB / 20.0)
    Vb = Vh**_SHELF_VB_EXP
    a0 = 1.0 + K / _SHELF_Q + K * K
    b = np.array([
        (Vh + Vb * K / _SHELF_Q + K * K) / a0,
        2.0 * (K * K - Vh) / a0,
        (Vh - Vb * K / _SHELF_Q + K * K) / a0,
    ])
    a = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / _SHELF_Q + K * K) / a0])
    return b, a


def _deman_highpass(sr: float):
    """BS.1770 stage-2 high-pass: the spec keeps the UN-normalized
    [1, -2, 1] numerator (slight broadband gain vs a textbook RBJ HP)."""
    K = np.tan(np.pi * _HP_F0 / sr)
    d = 1.0 + K / _HP_Q + K * K
    b = np.array([1.0, -2.0, 1.0])
    a = np.array([1.0, 2.0 * (K * K - 1.0) / d, (1.0 - K / _HP_Q + K * K) / d])
    return b, a


def _biquad_mag2(b: np.ndarray, a: np.ndarray, w: np.ndarray) -> np.ndarray:
    """|H(e^{jw})|^2 of one biquad at angular frequencies w."""
    z1 = np.exp(-1j * w)
    z2 = z1 * z1
    num = b[0] + b[1] * z1 + b[2] * z2
    den = a[0] + a[1] * z1 + a[2] * z2
    return (num.real**2 + num.imag**2) / (den.real**2 + den.imag**2)


def k_weight_mag2(sr: int, n_fft: int) -> np.ndarray:
    """Combined K-weighting |H|^2 at the rFFT bin frequencies of an
    n_fft-point transform at sample rate sr."""
    w = 2.0 * np.pi * np.arange(n_fft // 2 + 1, dtype=np.float64) / n_fft
    bs, as_ = _deman_highshelf(float(sr))
    bh, ah = _deman_highpass(float(sr))
    return _biquad_mag2(bs, as_, w) * _biquad_mag2(bh, ah, w)


def _parseval_weights(sr: int, n_fft: int) -> np.ndarray:
    """Weights so that (|rfft(x)|^2 . w) / n_fft^2 == mean((k*x)^2):
    K-weighting |H|^2 times the rfft bin multiplicity (2 for interior
    bins, 1 for DC and — when n_fft is even — Nyquist)."""
    w = k_weight_mag2(sr, n_fft)
    d = np.full(n_fft // 2 + 1, 2.0)
    d[0] = 1.0
    if n_fft % 2 == 0:
        d[-1] = 1.0
    return w * d


def _segment_percentile(
    vals: np.ndarray,
    offsets: np.ndarray,
    counts: np.ndarray,
    q: float,
) -> np.ndarray:
    """Linear-interpolated per-segment percentile of the first counts[s]
    entries of each segment (vals already sorted ascending per segment,
    masked-out entries pushed to the tail as +inf)."""
    out = np.full(len(counts), np.nan)
    hasv = counts > 0
    if not hasv.any():
        return out
    pos = q * (counts[hasv] - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, counts[hasv] - 1)
    frac = pos - lo
    base = offsets[hasv]
    out[hasv] = vals[base + lo] * (1 - frac) + vals[base + hi] * frac
    return out


def _gated_mean_db(
    z: np.ndarray,
    l_db: np.ndarray,
    clip_of: np.ndarray,
    n_clips: int,
    rel_gate_lu: float,
) -> np.ndarray:
    """Two-stage (absolute then relative) gated power mean per clip,
    returned in LUFS; NaN where no block survives the gates."""
    out = np.full(n_clips, np.nan)
    m_abs = l_db > _ABS_GATE_LUFS
    cnt_a = np.bincount(clip_of, weights=m_abs, minlength=n_clips)
    sum_a = np.bincount(clip_of, weights=z * m_abs, minlength=n_clips)
    has = cnt_a > 0
    if not has.any():
        return out
    mean_a = np.where(has, sum_a / np.maximum(cnt_a, 1), np.nan)
    with np.errstate(divide="ignore", invalid="ignore"):
        gamma_r = _LUFS_OFFSET + 10.0 * np.log10(mean_a) - rel_gate_lu
    m = m_abs & (l_db > gamma_r[clip_of])
    cnt = np.bincount(clip_of, weights=m, minlength=n_clips)
    s = np.bincount(clip_of, weights=z * m, minlength=n_clips)
    ok = cnt > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        out[ok] = _LUFS_OFFSET + 10.0 * np.log10(s[ok] / cnt[ok])
    return out


def _group_loudness(pcm: np.ndarray, n_samples: np.ndarray, srs: np.ndarray):
    """Per-clip (n_blocks, lufs_integrated, lra_lu, true_peak_dbtp) for
    ONE concatenated same-codec group; framing is per distinct sample
    rate (block length depends on sr)."""
    c = len(n_samples)
    starts = np.zeros(c, dtype=np.int64)
    np.cumsum(n_samples[:-1], out=starts[1:])
    n_blocks = np.zeros(c, dtype=np.int64)
    lufs = np.full(c, np.nan)
    lra = np.full(c, np.nan)
    tp = np.full(c, np.nan)

    for sr in np.unique(srs):
        idx = np.flatnonzero(srs == sr)
        N = int(round(_BLOCK_S * sr))
        hop = int(round(_HOP_S * sr))
        ns = n_samples[idx]
        st0 = starts[idx]

        # ---- gating blocks: 400 ms, 75 % overlap, one rFFT ----
        nb = np.where(ns >= N, 1 + (ns - N) // hop, 0)
        n_blocks[idx] = nb
        total_b = int(nb.sum())
        if total_b > 0:
            has = np.flatnonzero(nb > 0)
            reps = nb[has]
            blk_of = np.repeat(np.arange(len(has)), reps)
            b0 = np.zeros(len(has), dtype=np.int64)
            np.cumsum(reps[:-1], out=b0[1:])
            k = np.arange(total_b, dtype=np.int64) - b0[blk_of]
            bstarts = st0[has][blk_of] + k * hop
            blocks = pcm[bstarts[:, None] + np.arange(N)[None, :]]
            spec = np.abs(np.fft.rfft(blocks, axis=1)) ** 2
            z = spec @ _parseval_weights(int(sr), N) / float(N) ** 2
            with np.errstate(divide="ignore"):
                l_db = _LUFS_OFFSET + 10.0 * np.log10(
                    np.maximum(z, 1e-30)
                )
            lufs[idx[has]] = _gated_mean_db(
                z, l_db, blk_of, len(has), _REL_GATE_LU
            )

            # ---- LRA: short-term 3 s composited from block powers ----
            w_st = int(round((_ST_S - _BLOCK_S) / _HOP_S)) + 1  # 27
            n_st = np.maximum(reps - (w_st - 1), 0)
            if n_st.sum() > 0:
                # per-clip moving mean of z over w_st consecutive blocks
                cz = np.concatenate([[0.0], np.cumsum(z)])
                st_of = np.repeat(np.arange(len(has)), n_st)
                s0 = np.zeros(len(has), dtype=np.int64)
                np.cumsum(n_st[:-1], out=s0[1:])
                j = np.arange(int(n_st.sum()), dtype=np.int64) - s0[st_of]
                a0 = b0[st_of] + j
                st_z = (cz[a0 + w_st] - cz[a0]) / w_st
                with np.errstate(divide="ignore"):
                    st_l = _LUFS_OFFSET + 10.0 * np.log10(
                        np.maximum(st_z, 1e-30)
                    )
                # abs gate, then relative gate 20 LU below gated mean
                m_abs = st_l > _ABS_GATE_LUFS
                cnt_a = np.bincount(st_of, weights=m_abs, minlength=len(has))
                sum_a = np.bincount(
                    st_of, weights=st_z * m_abs, minlength=len(has)
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    gamma = (
                        _LUFS_OFFSET
                        + 10.0 * np.log10(sum_a / np.maximum(cnt_a, 1))
                        - _LRA_REL_GATE_LU
                    )
                keep = m_abs & (st_l > gamma[st_of])
                kept_cnt = np.bincount(
                    st_of, weights=keep, minlength=len(has)
                ).astype(np.int64)
                sort_key = np.where(keep, st_l, np.inf)
                order = np.lexsort((sort_key, st_of))
                sorted_l = sort_key[order]
                p95 = _segment_percentile(sorted_l, s0, kept_cnt, 0.95)
                p10 = _segment_percentile(sorted_l, s0, kept_cnt, 0.10)
                lra[idx[has]] = p95 - p10

        # ---- true peak: non-overlapping coverage blocks, 4x FFT ----
        ntp = np.maximum((ns + N - 1) // N, (ns > 0).astype(np.int64))
        total_t = int(ntp.sum())
        if total_t > 0:
            hast = np.flatnonzero(ntp > 0)
            repst = ntp[hast]
            t_of = np.repeat(np.arange(len(hast)), repst)
            t0 = np.zeros(len(hast), dtype=np.int64)
            np.cumsum(repst[:-1], out=t0[1:])
            kb = np.arange(total_t, dtype=np.int64) - t0[t_of]
            M = N + 2 * _TP_PAD
            rel = kb[:, None] * N - _TP_PAD + np.arange(M)[None, :]
            absi = st0[hast][t_of][:, None] + rel
            inside = (rel >= 0) & (rel < ns[hast][t_of][:, None])
            gathered = pcm[np.clip(absi, 0, len(pcm) - 1)] * inside
            X = np.fft.rfft(gathered, axis=1)
            up = np.fft.irfft(X, n=_TP_OVER * M, axis=1) * _TP_OVER
            interior = up[:, _TP_OVER * _TP_PAD : _TP_OVER * (_TP_PAD + N)]
            blk_peak = np.abs(interior).max(axis=1)
            clip_peak = np.maximum.reduceat(blk_peak, t0)
            # never report below the sample-domain peak (reduceat is per
            # clip of the WHOLE group; select this sr's clips after)
            samp_peak = np.maximum.reduceat(np.abs(pcm), starts)[idx][hast]
            peak = np.maximum(clip_peak, samp_peak)
            tp[idx[hast]] = 20.0 * np.log10(np.maximum(peak, 1e-12))

    return n_blocks, lufs, lra, tp


def _loudness_one(pdf: pd.DataFrame) -> pd.DataFrame:
    n = len(pdf)
    ok = np.zeros(n, dtype=bool)
    n_blocks = np.zeros(n, dtype=np.int64)
    lufs = np.full(n, np.nan)
    lra = np.full(n, np.nan)
    tp = np.full(n, np.nan)
    eff_raw, eff_codec, eff_sr, valid = _resolve_effective(pdf)
    for codec in _RAW_CODECS:
        sel = valid & (eff_codec == codec)
        if not sel.any():
            continue
        pos = np.flatnonzero(sel)
        pcm, lens = _decode_concat([bytes(eff_raw[i]) for i in pos], codec)
        nb, lu, lr, t = _group_loudness(pcm, lens, eff_sr[pos])
        n_blocks[pos] = nb
        lufs[pos], lra[pos], tp[pos] = lu, lr, t
        ok[pos] = True
    return pd.DataFrame(
        {
            "clip_id": pdf["clip_id"].values,
            "decode_ok": ok,
            "n_blocks": n_blocks.astype("int32"),
            "lufs_integrated": lufs,
            "lra_lu": lra,
            "true_peak_dbtp": tp,
        }
    )


def audio_loudness_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body; input columns: clip_id, bytes, codec, sr_hz."""
    for pdf in batches:
        yield _loudness_one(pdf)


def extract_loudness(df):
    """R128 loudness per clip: df(clip_id, bytes, codec, sr_hz) ->
    AUDIO_LOUDNESS_SCHEMA.  One narrow Arrow stage — no shuffle, the
    payload column is consumed where it is scanned."""
    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        audio_loudness_batches, AUDIO_LOUDNESS_SCHEMA
    )
