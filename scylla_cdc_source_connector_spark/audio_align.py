"""Pairwise audio alignment: FFT cross-correlation offset estimation.

`audio_near_dup` / `audio_containment` answer WHETHER two clips share
content; a training pipeline that wants to keep exactly one copy of the
shared region (or verify a transcript against the right span) also needs
WHERE — the time offset of one clip inside the other.  This module
estimates it with normalized cross-correlation over short-time ENERGY
ENVELOPES (RMS per hop), the classic coarse-alignment front end of audio
synchronization systems: envelopes are gain- and codec-robust, ~200×
smaller than the PCM, and their FFT cross-correlation finds the lag in
O(L log L) instead of O(L²).

Execution shape (100 TB):
  1. `energy_envelopes` — ONE vectorized mapInPandas pass over the clips:
     per Arrow batch, same-codec groups are decoded via the audio.py LUT
     kernels into one concatenated float32 array and a single segmented
     `np.add.reduceat` produces every clip's envelope (zero per-row numpy
     dispatch, same contract as audio_fingerprint_batches).  A clip's
     envelope at the default 100 frames/s is ~400 bytes/s of audio —
     the PCM bytes themselves never leave the map side.
  2. `align_clip_pairs` — joins the candidate pairs (from audio_near_dup
     or audio_containment — slim id/id rows) against the envelopes twice;
     only the compact envelope arrays cross those exchanges.  The NCC
     kernel buckets pairs by padded FFT length and runs batched rffts,
     one matrix per bucket (same length-bucket scatter as
     audio_fingerprint._fingerprint_group).

Reference parity: the connector ships audio as an opaque BLOB
(ScyllaSchema.java:315-316) with no notion of content alignment; this is
an engine extension in the audio_containment family (SURVEY §2.9).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark import audio

#: envelope frames per second: 100 → 10 ms hops, so offsets resolve to
#: ±10 ms — tighter than any hop the containment sweep leaves behind
DEFAULT_FPS = 100

#: output schema of energy_envelope_batches (DDL, for mapInPandas)
ENVELOPE_SCHEMA = (
    "clip_id string, sr_hz int, n_frames int, env array<float>, env_ok boolean"
)

ALIGN_SCHEMA = (
    "offset_ms long, peak_corr double, n_overlap_frames int, align_ok boolean"
)


def _envelopes_codec_group(
    raws: list[bytes], codec: str, srs: np.ndarray, fps: int
):
    """Envelopes for ONE same-codec group: one concatenated decode, one
    segmented reduceat.  Returns (list of float32 arrays, n_frames int64,
    ok bool) aligned with the group order."""
    m = len(raws)
    byte_lens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=m)
    lens = byte_lens // 2 if codec == "pcm_s16le" else byte_lens
    hops = np.maximum(srs.astype(np.int64) // fps, 1)
    ok = lens > 0
    envs: list = [None] * m
    n_frames = np.zeros(m, dtype=np.int64)
    use = np.flatnonzero(ok)
    if len(use) == 0:
        return envs, n_frames, ok

    sel = [raws[i] for i in use]
    pcm = audio.decode(b"".join(sel), codec)
    np.square(pcm, out=pcm)  # energy in place; envelope = sqrt(mean(x²))
    sel_lens = lens[use]
    sel_hops = hops[use]
    ends = np.cumsum(sel_lens)
    starts = ends - sel_lens

    # every frame boundary of every clip in one global increasing index
    # array: reduceat segments [b_k, b_{k+1}) then chop per clip — the
    # final frame of clip i ends exactly at clip i+1's first boundary
    frames = (sel_lens + sel_hops - 1) // sel_hops
    total_f = int(frames.sum())
    f0 = np.zeros(len(use), dtype=np.int64)
    np.cumsum(frames[:-1], out=f0[1:])
    clip_of_frame = np.repeat(np.arange(len(use)), frames)
    k = np.arange(total_f, dtype=np.int64) - f0[clip_of_frame]
    bounds = starts[clip_of_frame] + k * sel_hops[clip_of_frame]
    energy = np.add.reduceat(pcm, bounds, dtype=np.float64)
    counts = np.diff(np.append(bounds, len(pcm)))
    rms = np.sqrt(energy / np.maximum(counts, 1)).astype(np.float32)
    for j, i in enumerate(use):
        envs[i] = rms[f0[j] : f0[j] + frames[j]]
        n_frames[i] = frames[j]
    return envs, n_frames, ok


def energy_envelope_batches(
    fps: int = DEFAULT_FPS,
):
    """mapInPandas factory: (clip_id, bytes, codec, sr_hz) -> ENVELOPE_SCHEMA.

    WAV containers are unwrapped (multichannel downmixed to mono s16le,
    same contract as audio_fingerprint_batches); unsupported codecs /
    null payloads yield env_ok=false with an empty envelope."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            envs: list = [None] * n
            nf = np.zeros(n, dtype=np.int64)
            ok = np.zeros(n, dtype=bool)
            codecs = np.asarray(pdf["codec"].values, dtype=object)
            srs = np.asarray(pdf["sr_hz"].values, dtype=np.int64)
            raws = pdf["bytes"].values
            eff_codec = codecs.copy()
            eff_raw: list = list(raws)
            for i in np.flatnonzero(codecs == "wav"):
                if raws[i] is None:
                    eff_codec[i] = None
                    continue
                try:
                    pcm_f = audio.decode(bytes(raws[i]), "wav")
                    _, _, sr, _ = audio.wav_parse(bytes(raws[i]))
                except (
                    audio.MalformedContainerError,
                    audio.UnsupportedCodecError,
                ):
                    eff_codec[i] = None
                    continue
                mono_i16 = np.clip(
                    np.round(pcm_f * 32768.0), -32768, 32767
                ).astype("<i2")
                eff_codec[i] = "pcm_s16le"
                eff_raw[i] = mono_i16.tobytes()
                srs[i] = sr
            valid = np.fromiter(
                (
                    r is not None
                    and c in audio.SUPPORTED_CODECS
                    and not (c == "pcm_s16le" and len(r) % 2)
                    and len(r) > 0
                    for r, c in zip(eff_raw, eff_codec)
                ),
                dtype=bool,
                count=n,
            )
            for codec in audio.SUPPORTED_CODECS:
                sel = valid & (eff_codec == codec)
                if not sel.any():
                    continue
                pos = np.flatnonzero(sel)
                group = [bytes(eff_raw[i]) for i in pos]
                e_, f_, ok_ = _envelopes_codec_group(
                    group, codec, srs[pos], fps
                )
                for j, i in enumerate(pos):
                    envs[i] = e_[j]
                nf[pos] = f_
                ok[pos] = ok_
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"].values,
                    "sr_hz": srs.astype("int32"),
                    "n_frames": nf.astype("int32"),
                    "env": [
                        e if e is not None else np.array([], dtype=np.float32)
                        for e in envs
                    ],
                    "env_ok": ok,
                }
            )

    return _batches


def energy_envelopes(clips: DataFrame, *, fps: int = DEFAULT_FPS) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) DataFrame -> compact per-clip RMS
    envelopes via one vectorized Arrow pass."""
    return clips.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        energy_envelope_batches(fps), ENVELOPE_SCHEMA
    )


def _ncc_bucket(
    A: np.ndarray,
    B: np.ndarray,
    la: np.ndarray,
    lb: np.ndarray,
    L: int,
    min_overlap: int,
    overlap_penalty: float,
):
    """Normalized cross-correlation for one padded-length bucket.

    A, B: (N, L) zero-padded mean-removed envelopes; la, lb true lengths.
    Returns (offset_frames int64, peak float64, overlap int64) per pair —
    offset is where B's start lands relative to A's start (negative: A
    starts inside B).  Per-lag normalization via prefix-sum energies makes
    a clean excerpt score ~1.0 regardless of the length ratio."""
    n = len(la)
    FA = np.fft.rfft(A, axis=1)
    FB = np.fft.rfft(B, axis=1)
    xc = np.fft.irfft(FA * np.conj(FB), n=L, axis=1)  # (N, L)

    # prefix sums of per-row energies for windowed norms
    Sa = np.zeros((n, L + 1))
    np.cumsum(A * A, axis=1, out=Sa[:, 1:])
    Sb = np.zeros((n, L + 1))
    np.cumsum(B * B, axis=1, out=Sb[:, 1:])

    idx = np.arange(L, dtype=np.int64)[None, :]
    # circular index -> signed lag; the dead zone between la and L-lb is
    # masked (no overlap there by construction of the padding)
    lag = np.where(idx < la[:, None], idx, idx - L)
    pos = lag >= 0
    o = np.where(
        pos,
        np.minimum(la[:, None] - lag, lb[:, None]),
        np.minimum(lb[:, None] + lag, la[:, None]),
    )
    valid = o >= min_overlap

    rows = np.arange(n)[:, None]
    ea_lo = np.where(pos, lag, 0)
    eb_lo = np.where(pos, 0, -lag)
    ea = Sa[rows, np.clip(ea_lo + o, 0, L)] - Sa[rows, np.clip(ea_lo, 0, L)]
    eb = Sb[rows, np.clip(eb_lo + o, 0, L)] - Sb[rows, np.clip(eb_lo, 0, L)]
    denom = np.sqrt(np.maximum(ea * eb, 0.0)) + 1e-12
    ncc = xc / denom
    # overlap weighting: a short accidental overlap at an extreme lag can
    # out-score the true alignment on pure per-window NCC; weight each lag
    # by (overlap / full possible overlap)^p so the score ≈ raw NCC when
    # one clip fully covers the other (the near-dup/containment case) and
    # decays for sliver overlaps.  p=0 disables.
    if overlap_penalty > 0:
        full = np.minimum(la, lb)[:, None]
        ncc = ncc * (np.maximum(o, 0) / np.maximum(full, 1)) ** overlap_penalty
    ncc = np.where(valid, ncc, -np.inf)

    best = np.argmax(ncc, axis=1)
    off = lag[np.arange(n), best]
    peak = ncc[np.arange(n), best]
    ov = o[np.arange(n), best]
    none = ~np.isfinite(peak)
    return (
        np.where(none, 0, off),
        np.where(none, 0.0, np.clip(peak, -1.0, 1.0)),
        np.where(none, 0, ov),
        ~none,
    )


def _align_pdf(
    pdf: pd.DataFrame,
    fps: int,
    min_overlap_s: float,
    out_cols: list[str],
    overlap_penalty: float = 0.5,
) -> pd.DataFrame:
    """Alignment kernel over one Arrow batch of joined pairs: bucket by
    padded FFT length, one batched rfft pair + NCC per bucket."""
    n = len(pdf)
    off_ms = np.zeros(n, dtype=np.int64)
    peak = np.zeros(n, dtype=np.float64)
    overlap = np.zeros(n, dtype=np.int64)
    ok = np.zeros(n, dtype=bool)
    min_overlap = max(3, int(round(min_overlap_s * fps)))

    la = np.fromiter((len(e) for e in pdf["__env_a"]), dtype=np.int64, count=n)
    lb = np.fromiter((len(e) for e in pdf["__env_b"]), dtype=np.int64, count=n)
    can = (la >= min_overlap) & (lb >= min_overlap)
    if can.any():
        L_need = la + lb
        lbuck = np.int64(1) << np.ceil(
            np.log2(np.maximum(L_need, 2))
        ).astype(np.int64)
        lbuck = np.where(can, lbuck, 0)
        for L in (int(v) for v in np.unique(lbuck[can])):
            sel = np.flatnonzero(lbuck == L)
            A = np.zeros((len(sel), L))
            B = np.zeros((len(sel), L))
            for j, i in enumerate(sel):
                ea = np.asarray(pdf["__env_a"].iloc[i], dtype=np.float64)
                eb = np.asarray(pdf["__env_b"].iloc[i], dtype=np.float64)
                A[j, : len(ea)] = ea - ea.mean()
                B[j, : len(eb)] = eb - eb.mean()
            o_, p_, v_, ok_ = _ncc_bucket(
                A, B, la[sel], lb[sel], L, min_overlap, overlap_penalty
            )
            off_ms[sel] = np.round(o_ * 1000.0 / fps).astype(np.int64)
            peak[sel] = p_
            overlap[sel] = v_
            ok[sel] = ok_

    out = pdf.drop(columns=["__env_a", "__env_b"]).copy()
    out["offset_ms"] = off_ms
    out["peak_corr"] = peak
    out["n_overlap_frames"] = overlap.astype("int32")
    out["align_ok"] = ok
    # joins reorder columns (keys move left); Arrow matching is positional,
    # so reorder to the declared schema explicitly
    return out[out_cols]


def align_clip_pairs(
    pairs: DataFrame,
    clips: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    fps: int = DEFAULT_FPS,
    min_overlap_s: float = 0.25,
    overlap_penalty: float = 0.5,
) -> DataFrame:
    """Estimate the time offset between each candidate pair's clips.

    pairs: slim (id_a, id_b) rows — typically audio_near_dup or
    audio_containment output; clips: the payload table (clip_id, bytes,
    codec, sr_hz).  Returns pairs + (offset_ms, peak_corr,
    n_overlap_frames, align_ok): ``offset_ms`` > 0 means clip B's content
    begins offset_ms after clip A's start (B is an excerpt/suffix), < 0
    means A starts inside B; ``peak_corr`` is the per-lag-normalized
    cross-correlation at the best lag (≈1.0 for a true copy/excerpt).

    Scale shape: envelopes are computed ONCE per distinct clip id that
    appears in any pair (semi-join pruned — clips never in a candidate
    pair are not decoded), then two slim joins ship only the compact
    envelope arrays; the NCC kernel is one mapInPandas over the joined
    rows with batched rffts per length bucket.  Audio bytes never cross
    an exchange."""
    wanted = (
        pairs.select(F.col(id_a).alias("clip_id"))
        .union(pairs.select(F.col(id_b).alias("clip_id")))
        .distinct()
    )
    # dedup AFTER the envelope pass, not before: the clips table may carry
    # duplicate clip_ids (e.g. multiple postimages of one clip in a raw
    # changelog), and deduping the payload table first would shuffle the
    # audio bytes — deduping the envelope table shuffles only the compact
    # (clip_id, env) rows
    envs = (
        energy_envelopes(clips.join(wanted, "clip_id", "left_semi"), fps=fps)
        .where("env_ok")
        .dropDuplicates(["clip_id"])
    )
    ea = envs.select(
        F.col("clip_id").alias(id_a), F.col("env").alias("__env_a")
    )
    eb = envs.select(
        F.col("clip_id").alias(id_b), F.col("env").alias("__env_b")
    )
    joined = pairs.join(ea, id_a).join(eb, id_b)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pairs.schema.fields
    ) + ", " + ALIGN_SCHEMA
    out_cols = [f.name for f in pairs.schema.fields] + [
        "offset_ms",
        "peak_corr",
        "n_overlap_frames",
        "align_ok",
    ]

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _align_pdf(pdf, fps, min_overlap_s, out_cols, overlap_penalty)

    return joined.mapInPandas(_batches, out_schema)
