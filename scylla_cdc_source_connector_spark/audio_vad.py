"""Voice-activity / silence segmentation over audio payloads — vectorized.

A training-data pipeline trims leading/trailing silence and drops
clips with no speech before transcription-quality checks.  This module
computes, per clip, frame-energy voice activity (fixed frame length,
energy-in-dBFS threshold) entirely with numpy segmented reductions:

- rows are grouped by (codec, sr_hz, channels) inside each Arrow batch,
- each group is decoded as ONE concatenated float32 array (same LUT path
  as audio.py; WAV containers are unwrapped per row first — O(1)/clip),
- frame energies come from a cumulative-sum-of-squares difference
  (exact per-frame windows, no reduceat tail contamination),
- per-clip speech counts / first / last speech frames come from
  np.add/minimum/maximum.reduceat over the frame arrays.

Zero per-row numpy dispatch; python cost is O(#groups + #wav headers).

The reference connector has no audio semantics (the payload is an opaque
BLOB, ScyllaSchema.java:315-316) — this operator is part of the
training-data surface layered on top (SURVEY.md §2, LLM-pipeline ops).

Trimming itself stays JVM-side: with trim offsets in hand the byte slice
is `expr("substring(bytes, 1 + trim_start_b, trim_end_b - trim_start_b)")`
on the BINARY column (sample-aligned for the raw codecs: 2 B/sample for
pcm_s16le, 1 B/sample for G.711), so the payload never crosses into
Python a second time.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from scylla_cdc_source_connector_spark import audio

#: output schema of the vad_stats mapInPandas body (DDL)
VAD_SCHEMA = (
    "clip_id string, decode_ok boolean, sr_hz int, n_channels int, "
    "n_frames int, speech_frames int, speech_ratio double, "
    "trim_start_ms int, trim_end_ms int, "
    "trim_start_b bigint, trim_end_b bigint"
)

_BYTES_PER_SAMPLE = {"pcm_s16le": 2, "ulaw": 1, "alaw": 1}


def _decode_group(raws: list[bytes], codec: str) -> np.ndarray:
    """Concatenated float32 PCM for a list of same-codec payloads."""
    buf = np.frombuffer(b"".join(raws), dtype=np.uint8)
    if codec == "pcm_s16le":
        pcm = buf.view("<i2")
    elif codec == "ulaw":
        pcm = audio._ULAW_DECODE_LUT[buf]
    else:
        pcm = audio._ALAW_DECODE_LUT[buf]
    return pcm.astype(np.float32) / np.float32(32768.0)


def _vad_group(
    raws: list[bytes],
    codec: str,
    sr_hz: int,
    channels: int,
    frame_ms: int,
    threshold_db: float,
):
    """Per-clip VAD for one (codec, sr, channels) group.

    Returns (n_frames, speech_frames, first_speech, last_speech) int64
    arrays; first/last are -1 when the clip has no speech frame."""
    m = len(raws)
    bps = _BYTES_PER_SAMPLE[codec]
    lens_b = np.fromiter((len(r) for r in raws), dtype=np.int64, count=m)
    n_samples = lens_b // bps
    # one VAD frame spans frame_ms of ALL channels (interleaved energy)
    L = max(int(sr_hz * frame_ms) // 1000, 1) * max(channels, 1)
    frames = n_samples // L
    total = int(frames.sum())
    out_first = np.full(m, -1, dtype=np.int64)
    out_last = np.full(m, -1, dtype=np.int64)
    out_speech = np.zeros(m, dtype=np.int64)
    if total == 0:
        return frames, out_speech, out_first, out_last

    nz = np.flatnonzero(frames > 0)
    pcm = _decode_group(raws, codec)
    clip_starts = np.zeros(m, dtype=np.int64)
    np.cumsum(n_samples[:-1], out=clip_starts[1:])

    f_nz = frames[nz]
    ofs = np.zeros(len(nz) + 1, dtype=np.int64)
    np.cumsum(f_nz, out=ofs[1:])
    # local frame index within each clip, then global sample start
    local = np.arange(total, dtype=np.int64) - np.repeat(ofs[:-1], f_nz)
    gstart = np.repeat(clip_starts[nz], f_nz) + local * L

    cs = np.empty(len(pcm) + 1, dtype=np.float64)
    cs[0] = 0.0
    np.cumsum(np.square(pcm, dtype=np.float64), out=cs[1:])
    energy = cs[gstart + L] - cs[gstart]
    # mean power per frame in dBFS; eps floors log10 for digital silence
    db = 10.0 * np.log10(energy / L + 1e-12)
    speech = db > threshold_db

    seg = ofs[:-1]
    out_speech[nz] = np.add.reduceat(speech.astype(np.int64), seg)
    big = np.int64(1) << 62
    first = np.minimum.reduceat(np.where(speech, local, big), seg)
    last = np.maximum.reduceat(np.where(speech, local, -1), seg)
    out_first[nz] = np.where(first == big, -1, first)
    out_last[nz] = last
    return frames, out_speech, out_first, out_last


def vad_stats_batches(
    frame_ms: int = 20, threshold_db: float = -40.0, emit_trimmed: bool = False
):
    """mapInPandas body factory.  Input columns: clip_id, bytes, codec,
    sr_hz.  Output: VAD_SCHEMA rows (speech ratio + speech-span trim
    offsets in ms AND in payload bytes, sample-aligned).

    emit_trimmed=True appends (bytes, codec): the speech-span slice of
    the UNWRAPPED payload (wav rows come back as their inner raw codec)
    cut inside this same Arrow pass — the payload is already resident
    here for the energy scan, so slicing now costs one memcpy and
    avoids both a second decode and a clip_id join/shuffle to reunite
    offsets with bytes.  Rows with no detected speech yield empty bytes;
    undecodable rows pass their original payload through untrimmed."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            dec_ok = np.zeros(n, dtype=bool)
            srs = np.zeros(n, dtype=np.int64)
            chans = np.ones(n, dtype=np.int64)
            n_frames = np.zeros(n, dtype=np.int64)
            speech = np.zeros(n, dtype=np.int64)
            first = np.full(n, -1, dtype=np.int64)
            last = np.full(n, -1, dtype=np.int64)
            bps_arr = np.zeros(n, dtype=np.int64)

            codecs = np.asarray(pdf["codec"].values, dtype=object)
            raws = pdf["bytes"].values
            sr_col = pd.to_numeric(pdf["sr_hz"], errors="coerce").fillna(0)

            eff_codec = codecs.copy()
            eff_raw: list = list(raws)
            srs[:] = sr_col.to_numpy(dtype=np.int64, na_value=0)
            for i in np.flatnonzero(codecs == "wav"):
                if raws[i] is None:
                    eff_codec[i] = None
                    continue
                try:
                    inner, ch, sr, payload = audio.wav_parse(bytes(raws[i]))
                except (audio.MalformedContainerError, audio.UnsupportedCodecError):
                    eff_codec[i] = None
                    continue
                eff_codec[i], eff_raw[i] = inner, payload
                srs[i], chans[i] = sr, ch  # container metadata wins

            valid = np.fromiter(
                (
                    r is not None
                    and c in _BYTES_PER_SAMPLE
                    and s > 0
                    and not (c == "pcm_s16le" and len(r) % 2)
                    for r, c, s in zip(eff_raw, eff_codec, srs)
                ),
                dtype=bool,
                count=n,
            )
            keys = [
                (eff_codec[i], int(srs[i]), int(chans[i]))
                for i in range(n)
            ]
            for key in sorted({k for i, k in enumerate(keys) if valid[i]},
                              key=str):
                codec, sr, ch = key
                pos = np.flatnonzero(
                    valid & np.fromiter(
                        (k == key for k in keys), dtype=bool, count=n
                    )
                )
                group = [bytes(eff_raw[i]) for i in pos]
                f_, s_, fi_, la_ = _vad_group(
                    group, codec, sr, ch, frame_ms, threshold_db
                )
                n_frames[pos] = f_
                speech[pos] = s_
                first[pos] = fi_
                last[pos] = la_
                dec_ok[pos] = True
                bps_arr[pos] = _BYTES_PER_SAMPLE[codec]

            ratio = np.divide(
                speech, n_frames, out=np.zeros(n), where=n_frames > 0
            )
            has = first >= 0
            t0_ms = np.where(has, first * frame_ms, 0)
            t1_ms = np.where(has, (last + 1) * frame_ms, 0)
            # sample-aligned byte offsets into the (unwrapped) payload
            spf = np.maximum(srs * frame_ms // 1000, 1) * chans  # samples/frame
            t0_b = np.where(has, first * spf * bps_arr, 0)
            t1_b = np.where(has, (last + 1) * spf * bps_arr, 0)
            out = {
                "clip_id": pdf["clip_id"].values,
                "decode_ok": dec_ok,
                "sr_hz": srs.astype("int32"),
                "n_channels": chans.astype("int32"),
                "n_frames": n_frames.astype("int32"),
                "speech_frames": speech.astype("int32"),
                "speech_ratio": ratio,
                "trim_start_ms": t0_ms.astype("int32"),
                "trim_end_ms": t1_ms.astype("int32"),
                "trim_start_b": t0_b.astype("int64"),
                "trim_end_b": t1_b.astype("int64"),
            }
            if emit_trimmed:
                out["bytes"] = [
                    (bytes(eff_raw[i])[t0_b[i] : t1_b[i]] if dec_ok[i]
                     else (bytes(raws[i]) if raws[i] is not None else None))
                    for i in range(n)
                ]
                out["codec"] = [
                    (eff_codec[i] if dec_ok[i] else codecs[i])
                    for i in range(n)
                ]
            yield pd.DataFrame(out)

    return body


def vad_stats(df, frame_ms: int = 20, threshold_db: float = -40.0):
    """DataFrame-level VAD: (clip_id, bytes, codec, sr_hz) → VAD_SCHEMA."""
    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        vad_stats_batches(frame_ms=frame_ms, threshold_db=threshold_db),
        VAD_SCHEMA,
    )


#: vad_stats columns + the trimmed payload (speech-span slice, unwrapped)
TRIMMED_SCHEMA = VAD_SCHEMA + ", bytes binary, codec string"


def trim_clips(df, frame_ms: int = 20, threshold_db: float = -40.0):
    """Silence-trim in ONE pass: (clip_id, bytes, codec, sr_hz) →
    VAD stats + the speech-span payload slice.

    The slice happens inside the same Arrow batch that computed the
    frame energies (see vad_stats_batches emit_trimmed) — one payload
    trip into Python, one memcpy out, no join and no shuffle.  The
    JVM-side alternative (`substring(bytes, 1 + trim_start_b, ...)`)
    needs the offsets and the bytes in one row, i.e. a clip_id join that
    would move the payload through an exchange; at 20 kB/row the local
    Arrow copy is the cheaper path.  WAV rows come back unwrapped as
    their inner raw codec (sr_hz/n_channels from the container)."""
    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        vad_stats_batches(
            frame_ms=frame_ms, threshold_db=threshold_db, emit_trimmed=True
        ),
        TRIMMED_SCHEMA,
    )
