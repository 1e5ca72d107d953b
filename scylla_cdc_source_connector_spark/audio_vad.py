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
    "trim_start_b bigint, trim_end_b bigint, snr_db double"
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

    Returns (n_frames, speech_frames, first_speech, last_speech,
    snr_db) arrays; first/last are -1 when the clip has no speech frame,
    snr_db is NaN when either class is empty; plus the per-frame
    internals the span splitter builds on: (speech mask, local frame
    index, nz clip indices, per-nz frame offsets)."""
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
    out_snr = np.full(m, np.nan)
    empty = (
        frames,
        out_speech,
        out_first,
        out_last,
        out_snr,
        np.zeros(0, dtype=bool),
        np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int64),
        np.zeros(1, dtype=np.int64),
    )
    if total == 0:
        return empty

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
    sp_cnt = np.add.reduceat(speech.astype(np.int64), seg)
    out_speech[nz] = sp_cnt
    big = np.int64(1) << 62
    first = np.minimum.reduceat(np.where(speech, local, big), seg)
    last = np.maximum.reduceat(np.where(speech, local, -1), seg)
    out_first[nz] = np.where(first == big, -1, first)
    out_last[nz] = last
    # VAD-referenced SNR: mean speech-frame power over mean silence-frame
    # power — the cheap corpus-QC proxy for recording quality (needs both
    # classes present; one-sided clips stay NaN)
    sp_sum = np.add.reduceat(np.where(speech, energy, 0.0), seg)
    nz_cnt = f_nz - sp_cnt
    nz_sum = np.add.reduceat(np.where(speech, 0.0, energy), seg)
    both = (sp_cnt > 0) & (nz_cnt > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        snr = 10.0 * np.log10(
            (sp_sum / np.maximum(sp_cnt, 1))
            / ((nz_sum / np.maximum(nz_cnt, 1)) + 1e-12)
        )
    out_snr[nz] = np.where(both, snr, np.nan)
    return frames, out_speech, out_first, out_last, out_snr, speech, local, nz, ofs



def _resolve_rows(pdf: pd.DataFrame):
    """Shared per-batch container/validity resolution for the VAD bodies:
    WAV rows unwrapped (container metadata wins), undecodable/odd-length
    rows invalidated.  Returns (eff_raw list, eff_codec obj array,
    srs int64, chans int64, valid mask)."""
    n = len(pdf)
    codecs = np.asarray(pdf["codec"].values, dtype=object)
    raws = pdf["bytes"].values
    sr_col = pd.to_numeric(pdf["sr_hz"], errors="coerce").fillna(0)
    srs = sr_col.to_numpy(dtype=np.int64, na_value=0)
    chans = np.ones(n, dtype=np.int64)
    eff_codec = codecs.copy()
    eff_raw: list = list(raws)
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
    return eff_raw, eff_codec, srs, chans, valid


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
            n_frames = np.zeros(n, dtype=np.int64)
            speech = np.zeros(n, dtype=np.int64)
            first = np.full(n, -1, dtype=np.int64)
            last = np.full(n, -1, dtype=np.int64)
            snr_arr = np.full(n, np.nan)
            bps_arr = np.zeros(n, dtype=np.int64)

            codecs = np.asarray(pdf["codec"].values, dtype=object)
            raws = pdf["bytes"].values
            eff_raw, eff_codec, srs, chans, valid = _resolve_rows(pdf)
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
                f_, s_, fi_, la_, sn_, *_mask = _vad_group(
                    group, codec, sr, ch, frame_ms, threshold_db
                )
                n_frames[pos] = f_
                speech[pos] = s_
                first[pos] = fi_
                last[pos] = la_
                snr_arr[pos] = sn_
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
                "snr_db": snr_arr,
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


#: output schema of split_speech_spans (DDL): one row per detected
#: utterance; span_idx == -1 marks an undecodable clip passed through
SPANS_SCHEMA = (
    "clip_id string, decode_ok boolean, span_idx int, n_spans int, "
    "sr_hz int, n_channels int, span_start_ms int, span_end_ms int, "
    "bytes binary, codec string"
)


def speech_spans_batches(
    frame_ms: int = 20,
    threshold_db: float = -40.0,
    min_silence_ms: int = 200,
    min_speech_ms: int = 100,
):
    """mapInPandas body factory for utterance splitting — the 1→N
    VAD-based cousin of trim_clips: contiguous speech runs separated by
    less than `min_silence_ms` of silence MERGE into one span (natural
    inter-word pauses don't fragment an utterance), spans shorter than
    `min_speech_ms` drop (clicks/noise bursts), and each surviving span
    is emitted as its own row with the sample-aligned payload slice cut
    inside this same Arrow pass.

    Run detection and gap merging are fully vectorized over the group's
    frame mask (transition masks + reduceat over merged-run segments) —
    python cost stays O(#groups + #wav headers + one list-comp memcpy
    per emitted span, the same class as trim_clips' slice out).

    Row accounting: decodable clips emit one row per span (ZERO rows
    when no speech survives the gates — a splitter yields utterances;
    gate upstream on vad_stats if every clip must stay visible);
    undecodable rows pass through once with span_idx=-1 and their
    original payload, the pipeline's quarantine convention."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        min_gap_frames = max(min_silence_ms // frame_ms, 1)
        min_run_frames = max(-(-min_speech_ms // frame_ms), 1)
        for pdf in batches:
            n = len(pdf)
            codecs = np.asarray(pdf["codec"].values, dtype=object)
            raws = pdf["bytes"].values
            clip_ids = pdf["clip_id"].values
            eff_raw, eff_codec, srs, chans, valid = _resolve_rows(pdf)
            rows: dict[str, list] = {
                k: []
                for k in (
                    "clip_id", "decode_ok", "span_idx", "n_spans", "sr_hz",
                    "n_channels", "span_start_ms", "span_end_ms", "bytes",
                    "codec",
                )
            }

            def emit(cid, ok, si, ns, sr, ch, t0, t1, payload, codec):
                rows["clip_id"].append(cid)
                rows["decode_ok"].append(ok)
                rows["span_idx"].append(si)
                rows["n_spans"].append(ns)
                rows["sr_hz"].append(sr)
                rows["n_channels"].append(ch)
                rows["span_start_ms"].append(t0)
                rows["span_end_ms"].append(t1)
                rows["bytes"].append(payload)
                rows["codec"].append(codec)

            for i in np.flatnonzero(~valid):
                emit(
                    clip_ids[i], False, -1, 0, int(srs[i]), int(chans[i]),
                    0, 0,
                    bytes(raws[i]) if raws[i] is not None else None,
                    codecs[i],
                )

            keys = [
                (eff_codec[i], int(srs[i]), int(chans[i])) for i in range(n)
            ]
            for key in sorted(
                {k for i, k in enumerate(keys) if valid[i]}, key=str
            ):
                codec, sr, ch = key
                pos = np.flatnonzero(
                    valid
                    & np.fromiter(
                        (k == key for k in keys), dtype=bool, count=n
                    )
                )
                group = [bytes(eff_raw[i]) for i in pos]
                (f_, _s, _fi, _la, _sn, speech, local, nz, ofs) = _vad_group(
                    group, codec, sr, ch, frame_ms, threshold_db
                )
                if not speech.size or not speech.any():
                    continue
                total = len(speech)
                # raw speech runs, broken at clip boundaries (local == 0)
                prev = np.concatenate(([False], speech[:-1]))
                nxt = np.concatenate((speech[1:], [False]))
                same_prev = local > 0
                same_next = np.concatenate((local[1:] > 0, [False]))
                starts = np.flatnonzero(speech & ~(prev & same_prev))
                ends = np.flatnonzero(speech & ~(nxt & same_next))
                # run -> group-local clip index via the frame offsets
                run_clip = np.searchsorted(ofs[1:], starts, side="right")
                # merge runs whose silence gap < min_gap (same clip only)
                gap = local[starts[1:]] - local[ends[:-1]] - 1
                merge = np.concatenate(
                    ([False],
                     (run_clip[1:] == run_clip[:-1]) & (gap < min_gap_frames))
                )
                gid = np.cumsum(~merge) - 1
                seg = np.flatnonzero(~merge)
                m_start = local[starts][seg]  # first run's start per group
                m_end = np.maximum.reduceat(local[ends], seg)
                m_clip = run_clip[seg]
                keep = (m_end - m_start + 1) >= min_run_frames
                m_start, m_end, m_clip = m_start[keep], m_end[keep], m_clip[keep]
                if not len(m_clip):
                    continue
                # per-clip span numbering: rank within each run of equal
                # m_clip values (m_clip is sorted by construction)
                g0 = np.flatnonzero(
                    np.concatenate(([True], m_clip[1:] != m_clip[:-1]))
                )
                sizes = np.diff(np.concatenate((g0, [len(m_clip)])))
                span_idx = np.arange(len(m_clip)) - np.repeat(g0, sizes)
                counts = np.bincount(m_clip, minlength=len(nz))
                bps = _BYTES_PER_SAMPLE[codec]
                spf = max(int(sr * frame_ms) // 1000, 1) * max(ch, 1)
                for j in range(len(m_clip)):
                    gi = int(pos[nz[m_clip[j]]])
                    b0 = int(m_start[j]) * spf * bps
                    b1 = (int(m_end[j]) + 1) * spf * bps
                    emit(
                        clip_ids[gi], True, int(span_idx[j]),
                        int(counts[m_clip[j]]), sr, ch,
                        int(m_start[j]) * frame_ms,
                        (int(m_end[j]) + 1) * frame_ms,
                        bytes(eff_raw[gi])[b0:b1], codec,
                    )
            yield pd.DataFrame(rows)

    return body


def split_speech_spans(
    df,
    frame_ms: int = 20,
    threshold_db: float = -40.0,
    min_silence_ms: int = 200,
    min_speech_ms: int = 100,
):
    """Utterance splitter: (clip_id, bytes, codec, sr_hz) → one row per
    detected speech span (SPANS_SCHEMA), payload sliced in the same
    Arrow pass.  The ASR-prep op between trim (one span) and fixed
    windows (arbitrary cuts): cuts at natural pauses, so transcript
    alignment survives segmentation."""
    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        speech_spans_batches(
            frame_ms=frame_ms,
            threshold_db=threshold_db,
            min_silence_ms=min_silence_ms,
            min_speech_ms=min_speech_ms,
        ),
        SPANS_SCHEMA,
    )
