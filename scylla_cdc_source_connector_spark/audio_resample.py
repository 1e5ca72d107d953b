"""Sample-rate normalization (linear-interpolation resampler) — vectorized.

Training pipelines normalize heterogeneous telephony audio (8/16/22.05/44.1
kHz) to one model sample rate before feature extraction.  This module
resamples every clip to a target rate with pure-numpy linear interpolation,
batched the same way as audio.py / audio_vad.py:

- rows group by (effective codec, source sr) inside each Arrow batch
  (WAV containers unwrapped per row first, container sr wins),
- each group decodes as ONE concatenated float32 array,
- ALL clips' fractional source positions are built as one flat array
  (repeat/cumsum construction), so the gather + lerp is two fancy-index
  reads and one fma over the whole group — zero per-row numpy dispatch,
- output is re-encoded little-endian PCM16 (`pcm_s16le`), the normalized
  interchange codec, with one global encode pass and per-clip byte
  slicing.

Linear interpolation is the right fidelity/cost point for telephony-band
G.711 material (the fixture corpus): it is exact for the piecewise-linear
reconstruction and keeps SNR well above the 30 dB pipeline floor for
band-limited content; a windowed-sinc kernel can swap in behind the same
grouping without touching the Spark plumbing.

Multichannel WAVs are downmixed to mono (mean) before resampling — the
normalized corpus is mono by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from scylla_cdc_source_connector_spark import audio

#: output schema of resample_batches (DDL)
RESAMPLE_SCHEMA = (
    "clip_id string, decode_ok boolean, codec string, sr_hz int, "
    "n_samples int, bytes binary"
)

_BYTES_PER_SAMPLE = {"pcm_s16le": 2, "ulaw": 1, "alaw": 1}


def resample_linear(pcm: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Reference single-clip resampler (float32 in → float32 out).

    Output length m = round(n * sr_to / sr_from); output sample j is the
    linear interpolation of the source at position j * sr_from / sr_to
    (clamped to the last sample).  Pinned by tests; the grouped kernel
    below must match this exactly."""
    n = len(pcm)
    if n == 0 or sr_from == sr_to:
        return pcm.astype(np.float32)
    m = max(int(round(n * sr_to / sr_from)), 1)
    pos = np.arange(m, dtype=np.float64) * (sr_from / sr_to)
    np.clip(pos, 0.0, n - 1.0, out=pos)
    i0 = pos.astype(np.int64)
    i1 = np.minimum(i0 + 1, n - 1)
    w = (pos - i0).astype(np.float32)
    return (pcm[i0] * (1.0 - w) + pcm[i1] * w).astype(np.float32)


def _resample_group(
    raws: list[bytes], codec: str, sr_from: int, sr_to: int, channels: int
) -> tuple[np.ndarray, list[bytes]]:
    """Resample a same-(codec, sr, channels) group to sr_to mono PCM16.

    Returns (n_samples_out per clip, encoded pcm_s16le bytes per clip)."""
    m = len(raws)
    bps = _BYTES_PER_SAMPLE[codec]
    lens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=m)
    n_in = lens // bps

    buf = np.frombuffer(b"".join(raws), dtype=np.uint8)
    if codec == "pcm_s16le":
        pcm = buf.view("<i2").astype(np.float32) / np.float32(32768.0)
    elif codec == "ulaw":
        pcm = audio._ULAW_DECODE_LUT[buf].astype(np.float32) / np.float32(32768.0)
    else:
        pcm = audio._ALAW_DECODE_LUT[buf].astype(np.float32) / np.float32(32768.0)

    if channels > 1:
        # interleaved → mono mean; frame count floors at whole frames.
        # (The kept-index build is per-clip python — multichannel WAV is
        # the rare path; the mono hot path below stays fully flat.)
        frames_per_clip = n_in // channels
        starts = np.zeros(m, dtype=np.int64)
        np.cumsum(n_in[:-1], out=starts[1:])
        kept_idx = np.concatenate(
            [
                np.arange(starts[i], starts[i] + frames_per_clip[i] * channels)
                for i in range(m)
            ]
        ) if m else np.empty(0, dtype=np.int64)
        pcm = pcm[kept_idx].reshape(-1, channels).mean(axis=1, dtype=np.float32)
        n_in = frames_per_clip

    ratio = sr_from / sr_to
    n_out = np.maximum(np.round(n_in * (sr_to / sr_from)).astype(np.int64), 0)
    n_out = np.where(n_in > 0, np.maximum(n_out, 1), 0)
    total_out = int(n_out.sum())

    enc_parts: list[bytes]
    if total_out == 0:
        return n_out, [b""] * m

    in_starts = np.zeros(m, dtype=np.int64)
    np.cumsum(n_in[:-1], out=in_starts[1:])
    out_starts = np.zeros(m, dtype=np.int64)
    np.cumsum(n_out[:-1], out=out_starts[1:])

    nz = np.flatnonzero(n_out > 0)
    # local output index j within each clip, built flat (arange - repeat)
    local = (
        np.arange(total_out, dtype=np.int64)
        - np.repeat(out_starts[nz], n_out[nz])
    )
    pos = local.astype(np.float64) * ratio
    # clamp per clip to n_in - 1
    lim = np.repeat((n_in[nz] - 1).astype(np.float64), n_out[nz])
    np.minimum(pos, lim, out=pos)
    base = np.repeat(in_starts[nz], n_out[nz])
    i0 = pos.astype(np.int64)
    i1 = np.minimum(i0 + 1, np.repeat(
        (in_starts[nz] + n_in[nz] - 1), n_out[nz]
    ) - base)
    w = (pos - i0).astype(np.float32)
    g0 = pcm[base + i0]
    g1 = pcm[base + i1]
    out = g0 * (np.float32(1.0) - w) + g1 * w

    pcm16 = np.clip(
        np.round(out.astype(np.float64) * 32768.0), -32768, 32767
    ).astype("<i2")
    raw_all = pcm16.tobytes()
    enc_parts = [
        raw_all[2 * out_starts[i] : 2 * (out_starts[i] + n_out[i])]
        for i in range(m)
    ]
    return n_out, enc_parts


def _resample_frame(pdf: pd.DataFrame, target_sr: int) -> pd.DataFrame:
    """One-frame kernel shared by the mapInPandas body and the scalar
    UDF: (clip_id, bytes, codec, sr_hz) frame -> RESAMPLE_SCHEMA frame."""
    n = len(pdf)
    dec_ok = np.zeros(n, dtype=bool)
    n_samp = np.zeros(n, dtype=np.int64)
    out_bytes: list = [None] * n

    codecs = np.asarray(pdf["codec"].values, dtype=object)
    raws = pdf["bytes"].values
    srs = (
        pd.to_numeric(pdf["sr_hz"], errors="coerce")
        .fillna(0)
        .to_numpy(dtype=np.int64)
    )
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
        srs[i], chans[i] = sr, ch

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
    keys = [(eff_codec[i], int(srs[i]), int(chans[i])) for i in range(n)]
    for key in sorted({k for i, k in enumerate(keys) if valid[i]}, key=str):
        codec, sr, ch = key
        pos = np.flatnonzero(
            valid
            & np.fromiter((k == key for k in keys), dtype=bool, count=n)
        )
        group = [bytes(eff_raw[i]) for i in pos]
        ns, encs = _resample_group(group, codec, sr, target_sr, ch)
        for j, i in enumerate(pos):
            out_bytes[i] = encs[j]
        n_samp[pos] = ns
        dec_ok[pos] = True

    return pd.DataFrame(
        {
            "clip_id": pdf["clip_id"].values,
            "decode_ok": dec_ok,
            "codec": np.where(dec_ok, "pcm_s16le", None),
            "sr_hz": np.where(dec_ok, target_sr, 0).astype("int32"),
            "n_samples": n_samp.astype("int32"),
            "bytes": out_bytes,
        }
    )


def resample_batches(target_sr: int = 16_000):
    """mapInPandas body factory.  Input columns: clip_id, bytes, codec,
    sr_hz.  Output: RESAMPLE_SCHEMA — every decodable clip normalized to
    mono pcm_s16le @ target_sr."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _resample_frame(pdf, target_sr)

    return body


#: struct type returned by make_resample_udf (DDL)
RESAMPLE_UDF_TYPE = (
    "struct<bytes: binary, codec: string, sr_hz: int, "
    "n_samples: int, ok: boolean>"
)


def make_resample_udf(target_sr: int = 16_000):
    """Scalar Arrow pandas UDF (bytes, codec, sr_hz) -> struct(bytes,
    codec, sr_hz, n_samples, ok) — the normalize-on-ingest kernel.

    A scalar struct UDF (same shape as audio.make_audio_verdict_udf) so
    the normalized payload lands as a column INSIDE the existing
    envelope plan: no key join, no second shuffle of the payload.  Rows
    the kernel cannot decode (null payload, unsupported codec, missing
    sr) come back ok=false and the caller keeps the original cells."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(RESAMPLE_UDF_TYPE)
    def resample(
        raw: pd.Series, codec: pd.Series, sr: pd.Series
    ) -> pd.DataFrame:
        out = _resample_frame(
            pd.DataFrame(
                {"clip_id": "", "bytes": raw, "codec": codec, "sr_hz": sr}
            ),
            target_sr,
        )
        return pd.DataFrame(
            {
                "bytes": out["bytes"],
                "codec": out["codec"],
                "sr_hz": out["sr_hz"],
                "n_samples": out["n_samples"],
                "ok": out["decode_ok"],
            }
        )

    return resample


def resample_clips(df, target_sr: int = 16_000):
    """DataFrame-level sr normalization: (clip_id, bytes, codec, sr_hz) →
    RESAMPLE_SCHEMA (mono pcm_s16le @ target_sr)."""
    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        resample_batches(target_sr=target_sr), RESAMPLE_SCHEMA
    )
