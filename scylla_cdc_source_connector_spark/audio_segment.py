"""Fixed-window audio segmentation — pure JVM, zero Python.

The training-data chunking step: split each clip's raw audio into
model-input-sized windows (window_ms long, hop_ms apart, overlapping
when hop < window).  Everything is Catalyst expressions — window/hop
arithmetic in samples, `sequence()` + `posexplode` for the 1→N fan-out,
`substring(bytes, ...)` for the slice — so the payload bytes are cut
JVM-side inside whole-stage codegen and never cross into Python.  The
fan-out is a narrow transformation: segmentation preserves the input's
partitioning, so chunking a stream-clustered envelope batch (sink mode)
or a bucketed table adds NO exchange.

Sample-boundary correctness: window/hop are first converted to WHOLE
samples (floor), then to bytes via the codec's fixed bytes-per-sample
(pcm_s16le = 2, ulaw/alaw = 1 — G.711 is one byte per sample), so a
pcm_s16le segment can never split a 16-bit frame.  Container formats
(wav) and unknown codecs have no fixed bytes-per-sample at the column
level and are excluded (segment such rows after audio.wav_parse or the
sink's normalize-on-ingest stage, which rewrites them to raw pcm_s16le).

Scale shape: at 10^12 clips the fan-out multiplies rows by
ceil(dur/hop) but each output row carries only its window's bytes; the
slice happens on the node that already holds the clip (no shuffle), and
downstream per-segment ops see rows bounded by window_bytes regardless
of clip length — this is the operator that makes hour-long clips safe
for fixed-budget executors.

No reference analog (the connector never decodes payloads); this is a
SURVEY §2.9 engine extension for the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed bytes per sample for raw (container-less) codecs
BYTES_PER_SAMPLE = {"pcm_s16le": 2, "ulaw": 1, "alaw": 1}


def _bytes_per_sample_expr(codec_col: Column) -> Column:
    expr = F.lit(None).cast("int")
    for codec, bps in BYTES_PER_SAMPLE.items():
        expr = F.when(codec_col == codec, F.lit(bps)).otherwise(expr)
    return expr


def segment_clips(
    df: DataFrame,
    *,
    window_ms: int,
    hop_ms: int | None = None,
    keep_tail: bool = False,
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
) -> DataFrame:
    """1→N fixed-window chunking of raw audio bytes, fully JVM-side.

    Emits one row per window with the passthrough columns of ``df`` plus:
      seg_idx        0-based window index within the clip
      seg_start_ms   window start, milliseconds from clip start
      seg_bytes      the window's raw bytes (same codec as the clip)
      seg_n_samples  whole samples in the window

    Full windows only by default; ``keep_tail=True`` also emits the final
    short window (< window_ms) so concatenating hop==window segments
    reconstructs the clip byte-for-byte.  Rows with NULL bytes, an
    unsupported codec, or fewer bytes than one window (unless keep_tail)
    emit nothing.
    """
    if hop_ms is None:
        hop_ms = window_ms
    if window_ms <= 0 or hop_ms <= 0:
        raise ValueError("window_ms and hop_ms must be positive")

    bps = _bytes_per_sample_expr(F.col(codec_col))
    sr = F.col(sr_col).cast("long")
    # whole samples per window / hop (floor): sample-aligned by
    # construction, so byte offsets are exact multiples of bps
    win_samples = (sr * window_ms / 1000).cast("long")
    hop_samples = (sr * hop_ms / 1000).cast("long")
    win_bytes = (win_samples * bps).cast("long")
    hop_bytes = (hop_samples * bps).cast("long")
    n_bytes = F.length(F.col(bytes_col)).cast("long")

    # number of FULL windows; with keep_tail, one more when a remainder
    # exists (also covers clips shorter than a single window)
    n_full = F.when(
        n_bytes >= win_bytes, F.floor((n_bytes - win_bytes) / hop_bytes) + 1
    ).otherwise(F.lit(0))
    if keep_tail:
        # standard framing semantics: one more (short) window whenever the
        # next hop start still lands inside the clip — also covers clips
        # shorter than a single window (n_full == 0, tail at offset 0)
        n_seg = n_full + F.when(n_full * hop_bytes < n_bytes, 1).otherwise(0)
    else:
        n_seg = n_full

    eligible = (
        F.col(bytes_col).isNotNull()
        & bps.isNotNull()
        & (win_bytes > 0)
        & (hop_bytes > 0)
        & (n_seg > 0)
    )
    base = df.where(eligible).withColumn(
        "__seg_idx", F.explode(F.sequence(F.lit(0).cast("long"), n_seg - 1))
    )
    start = F.col("__seg_idx") * hop_bytes
    seg_len = F.least(win_bytes, n_bytes - start)
    return (
        base.withColumn(
            "seg_bytes",
            # substring is 1-based; length caps the tail window
            F.col(bytes_col).substr(
                (start + 1).cast("int"), seg_len.cast("int")
            ),
        )
        .withColumn(
            "seg_start_ms",
            (start / bps * 1000 / sr).cast("long"),
        )
        .withColumn("seg_n_samples", (seg_len / bps).cast("long"))
        .withColumnRenamed("__seg_idx", "seg_idx")
        .drop(bytes_col)
    )
