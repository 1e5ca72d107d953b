"""Fixed-window audio segmentation (audio_segment.py): sample alignment,
tiling/overlap arithmetic vs a numpy reference, byte-exact clip
reconstruction, and the zero-Python plan shape."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.audio_segment import (
    BYTES_PER_SAMPLE,
    segment_clips,
)
from scylla_cdc_source_connector_spark.fixtures import FixtureSpec, make_clips


@pytest.fixture(scope="module")
def clips_pdf():
    return make_clips(FixtureSpec(n_events=400, n_clips=120))


def _numpy_segments(raw: bytes, codec: str, sr: int, window_ms, hop_ms, keep_tail):
    bps = BYTES_PER_SAMPLE[codec]
    win_b = (sr * window_ms // 1000) * bps
    hop_b = (sr * hop_ms // 1000) * bps
    out = []
    i = 0
    while i + win_b <= len(raw):
        out.append(raw[i : i + win_b])
        i += hop_b
    if keep_tail and i < len(raw):
        out.append(raw[i:])
    return out


@pytest.mark.parametrize(
    "window_ms,hop_ms,keep_tail",
    [(50, 50, False), (50, 25, False), (60, 60, True), (37, 11, True)],
)
def test_segments_match_numpy_reference(
    spark, clips_pdf, window_ms, hop_ms, keep_tail
):
    df = spark.createDataFrame(
        clips_pdf[["clip_id", "bytes", "sr_hz", "codec"]]
    )
    got = (
        segment_clips(
            df, window_ms=window_ms, hop_ms=hop_ms, keep_tail=keep_tail
        )
        .select("clip_id", "seg_idx", "seg_bytes", "seg_start_ms", "seg_n_samples")
        .toPandas()
        .sort_values(["clip_id", "seg_idx"])
    )
    by_clip = {cid: g for cid, g in got.groupby("clip_id")}
    n_expected = 0
    for _, row in clips_pdf.iterrows():
        ref = _numpy_segments(
            bytes(row["bytes"]), row["codec"], row["sr_hz"],
            window_ms, hop_ms, keep_tail,
        )
        n_expected += len(ref)
        g = by_clip.get(row["clip_id"])
        if not ref:
            assert g is None
            continue
        assert [bytes(b) for b in g["seg_bytes"]] == ref
        bps = BYTES_PER_SAMPLE[row["codec"]]
        hop_b = (row["sr_hz"] * hop_ms // 1000) * bps
        starts = [
            i * hop_b // bps * 1000 // row["sr_hz"] for i in range(len(ref))
        ]
        assert list(g["seg_start_ms"]) == starts
        assert list(g["seg_n_samples"]) == [len(b) // bps for b in ref]
    assert len(got) == n_expected


def test_sample_alignment_pcm16(spark, clips_pdf):
    """pcm_s16le segments must never split a 16-bit frame."""
    pcm = clips_pdf[clips_pdf["codec"] == "pcm_s16le"]
    assert len(pcm) > 0
    df = spark.createDataFrame(pcm[["clip_id", "bytes", "sr_hz", "codec"]])
    seg = segment_clips(df, window_ms=33, hop_ms=17, keep_tail=True)
    odd = seg.where(F.length("seg_bytes") % 2 != 0).count()
    assert odd == 0


def test_reconstruction_hop_equals_window(spark, clips_pdf):
    """hop == window + keep_tail: concatenating a clip's segments in
    seg_idx order reproduces the original bytes exactly."""
    df = spark.createDataFrame(clips_pdf[["clip_id", "bytes", "sr_hz", "codec"]])
    seg = (
        segment_clips(df, window_ms=40, hop_ms=40, keep_tail=True)
        .groupBy("clip_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg_idx", "seg_bytes"))
                    ),
                    lambda s: F.hex(s["seg_bytes"]),
                ),
                "",
            ).alias("joined_hex")
        )
        .toPandas()
        .set_index("clip_id")["joined_hex"]
    )
    for _, row in clips_pdf.iterrows():
        assert seg[row["clip_id"]] == bytes(row["bytes"]).hex().upper()


def test_unsupported_and_null_rows_emit_nothing(spark):
    pdf = pd.DataFrame(
        {
            "clip_id": ["a", "b", "c"],
            "bytes": [b"\x00" * 100, None, b"\x00" * 100],
            "sr_hz": [8000, 8000, 8000],
            "codec": ["wav", "ulaw", "opus"],
        }
    )
    df = spark.createDataFrame(pdf)
    assert segment_clips(df, window_ms=5).count() == 0


def test_plan_is_jvm_only_and_narrow(spark, clips_pdf):
    """No Python evaluation and no exchange in the segmentation plan."""
    df = spark.createDataFrame(clips_pdf[["clip_id", "bytes", "sr_hz", "codec"]])
    plan = (
        segment_clips(df, window_ms=50, hop_ms=25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange" not in plan
