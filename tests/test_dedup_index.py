"""Incremental audio-dedup index (streaming/dedup_index.py) tests.

Scenario: chunk 1 establishes the corpus; chunk 2 inserts transcoded
copies (same audio, different G.711 codec, new clip_id) — the sink must
discover each copy as a duplicate of the ALREADY-INDEXED original at
ingest time, exactly-once across a crash replay, with the log-structured
index compacting on schedule."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from scylla_cdc_source_connector_spark import audio
from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
from scylla_cdc_source_connector_spark.fixtures import (
    FixtureSpec,
    make_changelog,
    write_changelog_chunk,
)
from scylla_cdc_source_connector_spark.schemas import OP_POST_IMAGE
from scylla_cdc_source_connector_spark.streaming import sink as sink_mod
from scylla_cdc_source_connector_spark.streaming.dedup_index import (
    fp_index_root,
    read_dup_pairs,
    read_fp_index,
)
from scylla_cdc_source_connector_spark.streaming.engine import run_stream


@pytest.fixture(scope="module")
def tmp_root_mod(tmp_path_factory):
    return str(tmp_path_factory.mktemp("dedup_index"))


def _transcode(raw: bytes, codec: str, to: str) -> bytes:
    pcm16 = (
        (audio.decode(raw, codec) * 32768.0).clip(-32768, 32767).astype("int16")
    )
    return audio.encode(pcm16, to)


@pytest.fixture(scope="module")
def dup_stream(tmp_root_mod):
    """3 chunks: originals | transcoded copies of 4 clips | more copies.
    Returns (input_dir, expected {dup_id: orig_id})."""
    pdf = make_changelog(FixtureSpec(n_events=300, n_clips=40, n_shards=4))
    t_shift = int(pdf["cdc$time_us"].max()) + 1_000_000

    post = pdf[pdf["cdc$operation"] == OP_POST_IMAGE].drop_duplicates("clip_id")
    origs = post.head(6)
    expected = {}
    dup_chunks = []
    for chunk_no, part in enumerate((origs.head(4), origs.tail(2))):
        rows = []
        for _, r in part.iterrows():
            # clone the clip's whole (clip, time) row-group so the
            # correlator completes it, under a new id and a later time
            grp = pdf[
                (pdf["clip_id"] == r["clip_id"])
                & (pdf["cdc$time_us"] == r["cdc$time_us"])
            ].copy()
            dup_id = f"{r['clip_id']}-copy{chunk_no}"
            alt = "ulaw" if r["codec"] != "ulaw" else "alaw"
            grp["clip_id"] = dup_id
            grp["cdc$time_us"] = (
                grp["cdc$time_us"] + t_shift + chunk_no * 2_000_000
            )
            grp["cdc$time"] = pd.to_datetime(
                grp["cdc$time_us"], unit="us"
            )
            has_payload = grp["bytes"].notna()
            grp.loc[has_payload, "bytes"] = grp.loc[has_payload].apply(
                lambda x: _transcode(bytes(x["bytes"]), x["codec"], alt), axis=1
            )
            grp.loc[has_payload, "codec"] = alt
            rows.append(grp)
            expected[dup_id] = r["clip_id"]
        dup_chunks.append(pd.concat(rows, ignore_index=True))

    d = f"{tmp_root_mod}/in"
    os.makedirs(d, exist_ok=True)
    write_changelog_chunk(pdf, f"{d}/c0.parquet")
    write_changelog_chunk(dup_chunks[0], f"{d}/c1.parquet")
    write_changelog_chunk(dup_chunks[1], f"{d}/c2.parquet")
    return d, expected


def _cfg(tmp, name, **kw):
    return EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        checkpoint_dir=f"{tmp}/{name}/ckpt",
        output_dir=f"{tmp}/{name}/out",
        lineage_dir=f"{tmp}/{name}/lineage",
        dedup_index=True,
        **kw,
    )


def test_incoming_copies_match_indexed_originals(spark, tmp_root_mod, dup_stream):
    d, expected = dup_stream
    cfg = _cfg(tmp_root_mod, "main", dedup_index_compact_every=0)
    q = run_stream(spark, cfg, d, available_now=True, max_files_per_trigger=1)
    q.awaitTermination(300)

    pairs = {
        (r["clip_id"], r["match_clip_id"])
        for r in read_dup_pairs(spark, cfg).collect()
    }
    for dup_id, orig_id in expected.items():
        assert (dup_id, orig_id) in pairs or (orig_id, dup_id) in pairs, (
            dup_id,
            sorted(pairs)[:10],
        )
    # index holds one latest fingerprint per clip, including the copies
    idx = read_fp_index(spark, cfg)
    ids = {r["clip_id"] for r in idx.collect()}
    assert set(expected) <= ids
    assert idx.count() == idx.select("clip_id").distinct().count()
    # lineage accounts for discoveries
    assert sum(r.get("n_dup_pairs", 0) for r in sink_mod.read_lineage(cfg)) >= len(
        expected
    )


def test_replay_rebuilds_identical_pairs(spark, tmp_root_mod, dup_stream):
    d, expected = dup_stream
    cfg = _cfg(tmp_root_mod, "replay", dedup_index_compact_every=0)
    q = run_stream(spark, cfg, d, available_now=True, max_files_per_trigger=1)
    q.awaitTermination(300)
    before = {
        (r["clip_id"], r["match_clip_id"], r["hamming"])
        for r in read_dup_pairs(spark, cfg).collect()
    }

    last = sink_mod.committed_batch_ids(cfg)[-1]
    os.remove(sink_mod.lineage_path(cfg, last))
    for p in (
        os.path.join(cfg.checkpoint_dir, "commits", str(last)),
        os.path.join(cfg.checkpoint_dir, "commits", f".{last}.crc"),
    ):
        if os.path.exists(p):
            os.remove(p)
    q = run_stream(spark, cfg, d, available_now=True, max_files_per_trigger=1)
    q.awaitTermination(300)
    after = {
        (r["clip_id"], r["match_clip_id"], r["hamming"])
        for r in read_dup_pairs(spark, cfg).collect()
    }
    assert after == before


def test_compaction_supersedes_log(spark, tmp_root_mod, dup_stream):
    d, expected = dup_stream
    cfg = _cfg(tmp_root_mod, "compact", dedup_index_compact_every=1)
    q = run_stream(spark, cfg, d, available_now=True, max_files_per_trigger=1)
    q.awaitTermination(300)
    snaps = [
        f for f in os.listdir(fp_index_root(cfg)) if f.startswith("compact_upto=")
    ]
    assert snaps, "no compaction snapshot written"
    idx = read_fp_index(spark, cfg)
    assert idx.count() == idx.select("clip_id").distinct().count()
    assert set(expected) <= {r["clip_id"] for r in idx.collect()}


def test_cross_sample_rate_copies_collide_after_normalization(
    spark, tmp_root_mod
):
    """Composed pipeline: the SAME content ingested at different sample
    rates (8 kHz alaw vs 44.1 kHz pcm) does NOT collide on raw
    fingerprints — but with normalize-on-ingest the index fingerprints
    the normalized (mono pcm_s16le @ 16 kHz) payloads, so the copies
    match at ingest time."""
    from scylla_cdc_source_connector_spark.audio_resample import (
        resample_linear,
    )

    tmp = f"{tmp_root_mod}/xsr"
    pdf = make_changelog(FixtureSpec(n_events=60, n_clips=8, n_shards=2))
    post = pdf[pdf["cdc$operation"] == OP_POST_IMAGE].drop_duplicates(
        "clip_id"
    )
    t_shift = int(pdf["cdc$time_us"].max()) + 1_000_000
    rows = []
    expected = {}
    for _, r in post.head(3).iterrows():
        # the SAME recording upsampled to 44.1 kHz pcm — the realistic
        # cross-rate duplicate (an independent re-render with fresh
        # noise would be different content, not a duplicate)
        pcm = audio.decode(bytes(r["bytes"]), r["codec"])
        up = resample_linear(pcm, int(r["sr_hz"]), 44_100)
        raw44 = audio.encode(
            np.clip(
                np.round(up.astype(np.float64) * 32768.0), -32768, 32767
            ).astype(np.int16),
            "pcm_s16le",
        )
        grp = pdf[
            (pdf["clip_id"] == r["clip_id"])
            & (pdf["cdc$time_us"] == r["cdc$time_us"])
        ].copy()
        dup_id = f"{r['clip_id']}-sr44"
        grp["clip_id"] = dup_id
        grp["cdc$time_us"] = grp["cdc$time_us"] + t_shift
        grp["cdc$time"] = pd.to_datetime(grp["cdc$time_us"], unit="us")
        has = grp["bytes"].notna()
        grp.loc[has, "bytes"] = [raw44] * int(has.sum())
        grp.loc[has, "codec"] = "pcm_s16le"
        grp.loc[has, "sr_hz"] = 44_100
        rows.append(grp)
        expected[dup_id] = r["clip_id"]
    d = f"{tmp}/in"
    os.makedirs(d, exist_ok=True)
    write_changelog_chunk(pdf, f"{d}/c0.parquet")
    write_changelog_chunk(pd.concat(rows, ignore_index=True), f"{d}/c1.parquet")

    cfg = _cfg(
        tmp_root_mod,
        "xsr_run",
        dedup_index_compact_every=0,
        audio_normalize_sr=16_000,
    )
    q = run_stream(spark, cfg, d, available_now=True, max_files_per_trigger=1)
    q.awaitTermination(300)
    pairs = {
        (r["clip_id"], r["match_clip_id"])
        for r in read_dup_pairs(spark, cfg).collect()
    }
    for dup_id, orig_id in expected.items():
        assert (dup_id, orig_id) in pairs or (orig_id, dup_id) in pairs, (
            dup_id,
            sorted(pairs)[:10],
        )


def test_dedup_index_requires_full_postimage(spark, tmp_root_mod, dup_stream):
    d, _ = dup_stream
    cfg = EngineConfig(
        checkpoint_dir=f"{tmp_root_mod}/bad/ckpt",
        output_dir=f"{tmp_root_mod}/bad/out",
        lineage_dir=f"{tmp_root_mod}/bad/lineage",
        dedup_index=True,
    )
    with pytest.raises(ValueError, match="include_after=FULL"):
        run_stream(spark, cfg, d, available_now=True)
