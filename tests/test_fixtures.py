"""Fixture generator determinism + shape tests."""

from __future__ import annotations

import numpy as np
import pandas as pd

from scylla_cdc_source_connector_spark.fixtures import (
    FixtureSpec,
    make_changelog,
    shard_of,
)


def test_deterministic():
    spec = FixtureSpec(n_events=500, n_clips=50)
    a = make_changelog(spec)
    b = make_changelog(spec)
    pd.testing.assert_frame_equal(a, b)


def test_operation_mix(changelog_pdf):
    ops = changelog_pdf["cdc$operation"].value_counts(normalize=False)
    deltas = changelog_pdf[changelog_pdf["cdc$operation"].isin([1, 2, 4, 5])]
    n = len(deltas)
    frac = deltas["cdc$operation"].value_counts(normalize=True)
    assert 0.6 < frac.get(2, 0) < 0.8  # ~70% insert
    assert 0.1 < frac.get(1, 0) < 0.3  # ~20% update
    assert ops.get(0, 0) > 0 and ops.get(9, 0) > 0


def test_images_accompany_deltas(changelog_pdf):
    """Every UPDATE has pre+post at the same (clip, time); every DELETE a
    pre; every INSERT a post."""
    g = changelog_pdf.groupby(["clip_id", "cdc$time_us"])["cdc$operation"].agg(set)
    for ops in g:
        if 1 in ops:
            assert 0 in ops and 9 in ops
        if 4 in ops:
            assert 0 in ops
        if 2 in ops:
            assert 9 in ops


def test_type_grouped_batch_ordering(changelog_pdf):
    """Within one (stream, cdc$time) batch: pres, then deltas, then posts
    in cdc$batch_seq_no order; at least one multi-event batch exists."""
    rank = {0: 0, 1: 1, 2: 1, 4: 1, 5: 1, 9: 2}
    multi = 0
    for (_, _), grp in changelog_pdf.drop_duplicates(
        ["cdc$stream_id", "cdc$time_us", "cdc$batch_seq_no"]
    ).groupby(["cdc$stream_id", "cdc$time_us"]):
        grp = grp.sort_values("cdc$batch_seq_no")
        ranks = [rank[o] for o in grp["cdc$operation"]]
        assert ranks == sorted(ranks)
        if grp["clip_id"].nunique() > 1:
            multi += 1
    assert multi > 0


def test_generations_clean_time_boundary(changelog_pdf):
    g0_max = changelog_pdf.loc[changelog_pdf["generation"] == 0, "cdc$time_us"].max()
    g1_min = changelog_pdf.loc[changelog_pdf["generation"] == 1, "cdc$time_us"].min()
    assert g0_max < g1_min


def test_shard_routing_stable(changelog_pdf, small_spec):
    ss = changelog_pdf["cdc$stream_id"]
    expect = changelog_pdf["clip_id"].map(
        lambda c: f"s{shard_of(c, small_spec.n_shards):04d}"
    )
    assert (ss == expect).all()


def test_duplicates_present(changelog_pdf):
    deltas = changelog_pdf[changelog_pdf["cdc$operation"].isin([1, 2, 4, 5])]
    assert deltas.duplicated(["clip_id", "cdc$time_us", "cdc$operation"]).sum() > 0


def test_hot_clips_skew(changelog_pdf, small_spec):
    deltas = changelog_pdf[changelog_pdf["cdc$operation"].isin([1, 2, 4, 5])]
    counts = deltas["clip_id"].value_counts()
    n_hot = max(1, int(small_spec.n_clips * small_spec.hot_clip_frac))
    hot_share = counts.head(n_hot).sum() / len(deltas)
    assert hot_share > 0.15  # hot ids draw disproportionate traffic


def test_null_transcript_tri_state(changelog_pdf):
    nulled = changelog_pdf[
        (changelog_pdf["cdc$operation"] == 1)
        & changelog_pdf["cdc$deleted_transcript"]
    ]
    assert len(nulled) > 0
    assert nulled["transcript"].isna().all()


def test_payload_tuning(spark):
    """tuning.apply_payload_tuning sizes both batch knobs to ~24 MB of
    rows and is runtime-settable on a live session."""
    from scylla_cdc_source_connector_spark import tuning

    before = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        tuning.apply_payload_tuning(spark, avg_row_bytes=20_000)
        got = int(spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch"))
        assert got == tuning.payload_batch_rows(20_000)
        assert 128 <= got <= 4096
        # degenerate row size floors at 128 rows
        assert tuning.payload_batch_rows(10**9) == 128
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", before)


def test_fixture_cache_keyed_by_content():
    """A FixtureSpec change (or a generator-version bump) must change the
    cache key, so stale cached fixture parquet can never silently feed
    checked queries."""
    from scylla_cdc_source_connector_spark import fixtures as fx
    from scylla_cdc_source_connector_spark.fixtures import FixtureSpec

    a = FixtureSpec(n_events=100, n_clips=100)
    assert a.content_hash() == FixtureSpec(n_events=100, n_clips=100).content_hash()
    # ANY field change misses, even ones the old size-keyed path ignored
    assert a.content_hash() != FixtureSpec(
        n_events=100, n_clips=100, dup_frac=0.5
    ).content_hash()
    assert a.content_hash() != FixtureSpec(
        n_events=100, n_clips=100, seed=43
    ).content_hash()
    # a generator-semantics bump misses too
    h_before = a.content_hash()
    old = fx.FIXTURE_GEN_VERSION
    try:
        fx.FIXTURE_GEN_VERSION = old + 1
        assert a.content_hash() != h_before
    finally:
        fx.FIXTURE_GEN_VERSION = old

    # the entry-side cache paths embed the hash
    import __spark_entry__ as entry

    p1 = entry._cached_changelog_path.__doc__  # documented contract
    assert "CONTENT hash" in p1


def test_changelog_chunks_write_splittable_row_groups(tmp_path):
    """Fixture chunks must never be one giant row group: a parquet row
    group goes entirely to the Spark task owning its byte-range midpoint,
    so a single-group 250 MB chunk is scanned by ONE task regardless of
    maxPartitionBytes (measured: 2.4 s/trigger micro-batch envelope write
    vs 1.0 s once split).  Pin that groups are sized by bytes, not rows."""
    import pyarrow.parquet as pq

    from scylla_cdc_source_connector_spark.fixtures import (
        FixtureSpec,
        make_changelog,
        write_changelog_chunk,
    )

    pdf = make_changelog(FixtureSpec(n_events=300, n_clips=60))
    path = str(tmp_path / "chunk.parquet")
    # ~300 events * ~2 rows * ~5-10 kB payload ≈ several MB; a 1 MB target
    # must yield multiple row groups, each near the target
    write_changelog_chunk(pdf, path, target_row_group_mb=1)
    md = pq.read_metadata(path)
    assert md.num_rows == len(pdf)
    assert md.num_row_groups >= 3, "row groups must be byte-sized"
    for i in range(md.num_row_groups - 1):  # last group may be a remainder
        mb = md.row_group(i).total_byte_size / 1e6
        assert mb < 8, f"row group {i} is {mb:.1f} MB for a 1 MB target"
    # values unchanged by the layout: full-file read round-trips
    import pandas as pd

    got = pd.read_parquet(path)
    assert len(got) == len(pdf)
    assert (got["clip_id"].values == pdf["clip_id"].values).all()


def test_payload_write_options_reach_the_parquet_writer(spark, tmp_path):
    """The engine's payload-bearing outputs are re-scanned by downstream
    consumers (corpus/apply/record converters), so the writer-side
    row-group rule applies to THEM too: payload_write_options must reach
    Hadoop's ParquetOutputFormat via the per-write options and produce
    byte-sized (splittable) groups.  Pinned with a 1 MB target over ~5 MB
    in one partition: multiple groups; the optionless control write of
    the same data produces one group (the 128 MB default)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from scylla_cdc_source_connector_spark.tuning import payload_write_options

    # distinct, high-entropy payloads: parquet flushes a row group when
    # the BUFFERED (encoded) size crosses block.size, so dictionary- or
    # RLE-compressible fillers (e.g. repeat('x', N)) never trigger it
    df = (
        spark.range(300)
        .select(
            F.col("id"),
            F.expr(
                "cast(concat_ws('', transform(sequence(1, 128),"
                " j -> sha2(concat(cast(id as string), '-',"
                " cast(j as string)), 512))) as binary)"
            ).alias("bytes"),
        )
        .coalesce(1)
    )

    def groups(d):
        fs = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(fs) == 1
        return pq.read_metadata(os.path.join(d, fs[0])).num_row_groups

    tuned = str(tmp_path / "tuned")
    payload_write_options(
        df.write.mode("overwrite"), row_group_bytes=1 << 20
    ).parquet(tuned)
    control = str(tmp_path / "control")
    df.write.mode("overwrite").parquet(control)

    assert groups(tuned) >= 2, "parquet.block.size option did not apply"
    assert groups(control) == 1
