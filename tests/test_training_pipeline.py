"""End-to-end composed training pipeline (plans/training_pipeline.py):
changelog → envelopes → latest live state → quality gate → trim →
segment → exact-fingerprint dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
from scylla_cdc_source_connector_spark.fixtures import FixtureSpec, make_changelog
from scylla_cdc_source_connector_spark.plans.training_pipeline import (
    training_corpus,
)
from scylla_cdc_source_connector_spark.schemas import changelog_schema


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = make_changelog(FixtureSpec(n_events=1_500, n_clips=150))
    cl = spark.createDataFrame(pdf, schema=changelog_schema())
    got = training_corpus(cl).toPandas()
    return cl, got


def test_corpus_shape_and_dedup(spark, corpus):
    cl, got = corpus
    assert len(got) > 0
    # exact dedup: one representative per fingerprint
    assert got["fingerprint"].is_unique
    # every segment belongs to a live (non-deleted) clip: a clip whose
    # LAST delta is a ROW_DELETE must not contribute segments
    dead = {
        r["clip_id"]
        for r in cl.where(F.col("`cdc$operation`").isin(1, 2, 4))
        .groupBy("clip_id")
        .agg(F.max_by("`cdc$operation`", "`cdc$time_us`").alias("last_op"))
        .where("last_op = 4")
        .collect()
    }
    assert dead, "fixture should contain deleted clips"
    assert not (set(got["clip_id"]) & dead)


def test_corpus_segments_are_sample_aligned(corpus):
    _, got = corpus
    pcm = got[got.codec == "pcm_s16le"]
    if len(pcm):
        assert (pcm["bytes"].map(len) % 2 == 0).all()
    assert (got["seg_n_samples"] > 0).all()


def test_duplicate_payloads_collapse(spark, corpus):
    """Feeding the corpus's own clips twice under different ids yields no
    new fingerprints: the exact-dup collapse keeps one representative."""
    cl, got = corpus
    base = training_corpus(cl)
    doubled = cl.unionByName(
        cl.withColumn("clip_id", F.concat(F.lit("copy-"), "clip_id"))
    )
    got2 = training_corpus(doubled).toPandas()
    assert set(got2["fingerprint"]) == set(got["fingerprint"])
    assert len(got2) == len(got)
