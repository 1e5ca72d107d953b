"""Pre-serialization PII scrub on the Kafka-records path
(operators/kafka_records.scrub_value_text_fields): transcripts are
redacted inside the envelope value before any wire format, NULL images
pass through, and the record contract is otherwise untouched."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
from scylla_cdc_source_connector_spark.operators.kafka_records import (
    kafka_records,
    scrub_value_text_fields,
)
from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes


@pytest.fixture(scope="module")
def env_with_pii(spark, changelog_path):
    df = spark.read.parquet(changelog_path)
    # plant PII in every transcript (pure column rewrite, stays columnar)
    df = df.withColumn(
        "transcript",
        F.when(
            F.col("transcript").isNotNull(),
            F.concat(F.col("transcript"), F.lit(" reach me: leak@corp.io")),
        ),
    )
    cfg = EngineConfig(
        include_before=IncludeMode.NONE, include_after=IncludeMode.FULL
    )
    return cdc_envelopes(df, cfg, processing_ts_ms=F.lit(0))


def test_scrub_redacts_transcripts_in_records(env_with_pii):
    rec = kafka_records(
        env_with_pii, pre_serialize=scrub_value_text_fields
    ).collect()
    assert len(rec) > 0
    saw_redacted = 0
    for r in rec:
        v = json.loads(bytes(r["value"]).decode("utf-8"))
        after = v.get("after")
        if after and after.get("transcript") is not None:
            assert "leak@corp.io" not in after["transcript"]
            assert "<EMAIL>" in after["transcript"]
            saw_redacted += 1
        else:
            # deletes / partial images: nothing to scrub, row intact
            assert "leak@corp.io" not in json.dumps(v)
    assert saw_redacted > 0


def test_scrub_missing_image_is_skipped(env_with_pii):
    # include_before=NONE means value has no usable before field to
    # scrub on some shapes; the default field list must not fail
    out = scrub_value_text_fields(env_with_pii)
    assert out.schema == env_with_pii.schema


def test_unscrubbed_records_unchanged_elsewhere(env_with_pii):
    plain = kafka_records(env_with_pii).collect()
    scrubbed = kafka_records(
        env_with_pii, pre_serialize=scrub_value_text_fields
    ).collect()
    assert len(plain) == len(scrubbed)
    # keys and topics identical — only value payload text changed
    assert [r["topic"] for r in plain] == [r["topic"] for r in scrubbed]
    assert [bytes(r["key"]) if r["key"] else None for r in plain] == [
        bytes(r["key"]) if r["key"] else None for r in scrubbed
    ]
