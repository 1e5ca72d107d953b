"""Golden end-to-end tests: engine envelopes vs the pure-Python oracle
(reference emit semantics), NON_EXTENSIBLE-style dict comparison with
dynamic processing-time fields stripped — mirroring the reference's
JSONAssert-based ITs (ScyllaTypesIT.java:47-53,130-180)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import (
    EngineConfig,
    IncludeMode,
    PkPlacement,
)
from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes
from tests.oracle_ref import expected_envelopes

CONFIGS = {
    "default_none": EngineConfig(),
    "full_full": EngineConfig(
        include_before=IncludeMode.FULL, include_after=IncludeMode.FULL
    ),
    "only_updated": EngineConfig(
        include_before=IncludeMode.ONLY_UPDATED,
        include_after=IncludeMode.ONLY_UPDATED,
    ),
    "before_only": EngineConfig(include_before=IncludeMode.FULL),
    "after_only": EngineConfig(include_after=IncludeMode.ONLY_UPDATED),
    "pk_everywhere": EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        pk_placements=(
            PkPlacement.KAFKA_KEY,
            PkPlacement.PAYLOAD_AFTER,
            PkPlacement.PAYLOAD_BEFORE,
            PkPlacement.PAYLOAD_KEY,
            PkPlacement.KAFKA_HEADERS,
        ),
    ),
    "pk_kafka_key_only": EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        pk_placements=(PkPlacement.KAFKA_KEY,),
    ),
}


def _engine_records(spark_df, cfg):
    env = cdc_envelopes(spark_df, cfg, processing_ts_ms=F.lit(0))
    rows = env.collect()
    out = {}
    for r in rows:
        v = r["value"]
        rec = {
            "topic": r["topic"],
            "key": r["key"].asDict() if r["key"] is not None else None,
            "op": v["op"],
            "before": v["before"].asDict() if v["before"] is not None else None,
            "after": v["after"].asDict() if v["after"] is not None else None,
            "source_ts_us": v["source"]["ts_us"],
        }
        if PkPlacement.PAYLOAD_KEY in cfg.pk_placements:
            pk = v[cfg.payload_key_name]
            rec["payload_key"] = pk.asDict() if pk is not None else None
        if PkPlacement.KAFKA_HEADERS in cfg.pk_placements:
            rec["headers"] = [h.asDict() for h in r["headers"]]
        out[(rec["key"]["clip_id"] if rec["key"] else v["source"]["ts_us"],
             rec["source_ts_us"], rec["op"])] = rec
    return out


def _oracle_records(pdf, cfg):
    out = {}
    for rec in expected_envelopes(pdf, cfg):
        out[(rec["key"]["clip_id"] if rec["key"] else rec["source_ts_us"],
             rec["source_ts_us"], rec["op"])] = rec
    return out


@pytest.mark.parametrize("name", list(CONFIGS))
def test_envelopes_match_oracle(spark, changelog_df, changelog_pdf, name):
    cfg = CONFIGS[name]
    got = _engine_records(changelog_df, cfg)
    want = _oracle_records(changelog_pdf, cfg)
    assert len(got) == len(want), (len(got), len(want))
    mismatches = []
    for k, w in want.items():
        g = got.get(k)
        if g != w:
            mismatches.append((k, g, w))
        if len(mismatches) >= 3:
            break
    assert not mismatches, mismatches[:1]


def test_source_struct_fields(spark, changelog_df):
    cfg = EngineConfig()
    env = cdc_envelopes(changelog_df, cfg, processing_ts_ms=F.lit(12345))
    row = env.limit(1).collect()[0]
    src = row["value"]["source"]
    assert src["connector"] == "scylla-cdc-spark"
    assert src["keyspace_name"] == cfg.keyspace
    assert src["table_name"] == cfg.table
    assert src["ts_ms"] == src["ts_us"] // 1000
    assert row["value"]["ts_ms"] == 12345
    assert row["topic"] == cfg.topic


def test_legacy_config_validation():
    from scylla_cdc_source_connector_spark.config import OutputFormat

    with pytest.raises(ValueError):
        EngineConfig(
            output_format=OutputFormat.LEGACY, include_before=IncludeMode.FULL
        ).validate()
    with pytest.raises(ValueError):
        EngineConfig(
            include_before=IncludeMode.FULL, preimages_enabled=False
        ).validate()
