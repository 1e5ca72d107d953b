"""Schema-Registry client protocol against the in-process stub
(functions/schema_registry.py) — VERDICT r3 #7.

Reference parity: subject naming + registration + version listing
(SchemaRegistryUtils.java), Confluent wire framing with REGISTRY-resolved
ids instead of static ones (ScyllaTypesAllAvroConnectorIT)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.functions import avro
from scylla_cdc_source_connector_spark.functions.schema_registry import (
    SchemaRegistryClient,
    SchemaRegistryError,
    StubSchemaRegistry,
    backward_compatible,
    canonical,
    resolve_schema_ids,
)


@pytest.fixture(scope="module")
def registry():
    reg = StubSchemaRegistry()
    yield SchemaRegistryClient(reg.url)
    reg.close()


def test_register_is_idempotent_and_global(registry):
    s = {
        "type": "record",
        "name": "V",
        "fields": [{"name": "a", "type": "long"}],
    }
    i1 = registry.register("t1-value", s)
    i2 = registry.register("t1-value", s)
    assert i1 == i2
    # same schema under ANOTHER subject: same GLOBAL id, new subject
    i3 = registry.register("t2-value", s)
    assert i3 == i1
    assert set(registry.subjects()) >= {"t1-value", "t2-value"}
    assert registry.versions("t1-value") == [1]
    assert json.loads(registry.get_by_id(i1)) == json.loads(canonical(s))


def test_evolution_versions_and_backward_gate(registry):
    v1 = {
        "type": "record",
        "name": "E",
        "fields": [{"name": "a", "type": "long"}],
    }
    v2 = {
        "type": "record",
        "name": "E",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
        ],
    }
    id1 = registry.register("evo-value", v1)
    id2 = registry.register("evo-value", v2)
    assert id2 != id1
    assert registry.versions("evo-value") == [1, 2]
    latest = registry.latest("evo-value")
    assert latest["id"] == id2 and latest["version"] == 2

    # BACKWARD gate: removing a field / non-nullable add / type change
    bad_removed = {"type": "record", "name": "E", "fields": []}
    with pytest.raises(SchemaRegistryError) as ei:
        registry.register("evo-value", bad_removed)
    assert ei.value.code == 409
    assert not backward_compatible(v2, bad_removed)[0]
    bad_add = {
        "type": "record",
        "name": "E",
        "fields": v2["fields"] + [{"name": "c", "type": "long"}],
    }
    with pytest.raises(SchemaRegistryError):
        registry.register("evo-value", bad_add)
    bad_type = {
        "type": "record",
        "name": "E",
        "fields": [{"name": "a", "type": "string"}],
    }
    with pytest.raises(SchemaRegistryError):
        registry.register("evo-value", bad_type)


def test_unknown_id_and_subject_404(registry):
    with pytest.raises(SchemaRegistryError) as ei:
        registry.get_by_id(999_999)
    assert ei.value.code == 404
    with pytest.raises(SchemaRegistryError):
        registry.versions("never-registered")


def test_wire_roundtrip_with_registry_ids(spark, registry):
    """register -> encode with the RETURNED id -> decode resolving the id
    via the registry (the full reference flow, no static ids)."""
    from scylla_cdc_source_connector_spark.config import (
        EngineConfig,
        IncludeMode,
        PkPlacement,
    )
    from scylla_cdc_source_connector_spark.fixtures import (
        FixtureSpec,
        make_changelog,
        write_changelog_chunk,
    )
    from scylla_cdc_source_connector_spark.operators.kafka_records import (
        kafka_records,
    )
    from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes

    import os
    import tempfile

    spec = FixtureSpec(n_events=120, n_clips=30)
    path = os.path.join(
        tempfile.gettempdir(), f"sr_cl_{spec.content_hash()}.parquet"
    )
    if not os.path.exists(path):
        write_changelog_chunk(make_changelog(spec), path)
    cfg = EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        pk_placements=(PkPlacement.KAFKA_KEY, PkPlacement.PAYLOAD_AFTER),
    )
    env = cdc_envelopes(
        spark.read.parquet(path), cfg, processing_ts_ms=F.lit(0)
    )
    topic = env.select("topic").first()["topic"]
    ids = resolve_schema_ids(registry, topic, env)
    assert set(ids) == {"key_schema_id", "value_schema_id"}
    assert ids["key_schema_id"] != ids["value_schema_id"]
    # subjects follow TopicNameStrategy
    assert {f"{topic}-key", f"{topic}-value"} <= set(registry.subjects())

    rec = kafka_records(env, fmt="avro", **ids).limit(5).collect()
    assert rec
    for r in rec:
        sid, payload = avro.unwire(bytes(r["value"]))
        assert sid == ids["value_schema_id"]
        writer_schema = json.loads(registry.get_by_id(sid))
        decoded = avro.decode_record(writer_schema, payload)
        assert decoded["op"] in ("c", "u", "d")
        if r["key"] is not None:
            ksid, kpayload = avro.unwire(bytes(r["key"]))
            assert ksid == ids["key_schema_id"]
            kschema = json.loads(registry.get_by_id(ksid))
            assert "clip_id" in avro.decode_record(kschema, kpayload)
