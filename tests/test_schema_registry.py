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


def test_registry_ids_through_maintain_kafka_records(spark, tmp_root, registry):
    """VERDICT r4 #5: committed sink batches convert with REGISTRY-resolved
    ids end-to-end (maintain_kafka_records(fmt='avro', registry=...)), a
    compatible evolve_schema evolution registers a NEW version whose id
    frames the later batches, and an incompatible evolution 409s."""
    import os
    import shutil

    import pyspark.sql.types as T

    from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
    from scylla_cdc_source_connector_spark.fixtures import (
        FixtureSpec,
        make_changelog,
        write_changelog_chunk,
    )
    from scylla_cdc_source_connector_spark.functions.avro import avro_schema_of
    from scylla_cdc_source_connector_spark.operators.kafka_records import (
        maintain_kafka_records,
        read_kafka_records,
    )
    from scylla_cdc_source_connector_spark.schemas import DEFAULT_TABLE
    from scylla_cdc_source_connector_spark.sources import iceberg_meta as im
    from scylla_cdc_source_connector_spark.streaming import sink as sink_mod
    from scylla_cdc_source_connector_spark.streaming.engine import (
        run_iceberg_meta_stream,
    )

    pdf = make_changelog(FixtureSpec(n_events=300, n_clips=50))
    loc = f"{tmp_root}/sr_ice_tbl"
    shutil.rmtree(loc, ignore_errors=True)
    im.create_table(loc, DEFAULT_TABLE.changelog_schema())
    p1 = f"{loc}/data/c0.parquet"
    write_changelog_chunk(pdf.iloc[:150], p1)
    im.append_files(loc, [p1], timestamp_ms=1000)

    cfg = EngineConfig(
        include_before=IncludeMode.FULL,
        include_after=IncludeMode.FULL,
        checkpoint_dir=f"{tmp_root}/sr_e2e/ck",
        output_dir=f"{tmp_root}/sr_e2e/out",
        lineage_dir=f"{tmp_root}/sr_e2e/lin",
    )
    topic = "sr-e2e.clips"  # explicit subject namespace (shared registry)
    run_iceberg_meta_stream(spark, cfg, loc, adopt_schema=True)
    n1 = maintain_kafka_records(
        spark, cfg, fmt="avro", registry=registry, topic=topic
    )
    assert n1 == sink_mod.read_emitted(spark, cfg).count() > 0

    rec = read_kafka_records(spark, cfg)
    sid_v1, payload = avro.unwire(bytes(rec.first()["value"]))
    assert sid_v1 == registry.latest(f"{topic}-value")["id"]
    # the id resolves to a decodable schema (the registry round-trip)
    sch = json.loads(registry.get_by_id(sid_v1))
    assert avro.decode_record(sch, payload)["op"] in ("c", "u", "d")

    # compatible evolution (nullable added column) -> NEW version, later
    # batches framed with the NEW id
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scylla_cdc_source_connector_spark.fixtures import arrow_changelog_schema

    im.evolve_schema(
        loc,
        T.StructType(
            list(DEFAULT_TABLE.changelog_schema().fields)
            + [T.StructField("lang", T.StringType(), True)]
        ),
    )
    new_pdf = pdf.iloc[150:].copy()
    new_pdf["lang"] = "en"
    p2 = f"{loc}/data/c1.parquet"
    pq.write_table(
        pa.Table.from_pandas(
            new_pdf,
            schema=arrow_changelog_schema().append(pa.field("lang", pa.string())),
            preserve_index=False,
        ),
        p2,
    )
    im.append_files(loc, [p2], timestamp_ms=2000)
    run_iceberg_meta_stream(spark, cfg, loc, adopt_schema=True)
    n2 = maintain_kafka_records(
        spark, cfg, fmt="avro", registry=registry, topic=topic
    )
    assert n2 > 0
    versions = registry.versions(f"{topic}-value")
    assert len(versions) == 2
    sid_v2 = registry.latest(f"{topic}-value")["id"]
    assert sid_v2 != sid_v1
    # both generations of records resolve through the registry
    ids_seen = {
        avro.unwire(bytes(r["value"]))[0]
        for r in read_kafka_records(spark, cfg).select("value").collect()
    }
    assert ids_seen == {sid_v1, sid_v2}

    # incompatible evolution (added field with NO default readable from
    # old data): the BACKWARD gate 409s and nothing is emitted
    env = sink_mod.read_emitted(spark, cfg, merge_schema=True)
    bad = env.withColumn(
        "value", F.struct(F.col("value.*"), F.lit(1).alias("must_have"))
    )
    with pytest.raises(SchemaRegistryError) as ei:
        resolve_schema_ids(registry, topic, bad)
    assert ei.value.code == 409
    # sanity: the constructed field really is avro-required (no default)
    f = next(
        f
        for f in avro_schema_of(bad.schema["value"].dataType)["fields"]
        if f["name"] == "must_have"
    )
    assert f["type"] == "int"
