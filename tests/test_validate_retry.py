"""Validation plane (V1/V2/V4 analog) + retry/backoff (K6) unit tests —
mirrors the reference's ScyllaStreamingChangeEventSourceRetryTest and
CdcTableOptionsValidatorTest coverage (SURVEY §5.1)."""

from __future__ import annotations

import random

import pytest

from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode
from scylla_cdc_source_connector_spark.retry import (
    RetryPolicy,
    with_retries,
)
from scylla_cdc_source_connector_spark.validate import (
    validate_changelog,
    validate_changelog_schema,
)


# ---------------------------------------------------------------------------
# retry / backoff (K6)
# ---------------------------------------------------------------------------
def test_backoff_doubles_and_caps():
    pol = RetryPolicy(base_ms=50, cap_ms=30_000, jitter_pct=0)
    rng = random.Random(1)
    seq = [pol.backoff_ms(a, rng) for a in range(1, 13)]
    assert seq[:5] == [50, 100, 200, 400, 800]
    assert seq[-1] == 30_000  # capped
    assert max(seq) == 30_000


def test_backoff_jitter_is_subtractive():
    pol = RetryPolicy(base_ms=1000, cap_ms=30_000, jitter_pct=20)
    rng = random.Random(42)
    vals = [pol.backoff_ms(1, rng) for _ in range(200)]
    assert all(800 <= v <= 1000 for v in vals)  # never above raw, ≤20% below
    assert min(vals) < 900  # jitter actually applied


def test_retries_transient_then_succeeds():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise OSError("disk hiccup")
        return "ok"

    out = with_retries(
        flaky,
        policy=RetryPolicy(jitter_pct=0),
        sleep=sleeps.append,
        rng=random.Random(0),
    )
    assert out == "ok"
    assert calls["n"] == 4
    assert sleeps == [0.05, 0.1, 0.2]  # exponential


def test_non_transient_raises_immediately():
    calls = {"n": 0}

    def bad():
        calls["n"] += 1
        raise ValueError("bug, not transience")

    with pytest.raises(ValueError):
        with_retries(bad, sleep=lambda s: None)
    assert calls["n"] == 1


def test_exhausted_attempts_reraise():
    calls = {"n": 0}

    def always():
        calls["n"] += 1
        raise TimeoutError("down")

    with pytest.raises(TimeoutError):
        with_retries(
            always, policy=RetryPolicy(max_attempts=5), sleep=lambda s: None
        )
    assert calls["n"] == 5


def test_cause_chain_walked():
    """Wrapped transient causes are classified transient (the reference
    walks the full cause chain incl. shaded classes)."""
    calls = {"n": 0}

    def wrapped():
        calls["n"] += 1
        if calls["n"] < 2:
            try:
                raise ConnectionError("inner")
            except ConnectionError as e:
                raise RuntimeError("outer wrapper") from e
        return 1

    assert with_retries(wrapped, sleep=lambda s: None) == 1
    assert calls["n"] == 2


# ---------------------------------------------------------------------------
# validation plane (V1/V2/V4)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def changelog_path(tmp_path_factory):
    from scylla_cdc_source_connector_spark.fixtures import (
        FixtureSpec,
        write_changelog_parquet,
    )

    p = str(tmp_path_factory.mktemp("vcl") / "cl.parquet")
    write_changelog_parquet(p, FixtureSpec(n_events=400, n_clips=60))
    return p


def test_valid_changelog_passes(spark, changelog_path):
    cfg = EngineConfig(
        include_before=IncludeMode.FULL, include_after=IncludeMode.FULL
    )
    rep = validate_changelog(spark, changelog_path, cfg)
    assert rep.ok, rep.errors


def test_missing_path_warns_not_errors(spark):
    """V1 warn-and-wait (ScyllaConnector.java:251-255): a missing changelog
    is a warning, not a startup failure."""
    rep = validate_changelog(
        spark, "/tmp/does-not-exist-sccs", EngineConfig()
    )
    assert rep.ok
    assert rep.warnings


def test_schema_violation_errors(spark):
    df = spark.range(3).withColumnRenamed("id", "clip_id")
    rep = validate_changelog_schema(df)
    assert not rep.ok
    assert any("cdc$operation" in e for e in rep.errors)
    with pytest.raises(ValueError):
        rep.raise_if_invalid()


def test_images_required_but_absent_errors(spark, changelog_path, tmp_path):
    """V2: include modes demand image rows that the changelog lacks."""
    from pyspark.sql import functions as F

    from scylla_cdc_source_connector_spark.schemas import (
        OP_POST_IMAGE,
        OP_PRE_IMAGE,
    )

    stripped = str(tmp_path / "no_images.parquet")
    (
        spark.read.parquet(changelog_path)
        .filter(~F.col("`cdc$operation`").isin(OP_PRE_IMAGE, OP_POST_IMAGE))
        .write.mode("overwrite")
        .parquet(stripped)
    )
    cfg = EngineConfig(
        include_before=IncludeMode.FULL, include_after=IncludeMode.FULL
    )
    rep = validate_changelog(spark, stripped, cfg)
    assert not rep.ok
    assert any("PRE_IMAGE" in e for e in rep.errors)
    assert any("POST_IMAGE" in e for e in rep.errors)


def test_bad_config_reported(spark, changelog_path):
    cfg = EngineConfig(include_before=IncludeMode.FULL, preimages_enabled=False)
    rep = validate_changelog(spark, changelog_path, cfg)
    assert not rep.ok


def test_split_dlq_routes_bad_rows(spark, changelog_path):
    """Per-row errors.tolerance: rows with null PK / unknown op byte /
    null coordinates land in the DLQ with ALL violated reasons; good
    rows pass through schema-identical."""
    from pyspark.sql import functions as F

    from scylla_cdc_source_connector_spark.validate import split_dlq

    base = spark.read.parquet(changelog_path).limit(20)
    bad = (
        base.limit(3)
        .withColumn("clip_id", F.lit(None).cast("string"))
        .withColumn("cdc$operation", F.lit(77).cast(base.schema["cdc$operation"].dataType))
    )
    mixed = base.unionByName(bad)

    good, dlq = split_dlq(mixed)
    assert good.schema == mixed.schema
    assert good.count() == 20
    rows = dlq.collect()
    assert len(rows) == 3
    for r in rows:
        assert set(r["dlq_reasons"]) == {"null_pk", "bad_operation"}

    # a fully healthy changelog yields an empty DLQ
    g2, d2 = split_dlq(base)
    assert d2.count() == 0 and g2.count() == 20
