"""Validation plane — the engine analog of the reference's connector
validation (SURVEY §2.7 / §3.3).

- V1 trial connection + existence: `ScyllaConnector.validate`
  (ScyllaConnector.java:136-194) builds a trial session and checks the
  configured tables; missing tables only WARN (warn-and-wait,
  ScyllaConnector.java:251-255).  Here: the changelog path/table must be
  readable; a missing path is a warning (the stream may appear later).
- V2 CDC-options cross-check: `CdcTableOptionsValidator`
  (CdcTableOptionsValidator.java:83-149) verifies preimage/postimage are
  enabled on the Scylla table when the include modes need them.  Here:
  when include_before/include_after request images, the changelog must
  actually carry PRE_IMAGE/POST_IMAGE rows — otherwise every UPDATE would
  wait out the incomplete-task timeout and be dropped.
- V4 schema validation: required columns with the expected types
  (the analog of the reference's table-name/IP syntax checks,
  ConfigSerializerUtil.java:83-199 — our "syntax" is the changelog schema).

V3 (config cross-checks) lives on EngineConfig.validate().
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from scylla_cdc_source_connector_spark.config import EngineConfig
from scylla_cdc_source_connector_spark.schemas import (
    OP_POST_IMAGE,
    OP_PRE_IMAGE,
    changelog_schema,
)


@dataclass
class ValidationReport:
    """Errors fail startup (like Connect's per-field error attachment);
    warnings don't (warn-and-wait)."""

    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.errors

    def raise_if_invalid(self) -> None:
        if self.errors:
            raise ValueError("changelog validation failed: " + "; ".join(self.errors))


def _types_compatible(actual, expected) -> bool:
    from pyspark.sql import types as T

    if actual == expected:
        return True
    # parquet naive timestamps surface as TIMESTAMP_NTZ under Spark 4's
    # inference; the stream source applies changelog_schema() explicitly,
    # so either flavor is admissible here (session TZ is pinned to UTC)
    ts = (T.TimestampType(), T.TimestampNTZType())
    return actual in ts and expected in ts


def validate_changelog_schema(df: DataFrame) -> ValidationReport:
    """V4: every required changelog column present with the expected type."""
    rep = ValidationReport()
    actual = {f.name: f.dataType for f in df.schema.fields}
    for f in changelog_schema().fields:
        if f.name not in actual:
            rep.errors.append(f"missing required column {f.name!r}")
        elif not _types_compatible(actual[f.name], f.dataType):
            rep.errors.append(
                f"column {f.name!r} has type {actual[f.name].simpleString()}, "
                f"expected {f.dataType.simpleString()}"
            )
    return rep


def validate_changelog(
    spark: SparkSession, path: str, cfg: EngineConfig, *, sample_limit: int = 100_000
) -> ValidationReport:
    """Full startup validation: config (V3), existence (V1), schema (V4),
    image availability vs include modes (V2).  Image presence is probed on
    a bounded sample — at 100 TB a full scan for validation is absurd, and
    any healthy changelog shows images within the first rows of a shard."""
    rep = ValidationReport()
    try:
        cfg.validate()
    except ValueError as e:
        rep.errors.append(str(e))
        return rep

    try:
        df = spark.read.parquet(path)
    except Exception as e:  # AnalysisException: path not found
        # warn-and-wait: the table may appear later (ScyllaConnector.java:251-255)
        rep.warnings.append(f"changelog not readable yet at {path!r}: {e}")
        return rep

    schema_rep = validate_changelog_schema(df)
    rep.errors.extend(schema_rep.errors)
    if rep.errors:
        return rep

    ops_needed = []
    if cfg.needs_preimage:
        ops_needed.append(("PRE_IMAGE", OP_PRE_IMAGE, "cdc.include.before"))
    if cfg.needs_postimage:
        ops_needed.append(("POST_IMAGE", OP_POST_IMAGE, "cdc.include.after"))
    if ops_needed:
        sample = df.select("`cdc$operation`").limit(sample_limit)
        present = {
            r[0]
            for r in sample.groupBy("`cdc$operation`").count().collect()
        }
        for label, code, key in ops_needed:
            if code not in present:
                rep.errors.append(
                    f"{key} requires {label} rows in the changelog but none "
                    f"found in the first {sample_limit} rows "
                    f"(CdcTableOptionsValidator.java:93-149 analog)"
                )
    return rep


#: every cdc$operation byte the CDC log can carry (schemas.py; the full
#: enum at CdcBatchPreimageMisalignmentIT.java:57-62 spans 0..9)
VALID_OPERATIONS = tuple(range(10))


def split_dlq(
    df: DataFrame, *, pk_cols: tuple[str, ...] = ("clip_id",)
) -> tuple[DataFrame, DataFrame]:
    """Per-ROW error tolerance — Kafka Connect's `errors.tolerance=all`
    + dead-letter-queue routing, for the changelog itself: rows that can
    never form a valid change event (null primary key, unknown
    cdc$operation byte, null stream/time coordinates) are split off with
    a `dlq_reasons` array instead of poisoning the pipeline or silently
    disappearing.

    Returns (good, dlq): `good` has the input schema exactly; `dlq`
    carries every original column plus `dlq_reasons` (all violated
    checks, not just the first — the triage column a DLQ consumer needs).
    Table-LEVEL problems (missing columns, wrong types) stay the job of
    validate_changelog at startup; this guards the per-row tail a healthy
    table can still contain after upstream corruption.

    Scale shape: two filters over the same scan (Catalyst pushes both
    down; no shuffle, no Python).  Route `dlq` wherever quarantined
    payloads go — it is exactly-once under the sink's lineage like any
    other per-batch output."""
    checks = [
        (
            "null_pk",
            F.lit(False)
            if not pk_cols
            else _any_null([F.col(c) for c in pk_cols]),
        ),
        (
            "bad_operation",
            F.col("`cdc$operation`").isNull()
            | ~F.col("`cdc$operation`").isin(*VALID_OPERATIONS),
        ),
        ("null_stream", F.col("`cdc$stream_id`").isNull()),
        ("null_time", F.col("`cdc$time`").isNull()),
    ]
    reasons = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in checks])
    )
    flagged = df.withColumn("dlq_reasons", reasons)
    good = flagged.where(F.size("dlq_reasons") == 0).drop("dlq_reasons")
    dlq = flagged.where(F.size("dlq_reasons") > 0)
    return good, dlq


def _any_null(cols):
    out = cols[0].isNull()
    for c in cols[1:]:
        out = out | c.isNull()
    return out
