"""End-to-end CDC plan assembly.

The batch plan is the engine's workhorse: it is also the body of every
streaming micro-batch (Structured Streaming's incremental execution of the
same logical plan), so keeping it one Catalyst tree — scan → single shuffle
on the correlation key → codegen'd projection — is what makes the 100 TB
case work: predicate pushdown into the changelog scan, map-side partial
aggregation before the shuffle, and no Python anywhere on the hot path.

Lifecycle mirror of the reference (SURVEY §3.2): windowed scan →
correlation (ScyllaChangesConsumer) → emitter projection
(ScyllaChangeRecordEmitter) → queue/poll (here: Catalyst pipeline) →
offset-tracked sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig
from scylla_cdc_source_connector_spark.operators.correlation import (
    complete_only,
    correlate_batch,
    mask_unused_images,
    needs_delta_flags,
)
from scylla_cdc_source_connector_spark.operators.change_typing import (
    admissible_only,
)
from scylla_cdc_source_connector_spark.operators.projection import build_envelopes
from scylla_cdc_source_connector_spark.schemas import DEFAULT_TABLE, TableModel


def cdc_envelopes(
    changelog: DataFrame,
    cfg: EngineConfig,
    *,
    processing_ts_ms: Column | None = None,
    table: TableModel = DEFAULT_TABLE,
) -> DataFrame:
    """changelog rows → emitted envelope rows (batch / per-micro-batch).

    Single shuffle (the correlation groupBy); duplicates collapse in the
    same aggregation; projection is codegen'd.  Emission order within a
    shard is recovered by sorting on (cdc$stream_id, cdc$time,
    cdc$batch_seq_no) at the sink — matching the reference's per-task
    ordering guarantee scope (SURVEY §7.3).
    """
    correlated = complete_only(
        mask_unused_images(
            correlate_batch(
                admissible_only(changelog, table=table),
                delta_flags=needs_delta_flags(cfg),
                table=table,
            ),
            cfg,
        ),
        cfg,
    )
    return build_envelopes(
        correlated, cfg, processing_ts_ms=processing_ts_ms, table=table
    )


def cdc_legacy_envelopes(
    changelog: DataFrame,
    cfg: EngineConfig,
    *,
    processing_ts_ms: Column | None = None,
    experimental_preimages: bool = False,
) -> DataFrame:
    """Legacy-format pipeline: Cell-wrapped envelopes.  The legacy emitter
    fills cells FROM the delta
    (ScyllaChangeRecordEmitterLegacy.fillStructWithChange:222-245), so the
    correlation shuffles delta VALUES here (delta_values=True) — the
    advanced path's payload elision doesn't apply."""
    from scylla_cdc_source_connector_spark.operators.legacy import (
        build_legacy_envelopes,
    )

    correlated = correlate_batch(changelog, delta_values=True)
    # legacy holds only a preimage slot (C5, ScyllaChangesConsumerLegacy);
    # postimages are always ignored, preimages only under the experimental
    # flag — image masking here follows that, not the include modes
    correlated = correlated.withColumn(
        "post_image", F.lit(None).cast(correlated.schema["post_image"].dataType)
    )
    if not experimental_preimages:
        correlated = correlated.withColumn(
            "pre_image", F.lit(None).cast(correlated.schema["pre_image"].dataType)
        )
    correlated = complete_only(correlated, cfg)
    return build_legacy_envelopes(
        correlated,
        cfg,
        processing_ts_ms=processing_ts_ms,
        experimental_preimages=experimental_preimages,
    )
