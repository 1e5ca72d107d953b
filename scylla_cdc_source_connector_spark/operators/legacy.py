"""Legacy output format — per-column Cell-wrapped envelopes (SURVEY P9).

Reference: ScyllaChangeRecordEmitterLegacy.fillStructWithChange (:222-245):
- PK columns appear plainly in key AND value structs;
- each non-PK column becomes a Cell struct `{value: v}` present iff the
  column was set (value non-null) or explicitly deleted (cdc$deleted true,
  looked up on the DELTA even when filling from a preimage);
- an absent (null) cell means "column not modified"; `{value: null}` means
  "set to NULL" — the tri-state of README.md:203-246.

Envelope per op (ScyllaChangeRecordEmitterLegacy.java:109-220):
- create: after = cells(delta); before = cells(preimage) iff experimental
  preimages delivered one (legacy preimage map C5,
  ScyllaChangesConsumerLegacy.java:56-126)
- update: after = cells(delta); before = cells(preimage) or null
- delete: before = cells(preimage if present else delta); after = null

The cell struct-or-null encoding survives Spark's columnar representation
without flattening — never unwrap early (SURVEY §7.3 tri-state note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig
from scylla_cdc_source_connector_spark.operators.change_typing import op_code_expr
from scylla_cdc_source_connector_spark.schemas import (
    NON_PK_COLUMNS,
    OP_CODE_DELETE,
)


def _cells_struct(img: Column, delta: Column) -> Column:
    """Cell-wrapped value struct from an image (or the delta itself);
    the deleted marker is always read from the delta."""
    fields = [img["clip_id"].alias("clip_id")]
    for c in NON_PK_COLUMNS:
        deleted = F.coalesce(delta[f"cdc$deleted_{c}"], F.lit(False))
        cell = F.when(
            img[c].isNotNull() | deleted, F.struct(img[c].alias("value"))
        )
        fields.append(cell.alias(c))
    return F.when(img.isNotNull(), F.struct(*fields))


def build_legacy_envelopes(
    correlated: DataFrame,
    cfg: EngineConfig,
    *,
    processing_ts_ms: Column | None = None,
    experimental_preimages: bool = False,
) -> DataFrame:
    """Correlated changes → legacy-format records.  Output shape matches
    build_envelopes but before/after are Cell-wrapped structs."""
    if processing_ts_ms is None:
        processing_ts_ms = F.unix_millis(F.current_timestamp())

    delta = F.col("delta")
    pre = F.col("pre_image") if experimental_preimages else F.lit(None)
    op = op_code_expr(delta["cdc$operation"])

    after_cells = _cells_struct(delta, delta)
    if experimental_preimages:
        before_cells = _cells_struct(F.col("pre_image"), delta)
        before_delete = F.coalesce(before_cells, _cells_struct(delta, delta))
    else:
        before_cells = F.lit(None)
        before_delete = _cells_struct(delta, delta)

    after = F.when(op == OP_CODE_DELETE, F.lit(None)).otherwise(after_cells)
    before = F.when(op == OP_CODE_DELETE, before_delete).otherwise(before_cells)

    source = F.struct(
        F.lit(cfg.connector_version).alias("version"),
        F.lit("scylla-cdc-spark").alias("connector"),
        F.lit(cfg.connector_name).alias("name"),
        (F.col("`cdc$time_us`") / 1000).cast("long").alias("ts_ms"),
        F.col("`cdc$time_us`").alias("ts_us"),
        F.lit("false").alias("snapshot"),
        F.lit(cfg.keyspace).alias("db"),
        F.lit(cfg.keyspace).alias("keyspace_name"),
        F.lit(cfg.table).alias("table_name"),
    ).alias("source")

    return correlated.select(
        F.lit(cfg.topic).alias("topic"),
        F.struct(F.col("clip_id")).alias("key"),
        F.struct(
            source,
            before.alias("before"),
            after.alias("after"),
            op.alias("op"),
            processing_ts_ms.cast("long").alias("ts_ms"),
        ).alias("value"),
        F.col("clip_id"),
        F.col("`cdc$stream_id`"),
        F.col("`cdc$time`"),
        F.col("`cdc$time_us`"),
        F.col("generation"),
        delta["cdc$batch_seq_no"].alias("cdc$batch_seq_no"),
    )
