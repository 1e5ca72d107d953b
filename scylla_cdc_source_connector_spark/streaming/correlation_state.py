"""Streaming pre/delta/post correlation — applyInPandasWithState.

The streaming twin of operators/correlation.correlate_batch for the case the
batch operator can't express: a micro-batch boundary splitting a CDC write
batch, so the PRE_IMAGE arrives in batch N and its delta in batch N+1.  The
reference holds a per-RowKey TaskInfo across polls for exactly this reason
(ScyllaChangesConsumer.java:132-139, 187-249) and evicts incomplete entries
after cdc.incomplete.task.timeout.ms = 15 s (C4, :37,147-185).

Spark mapping:
- group key   = (clip_id, cdc$time)      ≙ RowKey (RowKey.java:48-58)
- state       = partial {pre, post, delta} slots, last-writer-wins per slot
                in cdc$batch_seq_no order (TaskInfo setters overwrite)
- timeout     = EventTimeTimeout at cdc$time + incomplete_task_timeout —
                fires when the watermark passes it; expired incomplete
                groups are dropped exactly like the reference's stale-task
                cleanup (the watermark is the streaming analog of its
                wall-clock check)
- completeness is evaluated on every update; complete groups emit
  immediately and clear state (taskInfoMap.remove,
  ScyllaChangesConsumer.java:230-233)

State and output are FLAT columns (pre__*/post__*/d__*) because Arrow
state/record batches travel as primitives; `reassemble_correlated` rebuilds
the nested pre_image/post_image/delta structs so the downstream envelope
projection is byte-identical to the batch path.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from scylla_cdc_source_connector_spark.config import EngineConfig
from scylla_cdc_source_connector_spark.schemas import (
    DELTA_OPS,
    NON_PK_COLUMNS,
    OP_PARTITION_DELETE,
    OP_POST_IMAGE,
    OP_PRE_IMAGE,
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
)

_IMG_FIELDS = [
    ("bytes", T.BinaryType()),
    ("sr_hz", T.IntegerType()),
    ("dur_ms", T.IntegerType()),
    ("codec", T.StringType()),
    ("transcript", T.StringType()),
]


def _flat_fields(prefix: str) -> list[T.StructField]:
    out = [T.StructField(f"{prefix}has", T.BooleanType())]
    out += [T.StructField(f"{prefix}{n}", t) for n, t in _IMG_FIELDS]
    return out


def _delta_flag_fields() -> list[T.StructField]:
    """The delta slot stores per-column SET FLAGS, not values — the
    payload elision of operators.correlation.delta_struct_expr applied to
    the state store: advanced projection only reads delta null-ness, so
    state never holds a second copy of the audio payload."""
    out = [T.StructField("d__has", T.BooleanType())]
    out += [T.StructField(f"d__set_{n}", T.BooleanType()) for n, _ in _IMG_FIELDS]
    return out


def state_schema() -> T.StructType:
    fields = [
        T.StructField("cdc_time_us", T.LongType()),
        T.StructField("stream_id", T.StringType()),
        T.StructField("generation", T.IntegerType()),
        T.StructField("d_op", T.IntegerType()),
        T.StructField("d_seq", T.IntegerType()),
        T.StructField("pre_seq", T.IntegerType()),
        T.StructField("post_seq", T.IntegerType()),
    ]
    fields += _flat_fields("pre__")
    fields += _flat_fields("post__")
    fields += _delta_flag_fields()
    fields += [
        T.StructField(f"d__deleted_{c}", T.BooleanType()) for c in NON_PK_COLUMNS
    ]
    return T.StructType(fields)


def output_schema() -> T.StructType:
    fields = [
        T.StructField("clip_id", T.StringType()),
        T.StructField("cdc$time", T.TimestampType()),
        T.StructField("cdc$time_us", T.LongType()),
        T.StructField("cdc$stream_id", T.StringType()),
        T.StructField("generation", T.IntegerType()),
        T.StructField("d_op", T.IntegerType()),
        T.StructField("d_seq", T.IntegerType()),
    ]
    fields += _flat_fields("pre__")
    fields += _flat_fields("post__")
    fields += _delta_flag_fields()
    fields += [
        T.StructField(f"d__deleted_{c}", T.BooleanType()) for c in NON_PK_COLUMNS
    ]
    return T.StructType(fields)


_N_IMG = len(_IMG_FIELDS)
_STATE_LEN = 7 + 3 * (1 + _N_IMG) + len(NON_PK_COLUMNS)


def _pyval(v):
    """numpy/pandas scalar → plain python (None for NA/NaN) for Arrow state."""
    if v is None or v is pd.NA or v is pd.NaT:
        return None
    if isinstance(v, float) and pd.isna(v):
        return None
    if hasattr(v, "item"):
        return v.item()
    if isinstance(v, (bytearray, memoryview)):
        return bytes(v)
    return v


def _is_complete(cfg: EngineConfig, d_op, has_pre: bool, has_post: bool) -> bool:
    """C3 completion predicate (TaskInfo.java variants; same table as
    operators.correlation.is_complete_expr)."""
    if d_op is None:
        return False
    if d_op == OP_ROW_INSERT:
        return (not cfg.needs_postimage) or has_post
    if d_op == OP_ROW_UPDATE:
        return ((not cfg.needs_preimage) or has_pre) and (
            (not cfg.needs_postimage) or has_post
        )
    if d_op == OP_ROW_DELETE:
        return (not cfg.needs_preimage) or has_pre
    if d_op == OP_PARTITION_DELETE:
        return (not cfg.wait_preimage_for_partition_delete) or has_pre
    return False


def make_correlator(cfg: EngineConfig):
    """Builds the applyInPandasWithState function (closure over cfg)."""
    timeout_ms = cfg.incomplete_task_timeout_ms
    needs_pre, needs_post = cfg.needs_preimage, cfg.needs_postimage

    def correlate(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        clip_id, cdc_time = key

        if state.hasTimedOut:
            # stale incomplete group: drop, like cleanupStaleTasks
            # (ScyllaChangesConsumer.java:147-185)
            state.remove()
            return

        if state.exists:
            st = list(state.get)
        else:
            st = [None] * _STATE_LEN

        # unpack slots
        o = 7
        pre = st[o : o + 1 + _N_IMG]
        post = st[o + 1 + _N_IMG : o + 2 * (1 + _N_IMG)]
        dlt = st[o + 2 * (1 + _N_IMG) : o + 3 * (1 + _N_IMG)]
        ddel = st[o + 3 * (1 + _N_IMG) :]
        t_us, stream_id, gen = st[0], st[1], st[2]
        d_op, d_seq, pre_seq, post_seq = st[3], st[4], st[5], st[6]

        # Confidence-window enforcement (S2): applyInPandasWithState does NOT
        # drop late input rows itself — rows whose event time is already
        # behind the watermark correspond to windows the reference's reader
        # has moved past, so we drop them here explicitly.
        wm_ms = state.getCurrentWatermarkMs()
        absorbed = False

        for pdf in pdfs:
            pdf = pdf.sort_values("cdc$batch_seq_no", kind="stable")
            # itertuples would mangle the `cdc$...` names; groups are tiny
            # (one write batch), so dict records are fine here
            for rd in pdf.to_dict("records"):
                if wm_ms > 0 and int(rd["cdc$time_us"]) // 1000 < wm_ms:
                    continue
                absorbed = True
                op = int(rd["cdc$operation"])
                seq = int(rd["cdc$batch_seq_no"])
                t_us = int(rd["cdc$time_us"])
                stream_id = rd["cdc$stream_id"]
                gen = int(rd["generation"])
                if op == OP_PRE_IMAGE:
                    if needs_pre and (pre_seq is None or seq >= pre_seq):
                        pre = [True] + [_pyval(rd[n]) for n, _ in _IMG_FIELDS]
                        pre_seq = seq
                elif op == OP_POST_IMAGE:
                    if needs_post and (post_seq is None or seq >= post_seq):
                        post = [True] + [_pyval(rd[n]) for n, _ in _IMG_FIELDS]
                        post_seq = seq
                elif op in DELTA_OPS:
                    if d_seq is None or seq >= d_seq:
                        # delta slot: set FLAGS only (payload elision)
                        dlt = [True] + [
                            _pyval(rd[n]) is not None for n, _ in _IMG_FIELDS
                        ]
                        d_op, d_seq = op, seq
                        ddel = [
                            bool(rd.get(f"cdc$deleted_{c}") or False)
                            for c in NON_PK_COLUMNS
                        ]

        if _is_complete(cfg, d_op, bool(pre[0]), bool(post[0])):
            state.remove()
            out: dict[str, Any] = {
                "clip_id": clip_id,
                "cdc$time": cdc_time,
                "cdc$time_us": t_us,
                "cdc$stream_id": stream_id,
                "generation": gen,
                "d_op": d_op,
                "d_seq": d_seq,
            }
            for prefix, slot in (("pre__", pre), ("post__", post)):
                out[f"{prefix}has"] = bool(slot[0])
                for i, (n, _) in enumerate(_IMG_FIELDS):
                    out[f"{prefix}{n}"] = slot[1 + i] if slot[0] else None
            out["d__has"] = bool(dlt[0])
            for i, (n, _) in enumerate(_IMG_FIELDS):
                out[f"d__set_{n}"] = bool(dlt[1 + i]) if dlt[0] else False
            for i, c in enumerate(NON_PK_COLUMNS):
                out[f"d__deleted_{c}"] = bool(ddel[i]) if ddel else False
            yield pd.DataFrame([out])
        elif state.exists or absorbed:
            state.update(
                tuple(
                    [t_us, stream_id, gen, d_op, d_seq, pre_seq, post_seq]
                    + pre
                    + post
                    + dlt
                    + (ddel if ddel else [False] * len(NON_PK_COLUMNS))
                )
            )
            # evict when the event-time watermark passes cdc$time + timeout
            state.setTimeoutTimestamp(t_us // 1000 + timeout_ms)

    return correlate


def correlate_stream(changelog: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Watermarked streaming correlation.

    changelog must be a streaming DataFrame with the changelog schema.
    Watermark = confidence window (S2, ScyllaConnectorConfig.java:171-184):
    the reference never reads rows fresher than now - 30 s for the same
    reason Spark holds state until the watermark passes.
    """
    wm = f"{cfg.confidence_window_ms // 1000} seconds"
    grouped = changelog.withWatermark("`cdc$time`", wm).groupBy(
        "clip_id", "`cdc$time`"
    )
    return grouped.applyInPandasWithState(
        make_correlator(cfg),
        outputStructType=output_schema(),
        stateStructType=state_schema(),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _img_struct(prefix: str, clip: Column | None = None) -> Column:
    fields = [
        (clip if clip is not None else F.col("clip_id")).alias("clip_id")
    ] + [F.col(f"`{prefix}{n}`").alias(n) for n, _ in _IMG_FIELDS]
    return F.when(F.col(f"`{prefix}has`"), F.struct(*fields))


def reassemble_correlated(flat: DataFrame) -> DataFrame:
    """Flat correlator output → the nested (pre_image, post_image, delta)
    shape shared with operators.correlation.correlate_batch, so
    build_envelopes works identically on both paths."""
    # field order matches operators.correlation.delta_struct_expr
    # (with_values=False): metadata, set flags, deleted flags
    ordered = (
        [F.col("d_op").alias("cdc$operation"), F.col("d_seq").alias("cdc$batch_seq_no")]
        + [F.col(f"`d__set_{n}`").alias(f"set_{n}") for n, _ in _IMG_FIELDS]
        + [
            F.col(f"`d__deleted_{c}`").alias(f"cdc$deleted_{c}")
            for c in NON_PK_COLUMNS
        ]
    )
    return flat.select(
        "clip_id",
        "`cdc$time`",
        "`cdc$time_us`",
        "`cdc$stream_id`",
        "generation",
        _img_struct("pre__").alias("pre_image"),
        _img_struct("post__").alias("post_image"),
        F.when(F.col("d__has"), F.struct(*ordered)).alias("delta"),
    )
