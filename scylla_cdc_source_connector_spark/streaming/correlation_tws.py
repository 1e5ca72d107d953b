"""Streaming pre/delta/post correlation — transformWithStateInPandas.

The Spark 4.x successor of streaming/correlation_state.py's
applyInPandasWithState correlator, with identical semantics (same flat
state/output schemas, same C3 completion predicate, same last-writer-wins
slot absorption in cdc$batch_seq_no order) expressed in the
StatefulProcessor API.  What the newer operator buys at 10^12-key scale:

- **RocksDB-only state** with changelog checkpointing: per-key state lives
  off-heap on local SSD, snapshots upload incrementally — the only state
  backend that survives 10^12 RowKeys per the SURVEY §4 sizing.
- **Explicit event-time timers** (registerTimer / handleExpiredTimer)
  replace GroupStateTimeout: the stale-incomplete-group eviction (C4,
  ScyllaChangesConsumer.cleanupStaleTasks, ScyllaChangesConsumer.java:
  147-185) fires exactly when the watermark passes cdc$time +
  incomplete_task_timeout, per key, without a full state scan.
- **State TTL hooks and independent value/list/map states** for future
  operators (the correlator needs only one ValueState).

The reference mapping is unchanged from correlation_state.py:
group key = (clip_id, cdc$time) ≙ RowKey (RowKey.java:48-58); state =
partial {pre, post, delta} slots (TaskInfo, ScyllaChangesConsumer.java:
132-139, 187-249); complete groups emit immediately and clear state
(taskInfoMap.remove, :230-233).  The delta slot stores per-column SET
FLAGS, never payload values (payload elision — audio bytes are not copied
into RocksDB a second time).
"""

from __future__ import annotations

import importlib.util
from collections.abc import Iterator
from typing import Any

import pandas as pd


def tws_available() -> bool:
    """True when the runtime can actually execute transformWithStateInPandas.

    PySpark's StatefulProcessor state-server protocol is protobuf-framed
    (pyspark/sql/streaming/proto/StateMessage_pb2.py imports
    google.protobuf); without the `protobuf` package the streaming Python
    runner crashes at init.  Gate, don't crash mid-query."""
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent package `google` absent entirely
        return False
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from scylla_cdc_source_connector_spark.config import EngineConfig
from scylla_cdc_source_connector_spark.schemas import (
    DELTA_OPS,
    NON_PK_COLUMNS,
    OP_POST_IMAGE,
    OP_PRE_IMAGE,
)
from scylla_cdc_source_connector_spark.streaming.correlation_state import (
    _IMG_FIELDS,
    _N_IMG,
    _STATE_LEN,
    _is_complete,
    _pyval,
    output_schema,
    state_schema,
)


class CorrelationProcessor(StatefulProcessor):
    """Per-RowKey correlation state machine as a StatefulProcessor.

    One ValueState row (the flat slot tuple of
    correlation_state.state_schema) + one event-time timer per incomplete
    group.  Constructed per-query with the EngineConfig baked in; Spark
    pickles the instance to the executors."""

    def __init__(self, cfg: EngineConfig) -> None:
        self._timeout_ms = cfg.incomplete_task_timeout_ms
        self._needs_pre = cfg.needs_preimage
        self._needs_post = cfg.needs_postimage
        self._cfg = cfg

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("corr", state_schema())

    def close(self) -> None:
        pass

    # -- helpers -----------------------------------------------------------

    def _emit(self, key: tuple, st: list) -> pd.DataFrame:
        clip_id, cdc_time = key
        t_us, stream_id, gen = st[0], st[1], st[2]
        d_op, d_seq = st[3], st[4]
        o = 7
        pre = st[o : o + 1 + _N_IMG]
        post = st[o + 1 + _N_IMG : o + 2 * (1 + _N_IMG)]
        dlt = st[o + 2 * (1 + _N_IMG) : o + 3 * (1 + _N_IMG)]
        ddel = st[o + 3 * (1 + _N_IMG) :]
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
        return pd.DataFrame([out])

    # -- StatefulProcessor hooks -------------------------------------------

    def handleInputRows(
        self,
        key: tuple,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        prior = self._state.get() if self._state.exists() else None
        st = list(prior) if prior is not None else [None] * _STATE_LEN
        o = 7
        pre = st[o : o + 1 + _N_IMG]
        post = st[o + 1 + _N_IMG : o + 2 * (1 + _N_IMG)]
        dlt = st[o + 2 * (1 + _N_IMG) : o + 3 * (1 + _N_IMG)]
        ddel = st[o + 3 * (1 + _N_IMG) :]
        t_us, stream_id, gen = st[0], st[1], st[2]
        d_op, d_seq, pre_seq, post_seq = st[3], st[4], st[5], st[6]

        # Confidence-window enforcement (S2): rows already behind the
        # watermark belong to windows the reference's reader has moved
        # past — drop them (same explicit guard as the applyInPandas
        # correlator; the operator does not pre-filter late input).
        wm_ms = timerValues.getCurrentWatermarkInMs()
        absorbed = False
        for pdf in rows:
            pdf = pdf.sort_values("cdc$batch_seq_no", kind="stable")
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
                    if self._needs_pre and (pre_seq is None or seq >= pre_seq):
                        pre = [True] + [_pyval(rd[n]) for n, _ in _IMG_FIELDS]
                        pre_seq = seq
                elif op == OP_POST_IMAGE:
                    if self._needs_post and (
                        post_seq is None or seq >= post_seq
                    ):
                        post = [True] + [_pyval(rd[n]) for n, _ in _IMG_FIELDS]
                        post_seq = seq
                elif op in DELTA_OPS:
                    if d_seq is None or seq >= d_seq:
                        dlt = [True] + [
                            _pyval(rd[n]) is not None for n, _ in _IMG_FIELDS
                        ]
                        d_op, d_seq = op, seq
                        ddel = [
                            bool(rd.get(f"cdc$deleted_{c}") or False)
                            for c in NON_PK_COLUMNS
                        ]

        st = (
            [t_us, stream_id, gen, d_op, d_seq, pre_seq, post_seq]
            + pre
            + post
            + dlt
            + (ddel if ddel else [False] * len(NON_PK_COLUMNS))
        )
        if _is_complete(self._cfg, d_op, bool(pre[0]), bool(post[0])):
            # taskInfoMap.remove analog: clear state AND the eviction timer
            self._state.clear()
            for expiry in list(self._handle.listTimers()):
                self._handle.deleteTimer(expiry)
            yield self._emit(key, st)
        elif prior is not None or absorbed:
            self._state.update(tuple(st))
            # (re)arm the stale-task eviction timer at cdc$time + timeout;
            # timers are per-expiry, so drop any earlier registration first
            new_expiry = t_us // 1000 + self._timeout_ms
            for expiry in list(self._handle.listTimers()):
                if expiry != new_expiry:
                    self._handle.deleteTimer(expiry)
            self._handle.registerTimer(new_expiry)

    def handleExpiredTimer(
        self,
        key: tuple,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        # watermark passed cdc$time + incomplete_task_timeout with the
        # group still incomplete: drop it (cleanupStaleTasks)
        self._state.clear()
        return iter(())


def correlate_stream_tws(changelog: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Watermarked streaming correlation via transformWithStateInPandas.

    Drop-in replacement for correlation_state.correlate_stream: same
    watermark (= confidence window, S2), same group key, same flat output —
    reassemble_correlated applies unchanged.  Requires the RocksDB state
    store provider (Spark enforces this for transformWithState)."""
    wm = f"{cfg.confidence_window_ms // 1000} seconds"
    grouped = changelog.withWatermark("`cdc$time`", wm).groupBy(
        "clip_id", "`cdc$time`"
    )
    return grouped.transformWithStateInPandas(
        statefulProcessor=CorrelationProcessor(cfg),
        outputStructType=output_schema(),
        outputMode="append",
        timeMode="eventTime",
    )
