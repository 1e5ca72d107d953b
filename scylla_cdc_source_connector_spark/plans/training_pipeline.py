"""The composed training-data pipeline — what the engine exists for.

One declarative recipe from a raw CDC changelog to a deduplicated,
quality-gated audio segment corpus:

    changelog ──cdc_envelopes──► change records        (1 exchange)
       │  last-writer-wins per clip, deletes drop      (1 exchange, slim+payload)
       ▼
    live clips ──verdict UDF──► decode_ok ∧ SNR ≥ floor (no exchange)
       ▼
    trim_clips ──► speech-span payload                  (no exchange)
       ▼
    segment_clips ──► fixed windows                     (no exchange, narrow)
       ▼
    fingerprint ──► 48-bit spectral ids                 (no exchange)
       ▼
    exact-dup collapse: keep one representative per
    fingerprint                                         (1 slim + 1 payload exchange)

Every stage is an existing engine operator; this module only wires them.
Payload exchange budget for the whole recipe: THREE (correlation,
latest-state collapse, dedup rejoin) — everything else is narrow or
Arrow-local.  Near-dup collapse beyond exact fingerprint equality is the
caller's next step (`audio_near_dup` / `audio_containment` +
`functions.graph.connected_components`).

No reference analog: the connector stops at emitting change records;
this is the north_rule's "training-data pipeline over the change
stream" surface (SURVEY §2.9) assembled end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.config import EngineConfig, IncludeMode


def training_corpus(
    changelog: DataFrame,
    cfg: EngineConfig | None = None,
    *,
    min_snr_db: float = 30.0,
    segment_window_ms: int = 250,
    segment_hop_ms: int | None = None,
    keep_tail: bool = True,
) -> DataFrame:
    """Changelog → deduplicated segment corpus.

    Returns (clip_id, seg_idx, seg_start_ms, seg_n_samples, bytes, codec,
    sr_hz, fingerprint): one representative segment per distinct spectral
    fingerprint, from the latest live (non-deleted) post-image of each
    clip, decode-validated (SNR ≥ min_snr_db), silence-trimmed and cut
    into fixed windows.
    """
    from scylla_cdc_source_connector_spark import audio
    from scylla_cdc_source_connector_spark.audio_segment import segment_clips
    from scylla_cdc_source_connector_spark.audio_vad import trim_clips
    from scylla_cdc_source_connector_spark.plans.pipeline import cdc_envelopes

    if cfg is None:
        cfg = EngineConfig(
            include_before=IncludeMode.NONE, include_after=IncludeMode.FULL
        )
    if cfg.include_after is not IncludeMode.FULL:
        raise ValueError(
            "training_corpus needs include_after=FULL — the post-image "
            "payload must ride the envelope"
        )

    env = cdc_envelopes(changelog, cfg, processing_ts_ms=F.lit(0))
    # latest state per clip, deletes drop the key (apply.materialize_latest
    # semantics, inline): last writer wins on the event timestamp
    live = (
        env.groupBy("clip_id")
        .agg(
            F.max_by(
                F.struct(
                    F.col("value.op").alias("op"),
                    F.col("value.after.bytes").alias("bytes"),
                    F.col("value.after.codec").alias("codec"),
                    F.col("value.after.sr_hz").alias("sr_hz"),
                ),
                F.col("`cdc$time_us`"),
            ).alias("s")
        )
        .where("s.op != 'd'")
        .select("clip_id", "s.bytes", "s.codec", "s.sr_hz")
        .where(F.col("bytes").isNotNull())
    )

    # quality gate: ONE scalar Arrow verdict per clip (same UDF as the
    # sink's quarantine gate)
    verdict = audio.make_audio_verdict_udf()
    ok = (
        live.withColumn("__v", verdict(F.col("bytes"), F.col("codec")))
        .where(
            F.col("__v.decode_ok")
            & (F.col("__v.roundtrip_snr_db") >= F.lit(min_snr_db))
        )
        .drop("__v")
    )

    trimmed = trim_clips(ok).where(
        F.col("decode_ok") & (F.octet_length("bytes") > 0)
    ).select("clip_id", "bytes", "codec", "sr_hz")

    segs = segment_clips(
        trimmed,
        window_ms=segment_window_ms,
        hop_ms=segment_hop_ms,
        keep_tail=keep_tail,
    ).select(
        "clip_id",
        "seg_idx",
        "seg_start_ms",
        "seg_n_samples",
        F.col("seg_bytes").alias("bytes"),
        "codec",
        "sr_hz",
    )

    # exact-dup collapse.  The fingerprint pass CARRIES the segment row
    # through (one extra Arrow copy out) so the collapse is a single
    # groupBy(fingerprint) min_by — no rejoin.  A slim-ids + semi-join
    # variant looks cheaper on paper, but a self-join over an uncached
    # plan makes Catalyst execute the whole upstream (decode, trim,
    # segmentation) TWICE; carrying the bytes keeps the pipeline one
    # tree with exactly one dedup exchange.
    fp_schema = (
        "clip_id string, seg_idx long, seg_start_ms long, "
        "seg_n_samples long, bytes binary, codec string, sr_hz int, "
        "fingerprint long, fp_ok boolean"
    )

    def fp_passthrough(batches):
        from scylla_cdc_source_connector_spark.audio_fingerprint import (
            audio_fingerprint_batches,
        )

        for pdf in batches:
            st = next(
                audio_fingerprint_batches(
                    iter([pdf[["clip_id", "bytes", "codec"]]])
                )
            )
            out = pdf.copy()
            out["fingerprint"] = st["fingerprint"].values
            out["fp_ok"] = st["fp_ok"].values
            yield out

    corpus = segs.mapInPandas(fp_passthrough, fp_schema).where("fp_ok")
    cols = [
        "clip_id",
        "seg_idx",
        "seg_start_ms",
        "seg_n_samples",
        "bytes",
        "codec",
        "sr_hz",
    ]
    return (
        corpus.groupBy("fingerprint")
        .agg(
            F.min_by(
                F.struct(*cols), F.struct("clip_id", "seg_idx")
            ).alias("r")
        )
        .select(*[F.col(f"r.{c}").alias(c) for c in cols], "fingerprint")
    )
