"""Deterministic augmentation planning for ASR/TTS training.

SpecAugment (Park et al. 2019 — the standard spectrogram augmentation:
random time masks + frequency masks per training example per epoch) is
applied on-the-fly by the training loader, but at 10^12-clip scale the
MASK SCHEDULE itself needs to be reproducible and shardable: restarting
epoch 7 on a different cluster must mask the same frames, and a data
bug must be replayable from (clip_id, epoch).  This module computes the
schedule as DATA — one row per (clip, epoch, mask) with exact
coordinates — from seeded hashes, so it is a pure-codegen 1->N fan-out
with zero shuffle and an ANSI-SQL-reproducible definition.

Reference analog: none — the connector stops at emitting rows; this is
the engine-extension training axis next to `plans/sampling.py` and the
log-mel path (`audio_features.extract_mel_features`, whose WIN/HOP
frame arithmetic the time-mask bounds reuse).

Uniform draws: u = pmod(xxhash64(clip_id, epoch, kind, i, seed), 2^20)
/ 2^20 — deterministic across partitioning, retries and cluster sizes,
identical in any engine with the same hash (the pytest oracle recomputes
it row-by-row in Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.audio_features import HOP, WIN

#: resolution of the hash-derived uniforms
_U_RES = 1 << 20


def _u(seed_cols: list, lo, hi):
    """Deterministic integer uniform in [lo, hi] (inclusive) from a
    seeded hash; degenerates to lo when hi <= lo.  Used when the span
    is itself a column (SpecAugment's extent-dependent bounds): the hash
    is first folded to [0, 2^20) so the `% span` stays well-defined for
    any runtime span."""
    span = F.greatest(hi - lo + 1, F.lit(1))
    return lo + F.pmod(F.xxhash64(*seed_cols), F.lit(_U_RES)) % span


def _u_mod(seed_cols: list, span):
    """Deterministic integer uniform in [0, span) — the direct-mod
    convention for draws whose span is known (a literal or a simple
    column expression).  Distinct from `_u` (which folds through 2^20
    first); every draw in this module uses exactly one of these two
    helpers so the convention is visible at the call site."""
    return F.pmod(F.xxhash64(*seed_cols), span)


def specaugment_plan(
    clips: DataFrame,
    *,
    epochs: int,
    n_time_masks: int = 2,
    max_time_frames: int = 27,
    n_freq_masks: int = 2,
    max_freq_bands: int = 8,
    n_mels: int = 40,
    seed: int = 0,
    id_col: str = "clip_id",
    dur_col: str = "dur_ms",
    sr_col: str = "sr_hz",
) -> DataFrame:
    """Per-(clip, epoch) SpecAugment mask schedule.

    Output rows: (clip_id, epoch, kind 'time'|'freq', mask_idx, start,
    width, n_frames) — `start`/`width` index mel FRAMES for time masks
    (frame count derived from dur/sr with the shared WIN/HOP arithmetic)
    and mel BANDS for freq masks.  Per the paper: width ~ U[0, max],
    start ~ U[0, extent - width]; a zero-width draw emits width=0 (a
    no-op mask — kept so every (clip, epoch, mask_idx) slot exists and
    downstream joins never miss rows).  Clips too short for one frame
    get time masks of width 0.

    Scale shape: a metadata-only projection + one `explode` of a
    LITERAL (epoch x mask) array — no payload read, no shuffle, ~
    epochs * (n_time+n_freq) output rows per clip, each O(40 bytes)."""
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    n_samples = (F.col(dur_col).cast("long") * F.col(sr_col)) / 1000
    n_frames = F.greatest(
        F.floor((n_samples - WIN) / HOP).cast("int") + 1, F.lit(0)
    )
    slots = [
        (e, "time", i)
        for e in range(epochs)
        for i in range(n_time_masks)
    ] + [
        (e, "freq", i)
        for e in range(epochs)
        for i in range(n_freq_masks)
    ]
    slot_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(e).alias("epoch"),
                    F.lit(k).alias("kind"),
                    F.lit(i).alias("mask_idx"),
                )
                for e, k, i in slots
            ]
        )
    )
    base = clips.select(
        F.col(id_col).alias("clip_id"),
        n_frames.alias("n_frames"),
        slot_col.alias("__s"),
    ).select("clip_id", "n_frames", "__s.epoch", "__s.kind", "__s.mask_idx")
    seeds = [
        F.col("clip_id"),
        F.col("epoch"),
        F.col("kind"),
        F.col("mask_idx"),
        F.lit(seed),
    ]
    extent = F.when(F.col("kind") == "time", F.col("n_frames")).otherwise(
        F.lit(n_mels)
    )
    max_w = F.when(F.col("kind") == "time", F.lit(max_time_frames)).otherwise(
        F.lit(max_freq_bands)
    )
    width = F.least(
        _u([F.lit("w"), *seeds], F.lit(0), max_w), extent
    ).cast("int")
    start = _u([F.lit("s"), *seeds], F.lit(0), extent - width).cast("int")
    return base.select(
        "clip_id",
        "epoch",
        "kind",
        "mask_idx",
        F.when(width > 0, start).otherwise(F.lit(0)).alias("start"),
        width.alias("width"),
        "n_frames",
    )


def noise_mix_plan(
    clips: DataFrame,
    noises: DataFrame,
    *,
    epochs: int,
    snr_db_range: tuple[float, float] = (0.0, 20.0),
    p_apply: float = 1.0,
    seed: int = 0,
    id_col: str = "clip_id",
    dur_col: str = "dur_ms",
    noise_id_col: str = "noise_id",
    noise_dur_col: str = "dur_ms",
) -> DataFrame:
    """Per-(clip, epoch) additive-noise augmentation schedule — the other
    standard ASR augmentation next to SpecAugment: each training example
    is mixed with a noise clip at a scheduled SNR.  Like
    `specaugment_plan`, the SCHEDULE is computed as reproducible data
    (seeded-hash draws), so epoch 7 restarted on a different cluster
    mixes the same noise at the same SNR and offset.

    Output rows: (clip_id, epoch, applied, noise_id, noise_dur_ms,
    snr_db_x10, offset_ms).  Draws, all deterministic in
    (clip_id, epoch, seed):

      * applied   — u < p_apply (a skipped epoch still emits its row
        with applied=false, so every (clip, epoch) slot exists);
      * noise_id  — uniform over the noise table (by a dense 0..n-1
        rank computed on the SMALL noise side);
      * snr_db_x10 — uniform integer over [lo*10, hi*10] (x10 keeps the
        column exactly representable and oracle-hashable);
      * offset_ms — uniform over [0, noise_dur - clip_dur] when the
        noise outlasts the clip, else 0 (the loader tiles short noise).

    Scale shape: the big side is a metadata-only projection exploded
    against a LITERAL epoch array — zero shuffle — then a BROADCAST
    join against the noise table's (rank, id, dur) triple; the only
    exchange anywhere is the rank window over the noise side (noise
    corpus ≪ clip corpus, same C≪N defensibility as the IVF centroid
    collect).  Audio bytes are never read on either side.
    """
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    if not 0.0 <= p_apply <= 1.0:
        raise ValueError("p_apply must be in [0, 1]")
    lo10, hi10 = (int(round(x * 10)) for x in snr_db_range)
    if hi10 < lo10:
        raise ValueError("snr_db_range must be (lo, hi) with lo <= hi")
    counts = noises.agg(
        F.count("*").alias("n"),
        F.countDistinct(noise_id_col).alias("d"),
    ).first()
    n_noises = int(counts["n"])
    if n_noises == 0:
        raise ValueError("noise table is empty")
    if int(counts["d"]) != n_noises:
        # the 0..n-1 rank below tie-breaks nondeterministically on
        # duplicate ids, which would break the reproducibility contract
        raise ValueError("noise_id values must be unique")
    noise_slim = noises.select(
        (
            F.row_number().over(Window.orderBy(noise_id_col)) - 1
        ).alias("__nidx"),
        F.col(noise_id_col).alias("noise_id"),
        F.col(noise_dur_col).cast("int").alias("noise_dur_ms"),
    )
    base = clips.select(
        F.col(id_col).alias("clip_id"),
        F.col(dur_col).cast("int").alias("__dur"),
        F.explode(F.array(*[F.lit(e) for e in range(epochs)])).alias("epoch"),
    )
    seeds = [F.col("clip_id"), F.col("epoch"), F.lit(seed)]
    applied = (
        _u_mod([F.lit("a"), *seeds], F.lit(_U_RES))
        < F.lit(int(round(p_apply * _U_RES)))
    )
    drawn = base.select(
        "clip_id",
        "epoch",
        "__dur",
        applied.alias("applied"),
        _u_mod([F.lit("n"), *seeds], F.lit(n_noises)).alias("__nidx"),
        (
            F.lit(lo10)
            + _u_mod([F.lit("s"), *seeds], F.lit(hi10 - lo10 + 1))
        ).cast("int").alias("snr_db_x10"),
    )
    joined = drawn.join(F.broadcast(noise_slim), on="__nidx")
    offset = _u_mod(
        [F.lit("o"), *seeds],
        F.greatest(F.col("noise_dur_ms") - F.col("__dur") + 1, F.lit(1)),
    ).cast("int")
    return joined.select(
        "clip_id",
        "epoch",
        "applied",
        "noise_id",
        "noise_dur_ms",
        "snr_db_x10",
        offset.alias("offset_ms"),
    )


def speed_perturb_plan(
    clips: DataFrame,
    *,
    epochs: int,
    factors: tuple[float, ...] = (0.9, 1.0, 1.1),
    seed: int = 0,
    id_col: str = "clip_id",
    dur_col: str = "dur_ms",
) -> DataFrame:
    """Per-(clip, epoch) speed-perturbation schedule — the third leg of
    the standard ASR augmentation triple (speed perturb + additive noise
    + SpecAugment, the Kaldi/ESPnet recipe): each epoch resamples the
    clip by a factor drawn uniformly from `factors`.

    Output rows: (clip_id, epoch, factor_x100, new_dur_ms) —
    factor_x100 keeps the draw exactly representable (0.9 -> 90);
    new_dur_ms = floor(dur * 100 / factor_x100) (speeding UP shortens
    the clip).  Deterministic in (clip_id, epoch, seed), like the
    sibling planners, so a restarted epoch perturbs identically.

    Scale shape: metadata-only projection + literal epoch explode +
    `element_at` on a LITERAL factor array — zero shuffle, zero joins,
    no payload read."""
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    if not factors:
        raise ValueError("factors must be non-empty")
    fx100 = [int(round(f * 100)) for f in factors]
    if any(f <= 0 for f in fx100):
        raise ValueError("factors must be positive")
    base = clips.select(
        F.col(id_col).alias("clip_id"),
        F.col(dur_col).cast("long").alias("__dur"),
        F.explode(F.array(*[F.lit(e) for e in range(epochs)])).alias("epoch"),
    )
    pick = F.element_at(
        F.array(*[F.lit(v) for v in fx100]),
        (
            _u_mod(
                [F.lit("v"), F.col("clip_id"), F.col("epoch"), F.lit(seed)],
                F.lit(len(fx100)),
            )
            + 1
        ).cast("int"),
    )
    return base.select(
        "clip_id",
        "epoch",
        pick.cast("int").alias("factor_x100"),
        F.floor(F.col("__dur") * 100 / pick).cast("long").alias("new_dur_ms"),
    )
