"""Corpus composition operators: transcript↔audio consistency gating and
deterministic stratified sampling under per-stratum token budgets.

The north-star input is (clip_id, bytes, sr_hz, dur_ms, codec,
transcript) pairs; a training mix built from connector output needs two
passes the reference has no analog for (its job ends at emitting rows —
ScyllaChangesConsumer.java hands records to Kafka verbatim):

  * `speech_rate_check` — the cheapest cross-modal QA there is: a
    transcript whose token rate is physically implausible for its audio
    duration (conversational speech sits ~1-4 words/s) signals a
    mislabeled pair, a truncated blob, or a transcript from a different
    clip.  Pure codegen over metadata — the audio bytes are never read.

  * `stratified_sample` — "give me at most N tokens per (lang, source)
    cell, deterministically": the standard data-mixing step before
    tokenizer/training runs.  Per stratum, rows are ranked by a seeded
    hash (reproducible, order-independent) and kept while the stratum's
    running token sum stays within budget — an exact quota, not a
    probabilistic `sampleBy` fraction (which over/under-shoots per
    partition and needs a pre-pass to estimate rates anyway).

Scale shape of `stratified_sample`: the window runs over a SLIM
projection (id, stratum, weight, hash) — the document/audio payload
never enters the sort; selected ids join back to the full rows as a
key-only semi-join.  One shuffle for the per-stratum window + the join's
exchanges on ids.  Hot strata skew the window partition; the mitigation
is the same budget: a stratum's sort input can be pre-truncated to
rows whose individual weight ≤ budget, and AQE skew handling splits
oversized partitions for the join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.functions.text import tokens_expr


def speech_rate_check(
    clips: DataFrame,
    *,
    text_col: str = "transcript",
    dur_col: str = "dur_ms",
    min_tokens_per_s: float = 0.5,
    max_tokens_per_s: float = 6.0,
) -> DataFrame:
    """Adds (n_transcript_tokens, tokens_per_s_x100, speech_rate_ok,
    speech_rate_flag) — flag is 'ok' / 'too_fast' / 'too_slow' /
    'empty_transcript' / 'no_duration'.

    Integer ×100 rate keeps the column oracle-hashable; bounds default to
    the generous conversational-speech envelope (0.5-6 tokens/s) so only
    physically implausible pairs flag."""
    toks = F.size(tokens_expr(F.col(text_col)))
    rate_x100 = F.when(
        F.col(dur_col) > 0, F.floor(toks * 100000 / F.col(dur_col)).cast("long")
    )
    flag = (
        F.when(F.col(dur_col).isNull() | (F.col(dur_col) <= 0), "no_duration")
        .when(toks == 0, "empty_transcript")
        .when(rate_x100 > int(max_tokens_per_s * 100), "too_fast")
        .when(rate_x100 < int(min_tokens_per_s * 100), "too_slow")
        .otherwise("ok")
    )
    return (
        clips.withColumn("n_transcript_tokens", toks)
        .withColumn("tokens_per_s_x100", rate_x100)
        .withColumn("speech_rate_flag", flag)
        .withColumn("speech_rate_ok", flag == F.lit("ok"))
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    *,
    budget_per_stratum: int,
    weight_col: str | None = None,
    id_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum quota sample: keep rows, in seeded-hash
    order, while the stratum's cumulative weight stays ≤ budget.

    weight_col=None counts every row as weight 1 (a row-count quota);
    otherwise the column (e.g. a token count) is summed.  A single row
    heavier than the whole budget is dropped (it cannot fit), EXCEPT the
    stratum's first-ranked row when nothing lighter precedes it — so a
    stratum with only over-budget rows still contributes one row rather
    than silently vanishing; pass strict budgets downstream if that
    matters.  Rows keep their full width; the ordering/cumsum runs on a
    slim projection only (see module docstring).

    Determinism: the order is xxhash64(id_cols..., seed) — stable across
    partitioning, retries and cluster sizes; re-running on the same input
    yields the same sample (the property a reproducible data mix needs).
    """
    if not strata_cols:
        raise ValueError("strata_cols must be non-empty")
    ids = id_cols if id_cols is not None else [
        c for c in df.columns if c not in strata_cols
    ][:1]
    if not ids:
        raise ValueError("need id_cols (or at least one non-stratum column)")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    slim = df.select(
        *strata_cols,
        *ids,
        w.alias("__w"),
        F.xxhash64(*[F.col(c) for c in ids], F.lit(seed)).alias("__h"),
    )
    win = Window.partitionBy(*strata_cols).orderBy("__h", *ids)
    picked = (
        slim.withColumn("__cum", F.sum("__w").over(win))
        .withColumn("__rank", F.row_number().over(win))
        .where(
            (F.col("__cum") <= F.lit(budget_per_stratum))
            | (F.col("__rank") == 1)
        )
        .select(*ids)
    )
    return df.join(picked, on=ids, how="left_semi")
