"""Corpus composition tests: speech-rate consistency gate + deterministic
stratified token-budget sampling (plans/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.plans.sampling import (
    speech_rate_check,
    stratified_sample,
)


def test_speech_rate_flags(spark):
    rows = [
        # 10 tokens over 5 s = 2 tok/s -> ok
        ("ok", " ".join(["w"] * 10), 5000),
        # 40 tokens over 2 s = 20 tok/s -> too_fast
        ("fast", " ".join(["w"] * 40), 2000),
        # 1 token over 10 s = 0.1 tok/s -> too_slow
        ("slow", "w", 10000),
        ("empty", "", 3000),
        ("nodur", "some words here", 0),
        ("nulldur", "some words here", None),
    ]
    df = spark.createDataFrame(rows, "clip_id string, transcript string, dur_ms int")
    out = {r["clip_id"]: r for r in speech_rate_check(df).collect()}
    assert out["ok"]["speech_rate_flag"] == "ok" and out["ok"]["speech_rate_ok"]
    assert out["ok"]["tokens_per_s_x100"] == 200
    assert out["fast"]["speech_rate_flag"] == "too_fast"
    assert out["slow"]["speech_rate_flag"] == "too_slow"
    assert out["empty"]["speech_rate_flag"] == "empty_transcript"
    assert out["nodur"]["speech_rate_flag"] == "no_duration"
    assert out["nulldur"]["speech_rate_flag"] == "no_duration"
    assert not out["fast"]["speech_rate_ok"]


def test_speech_rate_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [("a", "w w w", 1000)], "clip_id string, transcript string, dur_ms int"
    )
    plan = speech_rate_check(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@pytest.fixture(scope="module")
def corpus(spark):
    # 3 langs x 40 docs, token counts 1..40 per lang
    rows = [
        (f"{lang}-{i}", lang, i, f"text payload {lang} {i}")
        for lang in ("en", "fr", "de")
        for i in range(1, 41)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, lang string, n_tokens int, text string"
    )


def test_stratified_budget_respected(spark, corpus):
    out = stratified_sample(
        corpus,
        ["lang"],
        budget_per_stratum=100,
        weight_col="n_tokens",
        id_cols=["doc_id"],
    )
    sums = {
        r["lang"]: r["s"]
        for r in out.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()
    }
    assert set(sums) == {"en", "fr", "de"}
    for lang, s in sums.items():
        assert 0 < s <= 100, (lang, s)
    # full width survives
    assert set(out.columns) == {"doc_id", "lang", "n_tokens", "text"}


def test_stratified_deterministic_and_partition_invariant(spark, corpus):
    kw = dict(budget_per_stratum=100, weight_col="n_tokens", id_cols=["doc_id"])
    a = sorted(r["doc_id"] for r in stratified_sample(corpus, ["lang"], **kw).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(corpus, ["lang"], **kw).collect())
    c = sorted(
        r["doc_id"]
        for r in stratified_sample(corpus.repartition(7), ["lang"], **kw).collect()
    )
    assert a == b == c and len(a) > 0
    # a different seed picks a different (but still budget-valid) sample
    d = sorted(
        r["doc_id"]
        for r in stratified_sample(corpus, ["lang"], seed=42, **kw).collect()
    )
    assert d != a


def test_stratified_row_count_quota_and_heavy_rows(spark):
    df = spark.createDataFrame(
        [("s1", f"d{i}", 10_000) for i in range(5)]
        + [("s2", "light", 3), ("s2", "heavy", 10_000)],
        "stratum string, doc_id string, n_tokens int",
    )
    # row-count quota (weight_col=None): exactly 2 rows per stratum
    rc = stratified_sample(
        df, ["stratum"], budget_per_stratum=2, id_cols=["doc_id"]
    )
    counts = {r["stratum"]: r["c"] for r in rc.groupBy("stratum").agg(F.count("*").alias("c")).collect()}
    assert counts == {"s1": 2, "s2": 2}

    # token budget smaller than any s1 row: the first-ranked row still
    # survives (stratum never silently vanishes)
    tb = stratified_sample(
        df, ["stratum"], budget_per_stratum=5, weight_col="n_tokens", id_cols=["doc_id"]
    )
    by_stratum: dict = {}
    for r in tb.collect():
        by_stratum.setdefault(r["stratum"], []).append(r["doc_id"])
    assert len(by_stratum["s1"]) == 1
    # s2: whether 'light' ranks first or second, the budget admits at most
    # one row beyond rank 1 only if cumulative <= 5
    assert 1 <= len(by_stratum["s2"]) <= 2


def test_stratified_validation(spark, corpus):
    with pytest.raises(ValueError, match="strata_cols"):
        stratified_sample(corpus, [], budget_per_stratum=10)


def test_stratified_payload_not_in_window_sort(spark, corpus):
    """The window/cumsum must run on the slim projection — the text
    payload joins back only after selection."""
    out = stratified_sample(
        corpus,
        ["lang"],
        budget_per_stratum=100,
        weight_col="n_tokens",
        id_cols=["doc_id"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    win = re.search(r"Window .*", plan)
    assert win is not None and "text" not in win.group(0)
