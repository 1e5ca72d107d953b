"""PII scrub + benchmark-contamination operator tests (training-data
hygiene over the reference's verbatim TEXT columns — ScyllaSchema maps
CQL TEXT straight to STRING, so any corpus built from connector output
needs both passes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.functions.text import (
    contamination_check,
    pii_scrub,
)


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        ("d1", "contact Jo at jo.smith+x@example.co.uk or +1-555-232-1234 now"),
        ("d2", "ssn 123-45-6789 leaked from 10.0.0.1 twice: 123-45-6789"),
        ("d3", "clean text with no sensitive content at all"),
        ("d4", "server 192.168.1.254 admin admin@internal.net"),
        ("d5", ""),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_pii_counts_and_redaction(pii_df):
    out = {r["doc_id"]: r for r in pii_scrub(pii_df).collect()}

    r1 = out["d1"]
    assert r1["n_pii_email"] == 1 and r1["n_pii_phone"] == 1
    assert r1["n_pii"] == 2
    assert "<EMAIL>" in r1["text_redacted"] and "<PHONE>" in r1["text_redacted"]
    assert "example.co.uk" not in r1["text_redacted"]
    assert "555" not in r1["text_redacted"]

    r2 = out["d2"]
    # SSN wins over phone (pattern order) and both occurrences count
    assert r2["n_pii_ssn"] == 2 and r2["n_pii_phone"] == 0
    assert r2["n_pii_ipv4"] == 1
    assert r2["text_redacted"].count("<SSN>") == 2
    assert "<IP>" in r2["text_redacted"]

    r3 = out["d3"]
    assert r3["n_pii"] == 0 and r3["text_redacted"] == r3["text"]

    r4 = out["d4"]
    assert r4["n_pii_ipv4"] == 1 and r4["n_pii_email"] == 1

    assert out["d5"]["n_pii"] == 0


def test_pii_category_subset_and_validation(pii_df):
    out = pii_scrub(pii_df, categories=["email"]).columns
    assert "n_pii_email" in out and "n_pii_phone" not in out
    with pytest.raises(ValueError, match="unknown PII categories"):
        pii_scrub(pii_df, categories=["email", "credit_card"])


def test_pii_scrub_is_shuffle_free(pii_df):
    plan = pii_scrub(pii_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_repetition_metrics(spark):
    from scylla_cdc_source_connector_spark.functions.text import (
        repetition_metrics,
    )

    rows = [
        # "spam ham " x20: every word dup'd, one bigram dominates
        ("looped", "spam ham " * 20),
        ("clean", "each word here appears exactly once in this sentence"),
        # duplicate lines
        ("lines", "header line\nbody text\nheader line\nbody text\nheader line"),
        ("tiny", "one"),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in repetition_metrics(df).collect()}

    lo = out["looped"]
    # 40 words, 2 distinct -> 950 permille dup words
    assert lo["dup_word_frac_x1000"] == 950
    # 39 bigrams: 'spam ham' x20, 'ham spam' x19 -> top = 20/39
    assert lo["top_bigram_frac_x1000"] == 1000 * 20 // 39

    cl = out["clean"]
    assert cl["dup_word_frac_x1000"] == 0
    assert cl["top_bigram_frac_x1000"] == 1000 // 8  # 8 bigrams, all unique

    ln = out["lines"]
    # 5 non-empty lines, 2 distinct -> 600 permille
    assert ln["dup_line_frac_x1000"] == 600

    assert out["tiny"]["dup_word_frac_x1000"] == 0
    assert out["tiny"]["top_bigram_frac_x1000"] == 0
    assert out["empty"]["top_bigram_frac_x1000"] == 0


def test_repetition_metrics_shuffle_free(spark):
    from scylla_cdc_source_connector_spark.functions.text import (
        repetition_metrics,
    )

    df = spark.createDataFrame([("a", "x y x y")], "doc_id string, text string")
    plan = repetition_metrics(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_contamination_check(spark):
    bench_sentence = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            # verbatim benchmark sentence inside a longer doc -> high overlap
            ("hot", f"intro words then {bench_sentence} and some trailing text"),
            # no 4-gram in common
            ("cold", "completely unrelated prose about distributed query engines"),
            # partial: shares a 4-gram ("quick brown fox jumps")
            ("warm", "a quick brown fox jumps here but nothing else matches it"),
        ],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame([(bench_sentence,)], "text string")

    out = {
        r["doc_id"]: r
        for r in contamination_check(
            docs, bench, n=4, min_overlap_x1000=300
        ).collect()
    }
    assert out["hot"]["contaminated"]
    assert out["hot"]["n_contaminated"] >= 6
    assert out["cold"]["n_contaminated"] == 0 and not out["cold"]["contaminated"]
    assert out["warm"]["n_contaminated"] == 1 and not out["warm"]["contaminated"]
    # integer permille is exact: hits/total * 1000 floored
    w = out["warm"]
    assert w["overlap_x1000"] == 1000 * w["n_contaminated"] // w["n_shingles"]


def test_contamination_single_exchange_broadcast(spark):
    docs = spark.range(0, 200).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon zeta doc "), F.col("id"))
        .cast("string")
        .alias("text"),
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta",)], "text string"
    )
    plan = (
        contamination_check(docs, bench, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the benchmark side must broadcast; the only shuffle is the final
    # per-doc count aggregation
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # partial+final pair
