"""C4-style duplicate-span removal tests (functions/dedup.dedup_spans):
first occurrence kept corpus-wide, later occurrences' sentences dropped,
text rebuilt in position order."""

from __future__ import annotations

import pytest

from scylla_cdc_source_connector_spark.functions.dedup import dedup_spans


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {r["doc_id"]: r for r in dedup_spans(df, **kw).collect()}


def test_cross_doc_span_removed(spark):
    span = "alpha one. beta two. gamma three."
    out = _run(
        spark,
        [
            ("a", f"{span} delta four."),
            ("b", f"intro here. {span} outro there."),
            ("c", "totally unique. nothing shared. all fresh."),
        ],
    )
    # first occurrence (doc a, lower id) keeps everything
    assert out["a"]["n_dropped_sentences"] == 0
    assert out["a"]["text"] == f"{span} delta four."
    # doc b loses exactly the 3 duplicated sentences, keeps its own
    assert out["b"]["n_sentences"] == 5 and out["b"]["n_dropped_sentences"] == 3
    assert out["b"]["text"] == "intro here. outro there."
    assert out["c"]["n_dropped_sentences"] == 0


def test_short_doc_dedup_and_full_drop(spark):
    out = _run(
        spark,
        [("a", "hello there."), ("b", "hello there."), ("c", "different.")],
    )
    assert out["a"]["text"] == "hello there."
    assert out["b"]["text"] == "" and out["b"]["n_dropped_sentences"] == 1
    assert out["c"]["text"] == "different."


def test_within_doc_repeat(spark):
    span = "rep one. rep two. rep three."
    out = _run(spark, [("a", f"{span} middle bit. {span}")])
    r = out["a"]
    assert r["n_sentences"] == 7 and r["n_dropped_sentences"] == 3
    assert r["text"] == f"{span} middle bit."


def test_rebuild_preserves_order(spark):
    # drop happens in the middle; remaining sentences must keep order
    span = "dup x. dup y. dup z."
    out = _run(
        spark,
        [("a", span), ("b", f"first. {span} second. third.")],
    )
    assert out["b"]["text"] == "first. second. third."


def test_span_n_one_is_sentence_dedup(spark):
    out = _run(
        spark,
        [("a", "same line. other a."), ("b", "fresh b. same line.")],
        span_n=1,
    )
    assert out["a"]["n_dropped_sentences"] == 0
    assert out["b"]["text"] == "fresh b." and out["b"]["n_dropped_sentences"] == 1


def test_span_n_validation(spark):
    with pytest.raises(ValueError, match="span_n"):
        _run(spark, [("a", "x.")], span_n=0)
