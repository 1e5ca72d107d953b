"""ASR eval (functions/asr_eval.py): normalization DuckDB oracle, CER
vs DuckDB levenshtein, WER vs a pure-Python reference DP, conventions
for empty sides, determinism of the fixed-point outputs."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.functions.asr_eval import (
    cer_expr,
    normalize_transcript,
    wer_scores,
)


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "clip_id string, transcript string, hypothesis string"
    )


def test_normalize_matches_duckdb(spark):
    rows = [
        ("a", "Hello, World!", None),
        ("b", "  it's   ME -- really?? ", None),
        ("c", "Ümlauts über alles", None),
        ("d", "", None),
        ("e", None, None),
        ("f", "tabs\tand\nnewlines stay", None),
    ]
    df = _pairs(spark, rows).select(
        "clip_id", normalize_transcript("transcript").alias("norm")
    )
    got = {r["clip_id"]: r["norm"] for r in df.collect()}
    con = duckdb.connect()
    for cid, text, _ in rows:
        want = con.execute(
            r"""SELECT trim(regexp_replace(regexp_replace(lower($1),
                 '[^\p{L}\p{N}'' ]', ' ', 'g'), ' +', ' ', 'g'))""",
            [text],
        ).fetchone()[0]
        if text is None:
            want = None
        assert got[cid] == want, (cid, got[cid], want)
    # Unicode letters SURVIVE (\p{L}, not ASCII \w) — pinned:
    assert got["c"] == "ümlauts über alles"
    # \t and \n are punctuation-class: they become spaces and collapse:
    assert got["f"] == "tabs and newlines stay"


def test_cer_matches_duckdb_levenshtein(spark):
    rows = [
        ("a", "kitten", "sitting"),
        ("b", "abc", "abc"),
        ("c", "", "xyz"),
        ("d", "longer reference text", "short"),
    ]
    df = _pairs(spark, rows).select(
        "clip_id", cer_expr("transcript", "hypothesis").alias("cer")
    )
    got = {r["clip_id"]: r["cer"] for r in df.collect()}
    con = duckdb.connect()
    for cid, ref, hyp in rows:
        d = con.execute(
            "SELECT levenshtein($1, $2)", [ref, hyp]
        ).fetchone()[0]
        want = d * 10000 // max(len(ref), 1)
        assert got[cid] == want, (cid, got[cid], want)


def _py_wer(ref: str, hyp: str) -> tuple[int, int]:
    """Reference word-level DP, the naive O(m*n) matrix."""
    a, b = ref.split(), hyp.split()
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[m][n], m


def test_wer_matches_python_reference(spark):
    rng = random.Random(7)
    vocab = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "far"]
    rows = []
    for i in range(60):
        ref = " ".join(rng.choices(vocab, k=rng.randint(0, 12)))
        hyp = " ".join(rng.choices(vocab, k=rng.randint(0, 12)))
        rows.append((f"c{i}", ref, hyp))
    out = {
        r["clip_id"]: r
        for r in wer_scores(_pairs(spark, rows), normalize=False).collect()
    }
    for cid, ref, hyp in rows:
        edits, n_ref = _py_wer(ref, hyp)
        r = out[cid]
        assert r["word_edits"] == edits, (cid, ref, hyp)
        assert r["n_ref_words"] == n_ref
        assert r["wer_x10000"] == edits * 10000 // max(n_ref, 1)


def test_wer_conventions_and_normalization(spark):
    rows = [
        ("equal", "The CAT sat.", "the cat sat"),
        ("sub", "the cat sat", "the dog sat"),
        ("empty_ref", "", "three words here"),
        ("empty_hyp", "two words", ""),
        ("null_hyp", "two words", None),
    ]
    out = {r["clip_id"]: r for r in wer_scores(_pairs(spark, rows)).collect()}
    assert out["equal"]["wer_x10000"] == 0  # normalization folds case/punct
    assert out["sub"]["word_edits"] == 1
    assert out["sub"]["wer_x10000"] == 3333
    # empty reference: all insertions, denominator clamps to 1
    assert out["empty_ref"]["word_edits"] == 3
    assert out["empty_ref"]["wer_x10000"] == 30000
    # empty/NULL hypothesis: all deletions
    assert out["empty_hyp"]["word_edits"] == 2
    assert out["empty_hyp"]["wer_x10000"] == 10000
    assert out["null_hyp"]["word_edits"] == 2


def test_wer_plan_projects_only_the_two_strings(spark):
    df = _pairs(spark, [("a", "x", "y")]).withColumn(
        "bytes", F.lit(b"\x00" * 8)
    )
    plan = wer_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "bytes" not in plan
