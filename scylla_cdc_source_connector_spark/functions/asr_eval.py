"""ASR evaluation at corpus scale: transcript normalization, CER, WER.

The north-star table pairs audio with transcripts; once a model produces
hypothesis transcripts, scoring them against the references is a corpus-
scale join+metric pass every ASR training loop runs per epoch.  The
reference connector has no analog (its job ends at emitting rows) — this
sits on the engine-extension training/eval axis next to
`plans/augment.py`.

Design for 10^12 rows:

  * `normalize_transcript` is a pure-codegen expression (lower →
    punctuation strip → whitespace collapse → trim): WER/CER are only
    comparable under a pinned normalization, and keeping it JVM-side
    means the normalization pass is free at scan speed.  The exact
    regex semantics are ANSI-reproducible (pytest cross-checks DuckDB).
  * `cer_expr` rides Spark's built-in `levenshtein` (JVM, codegen) —
    character error rate needs no Python at all.  Emitted as x10000
    integers (exact, oracle-hashable).
  * `wer_scores` needs WORD-level edit distance, which Spark lacks; it
    runs as an Arrow-batched iterator kernel (`mapInPandas`) with a
    per-row O(m*n) two-row list DP — transcripts are tens of words, so
    the DP is cache-resident (plain ints beat per-cell numpy scalar
    boxing at these lengths), chosen over a padded cross-row
    vectorization that would cube the memory for no win.  Only the two
    string columns enter the kernel; payloads never do.

Determinism: every output is an integer (counts / x10000 fixed-point),
so results hash identically across partitionings and clusters.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: strip everything that is not a letter, digit, apostrophe or space.
#: Unicode property classes, NOT \w: Java's \w is ASCII-only, which
#: would shred every non-English transcript ('café' -> 'caf', CJK ->
#: empty) — \p{L}\p{N} behave identically in Java regex and RE2/DuckDB,
#: so the pytest oracle pins the same semantics in both engines.
_PUNCT_RE = r"[^\p{L}\p{N}' ]"


def normalize_transcript(col: Column | str) -> Column:
    """Pinned ASR scoring normalization: lowercase, punctuation →
    space (apostrophes kept — contractions are words), whitespace
    collapsed, trimmed.  NULL passes through."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, _PUNCT_RE, " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def cer_expr(ref: Column | str, hyp: Column | str) -> Column:
    """Character error rate x10000 (floor), on ALREADY-normalized
    strings: levenshtein(ref, hyp) * 10000 div max(len(ref), 1).
    An empty reference with a non-empty hypothesis scores by the
    hypothesis length (all insertions, the standard convention)."""
    r = F.col(ref) if isinstance(ref, str) else ref
    h = F.col(hyp) if isinstance(hyp, str) else hyp
    # widen BEFORE the x10000 scale: int32 would overflow (or raise
    # under ANSI mode) past ~214k edit distance on pathological rows
    dist = F.levenshtein(r, h).cast("long")
    denom = F.greatest(F.length(r), F.lit(1))
    return F.floor(dist * 10000 / denom).cast("long")


WER_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("n_ref_words", T.IntegerType()),
        T.StructField("n_hyp_words", T.IntegerType()),
        T.StructField("word_edits", T.IntegerType()),
        T.StructField("wer_x10000", T.LongType()),
    ]
)


def _word_edit_distance(ref_words: list, hyp_words: list) -> int:
    """Classic two-row DP over the shorter dimension; O(m*n) time,
    O(min(m,n)) space.  Plain Python ints on purpose: per-cell numpy
    scalar indexing boxes/unboxes every access and measures ~5-10x
    slower than list arithmetic at transcript lengths (tens of words)."""
    a, b = ref_words, hyp_words
    if len(b) < len(a):
        a, b = b, a
    if not a:
        return len(b)
    prev = list(range(len(a) + 1))
    for j, bw in enumerate(b, start=1):
        cur = [j] + [0] * len(a)
        for i, aw in enumerate(a, start=1):
            cur[i] = min(
                prev[i] + 1,
                cur[i - 1] + 1,
                prev[i - 1] + (aw != bw),
            )
        prev = cur
    return prev[len(a)]


def wer_scores(
    df: DataFrame,
    *,
    id_col: str = "clip_id",
    ref_col: str = "transcript",
    hyp_col: str = "hypothesis",
    normalize: bool = True,
) -> DataFrame:
    """Per-row word error rate: (clip_id, n_ref_words, n_hyp_words,
    word_edits, wer_x10000) with wer_x10000 = floor(edits * 10000 /
    max(n_ref_words, 1)).  `normalize=True` applies
    `normalize_transcript` to both sides first (JVM, before the Arrow
    boundary, so the kernel only ever splits on single spaces)."""
    ref = normalize_transcript(ref_col) if normalize else F.col(ref_col)
    hyp = normalize_transcript(hyp_col) if normalize else F.col(hyp_col)
    slim = df.select(
        F.col(id_col).alias("clip_id"),
        ref.alias("__ref"),
        hyp.alias("__hyp"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs = pdf["__ref"].fillna("").tolist()
            hyps = pdf["__hyp"].fillna("").tolist()
            n_ref, n_hyp, edits, wer = [], [], [], []
            for r, h in zip(refs, hyps):
                rw = r.split() if r else []
                hw = h.split() if h else []
                # correct transcriptions dominate real eval sets: equal
                # strings are 0 edits without running the DP
                e = 0 if r == h else _word_edit_distance(rw, hw)
                n_ref.append(len(rw))
                n_hyp.append(len(hw))
                edits.append(e)
                wer.append(e * 10000 // max(len(rw), 1))
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "n_ref_words": pd.Series(n_ref, dtype="int32"),
                    "n_hyp_words": pd.Series(n_hyp, dtype="int32"),
                    "word_edits": pd.Series(edits, dtype="int32"),
                    "wer_x10000": pd.Series(wer, dtype="int64"),
                }
            )

    return slim.mapInPandas(batches, WER_SCHEMA)
