"""Text analysis over the documents table — language-ID heuristic, quality
scoring, token counting, document fingerprinting.

Everything is a columnar expression (whole-stage codegen); cross-engine
determinism (for the DuckDB oracle) favors md5 over engine-specific hashes
and integer metrics over floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword marker sets for the n-gram/lexicon heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "que", "y"],
    "de": ["der", "die", "und", "das"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization, empty tokens removed (BPE-ish splitting is
    layered on top via the regex in token_count_bpe)."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens_expr(F.col(text_col))))


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer quality metrics: length, tokens, stopword hits, mean token
    length ×100 (int), distinct-token count."""
    t = F.col(text_col)
    toks = tokens_expr(t)
    stop_hits = F.size(
        F.filter(toks, lambda x: F.lower(x).isin(STOPWORDS))
    )
    return (
        df.withColumn("n_chars", F.length(t))
        .withColumn("n_tokens", F.size(toks))
        .withColumn("n_stopwords", stop_hits)
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)))
        .withColumn(
            "mean_token_len_x100",
            # floor division — DuckDB's double→bigint cast ROUNDS while
            # Spark's truncates, so keep both sides on integer floor
            F.floor(
                F.length(F.concat_ws("", toks)) * 100
                / F.greatest(F.size(toks), F.lit(1))
            ).cast("long"),
        )
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-lexicon language ID: the language whose marker words hit the
    most tokens wins; ties and zero hits → 'und'.  Deterministic tie-break
    by language code order."""
    toks = tokens_expr(F.lower(F.col(text_col)))

    # NB: never use default-arg lambdas in higher-order functions — pyspark
    # reads the arity and binds a 2nd param to the ELEMENT INDEX, silently
    # clobbering the default.  Bind via a closure factory instead.
    def _hits(words):
        return F.size(F.filter(toks, lambda x: x.isin(words)))

    hit_cols = {lang: _hits(words) for lang, words in LANG_MARKERS.items()}
    df = df.withColumn(
        "lang_scores",
        F.array(
            *[
                F.struct(hit_cols[lang].alias("hits"), F.lit(lang).alias("lang"))
                for lang in sorted(LANG_MARKERS)
            ]
        ),
    )
    best = F.array_max("lang_scores")
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    ).drop("lang_scores")


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercased, whitespace collapsed) — the exact-dup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("doc_fingerprint", F.md5(norm))


def shingles_expr(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles from normalized text (for minhash/jaccard)."""
    toks = tokens_expr(F.lower(text))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
