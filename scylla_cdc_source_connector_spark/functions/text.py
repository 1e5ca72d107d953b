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


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition quality signals, per document:

      dup_word_frac_x1000   — 1 − distinct/total words (‰): word-level
                              repetitiveness
      dup_line_frac_x1000   — 1 − distinct/total non-empty lines (‰):
                              boilerplate/template detector
      top_bigram_frac_x1000 — occurrences of the most frequent word
                              bigram ÷ total bigrams (‰): the classic
                              "repeated phrase" rule (Gopher §A1.2-style)

    Repetitive machine-generated or template text scores high on all
    three; the standard gate drops docs above ~200-600‰ depending on the
    signal.  Integer ‰ keeps the columns oracle-hashable.

    Scale shape: everything is per-row array arithmetic — the bigram
    max-run is computed by sorting the row's bigram array and folding a
    (prev, run, best) state over it with `aggregate`, so no explode, no
    groupBy, ZERO shuffles at any corpus size.  Higher-order functions
    evaluate JVM-side (not whole-stage codegen, but never Python)."""
    t = F.col(text_col)
    toks = tokens_expr(t)
    n_toks = F.size(toks)
    dup_word = F.floor(
        (n_toks - F.size(F.array_distinct(toks)))
        * 1000
        / F.greatest(n_toks, F.lit(1))
    ).cast("long")

    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    dup_line = F.floor(
        (n_lines - F.size(F.array_distinct(lines)))
        * 1000
        / F.greatest(n_lines, F.lit(1))
    ).cast("long")

    idx = F.sequence(F.lit(1), F.greatest(n_toks - 1, F.lit(1)))
    bigrams = F.when(
        n_toks >= 2,
        F.array_sort(
            F.transform(
                idx, lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1))
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    run_state = F.aggregate(
        bigrams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
    )
    n_bigrams = F.size(bigrams)
    top_bigram = F.floor(
        run_state["best"] * 1000 / F.greatest(n_bigrams, F.lit(1))
    ).cast("long")

    return (
        df.withColumn("dup_word_frac_x1000", dup_word)
        .withColumn("dup_line_frac_x1000", dup_line)
        .withColumn("top_bigram_frac_x1000", top_bigram)
    )


#: PII categories as (name, Java-regex, placeholder), applied IN ORDER —
#: email before phone so the digits of "+1-555..." inside a redacted
#: mailto never re-match; SSN before phone because every SSN is also a
#: plausible phone fragment.  Patterns stay RE2-compatible (no lookarounds,
#: no backrefs) so the same strings run under DuckDB/Hyperscan-style
#: engines for cross-checking.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    # international-format phone: +CC then 7..14 digits with optional
    # single separators.  Deliberately conservative (requires the +CC
    # prefix) — a bare 10-digit run is as likely a record id as a phone
    # number in machine corpora, and false redaction corrupts training
    # text irreversibly.
    (
        "phone",
        r"\+\d{1,3}[ \-]?(?:\(\d{1,4}\)[ \-]?)?\d{2,4}[ \-]?\d{3,4}[ \-]?\d{0,4}\d",
        "<PHONE>",
    ),
]


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    *,
    categories: list[str] | None = None,
    redacted_col: str | None = None,
) -> DataFrame:
    """PII detection + redaction for training-data hygiene: per-category
    match counts (``n_pii_email`` ...), a total (``n_pii``), and the
    redacted text with matches replaced by typed placeholders.

    The reference connector emits user rows verbatim (ScyllaSchema maps
    CQL TEXT straight to STRING); any corpus built from its output needs
    this pass before the text reaches a tokenizer.  Counts are computed
    BEFORE redaction (on the raw text) while each replacement runs on the
    output of the previous one, so overlapping categories (SSN inside a
    longer digit run) count once under the first matching category —
    deterministic because PII_PATTERNS order is fixed.

    Scale shape: a chain of regexp_count/regexp_replace — pure whole-stage
    codegen, narrow, zero shuffles, zero Python.  At 100 TB this is a
    map-only pass that rides whatever partitioning the scan produced.
    """
    cats = [p for p in PII_PATTERNS if categories is None or p[0] in categories]
    if categories is not None:
        known = {p[0] for p in PII_PATTERNS}
        bad = sorted(set(categories) - known)
        if bad:
            raise ValueError(f"unknown PII categories: {bad} (known: {sorted(known)})")
    t = F.col(text_col)
    total = F.lit(0)
    for name, pat, _ in cats:
        cnt = F.regexp_count(t, F.lit(pat))
        df = df.withColumn(f"n_pii_{name}", cnt)
        total = total + cnt
    red = t
    for _, pat, placeholder in cats:
        red = F.regexp_replace(red, pat, placeholder)
    return df.withColumn("n_pii", total).withColumn(
        redacted_col or f"{text_col}_redacted", red
    )


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    min_overlap_x1000: int = 500,
) -> DataFrame:
    """Benchmark-contamination screening: for every document, the fraction
    of its word n-gram shingles that also occur anywhere in the benchmark
    set.  Returns (id_col, n_shingles, n_contaminated, overlap_x1000,
    contaminated) — ``overlap_x1000`` is an integer ‰ so the result is
    oracle-hashable, ``contaminated`` is overlap ≥ min_overlap_x1000.

    This is the standard n-gram decontamination test (GPT-3 appendix C /
    PaLM-style 8-gram overlap) expressed as a Spark plan:

      1. shingle the benchmark (shingles_expr, distinct) — the benchmark
         side is eval-set sized (≪ corpus), so it is **broadcast**;
      2. explode the corpus shingles to slim (doc_id, shingle) rows —
         the document text itself never leaves the map side;
      3. one broadcast LEFT join marks hits, ONE groupBy(doc_id) counts
         total + hit shingles per document.

    Scale shape: exactly one exchange (the final slim count aggregation,
    partial map-side combine applies); the broadcast join adds none.  At
    100 TB the exploded shingle stream is wide in rows but each row is a
    dozen words — the payload/document bytes never cross the exchange.
    """
    bench_sh = (
        benchmark.select(
            F.explode(shingles_expr(F.col(bench_text_col), n)).alias("__sh")
        )
        .where(F.col("__sh") != "")
        .distinct()
        .withColumn("__bench_hit", F.lit(True))
    )
    doc_sh = docs.select(
        F.col(id_col), F.explode(shingles_expr(F.col(text_col), n)).alias("__sh")
    )
    marked = doc_sh.join(F.broadcast(bench_sh), "__sh", "left")
    agg = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("__bench_hit").alias("n_contaminated"),
    )
    overlap = F.floor(
        F.col("n_contaminated") * 1000 / F.greatest(F.col("n_shingles"), F.lit(1))
    ).cast("long")
    return agg.withColumn("overlap_x1000", overlap).withColumn(
        "contaminated", F.col("overlap_x1000") >= F.lit(min_overlap_x1000)
    )


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
