"""Deduplication families for web-scale corpora.

- exact:        hash-groupBy on a normalized fingerprint (1 shuffle)
- minhash+LSH:  shingle → K minhashes (columnar, no explode) → band
                signatures → candidate pairs via band-bucket self-join →
                exact Jaccard verify.  The LSH join is the scale path: it
                shuffles only (band, signature) buckets, never the cross
                product.
- simhash:      64-bit token-vote fingerprint; near-dups = small Hamming
                distance within prefix buckets
- n-gram Jaccard: exact pairwise verify (used on LSH candidates only)
- embedding cosine near-dup: see similarity.py (bucketed by hyperplane LSH)

All hashing uses xxhash64 (stable across Spark runs/partitions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.functions.text import (
    fingerprint,
    shingles_expr,
    tokens_expr,
)


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism when the input arrives
    in fewer partitions (a single small file ⇒ 1 partition ⇒ the per-doc
    hashing work serializes on one core).  At scale the corpus already has
    ≥ cores partitions and this is a no-op — no extra shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # inputFiles() only lists the scan's files — it never converts the plan
    # to an RDD the way df.rdd.getNumPartitions() would (which forces a
    # full analysis/translation pass just to decide a repartition)
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = target
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the lowest id per normalized-text fingerprint (deterministic
    survivor).  One hash aggregation."""
    return (
        fingerprint(df, text_col)
        .groupBy("doc_fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays — the per-seed
    re-mix of the shingle/token hashes (public-domain constants)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _minhash_udf(n_hashes: int):
    """array<long> shingle hashes -> K minhash longs, one numpy pass per
    Arrow batch: each of the K minhashes is a splitmix64 re-mix with its
    seed, computed as one (S x K) broadcast + min.  Replaces the
    interpreted K-fold higher-order transform/array_min tree, which
    costs ~12 ms/doc at K=32 (HOFs never enter codegen).  Input is the
    COMPACT int64 array (strings were hashed once, JVM-side) so the Arrow
    transfer ships 8 bytes per shingle, not the shingle text."""
    from pyspark.sql.functions import pandas_udf

    seeds = _GOLDEN * (np.arange(1, n_hashes + 1, dtype=np.uint64))

    @pandas_udf("array<long>")
    def mh(sh_hashes: pd.Series) -> pd.Series:
        out = []
        for lst in sh_hashes:
            if lst is None or len(lst) == 0:
                out.append([0] * n_hashes)
                continue
            h = np.asarray(lst, dtype=np.int64).view(np.uint64)
            mixed = _splitmix64(h[:, None] ^ seeds[None, :])
            out.append(mixed.min(axis=0).view(np.int64).tolist())
        return pd.Series(out)

    return mh


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """K minhash values per doc.  Shingling and the ONE string-hash pass
    stay codegen'd/JVM expressions (one shingle definition, shared with
    the exact-Jaccard oracle; strings never cross the Arrow boundary);
    the K-seed re-mix + min runs as one numpy kernel (_minhash_udf) —
    the interpreted K-fold transform/array_min tree this replaces
    measured ~12 ms/doc at K=32 because Spark evaluates higher-order
    functions row-at-a-time, never in codegen.  Jaccard downstream
    operates on the hash sets (`sh_hashes`; 64-bit collisions are
    negligible)."""
    shingled = _spread(df).select(
        F.col(id_col), shingles_expr(F.col(text_col), shingle_n).alias("shingles")
    )
    hashed = shingled.select(
        F.col(id_col),
        F.transform(F.col("shingles"), lambda s: F.xxhash64(s)).alias("sh_hashes"),
    )
    return hashed.select(
        F.col(id_col),
        F.col("sh_hashes"),
        _minhash_udf(n_hashes)(F.col("sh_hashes")).alias("minhash"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    *,
    id_col: str = "doc_id",
    n_bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Band the signature; docs sharing any band bucket are candidates.
    Shuffle key = (band, band_signature) — bucket sizes stay tiny for
    non-dup corpora, so the self-join never approaches the cross product."""
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        *[
                            F.col("minhash")[b * rows_per_band + r]
                            for r in range(rows_per_band)
                        ]
                    ).alias("bucket"),
                )
                for b in range(n_bands)
            ]
        )
    )
    # band-bucket join on SLIM (id, band, bucket) rows only; the shingle
    # hash arrays rejoin after pair dedup — candidate duplication across
    # bands never copies the arrays
    banded = sigs.select(F.col(id_col), bands.alias("bb")).select(
        id_col, "bb.band", "bb.bucket"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = sigs.select(F.col(id_col), F.col("sh_hashes"))
    return (
        pairs.join(sets.withColumnsRenamed({id_col: "id_a", "sh_hashes": "sh_a"}), "id_a")
        .join(sets.withColumnsRenamed({id_col: "id_b", "sh_hashes": "sh_b"}), "id_b")
        .select("id_a", "id_b", "sh_a", "sh_b")
    )


def jaccard_expr(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.greatest(union, F.lit(1))


def dedup_minhash_lsh(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n_hashes: int = 32,
    n_bands: int = 8,
) -> DataFrame:
    """Near-dup pairs with exact-Jaccard verification of LSH candidates.
    Returns (id_a, id_b, jaccard) with jaccard >= threshold."""
    sigs = minhash_signatures(
        df, id_col=id_col, text_col=text_col, n_hashes=n_hashes
    )
    pairs = lsh_candidate_pairs(
        sigs, id_col=id_col, n_bands=n_bands, rows_per_band=n_hashes // n_bands
    )
    return pairs.select(
        "id_a",
        "id_b",
        jaccard_expr(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def _simhash_udf():
    """array<long> token hashes -> 64-bit simhash, one numpy pass per
    Arrow batch: bit votes are a (T x 64) broadcast + sign + pack.
    Replaces the 64 interpreted aggregate folds of simhash_from_hashes on
    the hot path (HOFs never enter codegen; the expression tree measured
    ~0.6 ms/doc).  Input is the compact int64 array — token strings were
    hashed once, JVM-side, and never cross the Arrow boundary."""
    from pyspark.sql.functions import pandas_udf

    bit_idx = np.arange(64, dtype=np.uint64)
    weights = np.uint64(1) << bit_idx

    @pandas_udf("long")
    def sh(tok_hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(tok_hashes), dtype=np.uint64)
        for i, lst in enumerate(tok_hashes):
            if lst is None or len(lst) == 0:
                continue
            h = np.asarray(lst, dtype=np.int64).view(np.uint64)
            bits = ((h[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = (weights[votes > 0]).sum(dtype=np.uint64)
        return pd.Series(out.view(np.int64))

    return sh


def simhash_signatures(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) — tokenization + the one string-hash pass stay
    shared codegen'd/JVM expressions (text.tokens_expr + xxhash64);
    the 64 bit votes run in _simhash_udf."""
    tok_hashes = F.transform(
        tokens_expr(F.lower(F.col(text_col))), lambda t: F.xxhash64(t)
    )
    return _spread(df).select(
        F.col(id_col), _simhash_udf()(tok_hashes).alias("simhash")
    )


def simhash_from_hashes(tok_hashes: Column, n_bits: int = 64) -> Column:
    """64-bit simhash from a precomputed token-hash array: each bit
    position votes +1/-1; sign of the vote sets the bit.  Pure expression
    tree (64 folds over the long array).  Pass a MATERIALIZED column (not
    an inline transform) — the 64 folds each reference it, and inlining
    would recompute the token hashing 64x.  Reference form: the hot path
    (dedup_simhash / simhash_signatures) uses the vectorized _simhash_udf
    — HOF folds are interpreted and cost ~0.6 ms/doc at 64 bits."""

    def _votes(i):
        return F.aggregate(
            tok_hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bit_terms = []
    for i in range(n_bits):
        # shift JVM-side: a python literal 1<<63 overflows py4j's signed long
        bit = F.shiftleft(F.lit(1).cast("long"), i)
        bit_terms.append(F.when(_votes(i) > 0, bit).otherwise(F.lit(0).cast("long")))
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out.bitwiseOR(t)
    return out


def hamming_band_blocks(
    sig_col: str, max_hamming: int, n_bits: int = 64
) -> list[Column]:
    """The pigeonhole block split shared by every Hamming banding join:
    `n_bits` of the signature column split into max_hamming+1 contiguous
    blocks, each a (tbl, blk) struct.

    n_bits MUST be the bits the signature actually occupies (e.g. the
    audio fingerprint packs only FP_BITS=46 of its int64): splitting the
    full 64 would make blocks over the constant-zero high bits, whose
    single bucket holds EVERY row — the candidate join degenerates to a
    cross product while staying accidentally correct."""
    n_tables = max_hamming + 1
    base, extra = divmod(n_bits, n_tables)
    if base == 0:
        raise ValueError(
            f"max_hamming={max_hamming} needs more blocks than "
            f"n_bits={n_bits} can fill"
        )
    blocks, off = [], 0
    for t in range(n_tables):
        width = base + (1 if t < extra else 0)
        blocks.append(
            F.struct(
                F.lit(t).alias("tbl"),
                F.shiftrightunsigned(sig_col, off)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("blk"),
            )
        )
        off += width
    return blocks


def hamming_near_dup_pairs(
    sig: DataFrame,
    *,
    id_col: str,
    sig_col: str,
    max_hamming: int = 3,
    n_bits: int = 64,
) -> DataFrame:
    """Pairs within `max_hamming` of each other on an int64 signature
    column occupying `n_bits` low bits — EXACT at the given radius, no
    all-pairs.

    The signature splits into max_hamming+1 contiguous blocks; by
    pigeonhole, any pair within Hamming distance max_hamming agrees
    EXACTLY on at least one block (Manku, Jain & Sarma, WWW'07 — the
    Google web near-dup design), so equality-bucketing each block yields
    a COMPLETE candidate set: slim (id, block) rows, per-block bucket
    self-join, bit_count verify on candidates.

    At 10^12 rows, widen the signature (128 bits → wider blocks) rather
    than shrinking blocks: expected bucket size ~ N / 2^width drives the
    join fan-out.  Shared by the text simhash and audio-fingerprint
    near-dup paths (the latter passes n_bits=FP_BITS)."""
    blocks = hamming_band_blocks(sig_col, max_hamming, n_bits)
    banded = sig.select(
        F.col(id_col), sig_col, F.explode(F.array(*blocks)).alias("b")
    ).select(F.col(id_col), sig_col, F.col("b.tbl"), F.col("b.blk"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col(f"a.{sig_col}").bitwiseXOR(F.col(f"b.{sig_col}")))
    return (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        # a close pair can match on several blocks — one output row
        .distinct()
    )


def dedup_simhash(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by text simhash — EXACT at the given Hamming radius
    (see hamming_near_dup_pairs; round 1 bucketed only a 16-bit prefix,
    which silently missed pairs whose flips landed in the prefix)."""
    sh = simhash_signatures(df, id_col=id_col, text_col=text_col)
    return hamming_near_dup_pairs(
        sh, id_col=id_col, sig_col="simhash", max_hamming=max_hamming
    )


def dedup_ngram_jaccard(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.  O(n²) verify — the correctness
    oracle for the LSH variants; at scale use dedup_minhash_lsh, which
    calls the same jaccard_expr only on LSH candidates."""
    sh = df.select(
        F.col(id_col), shingles_expr(F.col(text_col), shingle_n).alias("sh")
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jaccard_expr(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_n: int = 3,
) -> DataFrame:
    """C4-style duplicate-span removal: of every `span_n`-consecutive-
    sentence span occurring more than once ANYWHERE in the corpus, keep
    only the first occurrence (ordered by (id, position)) and delete the
    other occurrences' sentences from their documents (Raffel et al.,
    "Exploring the Limits of Transfer Learning", §2.2: "we removed all
    but one of any three-sentence span occurring more than once").

    Returns (id_col, text [rebuilt], n_sentences, n_dropped_sentences).
    Documents whose every sentence is dropped come back with text ''.
    Documents with fewer than span_n sentences form one short span at
    idx 0 (still deduped corpus-wide against identical short docs).

    Scale shape — every stage is declarative, no Python:
      1. posexplode sentences (narrow; the regex split rides the scan);
      2. a per-doc window builds span hashes from `lead(sentence, k)`
         (one shuffle on id — sentence text crosses it once);
      3. the global first-occurrence ranking windows over (span_hash)
         with only (hash, id, idx, n_sent) — SLIM rows, the sentence
         text column is NOT carried (dropped before the shuffle);
      4. duplicated-occurrence spans explode to their <= span_n covered
         sentence indices (slim), distinct, and anti-join the sentence
         table;
      5. one groupBy(id) rebuilds text in position order via sort_array
         of (idx, sentence) structs.
    Total: sentence text crosses two exchanges (the per-doc window and
    the rebuild agg); the corpus-wide dedup decision itself moves only
    hashes.  The span-hash window key is a uniform md5, so no salting is
    needed — no skew by construction unless one span dominates the
    corpus, which is exactly what the operator deletes.
    """
    if span_n < 1:
        raise ValueError("span_n must be >= 1")
    sent_split = r"(?<=[.!?])\s+"
    sents = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), sent_split), lambda x: F.trim(x) != ""
            )
        ).alias("idx", "sent"),
    )
    per_doc = Window.partitionBy(id_col).orderBy("idx")
    n_sent = F.count(F.lit(1)).over(Window.partitionBy(id_col))
    parts = [F.col("sent")] + [
        F.lead("sent", k).over(per_doc) for k in range(1, span_n)
    ]
    spans = (
        sents.select(
            F.col(id_col),
            "idx",
            n_sent.alias("n_sent"),
            F.md5(F.concat_ws("\x1f", *parts)).alias("span_hash"),
        )
        # a span starts at idx iff a full span fits; a doc shorter than
        # span_n contributes its single short span at idx 0
        .where(
            (F.col("idx") + span_n <= F.col("n_sent"))
            | ((F.col("n_sent") < span_n) & (F.col("idx") == 0))
        )
    )
    first = Window.partitionBy("span_hash").orderBy(F.col(id_col), F.col("idx"))
    dup_occurrences = (
        spans.withColumn("__rk", F.row_number().over(first))
        .where(F.col("__rk") > 1)
        .select(id_col, "idx", "n_sent")
    )
    drops = dup_occurrences.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.col("idx"),
                F.least(F.col("idx") + span_n - 1, F.col("n_sent") - 1),
            )
        ).alias("idx"),
    ).distinct()
    kept = sents.join(drops, [id_col, "idx"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("idx", "sent"))),
                lambda s: s["sent"],
            ),
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = sents.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sentences"))
    return totals.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        "n_sentences",
        (F.col("n_sentences") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
            "n_dropped_sentences"
        ),
    )
