"""Training-data-pipeline operator tests: ANN recall (LSH / IVF vs the
exact brute-force baseline), near-dup recall, and multimodal plumbing
(schema, fan-out, determinism) — the §5.3 analog of the reference's
operator-level unit tests for our added operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _topk_sets(df, k=10):
    rows = df.filter(F.col("rank") <= k).collect()
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = total = 0
    for q, truth in exact.items():
        total += len(truth)
        hits += len(truth & approx.get(q, set()))
    return hits / max(total, 1)


def test_ivf_recall_vs_brute_force(spark, emb):
    from scylla_cdc_source_connector_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    queries = emb.filter(F.col("vec_id") < 8)
    exact = _topk_sets(brute_force_topk(emb, queries, k=10))
    approx = _topk_sets(ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=6))
    r = _recall(approx, exact)
    # same operating point the entry registers (16 cells, 6 probed);
    # measured 0.93 at sf0.01 — hold the LSH-path bar here too
    assert r >= 0.8, f"IVF recall {r:.2f} < 0.8"


def test_ivf_full_probe_is_exact(spark, emb):
    """n_probe == n_centroids probes every cell => identical to brute force."""
    from scylla_cdc_source_connector_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    queries = emb.filter(F.col("vec_id") < 4)
    exact = _topk_sets(brute_force_topk(emb, queries, k=5), k=5)
    approx = _topk_sets(
        ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8), k=5
    )
    assert approx == exact


def test_lsh_recall_vs_brute_force(spark, emb):
    from scylla_cdc_source_connector_spark.functions.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    queries = emb.filter(F.col("vec_id") < 8)
    exact = _topk_sets(brute_force_topk(emb, queries, k=10))
    approx = _topk_sets(lsh_topk(emb, queries, k=10))
    r = _recall(approx, exact)
    assert r >= 0.8, f"banded-LSH top-k recall {r:.2f} < 0.8"


def test_embedding_near_dup_lsh_recall(spark, emb):
    """Banded hyperplane LSH must recover >= 0.8 of the exact cosine
    near-dup pairs (the round-1 single-bucket variant returned 0 rows)."""
    from scylla_cdc_source_connector_spark.functions.similarity import (
        cosine_expr,
        cosine_near_dup_pairs,
    )

    sub = emb.filter(F.col("vec_id") < 300)
    a = sub.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = sub.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {
        (r["id_a"], r["id_b"])
        for r in (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
            .filter(F.col("cosine") >= 0.35)
            .select("id_a", "id_b")
        ).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(sub, threshold=0.35).collect()
    }
    assert exact, "fixture should contain near-dup pairs at cosine >= 0.35"
    # no false positives: every emitted pair is exact-verified
    assert approx <= exact
    r = len(exact & approx) / len(exact)
    assert r >= 0.8, f"banded-LSH near-dup recall {r:.2f} < 0.8"


def test_minhash_lsh_recall_vs_exact_jaccard(spark, docs):
    from scylla_cdc_source_connector_spark.functions.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    subset = docs.filter(F.col("doc_id") < 300)
    # same shingle definition as the minhash path (trigrams)
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup_ngram_jaccard(subset, threshold=0.7, shingle_n=3).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in dedup_minhash_lsh(subset, threshold=0.7).collect()
    }
    if exact:
        # high-jaccard pairs are exactly what banding is designed to catch
        assert len(exact & approx) / len(exact) >= 0.8


def test_image_features_plumbing(spark, docs):
    from scylla_cdc_source_connector_spark.functions.multimodal import (
        IMAGE_FEATURES_SCHEMA,
        image_features_batches,
    )

    inp = docs.limit(20).select(
        F.col("doc_id").cast("string").alias("item_id"),
        F.encode(F.md5("text"), "utf-8").alias("payload"),
    )
    out = inp.mapInPandas(image_features_batches, IMAGE_FEATURES_SCHEMA)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["decode_ok"]
        assert 8 <= r["width"] <= 15 and 8 <= r["height"] <= 15
        assert r["n_channels"] == 3
        assert 0.0 <= r["mean_luma"] <= 255.0


def test_image_features_empty_payload_flagged(spark):
    from scylla_cdc_source_connector_spark.functions.multimodal import (
        IMAGE_FEATURES_SCHEMA,
        image_features_batches,
    )

    inp = spark.createDataFrame(
        [("x", bytearray(b""))], "item_id string, payload binary"
    )
    row = inp.mapInPandas(image_features_batches, IMAGE_FEATURES_SCHEMA).first()
    assert not row["decode_ok"]


def test_video_frame_fanout_deterministic(spark, docs):
    from scylla_cdc_source_connector_spark.functions.multimodal import (
        VIDEO_FRAMES_SCHEMA,
        video_frame_sample_batches,
    )

    inp = docs.limit(10).select(
        F.col("doc_id").cast("string").alias("item_id"),
        F.encode(F.repeat(F.md5("text"), 20), "utf-8").alias("payload"),
    )
    fn = video_frame_sample_batches(sample_every=1, frame_bytes=256)
    a = sorted(map(tuple, inp.mapInPandas(fn, VIDEO_FRAMES_SCHEMA).collect()))
    b = sorted(map(tuple, inp.mapInPandas(fn, VIDEO_FRAMES_SCHEMA).collect()))
    assert a == b
    # 640-byte payload, 256-byte frames -> exactly frames 0 and 1 per item
    assert len(a) == 20
    assert {t[1] for t in a} == {0, 1}


def test_simhash_banding_complete_at_radius(spark, docs):
    """Pigeonhole completeness (Manku et al. WWW'07): block-equality
    banding must find EVERY pair within the Hamming radius that an
    all-pairs scan over the same signatures finds — including pairs
    whose differing bits fall in the top prefix (the round-1
    single-prefix bucket's blind spot)."""
    from scylla_cdc_source_connector_spark.functions.dedup import (
        dedup_simhash,
        simhash_signatures,
    )

    subset = docs.filter(F.col("doc_id") < 400)
    # exact reference over the SAME signature kernel the banding consumes
    sh = simhash_signatures(subset)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 8)
        .collect()
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in dedup_simhash(subset, max_hamming=8).collect()
    }
    assert exact, "fixture should contain simhash near-dups at radius 8"
    assert banded == exact  # complete AND no false positives


def test_real_image_codecs_roundtrip_and_goldens():
    """decode_image is REAL for PPM(P6) and uncompressed BMP — pure
    numpy, no codec library (multimodal.py)."""
    import struct

    import numpy as np

    from scylla_cdc_source_connector_spark.functions.multimodal import (
        UnsupportedMediaError,
        decode_image,
        encode_ppm,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)
    # PPM round-trip, plus a comment-bearing header
    assert (decode_image(encode_ppm(img)) == img).all()
    with_comment = b"P6\n# a comment\n3 5\n255\n" + img.tobytes()
    assert (decode_image(with_comment) == img).all()

    # BMP golden: 2x2 24-bit bottom-up, rows padded to 4 bytes.
    # pixel rows (top..bottom): [(255,0,0),(0,255,0)] / [(0,0,255),(9,8,7)]
    def bmp24(rows_bgr, height):
        w = len(rows_bgr[0])
        stride = (w * 3 + 3) & ~3
        raster = b"".join(
            b"".join(bytes(px) for px in row).ljust(stride, b"\x00")
            for row in rows_bgr
        )
        header = struct.pack(
            "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
        ) + struct.pack(
            "<IiiHHIIiiII", 40, w, height, 1, 24, 0, len(raster), 0, 0, 0, 0
        )
        return header + raster

    # bottom-up: file stores the BOTTOM row first
    data = bmp24(
        [[(255, 0, 0), (7, 8, 9)], [(0, 0, 255), (0, 255, 0)]], height=2
    )
    out = decode_image(data)
    assert out.shape == (2, 2, 3)
    # decoded is RGB, top row first
    assert out[0, 0].tolist() == [255, 0, 0] and out[0, 1].tolist() == [0, 255, 0]
    assert out[1, 0].tolist() == [0, 0, 255] and out[1, 1].tolist() == [9, 8, 7]
    # top-down variant (negative height) stores the top row first
    data_td = bmp24(
        [[(0, 0, 255), (0, 255, 0)], [(255, 0, 0), (7, 8, 9)]], height=-2
    )
    assert (decode_image(data_td) == out).all()

    # failure modes are clear, not garbage
    import pytest as _pytest

    for bad in (b"P6\n3 5\n255\n" + img.tobytes()[:-1],  # truncated raster
                b"GIF89a....", b"BM" + b"\x00" * 20):
        with _pytest.raises(UnsupportedMediaError):
            decode_image(bad)

    # nearest-neighbor resize: exact on integer upscales
    up = resize_nearest(img, 10, 6)
    assert up.shape == (10, 6, 3)
    assert (up[::2, ::2] == img).all()
