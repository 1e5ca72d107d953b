"""SpecAugment mask scheduling (plans/augment.py): bounds, determinism,
frame arithmetic, Python-recomputed hash oracle, shuffle-free plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.audio_features import HOP, WIN
from scylla_cdc_source_connector_spark.plans.augment import specaugment_plan

SR = 16000


def _clips(spark):
    rows = [
        ("long", 2000, SR),   # 2 s -> many frames
        ("short", 20, SR),    # 320 samples < WIN -> 0 frames
        ("mid", 500, 8000),   # 4000 samples @8k
    ]
    return spark.createDataFrame(rows, "clip_id string, dur_ms int, sr_hz int")


def test_plan_shape_and_bounds(spark):
    plan = specaugment_plan(
        _clips(spark), epochs=3, n_time_masks=2, n_freq_masks=2, n_mels=40
    )
    rows = plan.collect()
    # every (clip, epoch, kind, mask_idx) slot exists exactly once
    assert len(rows) == 3 * 3 * (2 + 2)
    for r in rows:
        ext = r["n_frames"] if r["kind"] == "time" else 40
        assert 0 <= r["width"] <= min(ext, 27 if r["kind"] == "time" else 8)
        assert 0 <= r["start"] and r["start"] + r["width"] <= max(ext, 1)
    # frame arithmetic matches the shared mel framing
    nf = {r["clip_id"]: r["n_frames"] for r in rows}
    assert nf["long"] == 1 + (2 * SR - WIN) // HOP
    assert nf["short"] == 0
    assert nf["mid"] == 1 + (4000 - WIN) // HOP
    # short clip: time masks degenerate to width 0
    assert all(
        r["width"] == 0
        for r in rows
        if r["clip_id"] == "short" and r["kind"] == "time"
    )
    # freq masks unaffected by clip length
    assert any(
        r["width"] > 0
        for r in rows
        if r["clip_id"] == "short" and r["kind"] == "freq"
    )


def test_plan_deterministic_and_seeded(spark):
    kw = dict(epochs=4, n_time_masks=2, n_freq_masks=1)
    a = sorted(map(tuple, specaugment_plan(_clips(spark), **kw).collect()))
    b = sorted(map(tuple, specaugment_plan(_clips(spark), **kw).collect()))
    assert a == b
    c = sorted(
        map(tuple, specaugment_plan(_clips(spark), seed=9, **kw).collect())
    )
    assert c != a
    with pytest.raises(ValueError):
        specaugment_plan(_clips(spark), epochs=0)


def test_plan_matches_python_hash_oracle(spark):
    """The uniforms are pure xxhash64 arithmetic: recompute one row's
    draw in Spark itself over a literal and compare (the definition is
    engine-reproducible, not an implementation accident)."""
    plan = specaugment_plan(_clips(spark), epochs=1, n_time_masks=1, n_freq_masks=0)
    r = [x for x in plan.collect() if x["clip_id"] == "long"][0]
    ext, maxw = r["n_frames"], 27
    row = spark.range(1).select(
        (F.pmod(
            F.xxhash64(F.lit("w"), F.lit("long"), F.lit(0), F.lit("time"),
                       F.lit(0), F.lit(0)),
            F.lit(1 << 20),
        ) % F.greatest(F.lit(maxw) - F.lit(0) + 1, F.lit(1))).alias("w")
    ).collect()[0]
    assert min(row["w"], ext) == r["width"]


def test_plan_is_shuffle_free(spark):
    plan = specaugment_plan(_clips(spark), epochs=2)
    p = plan._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p


# ---------------------------------------------------------------- noise mix


from scylla_cdc_source_connector_spark.plans.augment import noise_mix_plan


def _noises(spark):
    rows = [("n-a", 5000), ("n-b", 100), ("n-c", 60000)]
    return spark.createDataFrame(rows, "noise_id string, dur_ms int")


def test_noise_mix_shape_and_bounds(spark):
    plan = noise_mix_plan(
        _clips(spark), _noises(spark), epochs=4, snr_db_range=(5.0, 15.0)
    )
    rows = plan.collect()
    # every (clip, epoch) slot exists exactly once
    assert len(rows) == 3 * 4
    assert len({(r["clip_id"], r["epoch"]) for r in rows}) == 12
    noise_durs = {"n-a": 5000, "n-b": 100, "n-c": 60000}
    clip_durs = {"long": 2000, "short": 20, "mid": 500}
    for r in rows:
        assert r["noise_id"] in noise_durs
        assert r["noise_dur_ms"] == noise_durs[r["noise_id"]]
        assert 50 <= r["snr_db_x10"] <= 150
        head = max(noise_durs[r["noise_id"]] - clip_durs[r["clip_id"]], 0)
        assert 0 <= r["offset_ms"] <= head
        assert r["applied"] is True  # p_apply defaults to 1.0


def test_noise_mix_deterministic_seeded_and_papply(spark):
    kw = dict(epochs=3, snr_db_range=(0.0, 20.0))
    a = sorted(map(tuple, noise_mix_plan(_clips(spark), _noises(spark), **kw).collect()))
    b = sorted(map(tuple, noise_mix_plan(_clips(spark), _noises(spark), **kw).collect()))
    assert a == b
    c = sorted(
        map(
            tuple,
            noise_mix_plan(_clips(spark), _noises(spark), seed=7, **kw).collect(),
        )
    )
    assert c != a
    # p_apply=0 keeps every slot but applies none
    none = noise_mix_plan(
        _clips(spark), _noises(spark), epochs=3, p_apply=0.0
    ).collect()
    assert len(none) == 9 and not any(r["applied"] for r in none)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        noise_mix_plan(_clips(spark), _noises(spark), epochs=0)
    with _pytest.raises(ValueError):
        noise_mix_plan(
            _clips(spark), _noises(spark).limit(0), epochs=1
        )


def test_noise_mix_draw_matches_expression_oracle(spark):
    """noise_id choice is pure xxhash64 arithmetic over (clip, epoch,
    seed) — recompute one row's index draw and rank join by hand."""
    plan = noise_mix_plan(_clips(spark), _noises(spark), epochs=1)
    r = [x for x in plan.collect() if x["clip_id"] == "long"][0]
    idx = spark.range(1).select(
        F.pmod(
            F.xxhash64(F.lit("n"), F.lit("long"), F.lit(0), F.lit(0)),
            F.lit(3),
        ).alias("i")
    ).collect()[0]["i"]
    assert ["n-a", "n-b", "n-c"][idx] == r["noise_id"]


def test_noise_mix_broadcasts_the_noise_side(spark):
    plan = noise_mix_plan(_clips(spark), _noises(spark), epochs=2)
    p = plan._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


# ------------------------------------------------------------ speed perturb


from scylla_cdc_source_connector_spark.plans.augment import speed_perturb_plan


def test_speed_perturb_shape_and_arithmetic(spark):
    plan = speed_perturb_plan(_clips(spark), epochs=5)
    rows = plan.collect()
    assert len(rows) == 3 * 5
    durs = {"long": 2000, "short": 20, "mid": 500}
    for r in rows:
        assert r["factor_x100"] in (90, 100, 110)
        assert r["new_dur_ms"] == durs[r["clip_id"]] * 100 // r["factor_x100"]
    # all three factors appear somewhere over 15 draws
    assert {r["factor_x100"] for r in rows} == {90, 100, 110}


def test_speed_perturb_deterministic_and_shuffle_free(spark):
    a = sorted(map(tuple, speed_perturb_plan(_clips(spark), epochs=4).collect()))
    b = sorted(map(tuple, speed_perturb_plan(_clips(spark), epochs=4).collect()))
    assert a == b
    c = sorted(
        map(tuple, speed_perturb_plan(_clips(spark), epochs=4, seed=3).collect())
    )
    assert c != a
    p = (
        speed_perturb_plan(_clips(spark), epochs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p
    with pytest.raises(ValueError):
        speed_perturb_plan(_clips(spark), epochs=1, factors=())


def test_noise_mix_rejects_duplicate_noise_ids(spark):
    dup = spark.createDataFrame(
        [("n-a", 5000), ("n-a", 100)], "noise_id string, dur_ms int"
    )
    with pytest.raises(ValueError, match="unique"):
        noise_mix_plan(_clips(spark), dup, epochs=1)
