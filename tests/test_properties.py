"""Property-based tests (hypothesis) over the pure-numpy kernels — no
SparkSession needed, so these fuzz far more inputs per second than the
example-based suites.  Targets the invariants the engine's correctness
depends on: codec roundtrip fidelity, container parse robustness
(typed errors only, never arbitrary crashes), resampler behavior, and
fingerprint determinism."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from scylla_cdc_source_connector_spark import audio

pcm16_arrays = st.integers(1, 4000).flatmap(
    lambda n: st.integers(0, 2**31 - 1).map(
        lambda seed: np.random.default_rng(seed)
        .integers(-32768, 32767, n)
        .astype(np.int16)
    )
)


@settings(derandomize=True, max_examples=60, deadline=None)
@given(pcm=pcm16_arrays, codec=st.sampled_from(list(audio.SUPPORTED_CODECS)))
def test_codec_roundtrip_snr(pcm, codec):
    """encode→decode must stay within the engine's own validation gate
    (SNR ≥ 30 dB) for every raw codec, on arbitrary int16 signals; G.711
    output length must be one byte per sample, PCM16 two."""
    raw = audio.encode(pcm, codec)
    assert len(raw) == len(pcm) * (2 if codec == "pcm_s16le" else 1)
    dec = audio.decode(raw, codec)
    assert len(dec) == len(pcm)
    ref = pcm.astype(np.float32) / 32768.0
    if np.abs(ref).max() > 1e-3:  # SNR undefined on near-silence
        assert audio.snr_db(ref, dec) >= 30.0


@settings(derandomize=True, max_examples=40, deadline=None)
@given(
    pcm=pcm16_arrays,
    sr=st.sampled_from([8000, 16000, 22050, 44100]),
    fmt=st.sampled_from(["pcm_s16le", "ulaw", "alaw"]),
    channels=st.sampled_from([1, 2]),
)
def test_wav_container_roundtrip(pcm, sr, fmt, channels):
    """wav_encode→wav_parse returns the same format/sr/channels and a
    payload that decodes to the same sample count (after downmix)."""
    if channels == 2:
        pcm = np.repeat(pcm, 2)
    blob = audio.wav_encode(pcm, sr, fmt, n_channels=channels)
    inner, ch, got_sr, payload = audio.wav_parse(blob)
    assert (inner, ch, got_sr) == (fmt, channels, sr)
    dec = audio.decode(blob, "wav")  # downmixes
    assert len(dec) == len(pcm) // channels


@settings(derandomize=True, max_examples=120, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_wav_parse_never_crashes_untyped(data):
    """Arbitrary bytes through the container parser raise ONLY the typed
    errors the Spark plumbing catches (decode_ok=False), never an
    IndexError/struct.error/etc that would kill an executor task."""
    try:
        audio.wav_parse(data)
    except (audio.MalformedContainerError, audio.UnsupportedCodecError):
        pass


@settings(derandomize=True, max_examples=120, deadline=None)
@given(data=st.binary(min_size=44, max_size=300), flip=st.integers(0, 43))
def test_wav_parse_corrupted_header_typed(data, flip):
    """A valid header with one corrupted byte must also fail typed (or
    parse, when the corruption lands in a don't-care byte)."""
    pcm = np.arange(-50, 50, dtype=np.int16)
    blob = bytearray(audio.wav_encode(pcm, 8000, "pcm_s16le"))
    blob[flip] ^= data[flip % len(data)] or 1
    try:
        audio.wav_parse(bytes(blob))
    except (audio.MalformedContainerError, audio.UnsupportedCodecError):
        pass


@settings(derandomize=True, max_examples=40, deadline=None)
@given(
    sr_pair=st.sampled_from([(8000, 16000), (44100, 16000), (22050, 8000)]),
    level=st.integers(1000, 30000),
    n=st.integers(64, 3000),
)
def test_resample_constant_stays_constant(sr_pair, level, n):
    """Linear-interp resampling of a constant signal is the constant, and
    the output length tracks the rate ratio."""
    from scylla_cdc_source_connector_spark.audio_resample import (
        resample_linear,
    )

    sr_from, sr_to = sr_pair
    pcm = np.full(n, level / 32768.0, dtype=np.float32)
    out = resample_linear(pcm, sr_from, sr_to)
    expect_n = int(round(n * sr_to / sr_from))
    assert abs(len(out) - expect_n) <= 1
    assert np.allclose(out, level / 32768.0, atol=1e-4)


@settings(derandomize=True, max_examples=30, deadline=None)
@given(pcm=pcm16_arrays, codec=st.sampled_from(list(audio.SUPPORTED_CODECS)))
def test_fingerprint_batch_independence(pcm, codec):
    """A clip's fingerprint is a pure function of (bytes, codec): the same
    clip fingerprinted alone and inside a batch of other clips must get
    the same 48 bits (the incremental dedup index depends on this)."""
    if len(pcm) < 256:
        pcm = np.tile(pcm, 256 // len(pcm) + 1)
    from scylla_cdc_source_connector_spark.audio_fingerprint import (
        _fingerprint_group,
    )

    raw = audio.encode(pcm, codec)
    other = audio.encode(
        np.random.default_rng(7).integers(-3000, 3000, 777).astype(np.int16),
        codec,
    )
    alone, _, ok1 = _fingerprint_group([raw], codec)
    batched, _, ok2 = _fingerprint_group([other, raw, other], codec)
    assert ok1[0] and ok2[1]
    assert alone[0] == batched[1]


@settings(derandomize=True, max_examples=60, deadline=None)
@given(
    n_bytes=st.integers(0, 5000),
    sr=st.sampled_from([8000, 16000, 44100]),
    window_ms=st.integers(1, 500),
    hop_ms=st.integers(1, 500),
    keep_tail=st.booleans(),
)
def test_segment_arithmetic_total_coverage(n_bytes, sr, window_ms, hop_ms, keep_tail):
    """The segmentation count/offset formulas (mirrored from
    audio_segment.segment_clips) tile the clip: segments never read past
    the end, starts advance by hop, and keep_tail covers the final byte
    for hop <= window."""
    bps = 1  # ulaw
    win_b = (sr * window_ms // 1000) * bps
    hop_b = (sr * hop_ms // 1000) * bps
    if win_b == 0 or hop_b == 0:
        return
    n_full = (n_bytes - win_b) // hop_b + 1 if n_bytes >= win_b else 0
    n_seg = n_full + (1 if keep_tail and n_full * hop_b < n_bytes else 0)
    last_end = 0
    for i in range(n_seg):
        start = i * hop_b
        end = min(start + win_b, n_bytes)
        assert start < n_bytes
        assert end <= n_bytes
        last_end = max(last_end, end)
    if keep_tail and hop_b <= win_b and n_bytes:
        assert last_end == n_bytes


# ---------------------------------------------------------------------------
# Avro binary codec (functions/avro.py): decode(encode(x)) == x for
# arbitrary values of an envelope-shaped recursive schema
# ---------------------------------------------------------------------------
@st.composite
def _avro_schema_and_value(draw, depth=2):
    """A random (schema, matching value) pair over the mapped type set."""
    kind = draw(
        st.sampled_from(
            ["long", "string", "bytes", "boolean", "double", "record", "array"]
            if depth > 0
            else ["long", "string", "bytes", "boolean", "double"]
        )
    )
    nullable = draw(st.booleans())

    def wrap(schema, value):
        if nullable:
            return ["null", schema], (None if draw(st.booleans()) else value)
        return schema, value

    if kind == "long":
        return wrap("long", draw(st.integers(-(2**63), 2**63 - 1)))
    if kind == "string":
        return wrap("string", draw(st.text(max_size=40)))
    if kind == "bytes":
        return wrap("bytes", draw(st.binary(max_size=40)))
    if kind == "boolean":
        return wrap("boolean", draw(st.booleans()))
    if kind == "double":
        return wrap("double", draw(st.floats(allow_nan=False, width=64)))
    if kind == "array":
        inner_s, _ = draw(_avro_schema_and_value(depth=depth - 1))
        # all items share inner_s: draw each value against that one schema
        items = [
            _value_for(draw, inner_s)
            for _ in range(draw(st.integers(0, 4)))
        ]
        return wrap({"type": "array", "items": inner_s}, items)
    # record
    n_fields = draw(st.integers(1, 4))
    fields, value = [], {}
    for i in range(n_fields):
        s2, v2 = draw(_avro_schema_and_value(depth=depth - 1))
        fields.append({"name": f"f{i}", "type": s2})
        value[f"f{i}"] = v2
    return wrap(
        {"type": "record", "name": f"R{depth}", "fields": fields}, value
    )


def _value_for(draw, schema):
    """Draw one value conforming to an already-drawn schema node."""
    if isinstance(schema, list):
        return None if draw(st.booleans()) else _value_for(draw, schema[1])
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "long":
        return draw(st.integers(-(2**63), 2**63 - 1))
    if t == "string":
        return draw(st.text(max_size=40))
    if t == "bytes":
        return draw(st.binary(max_size=40))
    if t == "boolean":
        return draw(st.booleans())
    if t == "double":
        return draw(st.floats(allow_nan=False, width=64))
    if t == "array":
        return [
            _value_for(draw, schema["items"])
            for _ in range(draw(st.integers(0, 3)))
        ]
    return {
        f["name"]: _value_for(draw, f["type"]) for f in schema["fields"]
    }


@settings(max_examples=150, deadline=None)
@given(sv=_avro_schema_and_value())
def test_avro_roundtrip_arbitrary(sv):
    from scylla_cdc_source_connector_spark.functions import avro

    schema, value = sv
    got = avro.decode_record(schema, avro.encode_record(schema, value))
    assert got == value


# ---------------------------------------------------------------------------
# Schema-Registry BACKWARD compatibility gate (functions/schema_registry.py)
# ---------------------------------------------------------------------------

_avro_primitive = st.sampled_from(["long", "int", "string", "double", "boolean", "bytes"])
_field_names = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=6),
    min_size=1,
    max_size=6,
    unique=True,
)


@st.composite
def _record_schemas(draw):
    names = draw(_field_names)
    fields = []
    for n in names:
        t = draw(_avro_primitive)
        if draw(st.booleans()):
            fields.append({"name": n, "type": ["null", t], "default": None})
        else:
            fields.append({"name": n, "type": t})
    return {"type": "record", "name": "R", "fields": fields}


@settings(derandomize=True, max_examples=60, deadline=None)
@given(schema=_record_schemas())
def test_backward_compat_reflexive(schema):
    """Every schema is BACKWARD-compatible with itself."""
    from scylla_cdc_source_connector_spark.functions.schema_registry import (
        backward_compatible,
    )

    ok, why = backward_compatible(schema, schema)
    assert ok, why


@settings(derandomize=True, max_examples=60, deadline=None)
@given(schema=_record_schemas(), extra_t=_avro_primitive)
def test_backward_compat_nullable_add_ok_others_rejected(schema, extra_t):
    """Adding a nullable field is compatible; adding it non-nullable,
    removing any field, or changing any field's type is not."""
    from scylla_cdc_source_connector_spark.functions.schema_registry import (
        backward_compatible,
    )

    grown = {
        **schema,
        "fields": schema["fields"]
        + [{"name": "zz_new", "type": ["null", extra_t], "default": None}],
    }
    assert backward_compatible(schema, grown)[0]
    grown_bad = {
        **schema,
        "fields": schema["fields"] + [{"name": "zz_new", "type": extra_t}],
    }
    assert not backward_compatible(schema, grown_bad)[0]

    shrunk = {**schema, "fields": schema["fields"][:-1]}
    if schema["fields"]:
        assert not backward_compatible(schema, shrunk)[0]

    f0 = schema["fields"][0]
    flipped_t = "string" if f0["type"] != "string" else "long"
    flipped = {
        **schema,
        "fields": [{"name": f0["name"], "type": flipped_t}] + schema["fields"][1:],
    }
    assert not backward_compatible(schema, flipped)[0]


# ------------------------------------------------------- WER edit distance


words = st.lists(
    st.sampled_from(["a", "b", "cat", "dog", "the", "x"]), max_size=10
)


@given(words, words)
@settings(max_examples=200, deadline=None)
def test_word_edit_distance_matches_matrix_dp(a, b):
    from scylla_cdc_source_connector_spark.functions.asr_eval import (
        _word_edit_distance,
    )

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
    assert _word_edit_distance(a, b) == d[m][n]


@given(words, words, words)
@settings(max_examples=100, deadline=None)
def test_word_edit_distance_is_a_metric(a, b, c):
    from scylla_cdc_source_connector_spark.functions.asr_eval import (
        _word_edit_distance,
    )

    dab = _word_edit_distance(a, b)
    # identity of indiscernibles + symmetry + bounds + triangle
    assert (dab == 0) == (a == b)
    assert dab == _word_edit_distance(b, a)
    assert abs(len(a) - len(b)) <= dab <= max(len(a), len(b))
    assert _word_edit_distance(a, c) <= dab + _word_edit_distance(b, c)


# ------------------------------------------------ KMV sketch properties --


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=200),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=4, max_value=64),
)
@settings(max_examples=60, deadline=None)
def test_kmv_merge_equals_global_bottom_k(parts, k):
    """Merging per-partition bottom-k sketches is EXACT w.r.t. one global
    sketch (bottom-k of a union ⊆ union of per-part bottom-ks), in any
    partitioning and any merge order."""
    from scylla_cdc_source_connector_spark.sources import puffin as pf

    all_hashes = np.array(
        sorted({h for p in parts for h in p}), dtype=np.uint64
    )
    blobs = [
        np.sort(np.unique(np.array(p, dtype=np.uint64)))[:k]
        .astype("<u8")
        .tobytes()
        for p in parts
    ]
    merged = pf.kmv_merge(blobs, k)
    assert np.array_equal(merged, all_hashes[:k])
    # merge of merges (tree reduction) gives the same sketch
    mid = len(blobs) // 2
    left = pf.kmv_merge(blobs[:mid], k) if blobs[:mid] else np.array([], dtype=np.uint64)
    right = pf.kmv_merge(blobs[mid:], k)
    two = pf.kmv_merge(
        [left.astype("<u8").tobytes(), right.astype("<u8").tobytes()], k
    )
    assert np.array_equal(two, merged)
    # exhaustive sketches are exact counts
    if len(all_hashes) < k:
        assert pf.kmv_estimate(merged, k) == len(all_hashes)


# --------------------------------------------- IMA ADPCM properties ------


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=600
    ),
    st.sampled_from([9, 33, 105, 505]),
)
@settings(max_examples=40, deadline=None)
def test_adpcm_roundtrip_structure(samples, spb):
    """Encode→decode is deterministic, length-exact up to tail padding,
    decoded values stay in int16 range, and the first sample of every
    block reconstructs EXACTLY (it rides the header verbatim)."""
    pcm = np.array(samples, dtype=np.int16)
    payload = audio.adpcm_ima_encode(pcm, samples_per_block=spb)
    block_align = 4 + (spb - 1) // 2
    out = audio.adpcm_ima_decode(payload, block_align)
    n_blocks = -(-len(pcm) // spb)
    assert len(out) == n_blocks * spb
    assert np.array_equal(
        out, audio.adpcm_ima_decode(payload, block_align)
    )
    # block-leading samples are verbatim
    assert np.array_equal(out[::spb], np.asarray(
        np.concatenate([pcm, np.repeat(pcm[-1:], n_blocks * spb - len(pcm))])
    )[::spb])
    # container roundtrip trims the padding via the fact chunk
    blob = audio.wav_encode_adpcm(pcm, 8000, samples_per_block=spb)
    codec, ch, sr, inner = audio.wav_parse(blob)
    assert (codec, ch, sr) == ("pcm_s16le", 1, 8000)
    assert len(inner) // 2 == len(pcm)


@given(
    st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=400
    ),
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=60, deadline=None)
def test_misra_gries_guarantee(stream, m, n_parts):
    """Misra-Gries bound under batching AND partition merging: reported
    count <= true count <= reported + total/(m+1) for every element, and
    any element ABSENT from the summary has true count <= total/(m+1).
    (Merging k summaries keeps the additive bound because decrements only
    ever subtract mass that is charged against total.)"""
    from collections import Counter

    from scylla_cdc_source_connector_spark.sources import puffin as pf

    true = Counter(stream)
    total = len(stream)
    bound = total / (m + 1) * n_parts  # conservative: error adds per merge
    # split the stream into partitions, truncate each, merge
    size = -(-len(stream) // n_parts)
    blobs = []
    for i in range(n_parts):
        part = np.array(stream[i * size : (i + 1) * size], dtype=np.uint64)
        if not len(part):
            continue
        u, inv = np.unique(part, return_inverse=True)
        c = np.bincount(inv).astype(np.int64)
        blobs.append(pf._mg_truncate(u, c, m).astype("<u8").tobytes())
    merged = pf.mg_merge(blobs, m)
    reported = {int(h): int(c) for h, c in merged}
    for v, t in true.items():
        r = reported.get(v, 0)
        assert r <= t, f"overcount: {v} reported {r} true {t}"
        assert t - r <= bound + 1e-9, (
            f"undercount beyond bound: {v} reported {r} true {t} bound {bound}"
        )
