"""Multimodal column handling — opaque binary payloads + typed metadata.

Audio decode is fully real (audio.py, G.711/PCM in numpy).  For images,
two REAL decoders ship in pure numpy — binary PPM (P6) and uncompressed
24/32-bit BMP — because neither needs a codec library; compressed
formats (JPEG/PNG/...) require libraries not baked into this container,
so they fall back to UnsupportedMediaError / the deterministic fake,
while the Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signature, partitioning — is identical for real and stubbed codecs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd


class UnsupportedMediaError(NotImplementedError):
    """Decoder for this media type is not available in this container."""


# --- real codecs (pure numpy, public formats) ------------------------------
def _ppm_decode(data: bytes) -> np.ndarray:
    """Binary PPM (magic P6): header `P6 <w> <h> <maxval>` of
    whitespace-separated tokens with `#` comments, then raw RGB rows."""
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise UnsupportedMediaError("truncated PPM header")
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval, then raster
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError as e:
        raise UnsupportedMediaError(f"bad PPM header: {e}") from e
    if maxval > 255:
        raise UnsupportedMediaError("16-bit PPM not supported")
    need = w * h * 3
    raster = data[pos : pos + need]
    if len(raster) < need:
        raise UnsupportedMediaError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _bmp_decode(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP (BITMAPINFOHEADER): bottom-up rows
    padded to 4 bytes, BGR(A) order; negative height = top-down."""
    if len(data) < 54:
        raise UnsupportedMediaError("truncated BMP header")
    offset = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedMediaError(
            f"only uncompressed 24/32-bit BMP (got bpp={bpp}, "
            f"compression={compression})"
        )
    top_down, h = h < 0, abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    need = stride * h
    raw = data[offset : offset + need]
    if len(raw) < need:
        raise UnsupportedMediaError("truncated BMP raster")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)[:, : w * nch]
    img = rows.reshape(h, w, nch)
    if not top_down:
        img = img[::-1]
    return img[..., [2, 1, 0] if nch == 3 else [2, 1, 0, 3]]


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes to a REAL pure-numpy decoder (PPM P6,
    uncompressed BMP).  Other formats raise UnsupportedMediaError — in a
    production image, register PIL/libvips decoders here."""
    if data[:2] == b"P6":
        return _ppm_decode(data)
    if data[:2] == b"BM":
        return _bmp_decode(data)
    raise UnsupportedMediaError("unknown image magic")


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary PPM encoder (fixture/round-trip counterpart of _ppm_decode)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize as one vectorized fancy-index (no loops)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).astype(np.intp)
    cols = (np.arange(out_w) * w // out_w).astype(np.intp)
    return img[rows[:, None], cols[None, :]]


#: mapInPandas output schema for image feature extraction
IMAGE_FEATURES_SCHEMA = (
    "item_id string, width int, height int, n_channels int, "
    "mean_luma double, decode_ok boolean"
)


def _fake_image_decode(data: bytes) -> np.ndarray:
    """Deterministic fake decoder: derives a small 'image' from the payload
    bytes so plumbing tests have stable expectations.  Replace with a real
    codec (PIL/libvips) in production images."""
    if len(data) < 4:
        raise UnsupportedMediaError("payload too small for fake decoder")
    h = 8 + data[0] % 8
    w = 8 + data[1] % 8
    arr = np.frombuffer(
        (data * ((h * w * 3) // len(data) + 1))[: h * w * 3], dtype=np.uint8
    )
    return arr.reshape(h, w, 3)


def image_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body over (item_id, payload binary).  Arrow-batched;
    real decoders (PPM/BMP magic) first, deterministic fake for other
    payloads so plumbing tests keep stable expectations."""
    for pdf in batches:
        out = {k: [] for k in
               ("item_id", "width", "height", "n_channels", "mean_luma", "decode_ok")}
        for item_id, raw in zip(pdf["item_id"].values, pdf["payload"].values):
            out["item_id"].append(item_id)
            try:
                data = bytes(raw) if raw is not None else b""
                try:
                    img = decode_image(data)
                except UnsupportedMediaError:
                    img = _fake_image_decode(data)
                out["width"].append(int(img.shape[1]))
                out["height"].append(int(img.shape[0]))
                out["n_channels"].append(int(img.shape[2]))
                out["mean_luma"].append(float(img.mean()))
                out["decode_ok"].append(True)
            except UnsupportedMediaError:
                out["width"].append(0)
                out["height"].append(0)
                out["n_channels"].append(0)
                out["mean_luma"].append(0.0)
                out["decode_ok"].append(False)
        yield pd.DataFrame(out)


#: frame-sampling output schema (video = opaque binary + frame count meta)
VIDEO_FRAMES_SCHEMA = "item_id string, frame_index int, frame_fingerprint string"


def video_frame_sample_batches(
    sample_every: int = 10,
    frame_bytes: int = 256,
):
    """Returns a mapInPandas body sampling every Nth 'frame' of the payload
    (frames are stubbed as fixed-size byte windows; a real build plugs
    ffmpeg here).  Shows the 1→N row fan-out shape of frame extraction.
    Fingerprint is md5 of the frame bytes — deterministic across processes
    (unlike salted hash()) and reproducible by any SQL oracle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, fps = [], [], []
            for item_id, raw in zip(pdf["item_id"].values, pdf["payload"].values):
                data = bytes(raw) if raw is not None else b""
                n_frames = max(1, len(data) // frame_bytes)
                for i in range(0, n_frames, sample_every):
                    chunk = data[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(item_id)
                    idxs.append(i)
                    fps.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"item_id": ids, "frame_index": idxs, "frame_fingerprint": fps}
            )

    return fn
