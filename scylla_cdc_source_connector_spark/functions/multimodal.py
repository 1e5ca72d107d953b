"""Multimodal column handling — opaque binary payloads + typed metadata.

Audio decode is fully real (audio.py, G.711/PCM in numpy).  Image and video
decode/resize/frame-sample require codec libraries not baked into this
container, so the *decode kernel* is stubbed behind UnsupportedMediaError /
a deterministic fake, while the Spark-side plumbing — schema, Arrow batch
shape, mapInPandas signature, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd


class UnsupportedMediaError(NotImplementedError):
    """Decoder for this media type is not available in this container."""


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
    per-image math vectorized."""
    for pdf in batches:
        out = {k: [] for k in
               ("item_id", "width", "height", "n_channels", "mean_luma", "decode_ok")}
        for item_id, raw in zip(pdf["item_id"].values, pdf["payload"].values):
            out["item_id"].append(item_id)
            try:
                img = _fake_image_decode(bytes(raw) if raw is not None else b"")
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
