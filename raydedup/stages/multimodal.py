"""Multimodal columns: opaque binary payloads with typed metadata.

Training-data-pipeline extension (BASELINE.md): images/audio/video are
``binary`` columns + metadata columns; decode / feature-extract /
resize / frame-sample run as actor-pool ``map_batches`` stages. The
image/audio codec libraries are NOT in this container, so the decode
step is STUBBED: ``decoder="fake"`` produces a deterministic pixel
tensor from the payload bytes (so every downstream stage — schema,
batching, actor signature, output layout — is real and tested), and
``decoder="pil"`` raises NotImplementedError until a codec is present.

The actor-pool shape mirrors the reference's one genuinely external
stage (the GPU event-point socket server,
``strategy/panako/PanakoGPUEventPointProcessor.java:34``): heavyweight
per-actor setup, per-batch inference.
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes -> (h, w, 3) uint8.

    A real deployment swaps this for PIL/ffmpeg INSIDE the same actor;
    nothing else changes."""
    seed = int.from_bytes(hashlib.blake2s(payload, digest_size=8).digest(), "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


class MediaDecodeKernel:
    """Actor-pool decode + feature extraction over binary media columns.

    __init__ loads the (stub) codec once per actor; __call__ decodes a
    batch and emits fixed-width features:
      media_id, kind, mean_rgb (fixed list f32 x 3), brightness f32,
      phash int64 (perceptual-hash stand-in: blake2s of the 8x8
      downsampled luma).
    Use small batch_size for large payloads (binary rows are wide).
    """

    def __init__(self, decoder: str = "fake", thumb: int = 8):
        if decoder == "fake":
            self.decode = _fake_decode
        elif decoder in ("pil", "ffmpeg"):
            raise NotImplementedError(
                f"decoder {decoder!r}: codec libraries are not available in "
                "this environment; use decoder='fake' (deterministic stub)"
            )
        else:
            raise ValueError(f"unknown decoder {decoder!r}")
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_numpy(zero_copy_only=False)
        heights = batch.column("height").to_numpy(zero_copy_only=False)
        n = len(payloads)
        mean_rgb = np.empty((n, 3), dtype=np.float32)
        brightness = np.empty(n, dtype=np.float32)
        phash = np.empty(n, dtype=np.int64)
        t = self.thumb
        for i in range(n):
            img = self.decode(payloads[i], int(widths[i]), int(heights[i]))
            mean_rgb[i] = img.reshape(-1, 3).mean(axis=0)
            luma = img.astype(np.float32).mean(axis=2)
            brightness[i] = luma.mean()
            # downsample to t x t by block mean, hash the sign pattern
            h, w = luma.shape
            ys = (np.arange(t) * h) // t
            xs = (np.arange(t) * w) // t
            small = luma[np.minimum(ys, h - 1)][:, np.minimum(xs, w - 1)]
            bits = (small > small.mean()).astype(np.uint8).ravel()
            phash[i] = int.from_bytes(
                hashlib.blake2s(bits.tobytes(), digest_size=8).digest(), "little", signed=True
            )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "mean_rgb": pa.FixedSizeListArray.from_arrays(
                    pa.array(mean_rgb.reshape(-1), type=pa.float32()), 3
                ),
                "brightness": pa.array(brightness, type=pa.float32()),
                "phash": pa.array(phash, type=pa.int64()),
            }
        )


def decode_media(
    media: Dataset, decoder: str = "fake", concurrency: int = 4, batch_size: int = 64
) -> Dataset:
    """Actor-pool decode stage; batch_size is small because payload rows
    are wide (object-store-friendly block sizing)."""
    return media.map_batches(
        MediaDecodeKernel,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"decoder": decoder},
    )


def frame_sample(media: Dataset, every_n: int = 10) -> Dataset:
    """Video frame sampling: one synthetic frame-row per sampled frame
    index (flat-map shape; the payload decode itself stays stubbed)."""

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_numpy(zero_copy_only=False)
        frames = t.column("n_frames").to_numpy(zero_copy_only=False)
        out_id, out_frame = [], []
        for i in range(t.num_rows):
            idxs = np.arange(0, max(int(frames[i]), 1), every_n, dtype=np.int64)
            out_id.append(np.full(idxs.shape[0], ids[i], dtype=np.int64))
            out_frame.append(idxs)
        return pa.table(
            {
                "media_id": pa.array(
                    np.concatenate(out_id) if out_id else np.empty(0, np.int64),
                    type=pa.int64(),
                ),
                "frame_index": pa.array(
                    np.concatenate(out_frame) if out_frame else np.empty(0, np.int64),
                    type=pa.int64(),
                ),
            }
        )

    return media.select_columns(["media_id", "n_frames"]).map_batches(
        explode, batch_format="pyarrow"
    )


def synthetic_media_table(n: int = 64, seed: int = 7) -> pa.Table:
    """Deterministic media fixture (binary payloads + typed metadata)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    kinds = ["image", "audio", "video"]
    rows: dict[str, list[Any]] = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(256, 2048)), dtype=np.uint8)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload.tobytes())
        rows["width"].append(int(rng.integers(16, 64)))
        rows["height"].append(int(rng.integers(16, 64)))
        rows["n_frames"].append(int(rng.integers(1, 120)) if kind == "video" else 1)
        rows["sample_rate"].append(16000 if kind == "audio" else 0)
    return pa.table(rows, schema=MEDIA_SCHEMA)
