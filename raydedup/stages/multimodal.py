"""Multimodal columns: opaque binary payloads with typed metadata.

Training-data-pipeline extension (BASELINE.md): images/audio/video are
``binary`` columns + metadata columns; decode / feature-extract /
resize / frame-sample run as actor-pool ``map_batches`` stages. Image
decode has a REAL path: ``decoder="png"`` runs the vendored
pure-Python baseline PNG codec (``stages/png.py`` — stdlib zlib, no
external library needed), so pixel values come from actual payloads;
``decoder="pil"`` auto-activates when PIL is importable (absent from
this container, loud NotImplementedError otherwise); ``decoder="fake"``
remains the deterministic stub for arbitrary binary payloads and the
audio/video paths whose codecs genuinely don't exist here.

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


def _png_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """REAL decode: baseline-PNG payload bytes -> (h, w, 3) uint8 via
    the vendored pure-Python codec (stages/png.py — stdlib zlib, no
    external image library). Closes ST5's stub gap: pixel values come
    from the actual payload, pinned by tests/test_png.py. The width/
    height metadata columns are advisory; the decoded dimensions win."""
    from raydedup.stages.png import decode_png_rgb

    return decode_png_rgb(payload)


def _resolve_image_decoder(decoder: str):
    """Shared decoder dispatch for the image kernels: 'fake' (stub),
    'png' (vendored pure-Python baseline codec — always available),
    'pil' (auto-activates when PIL is importable, loud otherwise),
    'ffmpeg' (never available in this container)."""
    if decoder == "fake":
        return _fake_decode
    if decoder == "png":
        return _png_decode
    if decoder == "pil":
        try:
            import io

            from PIL import Image  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "decoder 'pil': PIL is not importable in this environment; "
                "use decoder='png' (vendored baseline codec) or 'fake'"
            )

        def _pil_decode(payload: bytes, width: int, height: int) -> np.ndarray:
            img = Image.open(io.BytesIO(payload)).convert("RGB")
            return np.asarray(img, dtype=np.uint8)

        return _pil_decode
    if decoder == "ffmpeg":
        raise NotImplementedError(
            "decoder 'ffmpeg': codec libraries are not available in this "
            "environment; use decoder='png' or 'fake'"
        )
    raise ValueError(f"unknown decoder {decoder!r}")


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
        self.decode = _resolve_image_decoder(decoder)
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


def _explode_frame_rows(
    ids: np.ndarray, sizes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(media_id, per-row count) -> flat (media_id, local_index) rows —
    repeat/cumsum arithmetic, no per-row Python."""
    sizes = sizes.astype(np.int64)
    total = int(sizes.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    off = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(off, sizes)
    return np.repeat(ids.astype(np.int64), sizes), local


def frame_sample(media: Dataset, every_n: int = 10) -> Dataset:
    """Video frame sampling: one synthetic frame-row per sampled frame
    index (flat-map shape; the payload decode itself stays stubbed)."""

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_numpy(zero_copy_only=False)
        frames = np.maximum(
            t.column("n_frames").to_numpy(zero_copy_only=False).astype(np.int64), 1
        )
        sizes = (frames + every_n - 1) // every_n
        mid, local = _explode_frame_rows(ids, sizes)
        return pa.table(
            {
                "media_id": pa.array(mid, type=pa.int64()),
                "frame_index": pa.array(local * every_n, type=pa.int64()),
            }
        )

    return media.select_columns(["media_id", "n_frames"]).map_batches(
        explode, batch_format="pyarrow"
    )


def keyframe_sample(media: Dataset, rate: float = 0.1) -> Dataset:
    """Deterministic keyframe selection — the I-frame-extraction analog
    when no codec is present: frame f of media m is a keyframe iff
    f == 0 (codecs always key the first frame) or
    mix64(m * POLY_B + f) falls below ``rate`` of the hash space. The
    gate is a pure function of (media_id, frame_index), so sampling is
    partition-invariant, resumable, and SQL-mirrorable (q:media_keyframes
    hash-matches a DuckDB mirror of the same splitmix64 arithmetic)."""
    from raydedup.hashing import U64, hash_pair_u64

    thresh = U64(min(int(rate * 2.0**64), 2**64 - 1))

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_numpy(zero_copy_only=False)
        frames = np.maximum(
            t.column("n_frames").to_numpy(zero_copy_only=False).astype(np.int64), 1
        )
        mid, local = _explode_frame_rows(ids, frames)
        score = hash_pair_u64(mid.view(np.uint64), local.view(np.uint64))
        keep = (local == 0) | (score < thresh)
        return pa.table(
            {
                "media_id": pa.array(mid[keep], type=pa.int64()),
                "frame_index": pa.array(local[keep], type=pa.int64()),
            }
        )

    return media.select_columns(["media_id", "n_frames"]).map_batches(
        explode, batch_format="pyarrow"
    )


def _fake_decode_audio(payload: bytes, sample_rate: int, n_samples: int) -> np.ndarray:
    """Deterministic stand-in audio decoder: payload bytes -> float32 PCM
    in [-1, 1). A real deployment swaps in soundfile/ffmpeg inside the
    same actor; nothing else changes."""
    seed = int.from_bytes(hashlib.blake2s(payload, digest_size=8).digest(), "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    return (rng.random(n_samples, dtype=np.float32) * 2.0 - 1.0).astype(np.float32)


class AudioDecodeKernel:
    """Actor-pool audio decode + waveform features (the audio face of the
    ST5 media stage; the reference's entire front-end is audio decode —
    ``util/Key.java:85`` ffmpeg resample template).

    __init__ binds the (stub) codec once per actor; __call__ decodes a
    batch and emits per-row waveform features: media_id, duration_s,
    rms, peak, zero_crossing_rate. decoder='fake' synthesises a
    deterministic waveform from the payload bytes; real codec names
    raise until the library exists in the container.
    """

    def __init__(self, decoder: str = "fake", max_samples: int = 4096):
        self.is_wav = decoder == "wav"
        if decoder == "fake":
            self.decode = _fake_decode_audio
        elif decoder == "wav":
            # REAL decode: the vendored RIFF/PCM16 parser (stages/wavcodec.py)
            from raydedup.stages.wavcodec import decode_wav

            self._decode_wav = decode_wav
        elif decoder in ("soundfile", "ffmpeg"):
            raise NotImplementedError(
                f"decoder {decoder!r}: audio codec libraries are not available "
                "in this environment; use decoder='wav' (vendored PCM parser) "
                "or decoder='fake' (deterministic stub)"
            )
        else:
            raise ValueError(f"unknown decoder {decoder!r}")
        self.max_samples = max_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        rates = batch.column("sample_rate").to_numpy(zero_copy_only=False)
        n = len(payloads)
        duration = np.empty(n, dtype=np.float64)
        rms = np.empty(n, dtype=np.float32)
        peak = np.empty(n, dtype=np.float32)
        zcr = np.empty(n, dtype=np.float32)
        for i in range(n):
            if self.is_wav:
                s16, sr = self._decode_wav(payloads[i])
                wave = (s16[: self.max_samples].astype(np.float32)) / 32768.0
                sr = max(sr, 1)
                if wave.shape[0] == 0:
                    # a valid zero-length data chunk: all-zero features,
                    # true zero duration (a 1-sample pad would fake
                    # duration 1/sr and a NaN zcr — review finding)
                    duration[i] = 0.0
                    rms[i] = peak[i] = zcr[i] = 0.0
                    continue
            else:
                sr = max(int(rates[i]), 1)
                # stub length: one "sample per payload byte", capped — keeps
                # worker heap bounded however large the binary row is
                ns = min(len(payloads[i]), self.max_samples)
                wave = self.decode(payloads[i], sr, max(ns, 1))
            duration[i] = wave.shape[0] / sr
            rms[i] = np.sqrt(np.mean(wave * wave))
            peak[i] = np.abs(wave).max()
            zcr[i] = float(np.mean(np.signbit(wave[1:]) != np.signbit(wave[:-1])))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "duration_s": pa.array(duration, type=pa.float64()),
                "rms": pa.array(rms, type=pa.float32()),
                "peak": pa.array(peak, type=pa.float32()),
                "zero_crossing_rate": pa.array(zcr, type=pa.float32()),
            }
        )


class AudioFrameKernel:
    """Actor-pool REAL-decode audio framing in EXACT integer arithmetic:
    payload WAV bytes -> int16 samples -> per-frame
    (n_in_frame, sum_sq, peak, zero_crossings), all int64 — the audio
    analog of the reference's windowed event-point extraction
    (``OlafEventPointProcessor.java`` frame loop). Integer features
    exist so the DuckDB oracle can verify the DECODER itself: fixtures
    derive the waveform from the shared splitmix64 mirror, SQL
    regenerates the same samples and aggregates the same frames —
    hash-match proves the WAV parse end-to-end. Zero crossings count
    sign flips (negative <-> non-negative) between ADJACENT samples of
    the same frame."""

    def __init__(self, frame: int = 256):
        from raydedup.stages.wavcodec import decode_wav

        self.decode = decode_wav
        self.frame = int(frame)

    def __call__(self, batch: pa.Table) -> pa.Table:
        F = self.frame
        mids = batch.column("media_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        out_mid, out_frame, out_n, out_ss, out_pk, out_zc = [], [], [], [], [], []
        for i in range(len(payloads)):
            s16, _sr = self.decode(payloads[i])
            s = s16.astype(np.int64)
            ln = s.shape[0]
            if ln == 0:
                continue
            nf = (ln + F - 1) // F
            bounds = np.arange(nf, dtype=np.int64) * F
            ss = np.add.reduceat(s * s, bounds)
            pk = np.maximum.reduceat(np.abs(s), bounds)
            neg = s < 0
            cross = np.zeros(ln, dtype=np.int64)
            if ln > 1:
                cross[1:] = (neg[1:] != neg[:-1]).astype(np.int64)
                cross[bounds] = 0  # frame-local: no cross-frame pairs
            zc = np.add.reduceat(cross, bounds)
            n_in = np.diff(np.r_[bounds, ln])
            out_mid.append(np.full(nf, mids[i], dtype=np.int64))
            out_frame.append(np.arange(nf, dtype=np.int64))
            out_n.append(n_in.astype(np.int64))
            out_ss.append(ss)
            out_pk.append(pk)
            out_zc.append(zc)
        if not out_mid:
            return pa.schema(
                [("media_id", pa.int64()), ("frame", pa.int64()),
                 ("n_in_frame", pa.int64()), ("sum_sq", pa.int64()),
                 ("peak", pa.int64()), ("zero_crossings", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "media_id": pa.array(np.concatenate(out_mid)),
                "frame": pa.array(np.concatenate(out_frame)),
                "n_in_frame": pa.array(np.concatenate(out_n)),
                "sum_sq": pa.array(np.concatenate(out_ss)),
                "peak": pa.array(np.concatenate(out_pk)),
                "zero_crossings": pa.array(np.concatenate(out_zc)),
            }
        )


def audio_frames(
    media: Dataset, frame: int = 256, concurrency: int = 4, batch_size: int = 64
) -> Dataset:
    """Actor-pool REAL-WAV frame-feature stage (see AudioFrameKernel)."""
    return media.map_batches(
        AudioFrameKernel,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"frame": frame},
    )


def synthetic_wav_media_table(doc_ids: "np.ndarray", seed: int = 0xA0D10) -> pa.Table:
    """Deterministic REAL-WAV media fixture derived from doc ids: row i
    holds media_id = doc_id, a PCM16-mono WAV whose samples are
    s_j = (mix64(seed + doc_id * 2^20 + j) & 0xFFFF) - 32768 for
    j < n_samples = doc_id % 769 + 256 — the shared splitmix64 mirror,
    so the SQL oracle regenerates the identical waveform without
    parsing WAV bytes."""
    from raydedup.hashing import mix64
    from raydedup.stages.wavcodec import encode_wav

    ids = np.asarray(doc_ids, dtype=np.int64)
    payloads = []
    for d in ids.tolist():
        n = int(d % 769 + 256)
        j = np.arange(n, dtype=np.uint64)
        u = mix64(np.uint64(seed) + np.uint64(d) * np.uint64(1 << 20) + j)
        s = ((u & np.uint64(0xFFFF)).astype(np.int64) - 32768).astype(np.int16)
        payloads.append(encode_wav(s, 16000))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["audio"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array(np.full(len(ids), 16000, dtype=np.int64)),
        }
    )


def decode_audio(
    media: Dataset, decoder: str = "fake", concurrency: int = 4, batch_size: int = 64
) -> Dataset:
    """Actor-pool audio-decode stage over the audio rows of a media
    Dataset (small batch_size: binary rows are wide)."""
    return media.map_batches(
        AudioDecodeKernel,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"decoder": decoder},
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


def synthetic_png_media_table(n: int = 64, seed: int = 7) -> pa.Table:
    """Media fixture whose payloads are REAL baseline-PNG images
    (deterministic gradient + seeded noise, encoded by stages/png.py):
    the real-codec counterpart of synthetic_media_table, feedable to
    any image kernel with decoder='png'. All rows are kind='image';
    width/height metadata match the encoded dimensions."""
    from raydedup.stages.png import encode_png

    rng = np.random.Generator(np.random.PCG64(seed))
    rows: dict[str, list[Any]] = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        h = int(rng.integers(16, 64))
        w = int(rng.integers(16, 64))
        yy, xx = np.mgrid[0:h, 0:w]
        base = ((yy * 255) // max(h - 1, 1)).astype(np.uint8)
        img = np.stack(
            [
                base,
                ((xx * 255) // max(w - 1, 1)).astype(np.uint8),
                rng.integers(0, 256, size=(h, w), dtype=np.uint8),
            ],
            axis=2,
        )
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["payload"].append(encode_png(img))
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(1)
        rows["sample_rate"].append(0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class MediaResizeKernel:
    """Actor-pool image resize: decode (stub codec, loaded once per
    actor in __init__) then block-mean (area) downsample to a fixed
    ``size x size x 3`` uint8 thumbnail, emitted as a FixedSizeList
    column — the typed, fixed-width layout a training pipeline feeds to
    batched vision preprocessing. Deterministic: block boundaries are
    integer offset arithmetic, means are float64 then rounded half-up
    once. Real codec path gated exactly like MediaDecodeKernel."""

    def __init__(self, decoder: str = "fake", size: int = 16):
        self.decode = _resolve_image_decoder(decoder)
        if size < 1:
            raise ValueError("size must be >= 1")
        self.size = size

    def _resize(self, img: np.ndarray) -> np.ndarray:
        t = self.size
        h, w, _ = img.shape
        # block-mean area resample: pixel (i,j) of the thumb averages the
        # [yi, yi+1) x [xj, xj+1) block (integer boundaries, no overlap)
        yb = (np.arange(t + 1) * h) // t
        xb = (np.arange(t + 1) * w) // t
        yb = np.maximum(yb, np.arange(t + 1))  # every block >= 1 px when h >= t
        xb = np.maximum(xb, np.arange(t + 1))
        if h < t or w < t:  # tiny image: clamp to nearest-pixel gather
            ys = np.minimum((np.arange(t) * h) // t, h - 1)
            xs = np.minimum((np.arange(t) * w) // t, w - 1)
            return img[ys][:, xs]
        acc = np.add.reduceat(img.astype(np.float64), yb[:-1], axis=0)
        acc = np.add.reduceat(acc, xb[:-1], axis=1)
        area = (np.diff(yb)[:, None] * np.diff(xb)[None, :]).astype(np.float64)
        out = np.floor(acc / area[:, :, None] + 0.5)
        return out.astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_numpy(zero_copy_only=False)
        heights = batch.column("height").to_numpy(zero_copy_only=False)
        n = len(payloads)
        t = self.size
        thumbs = np.empty((n, t, t, 3), dtype=np.uint8)
        for i in range(n):
            img = self.decode(payloads[i], int(widths[i]), int(heights[i]))
            thumbs[i] = self._resize(img)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "thumb": pa.FixedSizeListArray.from_arrays(
                    pa.array(thumbs.reshape(-1), type=pa.uint8()), t * t * 3
                ),
                "thumb_size": pa.array(np.full(n, t, dtype=np.int64), pa.int64()),
            }
        )


def resize_media(
    media: Dataset,
    size: int = 16,
    decoder: str = "fake",
    concurrency: int = 4,
    batch_size: int = 32,
) -> Dataset:
    """Binary media rows -> fixed-size uint8 thumbnails (actor pool;
    small batches — binary rows are wide)."""
    return media.map_batches(
        MediaResizeKernel,
        fn_constructor_kwargs={"decoder": decoder, "size": size},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
