"""Minimal pure-Python baseline PNG codec (stdlib zlib + numpy).

Closes the ST5 "real codec" gap (VERDICT r3 #4) without any external
image library: the container has no PIL/libpng, but PNG's baseline
profile is zlib (stdlib) + per-scanline byte filters — enough to give
the multimodal actor-pool stages (``stages/multimodal.py``) a REAL
decode path whose output is pinned to actual pixel values, not the
deterministic stub. Reference analog: the GPU event-point server that
decodes real payloads out-of-process
(``strategy/panako/PanakoGPUEventPointProcessor.java:34``).

Scope (explicitly bounded, errors are loud):
- bit depth 8 only; color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); no Adam7 interlace; ancillary chunks are
  skipped; tRNS is ignored (alpha handling = channel drop).
- decoder implements ALL five scanline filters (None/Sub/Up/Average/
  Paeth) — None/Sub/Up vectorized (Sub is a mod-256 cumulative sum
  per channel phase), Average/Paeth per-pixel within the scanline
  (sequential by definition).
- encoder writes filter-0 scanlines with a fixed zlib level, so
  encode -> decode round-trips bit-exactly and encoded fixtures are
  byte-stable across runs/platforms.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, *, level: int = 6) -> bytes:
    """uint8 image array -> PNG bytes. Shapes: (h, w) or (h, w, 1) ->
    grayscale; (h, w, 3) -> RGB; (h, w, 4) -> RGBA. Filter 0 per
    scanline; fixed zlib level keeps output byte-deterministic."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise PngError(f"encode_png expects uint8, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3, 4):
        raise PngError(f"unsupported image shape {img.shape}")
    h, w, c = a.shape
    if h < 1 or w < 1:
        raise PngError("empty image")
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended to each scanline
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(filt: np.ndarray, fbytes: np.ndarray, bpp: int) -> np.ndarray:
    """(h, w*bpp) filtered bytes + per-row filter codes -> recon bytes."""
    h, stride = filt.shape
    recon = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(fbytes[y])
        row = filt[y]
        if f == 0:
            out = row.copy()
        elif f == 1:  # Sub: mod-256 cumulative sum per channel phase
            m = row.reshape(-1, bpp).astype(np.uint64)
            out = (np.cumsum(m, axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            out = row + prior  # uint8 wraps mod 256
        elif f == 3:  # Average (sequential in x)
            out = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(out[x - bpp]) if x >= bpp else 0
                out[x] = (int(row[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth (sequential in x)
            out = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(out[x - bpp]) if x >= bpp else 0
                up = int(prior[x])
                ul = int(prior[x - bpp]) if x >= bpp else 0
                out[x] = (int(row[x]) + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngError(f"unknown scanline filter {f}")
        recon[y] = out
        prior = out
    return recon


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array: (h, w) for grayscale, (h, w, c) for
    multi-channel; palette images resolve through their PLTE to
    (h, w, 3). Baseline profile only (see module docstring)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise PngError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    if data[:8] != _SIG:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):  # body or CRC cut off
            raise PngError("truncated chunk")
        body = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise PngError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            if length != 13:
                raise PngError("malformed IHDR")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            if length == 0 or length % 3:
                raise PngError("malformed PLTE (length not a multiple of 3)")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise PngError("missing IHDR")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8:
        raise PngError(f"unsupported bit depth {depth} (baseline profile: 8)")
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type}")
    if comp != 0 or filt_method != 0:
        raise PngError("unsupported compression/filter method")
    if interlace != 0:
        raise PngError("Adam7 interlace not supported (baseline profile)")
    if w < 1 or h < 1:
        raise PngError("empty image")
    c = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"corrupt IDAT stream: {e}") from e
    stride = w * c
    if len(raw) != h * (1 + stride):
        raise PngError("IDAT size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    recon = _unfilter(rows[:, 1:].copy(), rows[:, 0], c)
    if color_type == 3:
        if plte is None:
            raise PngError("palette image without PLTE")
        idx = recon.reshape(h, w)
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise PngError("palette index out of range")
        return plte[idx]
    img = recon.reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


def decode_png_rgb(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8: grayscale replicates, alpha drops.
    The canonical entry the media kernels use."""
    img = decode_png(data)
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] == 2:  # gray+alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    if img.shape[2] == 4:
        return np.ascontiguousarray(img[:, :, :3])
    return img
