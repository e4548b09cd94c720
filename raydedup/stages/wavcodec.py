"""Vendored PCM WAV codec (stdlib struct only) — the REAL audio decode
path for the media stage, closing the audio half of ST5 the way
``stages/png.py`` closed the image half. The reference's entire
front-end is audio decode (ffmpeg resample template,
``util/Key.java:85``; decode pipeline ``cli/Store.java`` ->
``PanakoStrategy.store``); this is its minimal faithful transplant:
RIFF/WAVE, PCM (format 1), 16-bit, mono.

Profile limits are LOUD (``WavError``), never silent garbage:
truncated files, non-RIFF payloads, compressed/float formats, multi-
channel and non-16-bit depths all raise with the offending field in
the message. Unknown RIFF chunks (LIST/fact/...) are skipped per spec.

``encode_wav`` writes the canonical 44-byte-header layout, so
encode->decode is byte-exact and deterministic — fixtures derive
waveforms from the shared splitmix64 mirror, which lets the DuckDB
oracle regenerate the SAME samples and verify the decoder end-to-end
without ever parsing a WAV itself (q:media_audio_frames).
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Malformed or out-of-profile WAV payload."""


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> canonical RIFF/PCM16 bytes (44 B header)."""
    s = np.ascontiguousarray(np.asarray(samples, dtype=np.int16))
    data = s.tobytes()
    byte_rate = sample_rate * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/PCM16-mono bytes -> (int16 samples, sample_rate).

    Walks the chunk list (skipping unknown chunks, honoring the spec's
    word alignment); loud ``WavError`` outside the profile."""
    if len(payload) < 12:
        raise WavError(f"truncated: {len(payload)} bytes, need >= 12")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavError(
            f"not a RIFF/WAVE payload (magic {payload[0:4]!r}/{payload[8:12]!r})"
        )
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise WavError(f"chunk {cid!r} truncated: {len(body)} of {size} bytes")
        if cid == b"fmt ":
            if size < 16:
                raise WavError(f"fmt chunk too small ({size} bytes)")
            audio_format, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_format != 1:
                raise WavError(f"audio format {audio_format} unsupported (PCM=1 only)")
            if channels != 1:
                raise WavError(f"{channels} channels unsupported (mono only)")
            if bits != 16:
                raise WavError(f"{bits}-bit depth unsupported (16-bit only)")
            fmt = rate
        elif cid == b"data":
            if data is not None:
                raise WavError("multiple data chunks")
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if pos != n and pos != n + 1:
        # pos == n + 1 is the final odd-sized chunk whose pad byte the
        # writer omitted (spec-tolerated); anything else is junk
        raise WavError(f"{n - pos} trailing bytes after the last chunk")
    if fmt is None:
        raise WavError("no fmt chunk")
    if data is None:
        raise WavError("no data chunk")
    if len(data) % 2:
        raise WavError(f"odd data chunk length {len(data)} for 16-bit samples")
    return np.frombuffer(data, dtype="<i2").astype(np.int16), int(fmt)
