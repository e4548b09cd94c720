"""Vendored baseline PNG codec (stages/png.py): round-trips, all five
scanline filters, palette resolution, pinned real-pixel hashes through
the media kernels (the ST5 real-codec gate, VERDICT r3 #4)."""

import hashlib
import struct
import zlib

import numpy as np
import pytest

from raydedup.stages.png import (
    PngError,
    _chunk,
    decode_png,
    decode_png_rgb,
    encode_png,
)


def _rng(seed=0):
    return np.random.Generator(np.random.PCG64(seed))


@pytest.mark.parametrize("shape", [(1, 1), (7, 3), (16, 16), (5, 31)])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip_exact(shape, channels):
    img = _rng(shape[0] * 100 + channels).integers(
        0, 256, size=(*shape, channels), dtype=np.uint8
    )
    out = decode_png(encode_png(img))
    want = img[:, :, 0] if channels == 1 else img
    np.testing.assert_array_equal(out, want)


def test_gray_2d_roundtrip_and_rgb_normalize():
    img = _rng(5).integers(0, 256, size=(9, 11), dtype=np.uint8)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img)
    rgb = decode_png_rgb(encode_png(img))
    assert rgb.shape == (9, 11, 3)
    np.testing.assert_array_equal(rgb[:, :, 0], img)
    np.testing.assert_array_equal(rgb[:, :, 1], img)
    # alpha drops
    rgba = _rng(6).integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png_rgb(encode_png(rgba)), rgba[:, :, :3])


def _encode_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-built PNG using the given per-scanline filter codes — tests
    that the DECODER handles every filter, since encode_png always
    writes filter 0."""
    h, w, c = img.shape
    out_rows = []
    prior = np.zeros(w * c, dtype=np.uint8)
    bpp = c
    for y in range(h):
        recon = img[y].reshape(-1)
        f = filters[y % len(filters)]
        if f == 0:
            filt = recon.copy()
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.uint8), recon[:-bpp]])
            filt = recon - left
        elif f == 2:
            filt = recon - prior
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.uint8), recon[:-bpp]])
            filt = recon - (
                (left.astype(np.uint16) + prior.astype(np.uint16)) // 2
            ).astype(np.uint8)
        elif f == 4:
            filt = np.empty(w * c, dtype=np.uint8)
            for x in range(w * c):
                a = int(recon[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                cc = int(prior[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else cc)
                filt[x] = (int(recon[x]) - pred) & 0xFF
        out_rows.append(bytes([f]) + filt.tobytes())
        prior = recon
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[c], 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"
    idat = zlib.compress(b"".join(out_rows), 6)
    return sig + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decoder_handles_all_filters(filters):
    img = _rng(42).integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    data = _encode_with_filters(img, filters)
    np.testing.assert_array_equal(decode_png(data), img)


def test_palette_decode():
    plte = _rng(9).integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = _rng(10).integers(0, 16, size=(6, 8), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 8, 6, 8, 3, 0, 0, 0)
    rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    sig = b"\x89PNG\r\n\x1a\n"
    data = (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte.tobytes())
        + _chunk(b"IDAT", zlib.compress(rows, 6))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(data), plte[idx])


def test_rejects_malformed():
    img = _rng(1).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(PngError, match="signature"):
        decode_png(b"nope" + good)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a byte of IEND's CRC
    with pytest.raises(PngError, match="CRC"):
        decode_png(bytes(bad_crc))
    # 16-bit depth rejected loudly
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"
    with pytest.raises(PngError, match="bit depth"):
        decode_png(
            sig
            + _chunk(b"IHDR", ihdr16)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
            + _chunk(b"IEND", b"")
        )


def test_encode_is_byte_deterministic():
    img = _rng(3).integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
    assert encode_png(img) == encode_png(img.copy())


def test_media_kernels_real_codec_pinned(ray_session):
    """The media actor-pool kernels over REAL PNG payloads: decoded
    pixel features are pinned by content hash — a codec regression
    (wrong unfilter, wrong channel order, wrong resize input) changes
    these digests. This is the real-codec counterpart of the stub-path
    oracle rows (q:media_thumbs)."""
    import ray.data as rd

    from raydedup.stages.multimodal import (
        decode_media,
        resize_media,
        synthetic_png_media_table,
    )

    tbl = synthetic_png_media_table(24, seed=7)
    ds = rd.from_arrow(tbl)

    thumbs = (
        resize_media(ds, size=8, decoder="png", concurrency=2, batch_size=8)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(thumbs) == 24
    blob = b"".join(bytes(v) for v in thumbs["thumb"])
    assert hashlib.sha256(blob).hexdigest() == _PINNED_THUMBS

    feats = (
        decode_media(ds, decoder="png", concurrency=2, batch_size=8)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    ph = feats["phash"].astype("int64").to_numpy().tobytes()
    assert hashlib.sha256(ph).hexdigest() == _PINNED_PHASH
    # gradient images: mean luma must sit mid-range, not stub noise
    assert 100 < feats["brightness"].mean() < 155

    # decoded-dimension sanity: a payload decodes to its metadata dims
    from raydedup.stages.png import decode_png_rgb

    row = tbl.slice(3, 1).to_pylist()[0]
    img = decode_png_rgb(row["payload"])
    assert img.shape == (row["height"], row["width"], 3)


_PINNED_THUMBS = "07a1de3205fac505f59e328d5c7ec369a27d470a2edc0cf980f44340aa26f551"
_PINNED_PHASH = "98c97405a51f066eee84fa2861db95ce479c13e4cfc9bfee651698015144ef25"


def test_all_malformed_paths_raise_pngerror():
    """Error contract (review r4): every malformed input raises
    PngError, never struct.error / zlib.error / numpy ValueError —
    callers classify bad media rows by catching PngError."""
    img = _rng(2).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    # chunk truncated before its CRC (cut through IEND into IDAT's CRC)
    with pytest.raises(PngError, match="truncated"):
        decode_png(good[:-14])
    # PLTE not a multiple of 3
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    bad = (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", b"\x01\x02\x03\x04")
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="PLTE"):
        decode_png(bad)
    # corrupt deflate stream (valid CRC, garbage IDAT bytes)
    ihdr2 = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bad2 = (
        sig
        + _chunk(b"IHDR", ihdr2)
        + _chunk(b"IDAT", b"\x99not-deflate")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="IDAT"):
        decode_png(bad2)
