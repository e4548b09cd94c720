"""Vendored WAV codec (stages/wavcodec.py) + real-decode audio frame
features: byte-exact round-trips, loud out-of-profile errors, unknown
chunk skipping, naive frame-feature parity, pinned fixture digest, and
the decode_audio kernel's real-codec branch."""

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pytest

from raydedup.stages.wavcodec import WavError, decode_wav, encode_wav


def _sig(n=1000, seed=3):
    rng = np.random.Generator(np.random.PCG64(seed))
    return (rng.integers(-32768, 32768, size=n)).astype(np.int16)


def test_roundtrip_exact():
    s = _sig()
    payload = encode_wav(s, 16000)
    back, rate = decode_wav(payload)
    assert rate == 16000
    np.testing.assert_array_equal(back, s)
    # canonical layout: deterministic bytes
    assert payload == encode_wav(s, 16000)
    assert len(payload) == 44 + 2 * len(s)


def test_unknown_chunks_skipped():
    s = _sig(64)
    payload = encode_wav(s, 8000)
    # splice a LIST chunk (odd size -> exercises word alignment) between
    # fmt and data
    head, data_chunk = payload[:36], payload[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = head + extra + data_chunk
    back, rate = decode_wav(spliced)
    assert rate == 8000
    np.testing.assert_array_equal(back, s)


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda p: p[:10], "truncated"),
        (lambda p: b"JUNK" + p[4:], "RIFF"),
        (lambda p: p.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1), "format"),
        (lambda p: p.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 1, 2), 1), "channels"),
        (lambda p: p[:34] + struct.pack("<H", 8) + p[36:], "bit"),
        (lambda p: p[:40] + struct.pack("<I", 7) + p[44:51], "odd|truncated"),
        (lambda p: p[:12], "fmt"),
    ],
)
def test_out_of_profile_is_loud(mutate, msg):
    import re

    payload = encode_wav(_sig(16), 16000)
    with pytest.raises(WavError) as ei:
        decode_wav(mutate(payload))
    assert re.search(msg, str(ei.value), re.I), str(ei.value)


def test_audio_frames_match_naive(ray_session):
    import ray.data as rd

    from raydedup.stages.multimodal import audio_frames, synthetic_wav_media_table

    ids = np.array([0, 3, 17, 500, 768], dtype=np.int64)
    media = synthetic_wav_media_table(ids)
    df = (
        audio_frames(rd.from_arrow(media), frame=256, concurrency=2, batch_size=2)
        .to_pandas().sort_values(["media_id", "frame"]).reset_index(drop=True)
    )
    from raydedup.hashing import mix64

    for d in ids.tolist():
        n = d % 769 + 256
        j = np.arange(n, dtype=np.uint64)
        u = mix64(np.uint64(0xA0D10) + np.uint64(d) * np.uint64(1 << 20) + j)
        s = ((u & np.uint64(0xFFFF)).astype(np.int64) - 32768)
        sub = df[df.media_id == d]
        assert len(sub) == (n + 255) // 256
        for f in range(len(sub)):
            seg = s[f * 256 : (f + 1) * 256]
            row = sub[sub.frame == f].iloc[0]
            assert int(row.n_in_frame) == len(seg)
            assert int(row.sum_sq) == int((seg * seg).sum())
            assert int(row.peak) == int(np.abs(seg).max())
            neg = seg < 0
            assert int(row.zero_crossings) == int((neg[1:] != neg[:-1]).sum())


def test_decode_audio_wav_branch(ray_session):
    import ray.data as rd

    from raydedup.stages.multimodal import decode_audio, synthetic_wav_media_table

    media = synthetic_wav_media_table(np.array([1, 2, 3], dtype=np.int64))
    df = decode_audio(
        rd.from_arrow(media), decoder="wav", concurrency=2, batch_size=2
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(df) == 3
    assert (df["peak"] <= 1.0).all() and (df["peak"] > 0.5).all()
    assert (df["duration_s"] > 0).all()
    # real decode differs from the fake stub on the same payloads
    fake = decode_audio(
        rd.from_arrow(media), decoder="fake", concurrency=2, batch_size=2
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert not np.allclose(df["rms"], fake["rms"])


def test_fixture_payload_digest_pinned():
    """Byte-deterministic fixture: the doc_id=42 WAV payload digest is
    pinned so any codec/fixture drift is loud."""
    from raydedup.stages.multimodal import synthetic_wav_media_table

    t = synthetic_wav_media_table(np.array([42], dtype=np.int64))
    payload = bytes(t.column("payload")[0].as_py())
    assert hashlib.sha256(payload).hexdigest() == (
        "d062198ad31f77eb4bf332a704cf02dd90e139b4015eb1d3ceca9f7a27c8691e"
    )
    assert len(payload) == 44 + 2 * (42 % 769 + 256)


def test_multiple_data_chunks_and_trailing_junk_loud():
    payload = encode_wav(_sig(8), 16000)
    data_chunk = payload[36:]
    with pytest.raises(WavError, match="multiple data"):
        decode_wav(payload + data_chunk)
    with pytest.raises(WavError, match="trailing"):
        decode_wav(payload + b"xyz")


def test_empty_data_chunk_zero_features(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from raydedup.stages.multimodal import decode_audio
    from raydedup.stages.wavcodec import encode_wav as enc

    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["audio"], pa.string()),
            "payload": pa.array([enc(np.array([], dtype=np.int16), 16000)], pa.binary()),
            "sample_rate": pa.array([16000], pa.int64()),
        }
    )
    df = decode_audio(rd.from_arrow(t), decoder="wav", concurrency=1, batch_size=1).to_pandas()
    assert float(df["duration_s"][0]) == 0.0
    assert float(df["rms"][0]) == 0.0 and float(df["zero_crossing_rate"][0]) == 0.0
