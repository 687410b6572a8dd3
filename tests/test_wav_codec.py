"""Clean-room WAV/RIFF codec tests (operators/multimodal.py round-6).

The codec backs ``media_wav_roundtrip`` — the audio counterpart of the
PNG entry: samples are encoded by Python's STDLIB ``wave`` writer and
decoded by the repo's clean-room RIFF parser, so the roundtrip pits
two independent implementations against each other. These tests pin
the spec behaviors the DuckDB oracle can't see: structural rejection
(magic, declared size, truncation, fmt inconsistency), RIFF even-byte
chunk padding, two's-complement signs at the extremes, and the exact
sample-derivation rule on a hand-computed fixture.
"""

from __future__ import annotations

import struct

import pytest

from backend_model_spark.operators.multimodal import (
    WAV_N,
    WAV_RATE,
    _wav_decode_pcm16,
    _wav_encode_pcm16,
    _wav_samples_from_bytes,
)


def test_encode_decode_roundtrip_extremes():
    s = [-32768, 32767, 0, -1, 1, 12345, -12345, 256] * 32
    rate, nch, dec = _wav_decode_pcm16(_wav_encode_pcm16(s, WAV_RATE))
    assert (rate, nch) == (WAV_RATE, 1)
    assert dec == s


def test_sample_derivation_fixture():
    """'AB' → bytes (65, 66) cyclically paired: every sample is
    65 + 256*66 = 16961 (positive branch)."""
    s = _wav_samples_from_bytes(b"AB")
    assert len(s) == WAV_N and set(s) == {16961}
    # high byte >= 0x80 takes the two's-complement branch:
    # (0x01, 0xFF) -> 0xFF01 = 65281 -> 65281 - 65536 = -255
    assert set(_wav_samples_from_bytes(b"\x01\xff")) == {-255}
    # odd-length payload: cyclic indexing wraps mid-pair
    # bytes (1,2,3): pairs (1,2),(3,1),(2,3),(1,2)... period 3 in i
    s3 = _wav_samples_from_bytes(bytes([1, 2, 3]))
    assert s3[0] == 1 + 256 * 2 and s3[1] == 3 + 256 * 1 and s3[2] == 2 + 256 * 3
    assert s3[3] == s3[0]


def test_decoder_rejects_corruption():
    wav = _wav_encode_pcm16([0] * 8, WAV_RATE)
    with pytest.raises(ValueError, match="not RIFF"):
        _wav_decode_pcm16(b"JUNK" + wav[4:])
    with pytest.raises(ValueError, match="size mismatch"):
        _wav_decode_pcm16(wav + b"\x00")
    with pytest.raises(ValueError, match="not WAVE"):
        _wav_decode_pcm16(wav[:8] + b"AVI " + wav[12:])
    # inconsistent fmt: corrupt block_align (offset 32 within the
    # canonical stdlib layout: RIFF(12) + 'fmt '+len(8) + 12 bytes in)
    bad = bytearray(wav)
    assert bad[12:16] == b"fmt "
    bad[32] ^= 0xFF
    bad_fixed = bytes(bad)
    with pytest.raises(ValueError):
        _wav_decode_pcm16(bad_fixed)


def test_decoder_honors_riff_padding():
    """A hand-built file with an odd-length junk chunk before 'data'
    must still parse: RIFF pads chunks to even byte boundaries."""
    pcm = struct.pack("<4h", 10, -10, 300, -300)
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    junk = b"\xab\xcd\xef"  # length 3 -> 1 pad byte
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"junk" + struct.pack("<I", len(junk)) + junk + b"\x00"
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, nch, dec = _wav_decode_pcm16(wav)
    assert (rate, nch, dec) == (WAV_RATE, 1, [10, -10, 300, -300])


def test_stdlib_reader_agrees_with_cleanroom_parser():
    """Close the loop the other way: Python's wave module reads back
    exactly the frames our parser extracted."""
    import io
    import wave

    s = _wav_samples_from_bytes(b"hello, wav")
    blob = _wav_encode_pcm16(s, WAV_RATE)
    _, _, dec = _wav_decode_pcm16(blob)
    with wave.open(io.BytesIO(blob), "rb") as r:
        assert r.getnchannels() == 1 and r.getframerate() == WAV_RATE
        ref = list(
            struct.unpack(f"<{r.getnframes()}h", r.readframes(r.getnframes()))
        )
    assert dec == ref == s


# --- property-based fuzzing (hypothesis) ----------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=600
    ),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
)
def test_roundtrip_property(samples, rate):
    """stdlib-wave encode → clean-room decode is the identity for any
    PCM16 signal at any common rate."""
    r, nch, dec = _wav_decode_pcm16(_wav_encode_pcm16(samples, rate))
    assert (r, nch, dec) == (rate, 1, samples)


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(min_size=1, max_size=400))
def test_sample_derivation_matches_direct_computation(payload):
    """The cyclic-pair two's-complement rule (the oracle's contract)
    against an independent int.from_bytes formulation."""
    s = _wav_samples_from_bytes(payload)
    n = len(payload)
    for i in (0, 1, WAV_N // 2, WAV_N - 1):
        pair = bytes([payload[(2 * i) % n], payload[(2 * i + 1) % n]])
        assert s[i] == int.from_bytes(pair, "little", signed=True)


@settings(max_examples=100, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=4, max_size=64
    ),
    flip=st.integers(min_value=0, max_value=10_000),
)
def test_structural_corruption_never_passes_silently(samples, flip):
    """Corrupting any byte of the RIFF STRUCTURE (first 44 header
    bytes: magic, sizes, fmt fields) either raises or — when it only
    touches a non-load-bearing field like the rate — still never
    corrupts the decoded samples silently into a DIFFERENT valid
    signal of the same shape."""
    blob = bytearray(_wav_encode_pcm16(samples, WAV_RATE))
    pos = flip % 44
    old = blob[pos]
    blob[pos] ^= 0xFF
    if blob[pos] == old:  # pragma: no cover - xor always changes
        return
    try:
        r, nch, dec = _wav_decode_pcm16(bytes(blob))
    except (ValueError, struct.error):
        return  # rejected: the desired outcome
    # accepted: the flipped byte must not have silently changed the
    # payload samples (e.g. a rate-field flip changes metadata only
    # when byte_rate consistency happens to still hold)
    assert dec == samples
