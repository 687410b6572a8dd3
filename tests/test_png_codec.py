"""Clean-room PNG codec tests (operators/multimodal.py round-6).

The codec backs ``media_png_roundtrip`` — the one multimodal entry
whose decode step is REAL (stdlib zlib + struct, written from the
public PNG specification). These tests pin the spec behaviors the
oracle can't see: all five filter types reconstruct, CRC corruption
is rejected, and the emitted bytes form a structurally valid PNG.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from backend_model_spark.operators.multimodal import (
    _PNG_SIG,
    _paeth,
    _png_chunk,
    _png_decode_gray8,
    _png_encode_gray8,
)


def test_encode_decode_roundtrip_all_sizes():
    for w, h in [(1, 1), (3, 2), (16, 16), (7, 5)]:
        pix = bytes((i * 37 + 11) % 256 for i in range(w * h))
        assert _png_decode_gray8(_png_encode_gray8(pix, w, h)) == (w, h, pix)


def test_decoder_reconstructs_all_five_filters():
    """Hand-build an IDAT using every filter type (the encoder only
    emits 0/1/2) so Average and Paeth reconstruction is exercised."""
    w, h = 4, 5
    pix = bytes((i * 53 + 7) % 256 for i in range(w * h))
    rows = [pix[r * w : (r + 1) * w] for r in range(h)]
    raw = bytearray()
    prev = bytes(w)
    for r, row in enumerate(rows):
        ftype = r % 5
        raw.append(ftype)
        for i in range(w):
            a = row[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            x = row[i]
            if ftype == 0:
                enc = x
            elif ftype == 1:
                enc = x - a
            elif ftype == 2:
                enc = x - b
            elif ftype == 3:
                enc = x - (a + b) // 2
            else:
                enc = x - _paeth(a, b, c)
            raw.append(enc & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    assert _png_decode_gray8(png) == (w, h, pix)


def test_crc_corruption_rejected():
    png = bytearray(_png_encode_gray8(bytes(range(16)) * 16, 16, 16))
    # flip one bit inside the IDAT payload (after the 8-byte sig,
    # 25-byte IHDR chunk, 8-byte IDAT header)
    png[8 + 25 + 8 + 2] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        _png_decode_gray8(bytes(png))


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        _png_decode_gray8(b"GIF89a" + b"\x00" * 64)


def test_emitted_png_is_structurally_valid():
    """Walk the chunk framing independently of the decoder."""
    png = _png_encode_gray8(bytes(256), 16, 16)
    assert png[:8] == _PNG_SIG
    pos, tags = 8, []
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        body = png[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", png[pos + 8 + length : pos + 12 + length])
        assert zlib.crc32(tag + body) & 0xFFFFFFFF == crc
        tags.append(tag)
        pos += 12 + length
    assert tags == [b"IHDR", b"IDAT", b"IEND"]


# --- property-based fuzzing (hypothesis, round-6 second session) -----------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    data=st.data(),
)
def test_roundtrip_property(w, h, data):
    """encode → decode is the identity for any gray8 image shape."""
    pix = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    assert _png_decode_gray8(_png_encode_gray8(pix, w, h)) == (w, h, pix)


@settings(max_examples=100, deadline=None)
@given(
    pix=st.binary(min_size=16, max_size=64),
    flip=st.integers(min_value=8, max_value=10_000),
)
def test_idat_corruption_is_always_caught(pix, flip):
    """Any bit flip past the signature is caught: either a CRC
    mismatch / structural error, or zlib fails to inflate — a PNG
    decode can never silently return different pixels (that is the
    point of per-chunk CRC-32)."""
    import zlib as _zlib

    side = 4
    png = bytearray(_png_encode_gray8(pix[: side * side].ljust(side * side, b"\0"), side, side))
    pos = 8 + (flip % (len(png) - 8))
    png[pos] ^= 0x01
    try:
        _, _, dec = _png_decode_gray8(bytes(png))
    except (ValueError, _zlib.error, struct.error):
        return
    raise AssertionError("corrupted PNG decoded without error")


def test_decode_and_resize_batches_match_numpy_reference():
    """Round 7: media_decode_features / media_resize run the REAL
    codec. Prove the full batch path (cyclic pad -> PNG encode ->
    decode -> [NN resample]) against an independent numpy reference
    that never touches the codec — so the PNG cycle must be a pixel
    identity and the kernel's index math must be the documented
    (r*h//rh, c*w//rw) map."""
    import math

    import numpy as np
    import pandas as pd

    from backend_model_spark.operators.multimodal import (
        DECODE_SIDE_MOD,
        RESIZE_TARGET,
        _decode_batch,
        _resize_batch,
    )

    rng = np.random.RandomState(5)
    payloads = [bytes(rng.randint(0, 256, size=k, dtype=np.uint8)) for k in (1, 7, 31, 32, 33, 200, 1023)]
    pdf = pd.DataFrame(
        {
            "media_id": np.arange(len(payloads), dtype="int64"),
            "kind": ["text-blob"] * len(payloads),
            "payload": payloads,
        }
    )

    dec = pd.concat(list(_decode_batch(iter([pdf]))))
    rez = pd.concat(list(_resize_batch(iter([pdf]))))
    for i, src in enumerate(payloads):
        n = len(src)
        w = n % DECODE_SIDE_MOD + 1
        h = (n // DECODE_SIDE_MOD) % DECODE_SIDE_MOD + 1
        pix = np.resize(np.frombuffer(src, dtype=np.uint8), w * h)
        drow = dec[dec["media_id"] == i].iloc[0]
        assert (drow["width"], drow["height"]) == (w, h)
        assert drow["mean_px_micros"] == math.floor(
            pix.sum() / float(w * h) * 1_000_000.0 + 0.5
        )
        img = pix.reshape(h, w)
        rw = max(w * RESIZE_TARGET // max(w, h), 1)
        rh = max(h * RESIZE_TARGET // max(w, h), 1)
        ref = img[(np.arange(rh) * h) // rh][:, (np.arange(rw) * w) // rw]
        rrow = rez[rez["media_id"] == i].iloc[0]
        assert (rrow["resized_w"], rrow["resized_h"]) == (rw, rh)
        assert rrow["n_pixels"] == rw * rh
        assert rrow["mean_resized_micros"] == math.floor(
            int(ref.sum()) / float(rw * rh) * 1_000_000.0 + 0.5
        )


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=1, max_size=1200))
def test_decode_batch_matches_numpy_reference_fuzzed(data):
    """Property form of the fixed-size reference test: for ANY payload
    the decode batch's (dims, mean) must equal the codec-free numpy
    reference — so the PNG cycle is a pixel identity at every
    geometry the length map can produce."""
    import math

    import numpy as np
    import pandas as pd

    from backend_model_spark.operators.multimodal import (
        DECODE_SIDE_MOD,
        _decode_batch,
    )

    pdf = pd.DataFrame(
        {"media_id": [0], "kind": ["text-blob"], "payload": [data]}
    )
    out = pd.concat(list(_decode_batch(iter([pdf]))))
    n = len(data)
    w = n % DECODE_SIDE_MOD + 1
    h = (n // DECODE_SIDE_MOD) % DECODE_SIDE_MOD + 1
    pix = np.resize(np.frombuffer(data, dtype=np.uint8), w * h)
    row = out.iloc[0]
    assert (row["width"], row["height"], row["n_bytes"]) == (w, h, n)
    assert row["mean_px_micros"] == math.floor(
        pix.sum() / float(w * h) * 1_000_000.0 + 0.5
    )


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=1, max_size=1200))
def test_resize_batch_matches_numpy_reference_fuzzed(data):
    """The resize kernel's (r*h//rh, c*w//rw) index map holds for any
    payload geometry, including extreme aspect ratios (w=1 or h=1,
    where the fit UPSCALES the short edge)."""
    import math

    import numpy as np
    import pandas as pd

    from backend_model_spark.operators.multimodal import (
        DECODE_SIDE_MOD,
        RESIZE_TARGET,
        _resize_batch,
    )

    pdf = pd.DataFrame({"media_id": [0], "payload": [data]})
    out = pd.concat(list(_resize_batch(iter([pdf]))))
    n = len(data)
    w = n % DECODE_SIDE_MOD + 1
    h = (n // DECODE_SIDE_MOD) % DECODE_SIDE_MOD + 1
    img = np.resize(np.frombuffer(data, dtype=np.uint8), w * h).reshape(h, w)
    rw = max(w * RESIZE_TARGET // max(w, h), 1)
    rh = max(h * RESIZE_TARGET // max(w, h), 1)
    ref = img[(np.arange(rh) * h) // rh][:, (np.arange(rw) * w) // rw]
    row = out.iloc[0]
    assert (row["resized_w"], row["resized_h"]) == (rw, rh)
    assert row["mean_resized_micros"] == math.floor(
        int(ref.sum()) / float(rw * rh) * 1_000_000.0 + 0.5
    )
