"""Multimodal-column operators: opaque ``binary`` payloads + typed
metadata, with Arrow-batched decode/feature plumbing (BASELINE.json
north-star extension; no multimodal surface exists in the reference —
SURVEY.md §1.1 notes its single flat table).

The container has no image/audio libraries, but PNG needs none
(stdlib zlib + struct), so since round 7 EVERY decode-shaped entry in
this module runs a REAL codec: the clean-room PNG encoder/decoder
below (CRC-verified chunks, zlib inflate, five-filter scanline
reconstruction) backs ``decode_features``, ``media_resize`` and
``png_roundtrip``; ``wav_roundtrip`` decodes real RIFF/PCM16. A
production build would swap the codec call for PIL / torchaudio /
pyav behind the same ``mapInPandas`` signature.

Scale notes: payloads stay opaque bytes end-to-end (no base64 blowup,
no driver round-trip); decode runs as Arrow-batched ``mapInPandas`` so
each task streams record batches; at 100 TB the media table would be
bucketed by content-hash prefix to parallelize without skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from backend_model_spark.sources.tables import load_table, spread


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table: documents' text bytes as opaque
    payloads with typed metadata — the schema a real image/audio table
    would have (payload binary + kind + size)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text-blob").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.length(F.col("text")).alias("declared_chars"),
        ).alias("meta"),
    )


def payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column stats per kind/lang: proves the opaque-payload
    path (encode → binary length) without ever decoding."""
    media = media_table(spark, sf_dir)
    return (
        media.groupBy("kind", F.col("meta.lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max(F.length("payload")).alias("max_bytes"),
        )
        .orderBy("kind", "lang")
    )


PAYLOAD_STATS_ORACLE = """
SELECT
  'text-blob' AS kind,
  lang,
  COUNT(*) AS n_media,
  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
  CAST(MAX(octet_length(encode(text))) AS INTEGER) AS max_bytes
FROM documents
GROUP BY lang
ORDER BY kind, lang
"""


DECODE_SIDE_MOD = 32  # synthetic image geometry: w = n%32+1, h = (n//32)%32+1

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_px_micros", T.LongType()),
    ]
)


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL codec decode (round 7; replaces the round-1 stub): each
    payload is encoded into a genuine grayscale PNG of the synthetic
    geometry (variable w×h, pixels = payload bytes cyclically padded,
    alternating scanline filters), then decoded back through the full
    clean-room path — signature check, per-chunk CRC-32, zlib
    inflate, filter reconstruction. width/height come from the
    decoded IHDR and mean intensity from the decoded pixels, so a
    decoder that mis-unfilters a scanline or inflates incorrectly
    changes the hashed output."""
    import math

    import numpy as np

    for pdf in batches:
        ids, kinds, nb, ws, hs, means = [], [], [], [], [], []
        for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
            src = bytes(payload)
            n = len(src)
            if not n:
                continue
            w0 = n % DECODE_SIDE_MOD + 1
            h0 = (n // DECODE_SIDE_MOD) % DECODE_SIDE_MOD + 1
            pix = np.resize(np.frombuffer(src, dtype=np.uint8), w0 * h0)
            png = _png_encode_gray8(pix.tobytes(), w0, h0)
            w, h, dec = _png_decode_gray8(png)
            s = sum(dec)
            ids.append(mid)
            kinds.append(kind)
            nb.append(n)
            ws.append(w)
            hs.append(h)
            means.append(int(math.floor(s / float(len(dec)) * 1_000_000.0 + 0.5)))
        yield pd.DataFrame(
            {
                "media_id": pd.Series(ids, dtype="int64"),
                "kind": pd.Series(kinds, dtype="object"),
                "n_bytes": pd.Series(nb, dtype="int32"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "mean_px_micros": pd.Series(means, dtype="int64"),
            }
        )


def decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract over the media table via
    ``mapInPandas`` — REAL codec semantics since round 7: a genuine
    PNG encode → decode cycle per payload (clean-room codec below),
    emitting decoded dimensions and mean intensity.

    Scale: the payload column flows executor-side only; pure-Python
    codec work is the per-row-expensive stage, so the single-split
    local scan is ``spread()`` first (measured 7.2× win at 10× for
    the sibling png_roundtrip; no-op on a many-split production
    scan)."""
    media = spread(
        media_table(spark, sf_dir).filter(F.length("payload") > 0)
    )
    return media.mapInPandas(_decode_batch, schema=_DECODE_SCHEMA).orderBy(
        "media_id"
    )


# The oracle recomputes every decoded pixel from the source text with
# the same cyclic-padding rule — byte-true indexing via
# hex(encode(text)) (two hex chars per BYTE; ascii(substr(...)) walks
# CHARACTERS and diverges on multi-byte text — round-6 review).
DECODE_FEATURES_ORACLE = f"""
WITH src AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE octet_length(encode(text)) > 0
),
dims AS (
  SELECT media_id, hx, n,
         n % {DECODE_SIDE_MOD} + 1 AS w,
         (n // {DECODE_SIDE_MOD}) % {DECODE_SIDE_MOD} + 1 AS h
  FROM src
),
px AS (
  SELECT media_id, n, w, h,
    list_sum(list_transform(
      generate_series(0, w * h - 1),
      i -> CAST('0x' || substr(hx, 2 * (i % n) + 1, 2) AS BIGINT)
    )) AS s
  FROM dims
)
SELECT
  media_id,
  'text-blob' AS kind,
  CAST(n AS INTEGER) AS n_bytes,
  CAST(w AS INTEGER) AS width,
  CAST(h AS INTEGER) AS height,
  CAST(FLOOR(s / (w * h) * 1000000.0 + 0.5) AS BIGINT) AS mean_px_micros
FROM px
ORDER BY media_id
"""


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: split each payload into fixed 256-byte
    'frames', keep every 4th — the video-keyframe pattern, as a
    JVM-side array op (no Python). Returns per-media frame counts."""
    media = media_table(spark, sf_dir)
    n_frames = F.ceil(F.length("payload") / F.lit(256.0)).cast("int")
    sampled = F.when(
        n_frames > 0, ((n_frames - 1) / F.lit(4)).cast("int") + 1
    ).otherwise(0)
    return (
        media.select(
            "media_id",
            n_frames.alias("n_frames"),
            sampled.alias("n_sampled_frames"),
        )
        .orderBy("media_id")
    )


FRAME_SAMPLE_ORACLE = """
SELECT
  doc_id AS media_id,
  CAST(CEIL(octet_length(encode(text)) / 256.0) AS INTEGER) AS n_frames,
  -- explicit FLOOR: DuckDB '//' on DOUBLE is plain division, and its
  -- double->int CAST rounds (Spark's truncates)
  CASE WHEN CEIL(octet_length(encode(text)) / 256.0) > 0
       THEN CAST(FLOOR((CEIL(octet_length(encode(text)) / 256.0) - 1) / 4) + 1 AS INTEGER)
       ELSE 0 END AS n_sampled_frames
FROM documents
ORDER BY media_id
"""


def media_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary dedup on the payload digest — the multimodal twin
    of text exact-dedup (identical bytes ⇒ identical media), reported
    per kind. md5 runs directly over the BINARY column: no decode, no
    base64 round-trip, engine-portable digests.

    Scale: one shuffle on the digest (uniform); at 100 TB this is the
    first pass of any media pipeline — dedup by bytes before paying
    for a single decode.
    """
    media = media_table(spark, sf_dir)
    return (
        media.withColumn("digest", F.md5(F.col("payload")))
        .groupBy("kind", "digest")
        .agg(
            F.min("media_id").alias("canonical_media_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.length("payload")).alias("payload_bytes"),
        )
        .orderBy("canonical_media_id")
    )


# DuckDB's md5 only accepts VARCHAR, hashing its UTF-8 bytes — which
# are exactly the payload bytes (encode(text,'UTF-8')), so md5(text)
# equals Spark's md5 over the binary column.
CONTENT_DEDUP_ORACLE = """
SELECT
  'text-blob' AS kind,
  md5(text) AS digest,
  MIN(doc_id) AS canonical_media_id,
  COUNT(*) AS n_copies,
  CAST(MIN(octet_length(CAST(encode(text) AS BLOB))) AS INTEGER)
    AS payload_bytes
FROM documents
GROUP BY digest
ORDER BY canonical_media_id
"""


RESIZE_TARGET = 32  # longest-edge target, aspect-preserving

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_w", T.IntegerType()),
        T.StructField("resized_h", T.IntegerType()),
        T.StructField("n_pixels", T.IntegerType()),
        T.StructField("mean_resized_micros", T.LongType()),
    ]
)


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL resize kernel (round 7; replaces the round-1 stub): decode
    the payload's PNG (same encode→decode cycle as
    :func:`_decode_batch`, CRC + inflate + filter reconstruction),
    then nearest-neighbor resample the decoded pixel grid into the
    aspect-preserving RESIZE_TARGET fit — source pixel for resized
    (r, c) is (r*h//rh, c*w//rw), pure integer index math so the
    oracle can recompute every resized pixel from the source text."""
    import math

    import numpy as np

    for pdf in batches:
        ids, ws, hs, rws, rhs, nps, means = [], [], [], [], [], [], []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            src = bytes(payload)
            n = len(src)
            if not n:
                continue
            w0 = n % DECODE_SIDE_MOD + 1
            h0 = (n // DECODE_SIDE_MOD) % DECODE_SIDE_MOD + 1
            pix = np.resize(np.frombuffer(src, dtype=np.uint8), w0 * h0)
            png = _png_encode_gray8(pix.tobytes(), w0, h0)
            w, h, dec = _png_decode_gray8(png)
            img = np.frombuffer(dec, dtype=np.uint8).reshape(h, w)
            long_edge = max(w, h)
            rw = max(w * RESIZE_TARGET // long_edge, 1)
            rh = max(h * RESIZE_TARGET // long_edge, 1)
            rows = (np.arange(rh, dtype=np.int64) * h) // rh
            cols = (np.arange(rw, dtype=np.int64) * w) // rw
            resized = img[rows][:, cols]
            s = int(resized.sum(dtype=np.int64))
            ids.append(mid)
            ws.append(w)
            hs.append(h)
            rws.append(rw)
            rhs.append(rh)
            nps.append(rw * rh)
            means.append(
                int(math.floor(s / float(rw * rh) * 1_000_000.0 + 0.5))
            )
        yield pd.DataFrame(
            {
                "media_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "resized_w": pd.Series(rws, dtype="int32"),
                "resized_h": pd.Series(rhs, dtype="int32"),
                "n_pixels": pd.Series(nps, dtype="int32"),
                "mean_resized_micros": pd.Series(means, dtype="int64"),
            }
        )


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode→resize over the media table via
    ``mapInPandas`` — the image-training preproc stage with a REAL
    codec and a REAL nearest-neighbor kernel on decoded pixels
    (round 7; the round-1 byte-arithmetic stub is gone).

    Scale: the payload column flows executor-side only (never through
    the driver); each task streams Arrow record batches through the
    Python worker, which is exactly the shape a real vision-preproc
    stage (decode, resize, normalize, patchify) runs at 100 TB; the
    per-row-expensive Python stage rides a ``spread()`` scan."""
    media = spread(
        media_table(spark, sf_dir).filter(F.length("payload") > 0)
    )
    return media.mapInPandas(_resize_batch, schema=_RESIZE_SCHEMA).orderBy(
        "media_id"
    )


# Every resized pixel recomputed from the source text: flat source
# index ((r*h//rh)*w + (c*w//rw)) % n with byte-true hex indexing.
# '//' on DuckDB BIGINTs is integer division; GREATEST mirrors max().
MEDIA_RESIZE_ORACLE = f"""
WITH src AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE octet_length(encode(text)) > 0
),
dims AS (
  SELECT media_id, hx, n,
         n % {DECODE_SIDE_MOD} + 1 AS w,
         (n // {DECODE_SIDE_MOD}) % {DECODE_SIDE_MOD} + 1 AS h
  FROM src
),
fit AS (
  SELECT media_id, hx, n, w, h,
    GREATEST(w * {RESIZE_TARGET} // GREATEST(w, h), 1) AS rw,
    GREATEST(h * {RESIZE_TARGET} // GREATEST(w, h), 1) AS rh
  FROM dims
),
px AS (
  SELECT media_id, w, h, rw, rh,
    list_sum(list_transform(
      generate_series(0, rw * rh - 1),
      i -> CAST('0x' || substr(
             hx,
             2 * ((((i // rw) * h // rh) * w + ((i % rw) * w // rw)) % n) + 1,
             2
           ) AS BIGINT)
    )) AS s
  FROM fit
)
SELECT
  media_id,
  CAST(w AS INTEGER) AS width,
  CAST(h AS INTEGER) AS height,
  CAST(rw AS INTEGER) AS resized_w,
  CAST(rh AS INTEGER) AS resized_h,
  CAST(rw * rh AS INTEGER) AS n_pixels,
  CAST(FLOOR(s / (rw * rh) * 1000000.0 + 0.5) AS BIGINT)
    AS mean_resized_micros
FROM px
ORDER BY media_id
"""


# ---------------------------------------------------------------------------
# Real PNG roundtrip — the one decode path with an actual codec.
#
# The container has no image libraries, but PNG needs none: the format
# is zlib (stdlib) + per-scanline filters + CRC-32 chunk framing, all
# implemented here clean-room from the public PNG specification
# (RFC 2083 / ISO 15948). This upgrades the multimodal family from
# "stub codec, real plumbing" to one entry whose decode step is REAL:
# the pipeline encodes each document's bytes into a genuine 16x16
# grayscale PNG (varying scanline filters), then decodes it back —
# signature check, per-chunk CRC-32 verification, zlib inflate,
# filter reconstruction — and emits pixel-level facts that a DuckDB
# oracle recomputes from the source text, so every pixel is
# independently verified cross-engine.
# ---------------------------------------------------------------------------

PNG_SIDE = 16  # fixed 16x16 tiles: 256 pixels, cyclically padded
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    body = tag + data
    return (
        struct.pack(">I", len(data))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def _png_encode_gray8(pixels: bytes, width: int, height: int) -> bytes:
    """Encode 8-bit grayscale pixels as a real PNG. Scanline filters
    alternate None/Sub/Up (row % 3) so a decoder that skips filter
    reconstruction cannot pass the roundtrip check."""
    import struct
    import zlib

    assert len(pixels) == width * height
    raw = bytearray()
    prev = bytes(width)
    for r in range(height):
        row = pixels[r * width : (r + 1) * width]
        ftype = r % 3
        raw.append(ftype)
        if ftype == 0:  # None
            raw.extend(row)
        elif ftype == 1:  # Sub (bpp=1)
            raw.extend(
                (row[i] - (row[i - 1] if i else 0)) & 0xFF
                for i in range(width)
            )
        else:  # Up
            raw.extend((row[i] - prev[i]) & 0xFF for i in range(width))
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_decode_gray8(data: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit grayscale PNG: signature, chunk walk with
    CRC-32 verification, zlib inflate, full five-filter scanline
    reconstruction (None/Sub/Up/Average/Paeth)."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("decompressed size mismatch")
    out = bytearray()
    prev = bytes(width)
    for r in range(height):
        ftype = raw[r * stride]
        line = raw[r * stride + 1 : (r + 1) * stride]
        rec = bytearray(width)
        for i in range(width):
            a = rec[i - 1] if i else 0  # left (bpp=1)
            b = prev[i]  # up
            c = prev[i - 1] if i else 0  # up-left
            x = line[i]
            if ftype == 0:
                v = x
            elif ftype == 1:
                v = x + a
            elif ftype == 2:
                v = x + b
            elif ftype == 3:
                v = x + (a + b) // 2
            elif ftype == 4:
                v = x + _paeth(a, b, c)
            else:
                raise ValueError(f"bad filter type {ftype}")
            rec[i] = v & 0xFF
        out.extend(rec)
        prev = bytes(rec)
    return width, height, bytes(out)


_PNG_RT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_px_micros", T.LongType()),
        T.StructField("px_polyhash", T.LongType()),
        T.StructField("roundtrip_ok", T.BooleanType()),
    ]
)

_PH_MOD = 1_000_000_007


def _png_roundtrip_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Encode payload bytes → real PNG → decode → pixel facts.

    Pixels: the payload's bytes cyclically repeated to fill the fixed
    16x16 tile (so the oracle can recompute every pixel from the
    source text with modular indexing). roundtrip_ok asserts decoded
    == source pixels bit-for-bit — through a real deflate cycle and
    three different scanline filters."""
    import math

    for pdf in batches:
        ids, ws, hs, means, hashes, oks = [], [], [], [], [], []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            src = bytes(payload)
            if not src:
                continue
            n = len(src)
            pix = bytes(
                src[i % n] for i in range(PNG_SIDE * PNG_SIDE)
            )
            png = _png_encode_gray8(pix, PNG_SIDE, PNG_SIDE)
            w, h, dec = _png_decode_gray8(png)
            s = sum(dec)
            ph = sum((i + 1) * v for i, v in enumerate(dec)) % _PH_MOD
            ids.append(mid)
            ws.append(w)
            hs.append(h)
            means.append(
                int(math.floor(s / float(len(dec)) * 1_000_000.0 + 0.5))
            )
            hashes.append(ph)
            oks.append(dec == pix)
        yield pd.DataFrame(
            {
                "media_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "mean_px_micros": pd.Series(means, dtype="int64"),
                "px_polyhash": pd.Series(hashes, dtype="int64"),
                "roundtrip_ok": pd.Series(oks, dtype="bool"),
            }
        )


def png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec media entry: payload → PNG encode → PNG decode →
    pixel facts, all inside one Arrow-batched ``mapInPandas`` stage
    (narrow, zero shuffles before the final orderBy; the PNG bytes
    never leave the executor).

    The DuckDB oracle recomputes width/height (fixed tile), the mean
    pixel (micros) and a positional polynomial hash of every pixel
    from the source text with the same cyclic-padding rule, plus
    literal TRUE for roundtrip_ok — so a decoder that mis-unfilters a
    single scanline, inflates incorrectly, or silently skips CRC
    breaks the hash."""
    # pure-Python codec work is the most per-row-expensive stage in the
    # repo — spread() the single-split local scan so all cores decode
    # (no-op on a many-split production scan); measured 6.8x -> ~1x
    # wall at 10x data on 32 cores (SCALE.md round 6)
    media = spread(
        media_table(spark, sf_dir).filter(F.length("payload") > 0)
    )
    return media.mapInPandas(
        _png_roundtrip_batch, schema=_PNG_RT_SCHEMA
    ).orderBy("media_id")


# NOTE the byte-true indexing: the Spark side consumes the UTF-8
# PAYLOAD BYTES, so the oracle must too. ascii(substr(text, ...))
# walks CHARACTERS and returns CODEPOINTS — identical to bytes only
# for pure-ASCII text; on the first multi-byte document the two
# diverge (found by round-6 review, executed proof in git history).
# hex(encode(text)) gives two hex chars per BYTE; byte j is
# CAST('0x' || substr(hx, 2*j+1, 2) AS BIGINT) — exact for any text.
PNG_ROUNDTRIP_ORACLE = f"""
WITH src AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE octet_length(encode(text)) > 0
),
px AS (
  SELECT media_id,
    list_transform(
      generate_series(0, {PNG_SIDE * PNG_SIDE - 1}),
      i -> CAST('0x' || substr(hx, 2 * (i % n) + 1, 2) AS BIGINT)
    ) AS p
  FROM src
)
SELECT
  media_id,
  CAST({PNG_SIDE} AS INTEGER) AS width,
  CAST({PNG_SIDE} AS INTEGER) AS height,
  CAST(FLOOR(list_sum(p) / {PNG_SIDE * PNG_SIDE}.0 * 1000000.0 + 0.5)
       AS BIGINT) AS mean_px_micros,
  CAST(list_sum(list_transform(generate_series(1, {PNG_SIDE * PNG_SIDE}),
       i -> i * p[i])) % {_PH_MOD} AS BIGINT) AS px_polyhash,
  TRUE AS roundtrip_ok
FROM px
ORDER BY media_id
"""


# ---------------------------------------------------------------------------
# Real audio codec: WAV (RIFF/WAVE PCM16) roundtrip + frame features
#
# The audio counterpart of the PNG entry above: the container has no
# audio libraries, but WAV needs none — PCM16 in RIFF chunk framing is
# pure struct arithmetic. The pipeline derives a deterministic 256-
# sample 16 kHz mono PCM16 signal from each document's payload bytes
# (cyclic pairs, little-endian, two's complement), encodes it with
# Python's STDLIB ``wave`` module (an independent reference encoder we
# did not write), then decodes the bytes back with the clean-room RIFF
# parser below (magic + size checks, chunk walk with even-padding,
# fmt-chunk consistency: PCM tag, mono, block-align and byte-rate
# cross-checks) and emits integer-exact audio facts — frame count,
# peak amplitude, total and per-64-sample-frame energies (the MFCC
# framing shape), and a positional polyhash over the signed samples —
# that a DuckDB oracle recomputes from the source text. Reference has
# no audio surface (SURVEY.md §1.1); this is BASELINE.json north-star
# multimodal extension.
# ---------------------------------------------------------------------------

WAV_RATE = 16000
WAV_N = 256  # samples per clip; 4 frames of 64 for the framed energies
_WAV_FRAME = 64
_WAV_PH_MOD = 1_000_000_007


def _wav_encode_pcm16(samples: list[int], rate: int) -> bytes:
    """Encode mono PCM16 via the stdlib ``wave`` writer (independent
    of the clean-room parser below, so roundtrip_ok actually tests
    two implementations against each other)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def _wav_decode_pcm16(data: bytes) -> tuple[int, int, list[int]]:
    """Clean-room RIFF/WAVE PCM16 decoder: verifies the RIFF magic and
    declared size, walks chunks with RIFF even-byte padding, checks
    fmt consistency (PCM tag, 16-bit, block_align == nch*2,
    byte_rate == rate*block_align), and unpacks the data chunk.
    Returns (sample_rate, n_channels, samples)."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("not RIFF")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size != len(data) - 8:
        raise ValueError("RIFF size mismatch")
    if data[8:12] != b"WAVE":
        raise ValueError("not WAVE")
    pos, rate, nch, pcm = 12, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            fmt_tag, nch, rate, byte_rate, block_align, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if fmt_tag != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
            if block_align != nch * 2 or byte_rate != rate * block_align:
                raise ValueError("inconsistent fmt chunk")
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length & 1)  # RIFF pads chunks to even
    if rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    if len(pcm) % 2:
        raise ValueError("odd PCM byte count")
    return rate, nch, list(struct.unpack(f"<{len(pcm) // 2}h", pcm))


_WAV_RT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("peak_abs", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("frame_energy_0", T.LongType()),
        T.StructField("frame_energy_1", T.LongType()),
        T.StructField("frame_energy_2", T.LongType()),
        T.StructField("frame_energy_3", T.LongType()),
        T.StructField("sample_polyhash", T.LongType()),
        T.StructField("roundtrip_ok", T.BooleanType()),
    ]
)


def _wav_samples_from_bytes(src: bytes) -> list[int]:
    """256 signed PCM16 samples from payload bytes: cyclic pairs,
    little-endian, two's complement — the rule the oracle replays."""
    n = len(src)
    out = []
    for i in range(WAV_N):
        v = src[(2 * i) % n] + 256 * src[(2 * i + 1) % n]
        out.append(v - 65536 if v >= 32768 else v)
    return out


def _wav_roundtrip_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: dict[str, list] = {f.name: [] for f in _WAV_RT_SCHEMA.fields}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            src = bytes(payload)
            if not src:
                continue
            s = _wav_samples_from_bytes(src)
            rate, nch, dec = _wav_decode_pcm16(
                _wav_encode_pcm16(s, WAV_RATE)
            )
            fe = [
                sum(x * x for x in dec[k * _WAV_FRAME : (k + 1) * _WAV_FRAME])
                for k in range(WAV_N // _WAV_FRAME)
            ]
            rows["media_id"].append(mid)
            rows["sample_rate"].append(rate)
            rows["n_frames"].append(len(dec))
            rows["peak_abs"].append(max(abs(x) for x in dec))
            rows["energy"].append(sum(fe))
            for k in range(4):
                rows[f"frame_energy_{k}"].append(fe[k])
            rows["sample_polyhash"].append(
                sum((i + 1) * x for i, x in enumerate(dec)) % _WAV_PH_MOD
            )
            rows["roundtrip_ok"].append(
                dec == s and rate == WAV_RATE and nch == 1
            )
        yield pd.DataFrame(
            {
                "media_id": pd.Series(rows["media_id"], dtype="int64"),
                "sample_rate": pd.Series(rows["sample_rate"], dtype="int32"),
                "n_frames": pd.Series(rows["n_frames"], dtype="int32"),
                "peak_abs": pd.Series(rows["peak_abs"], dtype="int64"),
                "energy": pd.Series(rows["energy"], dtype="int64"),
                "frame_energy_0": pd.Series(rows["frame_energy_0"], dtype="int64"),
                "frame_energy_1": pd.Series(rows["frame_energy_1"], dtype="int64"),
                "frame_energy_2": pd.Series(rows["frame_energy_2"], dtype="int64"),
                "frame_energy_3": pd.Series(rows["frame_energy_3"], dtype="int64"),
                "sample_polyhash": pd.Series(rows["sample_polyhash"], dtype="int64"),
                "roundtrip_ok": pd.Series(rows["roundtrip_ok"], dtype="bool"),
            }
        )


def wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec audio entry: payload → PCM16 → stdlib-``wave``
    encode → clean-room RIFF decode → integer audio facts, one
    Arrow-batched ``mapInPandas`` stage (narrow, zero shuffles before
    the final orderBy; WAV bytes never leave the executor).

    Every emitted fact is exact integer arithmetic over the signed
    samples, so the DuckDB oracle recomputes all of it from the source
    text with the same cyclic-pair two's-complement rule — a decoder
    that drops RIFF padding, mis-signs a sample, or swaps endianness
    breaks the hash. At 100 TB this is the same shape as PNG decode:
    linear in executors, media bucketed by content-hash prefix.
    """
    media = spread(
        media_table(spark, sf_dir).filter(F.length("payload") > 0)
    )
    return media.mapInPandas(
        _wav_roundtrip_batch, schema=_WAV_RT_SCHEMA
    ).orderBy("media_id")


def _frame_energy_sql(k: int) -> str:
    lo, hi = k * _WAV_FRAME + 1, (k + 1) * _WAV_FRAME
    return (
        f"CAST(list_sum(list_transform(generate_series({lo}, {hi}),"
        f" i -> s[i] * s[i])) AS BIGINT) AS frame_energy_{k}"
    )


# Byte-true indexing (same rationale as PNG_ROUNDTRIP_ORACLE above):
# samples are built from UTF-8 payload BYTES via hex(encode(text)),
# never from characters/codepoints — exact for any language.
WAV_ROUNDTRIP_ORACLE = f"""
WITH src AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE octet_length(encode(text)) > 0
),
smp AS (
  SELECT media_id,
    list_transform(
      generate_series(0, {WAV_N - 1}),
      i -> CASE
        WHEN CAST('0x' || substr(hx, 2 * ((2 * i) % n) + 1, 2) AS BIGINT)
             + 256 * CAST('0x' || substr(hx, 2 * ((2 * i + 1) % n) + 1, 2) AS BIGINT) >= 32768
        THEN CAST('0x' || substr(hx, 2 * ((2 * i) % n) + 1, 2) AS BIGINT)
             + 256 * CAST('0x' || substr(hx, 2 * ((2 * i + 1) % n) + 1, 2) AS BIGINT) - 65536
        ELSE CAST('0x' || substr(hx, 2 * ((2 * i) % n) + 1, 2) AS BIGINT)
             + 256 * CAST('0x' || substr(hx, 2 * ((2 * i + 1) % n) + 1, 2) AS BIGINT)
      END
    ) AS s
  FROM src
)
SELECT
  media_id,
  CAST({WAV_RATE} AS INTEGER) AS sample_rate,
  CAST({WAV_N} AS INTEGER) AS n_frames,
  CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT) AS peak_abs,
  CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS energy,
  {_frame_energy_sql(0)},
  {_frame_energy_sql(1)},
  {_frame_energy_sql(2)},
  {_frame_energy_sql(3)},
  CAST(
    ((list_sum(list_transform(generate_series(1, {WAV_N}), i -> i * s[i]))
      % {_WAV_PH_MOD}) + {_WAV_PH_MOD}) % {_WAV_PH_MOD}
    AS BIGINT) AS sample_polyhash,
  TRUE AS roundtrip_ok
FROM smp
ORDER BY media_id
"""
