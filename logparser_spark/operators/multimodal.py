"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct.  The Spark-side plumbing (schema, partitioning, Arrow
batch shape, UDF signatures) is real and tested, and — r3 — so is the
codec step for the UNCOMPRESSED formats, implemented from the published
byte layouts with nothing but numpy/struct:

* **BMP** (Windows V3 ``BITMAPINFOHEADER``, 24-bit BGR, bottom-up rows,
  4-byte row padding): :func:`encode_bmp` / :func:`decode_bmp`.
* **WAV** (RIFF, PCM 16-bit mono): :func:`encode_wav` / :func:`decode_wav`.
* **PNG** (r4 — a real COMPRESSED format): 8-bit greyscale/RGB/RGBA,
  non-interlaced, per the PNG specification (RFC 2083 / W3C PNG) —
  chunk framing with CRC-32, zlib-deflated scanlines, and all five
  scanline filters (None/Sub/Up/Average/Paeth) on decode.  Needs only
  stdlib ``zlib`` + numpy: :func:`encode_png` / :func:`decode_png`.

Formats whose codecs genuinely need external libraries (jpeg/webp, mp3,
h264 — PIL/ffmpeg, absent in this container) still fall back to a
deterministic md5 stub, loudly labeled so the boundary between real
decode and stand-in is visible in the output ``format`` column
('bmp'/'png'/'wav' = real parse, 'raw' = stub).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),          # image | audio | video
        T.StructField("payload", T.BinaryType()),        # opaque encoded bytes
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ])),
    ]
)

DECODED_FIELDS = [
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
]


# ---------------------------------------------------------------------------
# Real codecs for uncompressed formats (pure bytes + numpy, no libraries)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BMP bytes (V3 header, bottom-up)."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    # RGB → BGR, bottom row first
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(raw: bytes) -> np.ndarray:
    """24-bit BMP bytes → (h, w, 3) uint8 RGB (inverse of encode_bmp)."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", raw, 10)[0]
    w, h = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(raw, dtype=np.uint8, count=row_bytes * abs(h),
                         offset=offset).reshape(abs(h), row_bytes)
    img = rows[:, : w * 3].reshape(abs(h), w, 3)[:, :, ::-1]
    return img[::-1] if h > 0 else img  # positive h = bottom-up


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM bytes."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → (int16 samples, sample rate)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    rate = struct.unpack_from("<I", raw, 24)[0]
    n = struct.unpack_from("<I", raw, 40)[0]
    return np.frombuffer(raw, dtype="<i2", count=n // 2, offset=44), rate


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type (8-bit depth only): 0=grey, 2=RGB, 6=RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 pixel array → PNG bytes (8-bit, non-interlaced).

    Accepts ``(h, w)`` greyscale, ``(h, w, 3)`` RGB or ``(h, w, 4)``
    RGBA.  Scanlines use filter 0 (None) — always a valid PNG; smarter
    per-line filter selection only changes the compressed size, not the
    decoded pixels.
    """
    import zlib

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # one filter byte (0 = None) prepended to each scanline
    lines = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    lines[:, 1:] = px.reshape(h, w * ch)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(lines.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(lines: np.ndarray, ch: int) -> np.ndarray:
    """Undo per-scanline filtering: ``lines`` is (h, 1 + w*ch) raw bytes
    (filter id first); returns (h, w*ch) reconstructed bytes.

    Filters per the PNG spec §6: 0 None, 1 Sub (left), 2 Up, 3 Average,
    4 Paeth.  Up/None vectorize across the row; Sub/Average/Paeth have a
    left-neighbor dependency, so those rows walk pixel-groups (columns of
    ``ch`` bytes at a time — still numpy per step, and our own encoder
    emits filter 0 which takes the fully vectorized path).
    """
    h, stride = lines.shape
    w_bytes = stride - 1
    out = np.zeros((h, w_bytes), dtype=np.uint8)
    for y in range(h):
        f = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(w_bytes, np.int32)
        if f == 0:
            rec = cur
        elif f == 2:
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):
            rec = np.zeros(w_bytes, np.int32)
            for x in range(0, w_bytes, ch):
                a = rec[x - ch : x] if x else np.zeros(ch, np.int32)
                b = prev[x : x + ch]
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[x - ch : x] if x else np.zeros(ch, np.int32)
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                rec[x : x + ch] = (cur[x : x + ch] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(raw: bytes) -> np.ndarray:
    """PNG bytes → uint8 pixel array (inverse of :func:`encode_png`).

    Supports 8-bit greyscale/RGB/RGBA, non-interlaced, multi-IDAT;
    verifies chunk CRCs.  Returns ``(h, w)`` for greyscale else
    ``(h, w, ch)``.
    """
    import zlib

    if raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos < len(raw):
        (length,) = struct.unpack_from(">I", raw, pos)
        tag = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", raw, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = meta
    if depth != 8 or color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG depth/color {depth}/{color_type}")
    if comp or filt or interlace:
        raise ValueError("unsupported PNG compression/filter/interlace mode")
    ch = _PNG_CHANNELS[color_type]
    lines = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    px = _png_unfilter(lines.reshape(h, 1 + w * ch), ch).reshape(h, w, ch)
    return px[:, :, 0] if ch == 1 else px


def _md5_stream(seed: bytes, n: int) -> np.ndarray:
    """n deterministic bytes from chained md5 of seed (test pixel/PCM)."""
    import hashlib

    out = bytearray()
    ctr = 0
    while len(out) < n:
        out += hashlib.md5(seed + ctr.to_bytes(4, "little")).digest()
        ctr += 1
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents`` (test stand-in
    for a real object-store-backed media table).

    Image rows carry REAL encoded images — alternating BMP and PNG, so
    both the uncompressed and the compressed codec paths are exercised —
    and audio rows REAL WAVs (pixels / PCM are md5-derived from the
    text, so the table is reproducible); video rows keep an opaque
    payload — their decode stays stubbed.  Encoding runs in the same
    ``mapInPandas`` Arrow-batch shape the decode side uses.
    """
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("_seed"),
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, kind, seed in zip(
                pdf["media_id"], pdf["kind"], pdf["_seed"]
            ):
                seed = bytes(seed)
                if kind == "image":
                    w = 8 + int(mid) % 9
                    h = 8 + (int(mid) * 7) % 9
                    px = _md5_stream(seed, w * h * 3).reshape(h, w, 3)
                    enc = encode_bmp if (int(mid) // 3) % 2 == 0 else encode_png
                    payloads.append(enc(px))
                elif kind == "audio":
                    n = 64 + int(mid) % 64
                    pcm = (
                        _md5_stream(seed, n * 2).view("<i2").astype(np.int16)
                    )
                    payloads.append(encode_wav(pcm))
                else:
                    payloads.append(seed)  # opaque (stub decode path)
            mime = {
                b"BM": "image/bmp",
                _PNG_SIG[:2]: "image/png",
                b"RI": "audio/wav",
            }
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": [
                        {
                            "mime": mime.get(p[:2], "application/octet-stream"),
                            "n_bytes": len(p),
                        }
                        for p in payloads
                    ],
                }
            )

    return base.mapInPandas(fn, MEDIA_SCHEMA)


def _decode_image_batch(payload: pd.Series) -> pd.DataFrame:
    """Decode one Arrow batch of payloads.

    Real parse for BMP/PNG (dims from the header, 8-dim feature =
    per-channel mean/std + normalized dims computed from the ACTUAL,
    for PNG zlib-inflated + unfiltered, pixels) and WAV (width =
    #samples, feature = RMS/zero-crossing stats of the ACTUAL PCM).
    Anything else — formats needing PIL/ffmpeg — takes the
    loudly-labeled md5 stub (format='raw') so the plumbing stays
    exactly testable without pretending to decode.
    """
    import hashlib

    rows = []
    for raw in payload:
        raw = bytes(raw)
        if raw[:2] == b"BM" or raw[:8] == _PNG_SIG:
            fmt = "bmp" if raw[:2] == b"BM" else "png"
            px = (decode_bmp if fmt == "bmp" else decode_png)(raw)
            if px.ndim == 2:  # greyscale PNG → replicate to 3 channels
                px = np.repeat(px[:, :, None], 3, axis=2)
            px = px[:, :, :3].astype(np.float64) / 255.0  # drop PNG alpha
            h, w, _ = px.shape
            mean = px.mean(axis=(0, 1))
            std = px.std(axis=(0, 1))
            rows.append(
                {
                    "width": w,
                    "height": h,
                    "format": fmt,
                    "feature": [
                        round(float(v), 6)
                        for v in (*mean, *std, w / 255.0, h / 255.0)
                    ],
                }
            )
        elif raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
            pcm, rate = decode_wav(raw)
            x = pcm.astype(np.float64) / 32768.0
            zc = float(np.mean(np.abs(np.diff(np.sign(x))) > 0)) if len(x) > 1 else 0.0
            rows.append(
                {
                    "width": int(len(pcm)),
                    "height": 1,
                    "format": "wav",
                    "feature": [
                        round(float(v), 6)
                        for v in (
                            np.sqrt(np.mean(x**2)),  # RMS
                            zc,                       # zero-crossing rate
                            x.mean(),
                            x.std(),
                            x.min(),
                            x.max(),
                            rate / 48000.0,
                            len(x) / 1e4,
                        )
                    ],
                }
            )
        else:
            # STUB: compressed/unknown format — md5-derived stand-in
            d = hashlib.md5(raw).digest()
            rows.append(
                {
                    "width": 16 + d[0] % 64,
                    "height": 16 + d[1] % 64,
                    "format": "raw",
                    "feature": [round(b / 255.0, 6) for b in d[3:11]],
                }
            )
    return pd.DataFrame(rows)


def decode_media(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched decode/feature-extract over ``mapInPandas``.

    Executor-parallel, no driver involvement, no per-row Python overhead
    beyond the codec call itself; BMP/WAV payloads are REALLY decoded
    (see :func:`_decode_image_batch`), compressed formats take the
    labeled stub.
    """
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "payload"] + DECODED_FIELDS
    )
    out_cols = [f.name for f in out_schema.fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = _decode_image_batch(pdf["payload"])
            keep = pdf.drop(columns=["payload"]).reset_index(drop=True)
            yield pd.concat([keep, decoded], axis=1)[out_cols]

    return df.mapInPandas(fn, out_schema)


def resize_media(df: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Arrow-batched resize over ``mapInPandas``.

    BMP and PNG payloads are REALLY resized: decode → nearest-neighbor
    resample in numpy → re-encode in the SAME format, so the output
    payload is itself a valid BMP/PNG of the target dimensions.
    Non-image payloads keep the deterministic md5-tag stand-in (audio
    resampling / video transcode need real DSP libraries).
    """
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [
            T.StructField("resized_w", T.IntegerType()),
            T.StructField("resized_h", T.IntegerType()),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        tag = f":{target_w}x{target_h}".encode()
        for pdf in batches:
            pdf = pdf.copy()
            out = []
            for raw in pdf["payload"]:
                raw = bytes(raw)
                if raw[:2] == b"BM" or raw[:8] == _PNG_SIG:
                    is_bmp = raw[:2] == b"BM"
                    px = (decode_bmp if is_bmp else decode_png)(raw)
                    h, w = px.shape[:2]
                    yi = (np.arange(target_h) * h) // target_h
                    xi = (np.arange(target_w) * w) // target_w
                    enc = encode_bmp if is_bmp else encode_png
                    out.append(enc(px[yi][:, xi]))
                else:
                    out.append(hashlib.md5(raw).digest() + tag)
            pdf["payload"] = out
            pdf["resized_w"] = target_w
            pdf["resized_h"] = target_h
            yield pdf[out_cols]

    return df.mapInPandas(fn, out_schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* (plumbing only): one output row per
    sampled frame index, derived from metadata — the decode of each frame
    would slot into :func:`decode_media`'s batch loop."""
    n_frames = (F.col("meta.n_bytes") / 16).cast("int")  # stub: bytes→frames
    idxs = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(idxs))
        .select("media_id", "frame_idx", "meta")
    )
