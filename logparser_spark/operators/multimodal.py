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
* **Y4M video** (r4): the YUV4MPEG2 stream format (mjpegtools; the
  standard uncompressed-video interchange ffmpeg/x264 read) — ASCII
  stream header (``YUV4MPEG2 W.. H.. F.. C444``) + per-frame ``FRAME``
  markers + raw planar YUV: :func:`encode_y4m` / :func:`decode_y4m`.
  One real codec per modality: image, audio, AND video.

Formats whose codecs genuinely need external libraries (jpeg/webp, mp3,
h264 — PIL/ffmpeg, absent in this container) still fall back to a
deterministic md5 stub, loudly labeled so the boundary between real
decode and stand-in is visible in the output ``format`` column
('bmp'/'png'/'wav'/'y4m' = real parse, 'raw' = stub).
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


_Y4M_MAGIC = b"YUV4MPEG2 "


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n, h, w, 3) uint8 planar-YUV frames → YUV4MPEG2 bytes (C444).

    Per the mjpegtools y4m layout: one ASCII stream header, then for
    each frame a ``FRAME\\n`` marker followed by the full-resolution Y,
    U, V planes (C444 = no chroma subsampling, so every byte round-trips
    exactly).
    """
    n, h, w, _ = frames.shape
    head = _Y4M_MAGIC + f"W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444\n".encode()
    out = [head]
    for f in np.ascontiguousarray(frames, dtype=np.uint8):
        # (h, w, 3) → planar: all Y, then all U, then all V
        out.append(b"FRAME\n" + f.transpose(2, 0, 1).tobytes())
    return b"".join(out)


def decode_y4m(raw: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 bytes → ((n, h, w, 3) uint8 YUV frames, (fps_num, den))."""
    if not raw.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = raw.index(b"\n")
    w = h = 0
    fps = (25, 1)
    colorspace = "420jpeg"  # the y4m spec's DEFAULT when C is absent
    for tok in raw[len(_Y4M_MAGIC) : nl].split():
        tag, val = chr(tok[0]), tok[1:].decode()
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif tag == "C":
            colorspace = val
    if colorspace != "444":
        # subsampled plane sizes (e.g. the default 4:2:0) would misparse
        # as C444 — reject loudly instead of reading garbage frames
        raise ValueError(f"only C444 supported, got C{colorspace}")
    plane = w * h
    frames, pos = [], nl + 1
    while pos < len(raw):
        fnl = raw.index(b"\n", pos)  # FRAME line (may carry params)
        if raw[pos : pos + 5] != b"FRAME":
            raise ValueError("bad y4m FRAME marker")
        body = np.frombuffer(raw, dtype=np.uint8, count=3 * plane, offset=fnl + 1)
        frames.append(body.reshape(3, h, w).transpose(1, 2, 0))
        pos = fnl + 1 + 3 * plane
    if not frames:  # header-only stream (encode of 0 frames) round-trips
        return np.zeros((0, h, w, 3), dtype=np.uint8), fps
    return np.stack(frames), fps


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
    audio rows REAL WAVs, and video rows REAL multi-frame Y4M streams
    (pixels / PCM / YUV planes are md5-derived from the text, so the
    table is reproducible).  Encoding runs in the same ``mapInPandas``
    Arrow-batch shape the decode side uses.
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
                    w = 4 + int(mid) % 5
                    h = 4 + (int(mid) * 3) % 5
                    nf = 2 + int(mid) % 4
                    yuv = _md5_stream(seed, nf * h * w * 3).reshape(
                        nf, h, w, 3
                    )
                    payloads.append(encode_y4m(yuv))
            mime = {
                b"BM": "image/bmp",
                _PNG_SIG[:2]: "image/png",
                b"RI": "audio/wav",
                b"YU": "video/x-yuv4mpeg",
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
        elif raw[: len(_Y4M_MAGIC)] == _Y4M_MAGIC:
            fr, fps = decode_y4m(raw)
            nf, h, w, _ = fr.shape
            yuv = fr.astype(np.float64) / 255.0
            mean = yuv.mean(axis=(0, 1, 2))  # per-plane over all frames
            std = yuv.std(axis=(0, 1, 2))
            rows.append(
                {
                    "width": int(w),
                    "height": int(h),
                    "format": "y4m",
                    "feature": [
                        round(float(v), 6)
                        for v in (*mean, *std, float(nf), fps[0] / 60.0)
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

    BMP, PNG and Y4M payloads are REALLY resized: decode →
    nearest-neighbor resample in numpy (per frame for video) →
    re-encode in the SAME format, so the output payload is itself a
    valid BMP/PNG/Y4M at the target dimensions.  Audio payloads keep
    the deterministic md5-tag stand-in (resampling PCM is a DSP
    operation, not a byte-layout one).
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
                elif raw[: len(_Y4M_MAGIC)] == _Y4M_MAGIC:
                    fr, fps = decode_y4m(raw)
                    _, h, w, _ = fr.shape
                    yi = (np.arange(target_h) * h) // target_h
                    xi = (np.arange(target_w) * w) // target_w
                    out.append(encode_y4m(fr[:, yi][:, :, xi], fps))
                else:
                    out.append(hashlib.md5(raw).digest() + tag)
            pdf["payload"] = out
            pdf["resized_w"] = target_w
            pdf["resized_h"] = target_h
            yield pdf[out_cols]

    return df.mapInPandas(fn, out_schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — REAL since r4: every n-th frame of each
    Y4M payload is decoded and per-plane YUV means are emitted, one row
    per sampled frame: (media_id, frame_idx, n_frames, y_mean, u_mean,
    v_mean).

    Arrow-batched ``mapInPandas`` like :func:`decode_media` — the frame
    loop runs inside the executor over the already-local payload bytes,
    so sampling density changes OUTPUT rows, not scan volume.  Non-Y4M
    video payloads (compressed codecs needing ffmpeg) are skipped —
    they have no parseable frames.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("y_mean", T.DoubleType()),
            T.StructField("u_mean", T.DoubleType()),
            T.StructField("v_mean", T.DoubleType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(raw)
                if raw[: len(_Y4M_MAGIC)] != _Y4M_MAGIC:
                    continue
                frames, _ = decode_y4m(raw)
                nf = frames.shape[0]
                for k in range(0, nf, every_n):
                    m = frames[k].astype(np.float64).mean(axis=(0, 1)) / 255.0
                    rows.append(
                        (int(mid), k, nf,
                         round(float(m[0]), 6), round(float(m[1]), 6),
                         round(float(m[2]), 6))
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.filter(F.col("kind") == "video").mapInPandas(fn, out_schema)
