"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct — the Spark-side plumbing (schema, partitioning, Arrow
batch shape, UDF signatures) is real and tested; the actual codec step is
stubbed because no image/audio libraries exist in this container.  The
stubs are deterministic (md5-derived) so tests are exact; swap
``_decode_image_batch`` for a PIL/libvips call on a real cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

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

HAVE_REAL_CODECS = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_REAL_CODECS = True
except Exception:
    pass


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents`` (test stand-in
    for a real object-store-backed media table): payload = utf-8 bytes."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_image_batch(payload: pd.Series) -> pd.DataFrame:
    """STUB decode. Real implementation would be e.g. PIL over the bytes.

    Deterministic fake: dimensions and an 8-dim feature vector derived
    from md5 of the payload, so downstream plumbing is exactly testable.
    """
    if HAVE_REAL_CODECS:
        raise NotImplementedError(
            "real codec path not wired in this sandbox; replace this stub "
            "with PIL/torchvision decode on a real cluster"
        )
    import hashlib

    rows = []
    for raw in payload:
        d = hashlib.md5(bytes(raw)).digest()
        rows.append(
            {
                "width": 16 + d[0] % 64,
                "height": 16 + d[1] % 64,
                "format": ("png", "jpeg", "webp")[d[2] % 3],
                "feature": [round(b / 255.0, 6) for b in d[3:11]],
            }
        )
    return pd.DataFrame(rows)


def decode_media(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched decode/feature-extract over ``mapInPandas``.

    The pattern to copy for real codecs: iterate Arrow batches, decode
    vectorized per batch, emit original columns + decoded struct fields —
    executor-parallel, no driver involvement, no per-row Python overhead
    beyond the codec call itself.
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
    """Arrow-batched resize over ``mapInPandas`` (plumbing real, codec
    stubbed like :func:`decode_media`).

    Real implementation: decode → resample → re-encode per batch.  The
    deterministic stand-in re-encodes the payload as
    ``md5(payload) || target dims`` so output bytes are exact in tests;
    the metadata struct is updated to the post-resize truth (the part
    downstream consumers rely on).
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

        for pdf in batches:
            if HAVE_REAL_CODECS:
                raise NotImplementedError(
                    "real resize path not wired in this sandbox; decode → "
                    "resample → encode per batch on a real cluster"
                )
            tag = f":{target_w}x{target_h}".encode()
            pdf = pdf.copy()
            pdf["payload"] = [
                hashlib.md5(bytes(raw)).digest() + tag for raw in pdf["payload"]
            ]
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
