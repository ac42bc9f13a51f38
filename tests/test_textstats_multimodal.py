"""Text-analysis operators vs their own DuckDB SQL twins + multimodal plumbing."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from logparser_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    frame_sample_plan,
    media_from_documents,
)
from logparser_spark.operators.textstats import (
    bottomk_sketch_expr,
    bottomk_sketch_sql,
    fingerprint_expr,
    fingerprint_sql,
    lang_id_expr,
    lang_id_sql,
    quality_exprs,
    quality_sql,
    token_counts_exprs,
    token_counts_sql,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con.execute(sql).df()


def _cmp(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    a = spark_pdf.sort_values("doc_id").reset_index(drop=True)
    b = duck_pdf.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_lang_id_matches_sql_twin(spark, docs):
    got = docs.select("doc_id", lang_id_expr("text").alias("lang_pred")).toPandas()
    want = _duck(f"SELECT doc_id, {lang_id_sql('text')} AS lang_pred FROM documents")
    _cmp(got, want)
    assert set(got["lang_pred"]) <= set("de en es fr zh und".split())


def test_quality_matches_sql_twin(spark, docs):
    exprs = quality_exprs("text")
    got = docs.select("doc_id", *[v.alias(k) for k, v in exprs.items()]).toPandas()
    sqls = quality_sql("text")
    sel = ", ".join(f"{v} AS {k}" for k, v in sqls.items())
    want = _duck(f"SELECT doc_id, {sel} FROM documents")
    _cmp(got, want)


def test_token_counts_match_sql_twin(spark, docs):
    exprs = token_counts_exprs("text")
    got = docs.select("doc_id", *[v.alias(k) for k, v in exprs.items()]).toPandas()
    sel = ", ".join(f"{v} AS {k}" for k, v in token_counts_sql("text").items())
    want = _duck(f"SELECT doc_id, {sel} FROM documents")
    _cmp(got, want)


def test_fingerprint_matches_sql_twin(spark, docs):
    got = docs.select("doc_id", fingerprint_expr("text").alias("fp")).toPandas()
    want = _duck(f"SELECT doc_id, {fingerprint_sql('text')} AS fp FROM documents")
    _cmp(got, want)


def test_bottomk_sketch_matches_sql_twin(spark, docs):
    got = docs.select("doc_id", bottomk_sketch_expr("text").alias("sk")).toPandas()
    want = _duck(f"SELECT doc_id, {bottomk_sketch_sql('text')} AS sk FROM documents")
    got["sk"] = got["sk"].apply(list)
    want["sk"] = want["sk"].apply(list)
    _cmp(got, want)


def test_bmp_wav_codec_roundtrip():
    """The uncompressed codecs are REAL: encode→decode is identity."""
    import numpy as np

    from logparser_spark.operators.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    rng = np.random.RandomState(7)
    for h, w in ((8, 8), (11, 13), (1, 5)):  # odd widths exercise padding
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all()
    pcm = rng.randint(-32768, 32767, 200).astype(np.int16)
    got, rate = decode_wav(encode_wav(pcm, rate=16000))
    assert rate == 16000 and (got == pcm).all()


def test_png_codec_roundtrip():
    """The PNG codec is REAL: encode→decode is identity for every
    supported color type, and decode undoes ALL FIVE spec filters."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from logparser_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(11)
    for shape in ((9, 7), (9, 7, 3), (9, 7, 4), (1, 1, 3), (2, 16, 3)):
        px = rng.randint(0, 256, shape, dtype=np.uint8)
        assert (decode_png(encode_png(px)) == px).all()

    # hand-build an IDAT whose 5 scanlines use filters 0..4 (applied
    # forward per PNG spec §6) — decode must reconstruct the pixels
    px = rng.randint(0, 256, (5, 6, 3), dtype=np.uint8).astype(np.int32)
    ch, lines = 3, []
    for y in range(5):
        cur = px[y].reshape(-1)
        prev = px[y - 1].reshape(-1) if y else np.zeros(18, np.int32)
        a = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        c = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        if y == 0:
            filt = cur
        elif y == 1:
            filt = cur - a
        elif y == 2:
            filt = cur - prev
        elif y == 3:
            filt = cur - ((a + prev) >> 1)
        else:
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, prev, c))
            filt = cur - pred
        lines.append(bytes([y]) + (filt & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0)
    raw = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
           + _png_chunk(b"IEND", b""))
    assert (decode_png(raw) == px.astype(np.uint8)).all()

    # chunk CRCs are verified
    good = encode_png(rng.randint(0, 256, (4, 4, 3), dtype=np.uint8))
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_y4m_codec_roundtrip():
    """The Y4M video codec is REAL: encode→decode is identity (frames,
    dims, fps) and foreign/compressed payloads are rejected loudly."""
    import numpy as np
    import pytest

    from logparser_spark.operators.multimodal import decode_y4m, encode_y4m

    rng = np.random.RandomState(3)
    for n, h, w in ((1, 4, 6), (5, 7, 5), (3, 1, 1)):
        fr = rng.randint(0, 256, (n, h, w, 3), dtype=np.uint8)
        got, fps = decode_y4m(encode_y4m(fr, fps=(30, 1)))
        assert fps == (30, 1) and got.shape == fr.shape and (got == fr).all()
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"\x00\x01garbage")
    # a spec-valid stream with NO C tag defaults to 4:2:0 — must reject
    # loudly, never misparse subsampled planes as C444
    with pytest.raises(ValueError, match="only C444"):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1\nFRAME\n" + b"\x00" * 24)
    # header-only stream (0 frames) round-trips to an empty frame array
    empty, _ = decode_y4m(encode_y4m(np.zeros((0, 4, 6, 3), np.uint8)))
    assert empty.shape == (0, 4, 6, 3)


def test_media_decode_real_formats(spark, docs):
    media = media_from_documents(docs.limit(50))
    decoded = decode_media(media)
    pdf = decoded.toPandas()
    assert len(pdf) == 50
    # every modality decodes REAL: BMP/PNG images, WAV audio, Y4M video
    by_kind = dict(pdf.groupby("kind")["format"].agg(set))
    assert by_kind["image"] == {"bmp", "png"} and by_kind["audio"] == {"wav"}
    assert by_kind["video"] == {"y4m"}
    vids = pdf[pdf["kind"] == "video"]
    assert (vids["width"] == 4 + vids["media_id"] % 5).all()
    assert (vids["height"] == 4 + (vids["media_id"] * 3) % 5).all()
    # both encodings of the same pixels decode to the same feature recipe:
    # dims come from the actual header, per the generator's formula
    imgs = pdf[pdf["kind"] == "image"]
    assert (imgs["format"] == np.where((imgs["media_id"] // 3) % 2 == 0,
                                       "bmp", "png")).all()
    assert (imgs["width"] == 8 + imgs["media_id"] % 9).all()
    assert (imgs["height"] == 8 + (imgs["media_id"] * 7) % 9).all()
    assert all(len(f) == 8 for f in pdf["feature"])
    # deterministic: same payload → same decode
    again = decode_media(media).toPandas()
    pd.testing.assert_frame_equal(
        pdf.sort_values("media_id").reset_index(drop=True),
        again.sort_values("media_id").reset_index(drop=True),
    )


def test_media_resize_real_bmp(spark, docs):
    from logparser_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        resize_media,
    )

    media = media_from_documents(docs.limit(40))
    resized = resize_media(media, target_w=32, target_h=48).toPandas()
    assert len(resized) == 40
    assert (resized["resized_w"] == 32).all() and (resized["resized_h"] == 48).all()
    from logparser_spark.operators.multimodal import decode_y4m

    # image payloads are VALID BMPs/PNGs (format preserved) at target dims
    seen = set()
    for _, r in resized[resized["kind"] == "image"].iterrows():
        raw = bytes(r["payload"])
        dec = decode_bmp if raw[:2] == b"BM" else decode_png
        seen.add(dec.__name__)
        assert dec(raw).shape == (48, 32, 3)
    assert seen == {"decode_bmp", "decode_png"}
    # video payloads are VALID Y4M streams at target dims (frame count kept)
    for _, r in resized[resized["kind"] == "video"].iterrows():
        fr, _ = decode_y4m(bytes(r["payload"]))
        assert fr.shape[1:] == (48, 32, 3) and fr.shape[0] >= 2
    # audio keeps the md5-tag stand-in (16 + tag bytes)
    others = resized[resized["kind"] == "audio"]
    assert all(len(bytes(p)) == 16 + len(b":32x48") for p in others["payload"])
    again = resize_media(media, target_w=32, target_h=48).toPandas()
    pd.testing.assert_frame_equal(
        resized.sort_values("media_id").reset_index(drop=True),
        again.sort_values("media_id").reset_index(drop=True),
    )


def test_frame_sampling_decodes_real_frames(spark, docs):
    import numpy as np

    from logparser_spark.operators.multimodal import decode_y4m

    media = media_from_documents(docs.limit(60))
    pdf = frame_sample_plan(media, every_n=2).toPandas()
    assert (pdf["frame_idx"] % 2 == 0).all()
    n_videos = media.filter("kind = 'video'").count()
    assert pdf["media_id"].nunique() == n_videos
    # generator formula: 2 + mid % 4 frames; sampled count = ceil(nf/2)
    assert (pdf["n_frames"] == 2 + pdf["media_id"] % 4).all()
    per = pdf.groupby("media_id").size()
    nf = (2 + per.index % 4).to_numpy()
    assert (per.to_numpy() == (nf + 1) // 2).all()
    # spot-check one sampled frame's y_mean against a direct decode
    row = pdf.iloc[0]
    raw = bytes(
        media.filter(F.col("media_id") == int(row["media_id"]))
        .select("payload").first()[0]
    )
    frames, _ = decode_y4m(raw)
    want = float(frames[int(row["frame_idx"])].astype(np.float64)
                 .mean(axis=(0, 1))[0] / 255.0)
    assert abs(row["y_mean"] - round(want, 6)) < 1e-9


def test_media_decode_unknown_payload_takes_labeled_stub(spark):
    """Foreign/compressed payloads (no codec in-sandbox) must surface as
    the loudly-labeled md5 stub, never a pretend decode."""
    media = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\x00\x01\xba fake-mpeg-ps"),
          {"mime": "video/mpeg", "n_bytes": 16})],
        MEDIA_SCHEMA,
    )
    row = decode_media(media).first()
    assert row["format"] == "raw" and len(row["feature"]) == 8


def test_ngram_repetition_hand_computed(spark):
    from logparser_spark.operators.textstats import ngram_repetition

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),       # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
            (2, "w x y z"),            # 3 bigrams, all distinct
            (3, "hi"),                 # shorter than n -> 1 gram
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ngram_repetition(df, n=2).collect()}
    r1 = got[1]
    assert r1["total_ngrams"] == 5 and r1["dup_frac"] == 0.6
    assert r1["top_share"] == 0.6 and not r1["keep"]  # 'a b' appears 3/5
    r2 = got[2]
    assert r2["total_ngrams"] == 3 and r2["dup_frac"] == 0.0
    assert not r2["keep"]  # top_share 1/3 > 0.06
    r3 = got[3]
    assert r3["total_ngrams"] == 1 and r3["top_share"] == 1.0


def test_ngram_repetition_matches_sql_twin(spark, docs):
    from logparser_spark.operators.textstats import (
        ngram_repetition,
        ngram_repetition_sql,
    )

    got = (
        ngram_repetition(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _duck(ngram_repetition_sql())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    _cmp(got, want)
    assert 0 < got["keep"].sum() < len(got)  # both branches exercised
