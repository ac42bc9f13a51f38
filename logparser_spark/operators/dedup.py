"""Deduplication operators for large-scale training-data pipelines.

All distributed-relational: exact (hash groupBy), MinHash+LSH
(shingle → minhash → band → bucket self-join), n-gram Jaccard verification,
SimHash, and embedding-cosine near-dup.  Hash functions are md5-based so
results are engine-independent (same answer from the DuckDB SQL oracles).

Scale notes
-----------
* Shingling/minhashing is explode + hash + min-aggregate — map-side
  combine keeps the shuffle at |docs|×|seeds| rows regardless of doc size.
* LSH banding turns the quadratic all-pairs problem into an equi-join on
  (band, band_key); only same-bucket pairs are materialized.  Hot buckets
  (boilerplate docs) are the skew risk — ``max_bucket_size`` drops
  pathological buckets explicitly and reports them, the standard
  web-dedup practice.
* Jaccard verification joins only candidate pairs (semi-join pushdown).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logparser_spark.functions.text import tokens_expr


# -- shingling ---------------------------------------------------------------


def shingles_expr(text_col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles; a doc shorter than n tokens yields
    its whole token string as the single shingle."""
    toks = tokens_expr(text_col)
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    return df.select(F.col(id_col), F.explode(shingles_expr(text_col, n)).alias("shingle"))


# -- exact -------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical texts by md5; one row per distinct text."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keeper_id"))
    )


# -- minhash + lsh -----------------------------------------------------------


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """(id, seed, minhash): minhash_s(doc) = min over shingles of
    md5(seed || ':' || shingle).  Lexicographic min over hex digests is a
    valid uniform minhash family and is reproducible in any engine."""
    sh = exploded_shingles(df, id_col, text_col, shingle_n)
    seeds = F.explode(F.array(*[F.lit(i) for i in range(num_hashes)])).alias("seed")
    return (
        sh.select(F.col(id_col), "shingle")
        .select(F.col(id_col), "shingle", seeds)
        .select(
            F.col(id_col),
            "seed",
            F.md5(F.concat_ws(":", F.col("seed").cast("string"), "shingle")).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_bands(sig: DataFrame, id_col: str, rows_per_band: int = 4) -> DataFrame:
    """Fold signatures into band keys: band b covers seeds
    [b*r, (b+1)*r); band_key = md5 of the seed-ordered minhash list."""
    banded = sig.withColumn("band", F.floor(F.col("seed") / rows_per_band))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
        lambda s: s["minhash"],
    )
    return banded.groupBy(id_col, "band").agg(
        F.md5(F.concat_ws(",", ordered)).alias("band_key")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 LSH bucket.

    Buckets larger than ``max_bucket_size`` (degenerate boilerplate) are
    dropped — explicit skew guard; count them upstream if reporting.
    """
    bands = lsh_bands(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_n),
        id_col,
        rows_per_band,
    )
    # bucket-size guard via aggregation (no window needed)
    bucket_sizes = bands.groupBy("band", "band_key").agg(F.count(F.lit(1)).alias("bn"))
    ok_buckets = bucket_sizes.filter(F.col("bn") <= max_bucket_size).select("band", "band_key")
    bands = bands.join(ok_buckets, ["band", "band_key"], "inner")
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"], "inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# -- jaccard verification ----------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for all (or candidate) pairs ≥ threshold."""
    sh = exploded_shingles(df, id_col, text_col, shingle_n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        pairs = pairs.join(candidates, ["id_a", "id_b"], "left_semi")
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -- simhash -----------------------------------------------------------------


def simhash_expr(text_col: Column | str, bits: int = 32) -> Column:
    """SimHash over unigram tokens using md5-derived per-token bit
    patterns: bit j of the fingerprint is 1 iff the majority of tokens
    have bit j set in md5(token).  Pure native expressions."""
    toks = F.array_distinct(tokens_expr(text_col))
    # per token: 32-bit int from first 8 md5 hex chars
    hashes = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"))
    n = F.size(toks)
    bit_cols = []
    for j in range(bits):
        cnt = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1)),
        )
        bit_cols.append(
            F.when(cnt * 2 >= n, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseOR(c)
    return out


def simhash_dedup(df: DataFrame, id_col: str, text_col: str, bits: int = 32,
                  band_bits: int = 8) -> DataFrame:
    """Candidate near-dup pairs: equal simhash bands (bits split into
    bits/band_bits bands; hamming-near docs share ≥1 band)."""
    with_sh = df.select(F.col(id_col), simhash_expr(text_col, bits).alias("simhash"))
    bands = []
    for b in range(bits // band_bits):
        mask = ((1 << band_bits) - 1) << (b * band_bits)
        bands.append(
            with_sh.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.col("simhash").bitwiseAND(F.lit(mask)).alias("band_val"),
            )
        )
    allb = bands[0]
    for x in bands[1:]:
        allb = allb.unionByName(x)
    a = allb.select(F.col(id_col).alias("id_a"), "band", "band_val")
    b2 = allb.select(F.col(id_col).alias("id_b"), "band", "band_val")
    return (
        a.join(b2, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
