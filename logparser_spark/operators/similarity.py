"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — brute-force exact top-k: broadcast the query set,
  score every corpus vector with a deterministic left-to-right fold
  (``F.zip_with`` + ``F.aggregate`` — JVM-side, no Python), rank with a
  window.  The right baseline, and exactly reproducible in SQL oracles.
* :func:`random_hyperplane_buckets` / :func:`ann_lsh_topk` — the scale
  path: sign-random-projection LSH.  Hyperplane signs are derived from
  md5 (deterministic, seedable); candidates = same-bucket vectors, scored
  brute-force within bucket.  At 10^9 vectors the bucket join replaces
  the full cross product; recall is tested against the exact baseline.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Deterministic dot product: elementwise product then ordered fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return F.sqrt(_dot(c, c))


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches by id).

    Output: (query_id, neighbor_id, sim, rank) with deterministic
    tie-breaking on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_expr(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def hyperplane_signs(dim: int, n_planes: int, seed: str = "lsh") -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix from md5 bits (no RNG)."""
    planes = []
    for p in range(n_planes):
        signs: list[int] = []
        ctr = 0
        while len(signs) < dim:
            digest = hashlib.md5(f"{seed}:{p}:{ctr}".encode()).digest()
            for byte in digest:
                for bit in range(8):
                    if len(signs) >= dim:
                        break
                    signs.append(1 if (byte >> bit) & 1 else -1)
            ctr += 1
        planes.append(signs)
    return planes


def random_hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: str = "lsh",
) -> DataFrame:
    """Attach an LSH bucket id: bit p = sign(v · h_p)."""
    planes = hyperplane_signs(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    v = F.col(vec_col)
    for p, signs in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(s)) for s in signs])
        bit = F.when(_dot(v, lit_plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(bit.cast("long"))
    return df.withColumn("lsh_bucket", bucket)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    k: int = 5,
    seed: str = "lsh",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing a bucket with
    the query in ≥1 of ``n_tables`` independent hash tables.

    With b planes each table splits the corpus into 2^b buckets →
    candidates ≈ |corpus|·L/2^b per query; tune (b, L) for the
    recall/cost point (more tables = recall, more planes = cheaper
    buckets).  Output schema matches :func:`cosine_topk`.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cand_tables = []
    for tbl in range(n_tables):
        s = f"{seed}:{tbl}"
        cb = random_hyperplane_buckets(c, "c_vec", dim, n_planes, s)
        qb = random_hyperplane_buckets(q.select("query_id", "q_vec"), "q_vec", dim, n_planes, s)
        cand_tables.append(
            cb.join(F.broadcast(qb.select("query_id", "lsh_bucket")), "lsh_bucket")
            .select("query_id", "neighbor_id")
        )
    cands = cand_tables[0]
    for t in cand_tables[1:]:
        cands = cands.unionByName(t)
    scored = (
        cands.distinct()
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("sim", cosine_expr(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )
