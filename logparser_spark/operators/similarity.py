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


def _table_bucket_expr(
    vec: Column, dim: int, n_planes: int, seed: str
) -> Column:
    planes = hyperplane_signs(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for p, signs in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(s)) for s in signs])
        bit = F.when(_dot(vec, lit_plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(bit.cast("long"))
    return bucket


def ann_corpus_neighbors(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    k: int = 5,
    seed: str = "lsh",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """All-corpus approximate top-k neighbors — the dedup-scale path where
    the query side IS the corpus and nothing is broadcast.

    Shape: every vector gets all ``n_tables`` bucket ids in ONE projection
    (posexplode of the bucket array — one scan, not one per table), the
    candidate pairs come from a shuffle equi-join on (table, bucket) with
    the same ``max_bucket_size`` skew guard as the dedup LSH join, pair
    dedup happens on narrow (query_id, neighbor_id) rows BEFORE the
    64-float vectors are joined back for scoring, and top-k is a window
    per query.  No cross join, no broadcast, no all-pairs: candidates ≈
    |corpus|·L·E[bucket size]/2.

    Output schema matches :func:`cosine_topk` (query_id, neighbor_id,
    sim, rank); every corpus vector appears as a query (vectors whose
    buckets were all over-size or singleton simply have no rows).
    """
    c = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    buckets = [
        _table_bucket_expr(F.col("_vec"), dim, n_planes, f"{seed}:{t}")
        for t in range(n_tables)
    ]
    bk = c.select("_id", F.posexplode(F.array(*buckets)).alias("tbl", "bucket"))
    ok = (
        bk.groupBy("tbl", "bucket")
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= max_bucket_size)
        .select("tbl", "bucket")
    )
    bk = bk.join(ok, ["tbl", "bucket"], "left_semi")
    a = bk.select(F.col("_id").alias("query_id"), "tbl", "bucket")
    b = bk.select(F.col("_id").alias("neighbor_id"), "tbl", "bucket")
    pairs = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = c.select(F.col("_id").alias("query_id"), F.col("_vec").alias("q_vec"))
    nv = c.select(F.col("_id").alias("neighbor_id"), F.col("_vec").alias("c_vec"))
    scored = (
        pairs.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .withColumn("sim", cosine_expr(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def _sql_dot(a: str, b_literal_or_col: str, dim: int) -> str:
    """Ordered double-precision dot in DuckDB, matching Spark's
    ``zip_with`` + in-order fold exactly (``list_dot_product`` computes in
    the list's own float32 and diverges — same reason as ``SQL_KNN``)."""
    return (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST(({b_literal_or_col})[i] AS DOUBLE)))"
    )


def ann_corpus_neighbors_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    k: int = 5,
    seed: str = "lsh",
    max_bucket_size: int = 1000,
) -> str:
    """DuckDB-SQL twin of :func:`ann_corpus_neighbors`.  The md5-derived
    hyperplanes are inlined as float literals (computed here, so both
    engines hash with the identical matrix).  ``sim`` is used for ranking
    but excluded from the checked output (float-representation parity —
    the ``SQL_KNN`` precedent); the ranks themselves are deterministic."""
    per_table = []
    for t in range(n_tables):
        planes = hyperplane_signs(dim, n_planes, f"{seed}:{t}")
        bits = " + ".join(
            f"(CASE WHEN {_sql_dot(vec_col, str([float(s) for s in signs]), dim)}"
            f" >= 0 THEN {1 << p} ELSE 0 END)"
            for p, signs in enumerate(planes)
        )
        per_table.append(
            f"SELECT {id_col} AS vid, {t} AS tbl, ({bits}) AS bucket FROM {table}"
        )
    bk_sql = " UNION ALL ".join(per_table)
    dot = _sql_dot(f"q.{vec_col}", f"n.{vec_col}", dim)
    norm_q = f"sqrt({_sql_dot(f'q.{vec_col}', f'q.{vec_col}', dim)})"
    norm_n = f"sqrt({_sql_dot(f'n.{vec_col}', f'n.{vec_col}', dim)})"
    return f"""
WITH bk AS ({bk_sql}),
ok AS (SELECT tbl, bucket FROM bk GROUP BY tbl, bucket
       HAVING count(*) <= {max_bucket_size}),
bo AS (SELECT bk.* FROM bk JOIN ok USING (tbl, bucket)),
pairs AS (SELECT DISTINCT a.vid AS query_id, b.vid AS neighbor_id
          FROM bo a JOIN bo b USING (tbl, bucket) WHERE a.vid <> b.vid),
scored AS (
  SELECT p.query_id, p.neighbor_id, {dot} / ({norm_q} * {norm_n}) AS sim
  FROM pairs p
  JOIN {table} q ON q.{id_col} = p.query_id
  JOIN {table} n ON n.{id_col} = p.neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
"""


def embedding_near_dups(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: str = "lsh",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS over the whole corpus:
    LSH-bucketed candidates (nothing broadcast, no all-pairs), kept when
    rounded cosine ≥ ``threshold``.  Canonical orientation id_a < id_b.

    The dedup-flavored sibling of :func:`ann_corpus_neighbors` — same
    candidate machinery, thresholded instead of top-k (no ranking
    window; canonical pairs only, so half the candidate stream).
    """
    c = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    buckets = [
        _table_bucket_expr(F.col("_vec"), dim, n_planes, f"{seed}:{t}")
        for t in range(n_tables)
    ]
    bk = c.select("_id", F.posexplode(F.array(*buckets)).alias("tbl", "bucket"))
    ok = (
        bk.groupBy("tbl", "bucket")
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= max_bucket_size)
        .select("tbl", "bucket")
    )
    bk = bk.join(ok, ["tbl", "bucket"], "left_semi")
    a = bk.select(F.col("_id").alias("id_a"), "tbl", "bucket")
    b = bk.select(F.col("_id").alias("id_b"), "tbl", "bucket")
    pairs = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = c.select(F.col("_id").alias("id_a"), F.col("_vec").alias("q_vec"))
    vb = c.select(F.col("_id").alias("id_b"), F.col("_vec").alias("c_vec"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            # 4 dp per the repo invariant on floats in checked outputs;
            # the threshold compares the ROUNDED value so both engines
            # make the same keep/drop decision at the boundary
            "sim", F.round(cosine_expr(F.col("q_vec"), F.col("c_vec")), 4)
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def embedding_near_dups_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: str = "lsh",
    max_bucket_size: int = 1000,
) -> str:
    """DuckDB-SQL twin of :func:`embedding_near_dups` (rounded sim is
    part of the checked output — round(4) per the repo invariant on
    floats in checked outputs; the threshold filter compares the rounded
    value in BOTH engines so boundary rows keep/drop identically)."""
    per_table = []
    for t in range(n_tables):
        planes = hyperplane_signs(dim, n_planes, f"{seed}:{t}")
        bits = " + ".join(
            f"(CASE WHEN {_sql_dot(vec_col, str([float(s) for s in signs]), dim)}"
            f" >= 0 THEN {1 << p} ELSE 0 END)"
            for p, signs in enumerate(planes)
        )
        per_table.append(
            f"SELECT {id_col} AS vid, {t} AS tbl, ({bits}) AS bucket FROM {table}"
        )
    bk_sql = " UNION ALL ".join(per_table)
    dot = _sql_dot(f"q.{vec_col}", f"n.{vec_col}", dim)
    norm_q = f"sqrt({_sql_dot(f'q.{vec_col}', f'q.{vec_col}', dim)})"
    norm_n = f"sqrt({_sql_dot(f'n.{vec_col}', f'n.{vec_col}', dim)})"
    return f"""
WITH bk AS ({bk_sql}),
ok AS (SELECT tbl, bucket FROM bk GROUP BY tbl, bucket
       HAVING count(*) <= {max_bucket_size}),
bo AS (SELECT bk.* FROM bk JOIN ok USING (tbl, bucket)),
pairs AS (SELECT DISTINCT a.vid AS id_a, b.vid AS id_b
          FROM bo a JOIN bo b USING (tbl, bucket) WHERE a.vid < b.vid)
SELECT id_a, id_b, round({dot} / ({norm_q} * {norm_n}), 4) AS sim
FROM pairs p
JOIN {table} q ON q.{id_col} = p.id_a
JOIN {table} n ON n.{id_col} = p.id_b
WHERE round({dot} / ({norm_q} * {norm_n}), 4) >= {threshold}
"""


def ann_lsh_topk_sql(
    table: str = "embeddings",
    query_filter: str = "vec_id < 5",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    k: int = 5,
    seed: str = "lsh",
) -> str:
    """DuckDB-SQL twin of :func:`ann_lsh_topk` (broadcast-query form):
    corpus and the filtered query set are bucketed with the same inlined
    hyperplanes; candidates share a bucket in ≥1 table.  ``sim`` ranks
    but is excluded from the checked output (``SQL_KNN`` precedent)."""
    per_table = []
    for t in range(n_tables):
        planes = hyperplane_signs(dim, n_planes, f"{seed}:{t}")
        bits = " + ".join(
            f"(CASE WHEN {_sql_dot(vec_col, str([float(s) for s in signs]), dim)}"
            f" >= 0 THEN {1 << p} ELSE 0 END)"
            for p, signs in enumerate(planes)
        )
        per_table.append(
            f"SELECT {id_col} AS vid, {t} AS tbl, ({bits}) AS bucket FROM {table}"
        )
    bk_sql = " UNION ALL ".join(per_table)
    dot = _sql_dot(f"q.{vec_col}", f"n.{vec_col}", dim)
    norm_q = f"sqrt({_sql_dot(f'q.{vec_col}', f'q.{vec_col}', dim)})"
    norm_n = f"sqrt({_sql_dot(f'n.{vec_col}', f'n.{vec_col}', dim)})"
    return f"""
WITH bk AS ({bk_sql}),
qb AS (SELECT bk.* FROM bk JOIN {table} v ON v.{id_col} = bk.vid
       WHERE {query_filter}),
pairs AS (SELECT DISTINCT q.vid AS query_id, c.vid AS neighbor_id
          FROM qb q JOIN bk c USING (tbl, bucket)
          WHERE c.vid <> q.vid),
scored AS (
  SELECT p.query_id, p.neighbor_id, {dot} / ({norm_q} * {norm_n}) AS sim
  FROM pairs p
  JOIN {table} q ON q.{id_col} = p.query_id
  JOIN {table} n ON n.{id_col} = p.neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
"""


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
