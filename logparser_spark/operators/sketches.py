"""Mergeable frequency sketches: count-min with heavy-hitter extraction.

The count-min sketch (Cormode & Muthukrishnan, J. Algorithms '05) keeps a
``depth × width`` grid of counters; key k increments cell
``(i, h_i(k))`` for each of ``depth`` independent hash rows, and the
estimate is the MIN over rows (collisions only ever inflate — one-sided
error ≤ 2N/width with prob 1-(1/2)^depth).

Why a sketch when groupBy-count is exact: the sketch's size is
``depth × width`` CELLS regardless of key cardinality, so it map-side
combines to a constant-size partial per partition and merges by cell-wise
addition — the shape you want for per-executor or per-window frequency
state at 10^12 turns where the distinct-key set itself is shuffle-heavy.
(Same motivation as ``textstats.bottom_k_sketch`` for distinct counts.)

Determinism: hash rows use the repo's md5 bucket idiom
(:func:`logparser_spark.functions.hashing.bucket_expr` — not Murmur3
``F.hash``) so Spark, the DuckDB twins, and plain Python agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logparser_spark.functions.hashing import bucket_expr, bucket_sql


def _cms_col(key: Column, row: int, width: int) -> Column:
    return bucket_expr(F.concat(F.lit(f"cms{row}:"), key), width)


def _cms_col_sql(key_sql: str, row: int, width: int) -> str:
    return bucket_sql(f"'cms{row}:' || {key_sql}", width)


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch as a (row, col, cnt) table — ≤ depth·width rows.

    One narrow explode (depth rows per input row) then a groupBy whose
    group count is bounded by the GRID, not the data; Spark's hash
    aggregate partial-combines each partition down to ≤ depth·width
    cells before the (tiny) shuffle.
    """
    k = F.col(key_col).cast("string")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"), _cms_col(k, i, width).alias("col")
                )
                for i in range(depth)
            ]
        )
    ).alias("_c")
    return (
        df.select(cells)
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for every key row: (key_col, est).

    Keys fan out to their ``depth`` cells and equi-join the sketch on
    (row, col) — the sketch side is grid-bounded, so Catalyst broadcasts
    it; a cell never seen counts 0 (left join) though with the sketch
    built over the same stream every probed cell exists.
    """
    k = F.col(key_col).cast("string")
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cms_col(k, i, width).alias("col")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_c"),
    ).select(key_col, F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left").na.fill(
        {"cnt": 0}
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("est"))


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Keys whose CMS estimate ≥ threshold: (key_col, est).

    One-sided: every TRUE heavy hitter survives (estimates never
    undercount); collision-inflated light keys may ride along — the
    classic sketch trade, bounded by 2N/width per row.
    """
    sk = cms_sketch(df, key_col, depth, width)
    distinct = df.select(key_col).distinct()
    return cms_estimate(distinct, sk, key_col, depth, width).filter(
        F.col("est") >= threshold
    )


def cms_heavy_hitters_sql(
    src: str,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 256,
) -> str:
    """DuckDB-SQL twin of :func:`cms_heavy_hitters` (same md5 rows)."""
    key_s = f"CAST({key_col} AS VARCHAR)"
    cells = " UNION ALL ".join(
        f"SELECT {i} AS row, {_cms_col_sql(key_s, i, width)} AS col FROM {src}"
        for i in range(depth)
    )
    probes = " UNION ALL ".join(
        f"SELECT {key_col}, {i} AS row, {_cms_col_sql(key_s, i, width)} AS col "
        f"FROM (SELECT DISTINCT {key_col} FROM {src})"
        for i in range(depth)
    )
    return f"""
WITH sketch AS (
  SELECT row, col, count(*) AS cnt FROM ({cells}) GROUP BY row, col),
probes AS ({probes}),
est AS (
  SELECT {key_col}, min(coalesce(s.cnt, 0)) AS est
  FROM probes p LEFT JOIN sketch s USING (row, col)
  GROUP BY {key_col})
SELECT {key_col}, est FROM est WHERE est >= {threshold}
"""
