"""Grouping-accuracy evaluator (A6): distributed port of the reference's
``utils/evaluator.py`` (``get_accuracy`` ≈L30–100).

Metrics over (ground-truth group, predicted group) assignments per line:

* pair precision / recall / F1 — over all C(n,2) same-group line pairs;
* parsing accuracy (PA) — fraction of lines whose predicted group
  corresponds *exactly* (same member set) to one ground-truth group.

All four reduce to three grouped counts — fully relational, no Python,
and SQL-expressible (used as a DuckDB-checked driver query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairs(n: F.Column) -> F.Column:
    return (n * (n - 1) / 2).cast("double")


def grouping_accuracy(df: DataFrame, gt_col: str, pred_col: str) -> DataFrame:
    """One-row frame: precision, recall, f1, parsing_accuracy (4 dp)."""
    joint = df.groupBy(gt_col, pred_col).agg(F.count(F.lit(1)).alias("n")).cache()
    gt_sizes = joint.groupBy(gt_col).agg(F.sum("n").alias("gt_n"))
    pred_sizes = joint.groupBy(pred_col).agg(F.sum("n").alias("pred_n"))

    true_pairs = joint.agg(F.sum(_pairs(F.col("n")))).first()[0] or 0.0
    gt_pairs = gt_sizes.agg(F.sum(_pairs(F.col("gt_n")))).first()[0] or 0.0
    pred_pairs = pred_sizes.agg(F.sum(_pairs(F.col("pred_n")))).first()[0] or 0.0
    total = df.count()

    # a predicted group is exact iff it is the only cell of both its row
    # (gt group) and column (pred group) in the joint table
    exact = (
        joint.join(gt_sizes, gt_col)
        .join(pred_sizes, pred_col)
        .filter((F.col("n") == F.col("gt_n")) & (F.col("n") == F.col("pred_n")))
        .agg(F.sum("n"))
        .first()[0]
        or 0
    )

    precision = true_pairs / pred_pairs if pred_pairs else 0.0
    recall = true_pairs / gt_pairs if gt_pairs else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    pa = exact / total if total else 0.0
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                round(precision, 4),
                round(recall, 4),
                round(f1, 4),
                round(pa, 4),
            )
        ],
        "precision double, recall double, f1 double, parsing_accuracy double",
    )


def grouping_accuracy_sql(table_expr: str, gt_col: str, pred_col: str) -> str:
    """DuckDB-SQL twin of :func:`grouping_accuracy`."""
    return f"""
WITH joint AS (
  SELECT {gt_col} AS g, {pred_col} AS p, count(*) AS n
  FROM {table_expr} GROUP BY 1, 2
),
gt AS (SELECT g, sum(n) AS gt_n FROM joint GROUP BY g),
pr AS (SELECT p, sum(n) AS pred_n FROM joint GROUP BY p),
stats AS (
  SELECT
    (SELECT sum(n * (n - 1) / 2.0) FROM joint) AS true_pairs,
    (SELECT sum(gt_n * (gt_n - 1) / 2.0) FROM gt) AS gt_pairs,
    (SELECT sum(pred_n * (pred_n - 1) / 2.0) FROM pr) AS pred_pairs,
    (SELECT sum(n) FROM joint) AS total,
    (SELECT coalesce(sum(n), 0) FROM joint
       JOIN gt USING (g) JOIN pr USING (p)
       WHERE n = gt_n AND n = pred_n) AS exact
)
SELECT
  round(CASE WHEN pred_pairs > 0 THEN true_pairs / pred_pairs ELSE 0 END, 4) AS precision,
  round(CASE WHEN gt_pairs > 0 THEN true_pairs / gt_pairs ELSE 0 END, 4) AS recall,
  round(CASE WHEN true_pairs > 0 AND (true_pairs / pred_pairs + true_pairs / gt_pairs) > 0
        THEN 2 * (true_pairs / pred_pairs) * (true_pairs / gt_pairs)
             / (true_pairs / pred_pairs + true_pairs / gt_pairs) ELSE 0 END, 4) AS f1,
  round(exact * 1.0 / total, 4) AS parsing_accuracy
FROM stats
"""
