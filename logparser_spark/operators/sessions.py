"""Sessionization and temporal joins — log-pipeline staples beyond the
reference's surface (SURVEY §2.3 notes these join families; here they are
first-class operators with SQL twins).

All pure DataFrame/window compositions — no UDFs, fully codegen'd:

* :func:`sessionize` — gap-based session ids per key (new session when
  the inter-event gap exceeds ``gap``); the standard lag + cumulative-sum
  construction, one shuffle on the key.
* :func:`asof_join` — for each left row, the latest right row with
  ``ts_right <= ts_left`` per key. Spark has no native ASOF join; the
  union-tag-window construction below is the scalable equivalent (one
  shuffle, no range explosion). DuckDB's native ``ASOF JOIN`` is the
  oracle.
* :func:`range_join` — left rows matched to right intervals
  ``[start, end]`` per key (plain conditional join; at scale bucket the
  time axis to bound the join fan-out).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Attach ``session_id`` (0-based per key) and ``is_session_start``."""
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    # millisecond epochs: sub-second precision, engine-portable (DuckDB
    # epoch_ms), no float comparison
    def _ms(c: Column) -> Column:
        # unix_millis rejects TIMESTAMP_NTZ; session TZ is UTC so the
        # cast is instant-preserving
        return F.unix_millis(c.cast("timestamp"))

    gap_ms = _ms(F.col(ts_col)) - _ms(prev_ts)
    new_sess = F.when(
        prev_ts.isNull() | (gap_ms > gap_minutes * 60_000), F.lit(1)
    ).otherwise(F.lit(0))
    df2 = df.withColumn("is_session_start", new_sess == 1).withColumn(
        "_new", new_sess
    )
    sess = (F.sum("_new").over(w) - 1).alias("session_id")
    return df2.withColumn("session_id", sess).drop("_new")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left rows + the most recent right row at-or-before their timestamp.

    Union-tag-window: tag both sides, union, sort per key by
    (ts, right-before-left), carry the last-seen right payload forward
    with ``last(..., ignorenulls=True)``, keep left rows. One shuffle on
    the key — never a range cross-product.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, ts_col)]
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c + suffix)
            for c in right_cols
        ],
    )
    rt = right.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(c + suffix) for c in right_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (key, ts_col)
        ],
    )
    u = lt.unionByName(rt)
    # right rows sort before left rows at equal ts → "at or before".
    # Final tiebreak on the right payload columns: when several right rows
    # share (key, ts), the greatest payload tuple wins deterministically
    # (left rows carry NULL payloads, so the tiebreak never reorders a
    # left row relative to the rights it must see).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col), F.col("_side"), *[F.col(c + suffix) for c in right_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in right_cols:
        u = u.withColumn(c + suffix, F.last(c + suffix, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    how: str = "inner",
) -> DataFrame:
    """Match left rows to intervals containing their timestamp (per key)."""
    iv = intervals.withColumnRenamed(key, key + "_i")
    cond = (
        (left[key] == iv[key + "_i"])
        & (left[ts_col] >= iv[start_col])
        & (left[ts_col] <= iv[end_col])
    )
    return left.join(iv, cond, how).drop(key + "_i")
