"""Windowed grouped aggregates with explicit salted-key skew handling (A7).

North_rule requires per-sink grouped counts over windows keyed by
``(conv_id, turn_idx)`` with explicit salting.  ``salted_agg`` is the
generic two-stage pattern:

    stage 1: groupBy(keys…, salt)  → partial aggregate   (shuffle #1,
             a hot key's rows spread over ``salt_buckets`` reducers)
    stage 2: groupBy(keys…)        → final combine        (shuffle #2,
             one row per (key, salt) — tiny)

Spark's hash aggregate already does map-side partial combine, which
handles *count-like* skew well; explicit salting is the insurance for the
true pathological case (one key ≫ executor memory at the reducer, or
memory-heavy aggregates like ``collect_set``) and is proven equal to the
naive plan in tests (salted == unsalted on the skew fixture).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logparser_spark.config import PipelineConfig


def salted_agg(
    df: DataFrame,
    keys: list[str | Column],
    aggs: dict[str, tuple[str, str]] | None = None,
    salt_buckets: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-stage salted aggregate.

    ``aggs`` maps output column → ``("count", "sum")`` (row count) or
    ``(input_col, partial_fn, final_fn)`` for any aggregate with a
    distributive/algebraic decomposition — e.g. ``("value", "sum", "sum")``,
    ``("value", "max", "max")``, ``("value", "min", "min")``.  Default is a
    row count named ``n``.  Non-decomposable aggregates (avg, median) must
    be expressed by the caller as sum+count.  ``salt_on`` columns feed the
    deterministic salt (defaults to a uniform random-ish but deterministic
    function of all key columns plus ``turn_idx`` when present).
    """
    aggs = aggs or {"n": ("count", "sum")}
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    named = [k.alias(f"_k{i}") for i, k in enumerate(key_cols)]
    key_names = [f"_k{i}" for i in range(len(key_cols))]

    specs = []  # (out_col, src_col | None, partial_fn, final_fn)
    for out_col, spec in aggs.items():
        if len(spec) == 2:
            pfn, ffn = spec
            specs.append((out_col, None, pfn, ffn))
        else:
            src, pfn, ffn = spec
            specs.append((out_col, src, pfn, ffn))

    salt_src = salt_on or [c for c in ("turn_idx", "conv_id", "event_id") if c in df.columns]
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_src]) if salt_src else F.spark_partition_id(),
                  F.lit(salt_buckets)).alias("_salt")

    src_cols = sorted({s[1] for s in specs if s[1] is not None})
    base = df.select(*named, salt, *src_cols)
    partials = [
        getattr(F, pfn)(F.lit(1) if src is None else F.col(src)).alias(f"_p_{out_col}")
        for out_col, src, pfn, _ in specs
    ]
    finals = [
        getattr(F, ffn)(F.col(f"_p_{out_col}")).alias(out_col)
        for out_col, _, _, ffn in specs
    ]
    stage1 = base.groupBy(*key_names, "_salt").agg(*partials)
    stage2 = stage1.groupBy(*key_names).agg(*finals)
    out = stage2
    for i, k in enumerate(keys):
        name = k if isinstance(k, str) else f"key{i}"
        out = out.withColumnRenamed(f"_k{i}", name)
    return out


def sink_window_counts(df: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Per-sink counts per event-time tumbling window per template."""
    cfg = cfg or PipelineConfig()
    win = F.window("ts", cfg.window_duration)
    base = df.select(
        "sink_id",
        win["start"].alias("win_start"),
        "event_id",
        "conv_id",
        "turn_idx",
    )
    out = salted_agg(
        base,
        keys=["sink_id", "win_start", "event_id"],
        salt_buckets=cfg.salt_buckets,
    )
    return out.select("sink_id", "win_start", "event_id", F.col("n").alias("n_turns"))


def turn_window_counts(df: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Counts per (conv_id, turn-index bucket) window per template —
    the (conv_id, turn_idx)-keyed window of the north_star."""
    cfg = cfg or PipelineConfig()
    bucket = (F.floor(F.col("turn_idx") / cfg.turn_bucket) * cfg.turn_bucket).alias("turn_bucket")
    base = df.select("conv_id", bucket, "event_id", "turn_idx")
    out = salted_agg(
        base,
        keys=["conv_id", "turn_bucket", "event_id"],
        salt_buckets=cfg.salt_buckets,
    )
    return out.select("conv_id", "turn_bucket", "event_id", F.col("n").alias("n_turns"))


#: percentile fractions are interpreted at 4-decimal precision so the
#: rank is computed in EXACT integer arithmetic on both engines:
#: rank = ceil(p_num * n / 10_000) = (p_num*n + 9_999) div 10_000.
#: (Double ``ceil(p*n)`` can land one rank high when the product's
#: binary representation sits a hair above the exact value, e.g.
#: p=0.07, n=100 → 7.0000000000000007 → rank 8.)
_PCT_DENOM = 10_000


def _pct_num(p: float) -> int:
    num = round(p * _PCT_DENOM)
    if not 0 < num <= _PCT_DENOM:
        raise ValueError(f"percentile fraction {p} outside (0, 1]")
    return num


def grouped_percentiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    ps: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Exact per-group percentiles by the nearest-rank definition: the
    p-th percentile is the ``ceil(p*n)``-th smallest value (duplicates
    counted) — ``percentile_disc`` semantics, engine-portable because it
    selects an EXISTING value by integer rank instead of interpolating
    floats.  The rank itself is exact integer arithmetic (see
    ``_PCT_DENOM``), never a double ``ceil``.

    Output long form: (keys…, pct string like 'p95', ``value_col``).

    Scale shape: ``groupBy(keys, value).count()`` first (map-side
    combinable hash aggregate), then a cumulative count over the DISTINCT
    values within each key — the per-group window sorts at most
    |value domain| rows, not |group rows|, so a Zipf-head group never
    lands in one task as raw rows.  The rank-k value is the first
    distinct value whose cumulative count reaches k.  This is the
    scale-safe exact plan for bounded-cardinality values (cents bigints
    here); for sketch-accuracy-is-fine paths use ``F.approx_percentile``
    (t-digest, no cross-engine oracle).
    """
    from pyspark.sql import Window

    agg = df.groupBy(*keys, value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*keys)
    cum = agg.withColumn("_cum", F.sum("_cnt").over(w)).withColumn(
        "_n", F.sum("_cnt").over(wn)
    )
    targets = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(f"p{round(p * 100)}").alias("pct"),
                    F.lit(_pct_num(p)).alias("pnum"),
                )
                for p in ps
            ]
        )
    ).alias("_t")
    # integer division via expr (`div`), not float `/`
    with_rank = cum.select(*keys, value_col, "_cnt", "_cum", "_n", targets).withColumn(
        "_rank",
        F.expr(f"(_t.pnum * _n + {_PCT_DENOM - 1}) div {_PCT_DENOM}"),
    )
    return with_rank.filter(
        (F.col("_cum") >= F.col("_rank"))
        & (F.col("_cum") - F.col("_cnt") < F.col("_rank"))
    ).select(*keys, F.col("_t.pct").alias("pct"), value_col)


def grouped_percentiles_sql(
    src: str,
    keys: list[str],
    value_expr: str,
    value_alias: str,
    ps: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> str:
    """DuckDB-SQL twin of :func:`grouped_percentiles` (same pre-aggregated
    cumulative-count selection, same exact integer rank arithmetic)."""
    ks = ", ".join(keys)
    vals = ", ".join(f"('p{round(p * 100)}', {_pct_num(p)})" for p in ps)
    d = _PCT_DENOM
    return f"""
WITH agg AS (
  SELECT {ks}, {value_expr} AS {value_alias}, count(*) AS cnt
  FROM {src} GROUP BY {ks}, {value_alias}),
cum AS (
  SELECT {ks}, {value_alias}, cnt,
         sum(cnt) OVER (PARTITION BY {ks} ORDER BY {value_alias}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY {ks}) AS n
  FROM agg)
SELECT {ks}, t.pct, {value_alias}
FROM cum CROSS JOIN (VALUES {vals}) t(pct, pnum)
WHERE cum >= (t.pnum * n + {d - 1}) // {d}
  AND cum - cnt < (t.pnum * n + {d - 1}) // {d}
"""
