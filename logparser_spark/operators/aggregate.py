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
    floats.

    Output long form: (keys…, pct string like 'p95', ``value_col``).

    Scale shape: one shuffle on ``keys`` + per-group sort (the window) —
    the lower bound for EXACT percentiles.  Ties rank arbitrarily but
    the selected VALUE at rank k is the k-th order statistic either way,
    so the output is deterministic.  For sketch-accuracy-is-fine paths
    use ``F.approx_percentile`` (t-digest, no cross-engine oracle).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(value_col).asc())
    wn = Window.partitionBy(*keys)
    ranked = df.select(*keys, value_col).withColumn(
        "_rn", F.row_number().over(w)
    ).withColumn("_n", F.count(F.lit(1)).over(wn))
    targets = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(f"p{round(p * 100)}").alias("pct"),
                    F.lit(float(p)).alias("_p"),
                )
                for p in ps
            ]
        )
    ).alias("_t")
    return (
        ranked.select(*keys, value_col, "_rn", "_n", targets)
        .filter(F.col("_rn") == F.ceil(F.col("_t._p") * F.col("_n")))
        .select(*keys, F.col("_t.pct").alias("pct"), value_col)
    )


def grouped_percentiles_sql(
    src: str,
    keys: list[str],
    value_expr: str,
    value_alias: str,
    ps: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> str:
    """DuckDB-SQL twin of :func:`grouped_percentiles` (same nearest-rank
    selection; ``ceil(p*n)`` computed in double on both engines, so even
    a representation epsilon rounds identically)."""
    ks = ", ".join(keys)
    vals = ", ".join(f"('p{round(p * 100)}', {float(p)})" for p in ps)
    return f"""
WITH ranked AS (
  SELECT {ks}, {value_expr} AS {value_alias},
         row_number() OVER (PARTITION BY {ks} ORDER BY {value_expr}) AS rn,
         count(*) OVER (PARTITION BY {ks}) AS n
  FROM {src})
SELECT {ks}, t.pct, {value_alias}
FROM ranked CROSS JOIN (VALUES {vals}) t(pct, p)
WHERE rn = CAST(ceil(t.p * n) AS BIGINT)
"""
