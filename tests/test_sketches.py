"""CMS + HLL sketches: bounds, mergeability, cross-engine register equality."""

from __future__ import annotations

import hashlib
import math

import duckdb
from pyspark.sql import functions as F

from logparser_spark.operators.sketches import (
    _hll_alpha,
    cms_estimate,
    cms_heavy_hitters,
    cms_sketch,
    hll_distinct,
    hll_distinct_sql,
    hll_registers,
)

SF = "/root/testdata/sf0.001"


def _py_hll(values, log2m: int = 8):
    """Reference HLL in plain python — third implementation for the
    cross-engine register/estimate agreement tests."""
    m = 1 << log2m
    bucket_hex = log2m // 4
    regs: dict[int, int] = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        b = int(h[:bucket_hex], 16)
        suf = h[bucket_hex : bucket_hex + 10]
        stripped = suf.lstrip("0")
        if not stripped:
            rho = 41
        else:
            extra = {"1": 3, "2": 2, "3": 2}.get(
                stripped[0], 1 if stripped[0] in "4567" else 0
            )
            rho = 4 * (10 - len(stripped)) + extra + 1
        regs[b] = max(regs.get(b, 0), rho)
    s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    e = _hll_alpha(m) * m * m / s
    v_empty = m - len(regs)
    if e <= 2.5 * m and v_empty > 0:
        e = float(m) * math.log(m / v_empty)
    return regs, round(e, 4)


def test_hll_registers_match_python_reference(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").cache()
    got = {
        (r["event_type"], r["bucket"]): r["r"]
        for r in hll_registers(ev, ["event_type"], "user_id").collect()
    }
    for etype in [r[0] for r in ev.select("event_type").distinct().collect()]:
        vals = [
            r[0]
            for r in ev.filter(F.col("event_type") == etype)
            .select("user_id")
            .collect()
        ]
        want, _ = _py_hll(vals)
        mine = {b: r for (t, b), r in got.items() if t == etype}
        assert mine == want, etype


def test_hll_estimate_matches_duckdb_twin_exactly(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = (
        hll_distinct(ev, ["event_type"], "user_id")
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    want = (
        con.execute(hll_distinct_sql("events", ["event_type"], "user_id"))
        .df()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert (got["est"] == want["est"]).all()
    assert (got["n_buckets"] == want["n_buckets"]).all()


def test_hll_ignores_nulls_like_count_distinct(spark):
    """NULL values must not become a phantom register: est/n_buckets with
    NULLs present == without, in Spark AND the DuckDB twin."""
    import duckdb

    base = spark.range(100).select(
        F.lit("g").alias("g"), F.concat(F.lit("v"), "id").alias("v")
    )
    with_nulls = base.unionAll(
        spark.range(50).select(F.lit("g").alias("g"),
                               F.lit(None).cast("string").alias("v"))
    )
    a = hll_distinct(base, ["g"], "v").first()
    b = hll_distinct(with_nulls, ["g"], "v").first()
    assert (a["est"], a["n_buckets"]) == (b["est"], b["n_buckets"])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [("g", f"v{i}") for i in range(100)] + [("g", None)] * 50,
    )
    w = con.execute(hll_distinct_sql("t", ["g"], "v")).fetchone()
    assert (b["est"], b["n_buckets"]) == (w[1], w[2])


def test_hll_rejects_small_m(spark):
    import pytest

    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match=r"\[8, 16\]"):
        hll_registers(df, [], "v", log2m=4)


def test_hll_error_bound_and_mergeability(spark):
    # 20k distinct ids — the raw-estimator regime for m=256
    df = spark.range(20_000).select(
        (F.col("id") % 4).alias("g"), F.concat(F.lit("u"), "id").alias("uid")
    )
    est = {r["g"]: r["est"] for r in hll_distinct(df, ["g"], "uid").collect()}
    for g, e in est.items():
        exact = 5_000
        assert abs(e - exact) / exact < 3 * 1.04 / math.sqrt(256), (g, e)
    # mergeability: registers of the union == cell-wise MAX of split
    # registers (the property that makes per-split partials sound)
    a = df.filter("id % 2 = 0")
    b = df.filter("id % 2 = 1")
    union_regs = hll_registers(df, ["g"], "uid")
    merged = (
        hll_registers(a, ["g"], "uid")
        .unionAll(hll_registers(b, ["g"], "uid"))
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("r"))
    )
    assert union_regs.exceptAll(merged).count() == 0
    assert merged.exceptAll(union_regs).count() == 0


def test_cms_never_undercounts_and_grid_bounded(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").cache()
    depth, width = 4, 256
    sk = cms_sketch(ev, "user_id", depth, width).cache()
    # grid bound: at most depth*width cells, total mass = depth * n_rows
    assert sk.count() <= depth * width
    assert sk.agg(F.sum("cnt")).first()[0] == depth * ev.count()
    est = cms_estimate(
        ev.select("user_id").distinct(), sk, "user_id", depth, width
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    joined = est.join(exact, "user_id").toPandas()
    assert (joined["est"] >= joined["c"]).all()  # one-sided


def test_cms_heavy_hitters_superset_of_exact(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").cache()
    thr = 12
    hh = cms_heavy_hitters(ev, "user_id", thr, depth=4, width=512).toPandas()
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= thr)
        .toPandas()
    )
    assert set(exact["user_id"]) <= set(hh["user_id"])


def test_quantile_sketch_mergeable_and_bounded(spark):
    from logparser_spark.operators.sketches import (
        quantile_sample,
        quantile_sketch,
    )

    # 20k uniform values per group: sample quantile must track the true
    # quantile within the DKW band for k=256
    df = spark.range(40_000).select(
        (F.col("id") % 2).alias("g"),
        F.col("id").alias("rid"),
        (F.xxhash64("id") % 10_000).alias("v"),
    ).filter("v >= 0")
    got = quantile_sketch(df, ["g"], "v", "rid", [5000, 9000], k=256).collect()
    for r in got:
        p = r["p_pct"] / 10_000
        frac = (r["est"] + 1) / 10_000  # uniform over [0, 9999]
        assert abs(frac - p) < 3 * 0.05, r  # ~sqrt(ln(2/δ)/2k) band
        assert r["n_sample"] == 256
    # mergeability: re-ranked union of split samples == full sample
    a, b = df.filter("rid % 2 = 0"), df.filter("rid % 2 = 1")
    from pyspark.sql import Window

    union = quantile_sample(a, ["g"], "v", "rid", 256).unionAll(
        quantile_sample(b, ["g"], "v", "rid", 256)
    )
    w = Window.partitionBy("g").orderBy("_rk")
    remerged = (
        union.withColumn("_rn", F.row_number().over(w))
        .filter("_rn <= 256").drop("_rn")
    )
    full = quantile_sample(df, ["g"], "v", "rid", 256)
    assert full.exceptAll(remerged).count() == 0
    assert remerged.exceptAll(full).count() == 0


def test_quantile_sketch_plan_uses_window_group_limit(spark):
    """The rank filter must prune map-side (WindowGroupLimit): each map
    task ships at most k rows per group — never a full per-group sort of
    the data through the exchange."""
    from logparser_spark.operators.sketches import quantile_sketch

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = (
        quantile_sketch(ev, ["event_type"], "value", "event_id", [5000], 64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
