"""Count-min sketch: one-sided estimates, grid bound, heavy hitters."""

from __future__ import annotations

from pyspark.sql import functions as F

from logparser_spark.operators.sketches import (
    cms_estimate,
    cms_heavy_hitters,
    cms_sketch,
)

SF = "/root/testdata/sf0.001"


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
