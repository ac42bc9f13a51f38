#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Usage:
    python bench.py                  # standard run (driver contract)
    python bench.py --cpus 8         # explicit parallelism
    python bench.py --scaling        # N vs 4N cores scaling evidence
                                     # (local[8] vs local[32] subprocesses)

The headline metric is the north_rule's: parse→enrich→route→aggregate
throughput in turns/sec over synthetic multi-turn transcripts at the
selected scale, plus per-query seconds for the other heavy operators.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(sf_dir: str) -> float:
    for tag, v in (("sf0.001", 0.001), ("sf0.01", 0.01), ("sf0.1", 0.1)):
        if tag in sf_dir:
            return v
    return 0.1


def _n_turns(sf: float) -> int:
    return {0.001: 10_000, 0.01: 100_000}.get(sf, 1_000_000)


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("logparser_spark_bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_bench(sf_dir: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    from logparser_spark.config import PipelineConfig
    from logparser_spark.entry_queries import (
        q_knn_bruteforce,
        q_lsh_candidates,
        q_token_frequency,
        q_windowed_counts,
    )
    from logparser_spark.operators.aggregate import sink_window_counts, turn_window_counts
    from logparser_spark.operators.assign import assign_templates
    from logparser_spark.operators.enrich import enrich
    from logparser_spark.operators.mine import mine_templates
    from logparser_spark.operators.route import route_write, with_sink_id
    from logparser_spark.sources.lookups import lkp_role_df, lkp_tool_df
    from logparser_spark.sources.transcripts import transcripts_df

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sf = _sf_of(sf_dir)
    n_turns = _n_turns(sf)
    cfg = PipelineConfig(num_partitions=max(cpus * 2, 8))

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # materialize the input once so parse timing excludes generation
    tdf = transcripts_df(spark, n_turns, n_convs=max(n_turns // 500, 8),
                         skew_share_pct=20, num_partitions=cfg.num_partitions)
    tdf = tdf.cache()
    tdf.count()

    # headline: full parse -> enrich -> route(write) -> aggregate
    mined = timed("parse_mine", lambda: mine_templates(tdf, cfg))
    assigned = assign_templates(tdf, mined, cfg.drain, with_params=True)
    enriched = enrich(assigned, lkp_role_df(spark), lkp_tool_df(spark))
    routed = with_sink_id(enriched, cfg)
    out_dir = tempfile.mkdtemp(prefix="bench_route_")
    try:
        timed("assign_enrich_route_write", lambda: route_write(routed, out_dir, cfg))
        back = spark.read.parquet(out_dir)
        timed(
            "aggregate_sink_windows",
            lambda: _noop_write(sink_window_counts(back, cfg)),
        )
        timed(
            "aggregate_turn_windows",
            lambda: _noop_write(turn_window_counts(back, cfg)),
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    pipeline_sec = (
        timings["parse_mine"]
        + timings["assign_enrich_route_write"]
        + timings["aggregate_sink_windows"]
        + timings["aggregate_turn_windows"]
    )
    throughput = n_turns / pipeline_sec if pipeline_sec > 0 else 0.0

    # other heavy operators at the SF tables
    timed("token_frequency", lambda: _noop_write(q_token_frequency(spark, sf_dir)))
    timed("windowed_counts", lambda: _noop_write(q_windowed_counts(spark, sf_dir)))
    timed("minhash_lsh", lambda: _noop_write(q_lsh_candidates(spark, sf_dir)))
    timed("knn_bruteforce", lambda: _noop_write(q_knn_bruteforce(spark, sf_dir)))

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "parse_enrich_route_aggregate_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_turns": n_turns,
        "cpus": cpus,
        "pipeline_sec": round(pipeline_sec, 3),
        "throughput_turns_per_sec": round(throughput, 1),
    }
    spark.stop()
    return result


def run_scaling(sf_dir: str, n_small: int = 8, n_big: int = 32) -> dict:
    """Same job at two parallelism levels → throughput + efficiency."""
    results = {}
    for cpus in (n_small, n_big):
        proc = subprocess.run(
            [sys.executable, __file__, "--cpus", str(cpus), "--sf-dir", sf_dir],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t_small = results[n_small]["throughput_turns_per_sec"]
    t_big = results[n_big]["throughput_turns_per_sec"]
    eff = (t_big / t_small) / (n_big / n_small)
    return {
        "metric": "scaling_efficiency_Nx4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": _sf_of(sf_dir),
        "throughput_small": t_small,
        "throughput_big": t_big,
        "cores_small": n_small,
        "cores_big": n_big,
        "runs": results,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()
    if args.scaling:
        print(json.dumps(run_scaling(args.sf_dir)))
    else:
        print(json.dumps(run_bench(args.sf_dir, args.cpus)))
