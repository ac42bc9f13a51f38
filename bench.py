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


def _local_dirs() -> str:
    """Prefer tmpfs for shuffle/spill — local-mode shuffles go through the
    driver host's disk and 32 concurrent writers thrash a single block
    device; RAM-backed dirs restore scaling. On a real cluster this maps
    to SSD-backed spark.local.dir per executor."""
    cand = "/dev/shm/spark-local"
    try:
        os.makedirs(cand, exist_ok=True)
        return cand
    except OSError:
        return tempfile.gettempdir()


def build_spark(cpus: int, executors: int = 0):
    """``executors == 0`` → single-JVM ``local[cpus]``.

    ``executors > 0`` → ``local-cluster[executors, cpus, mem]``: real
    executor JVMs + netty shuffle on one box — the cluster-shaped
    deployment (several small executors per node, the standard sizing
    precisely because single-JVM scaling degrades with core count: GC
    and memory-manager contention grow superlinearly; measured in
    BENCH/BASELINE.md).
    """
    from pyspark.sql import SparkSession

    if executors:
        # local-cluster is standalone mode: Worker JVMs OVERRIDE
        # spark.local.dir with SPARK_LOCAL_DIRS (Spark warns about it),
        # so without this env the executors shuffle to /tmp — the one
        # block device — while single-JVM legs shuffle to tmpfs, and the
        # 16-slot leg dies of disk contention exactly where shuffle
        # volume is highest (measured: assign+route leg 2x slower).
        os.environ["SPARK_LOCAL_DIRS"] = _local_dirs()
    exec_mem_mb = int(os.environ.get("SPARK_EXEC_MEM_MB", str(max(cpus, 1) * 4096)))
    total = cpus * executors if executors else cpus
    master = (
        f"local-cluster[{executors},{cpus},{exec_mem_mb}]"
        if executors
        else f"local[{cpus}]"
    )
    b = (
        SparkSession.builder.master(master)
        .config("spark.local.dir", _local_dirs())
        .appName("logparser_spark_bench")
        .config("spark.sql.shuffle.partitions", str(max(total * 2, 8)))
        .config("spark.default.parallelism", str(total))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # route_write uses an AQE REBALANCE hint; equal ~24MB write tasks
        # pack into any slot count with low quantization loss (the 64MB
        # default yields 2.5-wave stages at bench sizes — on a real
        # cluster keep 64-128MB, the task count is thousands either way)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "24MB")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.task.cpus", os.environ.get("SPARK_TASK_CPUS", "1"))
        .config("spark.ui.enabled", "false")
    )
    evlog = os.environ.get("SPARK_GRAFT_EVENTLOG")
    if evlog:
        # stage-level decomposition for scaling analysis (parse the JSON
        # event log for per-stage times instead of guessing from wall)
        os.makedirs(evlog, exist_ok=True)
        b = b.config("spark.eventLog.enabled", "true").config(
            "spark.eventLog.dir", evlog
        )
    if executors:
        b = (
            b.config("spark.executor.memory", f"{exec_mem_mb - 2048}m")
            .config("spark.executorEnv.PYTHONPATH", REPO)
            .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        )
    return b.getOrCreate()


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _warmup(spark, parts: int) -> float:
    """Fork + import-warm every Python worker and JIT the Arrow paths.

    One-time per Spark application (~10-40 s for 32 workers, dominated by
    32 concurrent pandas imports); excluded from steady-state throughput
    and reported separately as ``warmup_sec`` — a 10^12-turn production
    job amortizes this to zero.
    """
    import pandas as pd

    t0 = time.time()

    def trivial(batches):
        # the sleep is the point: instant tasks let one worker per
        # executor drain every partition serially, so most workers never
        # fork until the FIRST MEASURED repeat (observed: big-leg sample
        # 1 at 2.3x sample 3). Holding each task ~1 s forces every slot
        # concurrently busy -> every worker forks + imports here instead.
        n = 0
        for b in batches:
            n += len(b)
        time.sleep(1.0)
        yield pd.DataFrame({"n": [n]})

    df = spark.range(0, parts * 10, 1, parts)
    df.mapInPandas(trivial, "n long").collect()
    # the scalar pandas_udf path (assign) JITs separately from mapInPandas
    from pyspark.sql import functions as F

    _one = F.pandas_udf(lambda s: s * 0 + 1, "long")
    df.select(_one(F.col("id"))).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def run_bench(sf_dir: str, cpus: int, n_turns_override: int = 0,
              pipeline_only: bool = False, executors: int = 0,
              repeats: int = 3, input_parquet: bool = False) -> dict:
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

    requested_cpus = cpus
    # A PySpark task slot occupies ~2 hot threads (JVM task + Python
    # worker), so slots are capped at half the physical cores: measured
    # local[16] beats local[32] on every stage on this 32-core box
    # (12.9 s vs 16.6 s total at sf0.1 — BENCH/BASELINE.md).
    half_cores = max((os.cpu_count() or 2) // 2, 1)
    if not executors and cpus > half_cores:
        cpus = half_cores
    spark = build_spark(cpus, executors)
    spark.sparkContext.setLogLevel("ERROR")
    sf = _sf_of(sf_dir)
    n_turns = n_turns_override or _n_turns(sf)
    total_cores = cpus * executors if executors else cpus
    # partitions follow DATA SIZE, not just cores (min ~750k turns per
    # partition): with cores-only sizing the 48 M-turn legs ran the route
    # write as 2 waves of fat tasks and the straggler set the stage time
    # (measured: 8-slot assign leg 166 s at 16 parts -> 109 s at 64).
    # Real clusters size partitions to ~128-256 MB for the same reason.
    parts = int(os.environ.get("SPARK_GRAFT_PARTS", "0")) or max(
        total_cores * 2, n_turns // 750_000, 8
    )
    cfg = PipelineConfig(num_partitions=parts)

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}

    def timed(name: str, fn, n: int = 0):
        """Best-of-N wall time, ALL samples recorded (VERDICT r2 #6: a
        single host stall must not be able to poison the recorded JSON —
        the sandbox shows sporadic noisy-neighbor stalls where identical
        jobs vary 4-30 s with idle guest CPU and no Spark warnings; the
        minimum reflects true engine cost, the spread shows the noise).
        Each repeat re-executes the full action inside the same JVM."""
        out = None
        runs: list[float] = []
        for _ in range(n or repeats):
            t0 = time.time()
            out = fn()
            runs.append(round(time.time() - t0, 3))
        samples[name] = runs
        timings[name] = min(runs)
        return out

    # materialize the input once so parse timing excludes generation
    tdf = transcripts_df(spark, n_turns, n_convs=max(n_turns // 500, 8),
                         skew_share_pct=20, num_partitions=cfg.num_partitions)
    in_dir = None
    if input_parquet:
        # scaling legs: write the input to tmpfs parquet and re-read it.
        # Caching would bias the N-vs-4N ratio (one small executor cannot
        # hold what 4 can; a partially-cached leg silently re-generates),
        # and a real job reads its input from storage anyway.
        in_dir = tempfile.mkdtemp(prefix="bench_input_", dir=_local_dirs())
        tdf.write.mode("overwrite").parquet(in_dir)
        # size scan splits to the target parallelism: the default 128 MB
        # maxPartitionBytes turns a ~400 MB input into 3 splits and
        # starves every core past the 4th (observed: 16-core leg slower
        # than 4-core). On a real cluster the 100 TB input has plenty of
        # splits; here the split size must follow the input size.
        # one split per input file, exactly: sizing splits as bytes//parts
        # re-splits every file that rounds a hair over and yields e.g. 36
        # splits for 32 files — 36 tasks over 8 slots is 4.5 waves, a
        # built-in 0.90 occupancy cap (measured via event logs). The
        # input was WRITTEN with `parts` partitions, so file count ==
        # parts; cover the largest file and each file is one split.
        fsizes = [
            os.path.getsize(os.path.join(in_dir, f))
            for f in os.listdir(in_dir)
            if f.endswith(".parquet")
        ]
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes",
            str(max(fsizes) + (4 << 20)),
        )
        tdf = spark.read.parquet(in_dir)
    else:
        tdf = tdf.cache()
        tdf.count()
    warmup_sec = _warmup(spark, cfg.num_partitions)

    # headline: full parse -> enrich -> route(write) -> aggregate
    mined = timed("parse_mine", lambda: mine_templates(tdf, cfg))
    assigned = assign_templates(tdf, mined, cfg.drain, with_params=True)
    enriched = enrich(assigned, lkp_role_df(spark), lkp_tool_df(spark))
    routed = with_sink_id(enriched, cfg)
    # route output on tmpfs: on a real cluster sink bandwidth (HDFS/S3/
    # Iceberg) scales with executors; a single local block device does not,
    # so RAM-backed output isolates compute scaling from the one disk.
    out_dir = tempfile.mkdtemp(prefix="bench_route_", dir=_local_dirs())
    # SPARK_GRAFT_TPLMAP=1 -> ship NULL templates through the write-side
    # shuffle, re-derive post-shuffle from the broadcast KB (A/B lever)
    tpl_kb = mined if os.environ.get("SPARK_GRAFT_TPLMAP") == "1" else None
    try:
        timed(
            "assign_enrich_route_write",
            lambda: route_write(routed, out_dir, cfg, templates=tpl_kb),
        )
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
        if in_dir:
            shutil.rmtree(in_dir, ignore_errors=True)
    pipeline_sec = (
        timings["parse_mine"]
        + timings["assign_enrich_route_write"]
        + timings["aggregate_sink_windows"]
        + timings["aggregate_turn_windows"]
    )
    throughput = n_turns / pipeline_sec if pipeline_sec > 0 else 0.0

    # other heavy operators at the SF tables
    if not pipeline_only:
        timed("token_frequency", lambda: _noop_write(q_token_frequency(spark, sf_dir)))
        timed("windowed_counts", lambda: _noop_write(q_windowed_counts(spark, sf_dir)))
        # first execution pays whole-stage codegen compile for the wide
        # md5 chain (~4 s one-time), later repeats read warm
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
        "requested_cpus": requested_cpus,
        "executors": executors,
        "total_cores": total_cores,
        "pipeline_sec": round(pipeline_sec, 3),
        "throughput_turns_per_sec": round(throughput, 1),
        "warmup_sec": warmup_sec,
        "samples": samples,
        "repeats": repeats,
    }
    spark.stop()
    return result


def _drain_jvms(timeout_s: int = 150) -> None:
    """Wait for stray Spark JVMs to exit before starting a leg.

    local-cluster worker/executor JVMs outlive the leg's python process
    by up to ~2 min (executors detect driver death via heartbeat
    timeouts, not process exit), and a next leg started inside that
    window measures their shutdown, not the engine — observed: the 4x4
    leg's assign stage at 86 s vs 18 s solo.  Poll until quiet, then
    hard-kill whatever remains.
    """
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        out = subprocess.run(
            ["pgrep", "-f", "org.apache.spark"], capture_output=True, text=True
        )
        if not out.stdout.strip():
            return
        time.sleep(2)
    subprocess.run(["pkill", "-9", "-f", "org.apache.spark"], capture_output=True)
    time.sleep(3)


def run_scaling(sf_dir: str, n_small: int = 4, n_big: int = 16,
                n_turns: int = 4_000_000, cluster: bool = False,
                repeats: int = 3, exec_cores: int = 0,
                execs_small: int = 1) -> dict:
    """Same job at two parallelism levels → throughput + efficiency.

    ``cluster=False``: single-JVM local[4] vs local[16] (N vs 4N cores in
    one JVM; every PySpark task slot occupies ~2 hot threads, so 16+16
    fills the 32-core box).  This is transparent but measures an
    anti-pattern deployment — nobody runs 16-core executors, because
    single-JVM efficiency degrades with core count (GC + memory-manager
    contention; see BENCH/BASELINE.md's decomposition).

    ``cluster=True``: the cluster-shaped measurement — the SAME job on
    ``local-cluster[1,4]`` vs ``local-cluster[4,4]``: one vs four real
    4-core executor JVMs with netty shuffle, i.e. exactly what adding
    three workers to a one-worker cluster does, minus the NICs.
    """
    results = {}
    if cluster:
        # executor shape: `exec_cores`-core executors, execs_small of
        # them on the small leg and 4x that on the big leg — the literal
        # "N vs 4N executors" pairing of the north rule.  Default
        # (exec_cores=n_small, execs_small=1) is the r2 1x4 -> 4x4 pair;
        # --exec-cores 2 --execs-small 2 measures 2x2 -> 8x2, the
        # many-small-JVMs regime the interference experiment showed this
        # box sustains at 0.93.
        ec = exec_cores or n_small
        n_small = ec * execs_small
        n_big = n_small * 4
        legs = [
            ("small", ["--cpus", str(ec), "--executors", str(execs_small)]),
            ("big", ["--cpus", str(ec), "--executors", str(execs_small * 4)]),
        ]
    else:
        legs = [
            ("small", ["--cpus", str(n_small)]),
            ("big", ["--cpus", str(n_big)]),
        ]
    for tag, leg_args in legs:
        _drain_jvms()
        proc = subprocess.run(
            [sys.executable, __file__, *leg_args, "--sf-dir", sf_dir,
             "--turns", str(n_turns), "--pipeline-only",
             "--repeats", str(repeats), "--input-parquet"],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[tag] = json.loads(line)
    t_small = results["small"]["throughput_turns_per_sec"]
    t_big = results["big"]["throughput_turns_per_sec"]
    eff = (t_big / t_small) / (n_big / n_small)
    return {
        "metric": "scaling_efficiency_Nx4N"
        + ("_cluster_shaped" if cluster else "_single_jvm"),
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": _sf_of(sf_dir),
        "throughput_small": t_small,
        "throughput_big": t_big,
        "cores_small": n_small,
        "cores_big": n_big,
        "runs": results,
    }


def run_interference(sf_dir: str, cpus: int = 4, n_legs: int = 4,
                     n_turns: int = 8_000_000) -> dict:
    """Measure the single-box shared-resource floor directly.

    ``n_legs`` *independent* local[cpus] pipelines run concurrently on
    disjoint inputs — the exact thread/memory footprint of one
    local[cpus*n_legs] run, but with ZERO Spark-level coordination
    between them.  Any per-leg slowdown vs a solo local[cpus] run is
    therefore pure host contention (one DRAM/page-cache domain carrying
    every leg's shuffle, Arrow pipes and sink writes), not engine
    serialization.  ``host_floor_efficiency`` = aggregate concurrent
    throughput / (n_legs × solo throughput): the ceiling ANY engine can
    reach at n_legs× parallelism on this box.  The engine-attributable
    efficiency of a local[cpus*n_legs] run is measured_eff / floor.
    """
    leg_cmd = [sys.executable, __file__, "--cpus", str(cpus), "--sf-dir", sf_dir,
               "--turns", str(n_turns), "--pipeline-only"]
    # keep the concurrent fleet inside the 128 GiB box: 20g/leg at <=4 legs
    # (the r3 shape), shrink proportionally beyond that.  NEVER floor the
    # per-leg size above 96/n_legs — overcommit swaps and measures a fake
    # floor (see BENCH/interference_8x2_12M_r5_memovercommit.json); a
    # too-small leg fails loudly instead, which is the failure we want
    mem_gb = max(2, min(20, 96 // n_legs))
    env = dict(os.environ, SPARK_DRIVER_MEM=f"{mem_gb}g")

    def parse(stdout: str) -> dict:
        return json.loads(
            [l for l in stdout.strip().splitlines() if l.startswith("{")][-1]
        )

    _drain_jvms()
    solo = parse(subprocess.run(
        leg_cmd, capture_output=True, text=True, cwd=REPO, env=env
    ).stdout)
    _drain_jvms()
    procs = [
        subprocess.Popen(leg_cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, cwd=REPO, env=env)
        for _ in range(n_legs)
    ]
    legs = [parse(p.communicate()[0]) for p in procs]
    t_solo = solo["throughput_turns_per_sec"]
    t_legs = [leg["throughput_turns_per_sec"] for leg in legs]
    floor = sum(t_legs) / (n_legs * t_solo) if t_solo else 0.0
    return {
        "metric": "host_floor_efficiency",
        "value": round(floor, 3),
        "unit": "ratio",
        "cpus_per_leg": cpus,
        "n_legs": n_legs,
        "n_turns_per_leg": n_turns,
        "solo_throughput": t_solo,
        "concurrent_throughputs": t_legs,
        "solo_stage_sec": solo["queries"],
        "concurrent_stage_sec": [leg["queries"] for leg in legs],
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cluster-scaling", action="store_true")
    ap.add_argument("--interference", action="store_true")
    ap.add_argument("--turns", type=int, default=0)
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--executors", type=int, default=0)
    # single-run default is 5: the host's noisy-neighbor stalls come in
    # multi-10s windows that can poison 2 of 3 consecutive samples
    # (observed 64.7 s and 25.8 s stall samples back-to-back, r5); five
    # draws make the recorded min robust to one such window at ~1 min
    # extra cost.  Scaling legs stay at 3 (minutes per sample at 96 M).
    ap.add_argument("--repeats", type=int, default=0)
    ap.add_argument("--input-parquet", action="store_true")
    ap.add_argument("--exec-cores", type=int, default=0)
    ap.add_argument("--execs-small", type=int, default=1)
    ap.add_argument("--n-legs", type=int, default=4)
    args = ap.parse_args()
    if args.scaling or args.cluster_scaling:
        print(json.dumps(run_scaling(args.sf_dir, n_turns=args.turns or 4_000_000,
                                     cluster=args.cluster_scaling,
                                     repeats=args.repeats or 3,
                                     exec_cores=args.exec_cores,
                                     execs_small=args.execs_small)))
    elif args.interference:
        print(json.dumps(run_interference(
            args.sf_dir, cpus=args.exec_cores or 4, n_legs=args.n_legs,
            n_turns=args.turns or 8_000_000)))
    else:
        print(json.dumps(run_bench(args.sf_dir, args.cpus, args.turns,
                                   args.pipeline_only, args.executors,
                                   args.repeats or 5, args.input_parquet)))
