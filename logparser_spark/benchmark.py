"""Loghub-style benchmark harness: per-dataset settings bank + runner.

Analog of the reference's ``benchmark/Drain_benchmark.py ≈L20–160``: a
bank of per-dataset ``{log_format, rex, st, depth}`` settings and a loop
that runs file → header-split → mask → mine → assign → evaluate against a
ground-truth structured CSV, emitting one metrics row per dataset.

The format strings and (st, depth) pairs follow the published loghub
benchmark configurations; the masking regex lists are portable
re-expressions of the same masking intents (engine-portable: no
lookbehind, usable from Python ``re``, Java regex and RE2 — the repo-wide
invariant).  Formats with optional header groups (Thunderbird/Linux/Mac
``(\\[<PID>\\])?``) are simplified to their mandatory prefix;
``compile_log_format`` has no optional-group syntax, and unmatched lines
fall into the ``_corrupt`` dead-letter lane rather than being dropped.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logparser_spark.config import DrainParams, PipelineConfig
from logparser_spark.operators.assign import assign_templates
from logparser_spark.operators.evaluate import grouping_accuracy
from logparser_spark.operators.mine import mine_templates
from logparser_spark.sources.logfile import read_log_file

_IP = r"\d+\.\d+\.\d+\.\d+(:\d+)?"
_NUM = r"\b\d+\b"
_HEX = r"0x[0-9a-fA-F]+"


@dataclass(frozen=True)
class DatasetSettings:
    log_format: str
    rex: tuple[str, ...]
    st: float
    depth: int


#: Per-dataset parser settings (reference ``benchmark_settings`` analog).
BENCHMARK_SETTINGS: dict[str, DatasetSettings] = {
    "HDFS": DatasetSettings(
        "<Date> <Time> <Pid> <Level> <Component>: <Content>",
        (r"blk_-?\d+", _IP, _NUM), 0.5, 4),
    "Hadoop": DatasetSettings(
        "<Date> <Time> <Level> [<Process>] <Component>: <Content>",
        (_IP, _NUM), 0.5, 4),
    "Spark": DatasetSettings(
        "<Date> <Time> <Level> <Component>: <Content>",
        (_NUM, r"\b\d+(\.\d+)? ?[KMG]B\b", _IP), 0.5, 4),
    "Zookeeper": DatasetSettings(
        "<Date> <Time> - <Level> [<Node>:<Component>@<Id>] - <Content>",
        (_IP, _NUM), 0.5, 4),
    "BGL": DatasetSettings(
        "<Label> <Timestamp> <Date> <Node> <Time> <NodeRepeat> <Type> "
        "<Component> <Level> <Content>",
        (r"core\.\d+", _HEX, _NUM), 0.5, 4),
    "HPC": DatasetSettings(
        "<LogId> <Node> <Component> <State> <Time> <Flag> <Content>",
        (r"=\d+", _NUM), 0.5, 4),
    "Thunderbird": DatasetSettings(
        "<Label> <Timestamp> <Date> <User> <Month> <Day> <Time> "
        "<Location> <Component>: <Content>",
        (_IP, _NUM), 0.5, 4),
    "Windows": DatasetSettings(
        "<Date> <Time>, <Level> <Component> <Content>",
        (_HEX, _NUM), 0.7, 5),
    "Linux": DatasetSettings(
        "<Month> <Date> <Time> <Level> <Component>: <Content>",
        (_IP, r"\d{2}:\d{2}:\d{2}", _NUM), 0.39, 6),
    "Android": DatasetSettings(
        "<Date> <Time> <Pid> <Tid> <Level> <Component>: <Content>",
        (r"(/[\w-]+)+", r"([\w-]+\.){2,}[\w-]+", _NUM), 0.2, 6),
    "HealthApp": DatasetSettings(
        "<Time>|<Component>|<Pid>|<Content>", (_NUM,), 0.2, 4),
    "Apache": DatasetSettings(
        "[<Time>] [<Level>] <Content>", (_IP, _NUM), 0.5, 4),
    "Proxifier": DatasetSettings(
        "[<Time>] <Program> - <Content>",
        (r"<\d+ sec", r"\b\d+(\.\d+)? ?[KMG]B\b", r"\(\d+(\.\d+)?", _NUM), 0.6, 3),
    "OpenSSH": DatasetSettings(
        "<Date> <Day> <Time> <Component> sshd[<Pid>]: <Content>",
        (_IP, r"([\w-]+\.){2,}[\w-]+", _NUM), 0.6, 5),
    "OpenStack": DatasetSettings(
        "<Logrecord> <Date> <Time> <Pid> <Level> <Component> [<ADDR>] <Content>",
        (r"((\d+\.){3}\d+,?)+", r"/.+?\s", _NUM), 0.5, 5),
    "Mac": DatasetSettings(
        "<Month> <Date> <Time> <User> <Component>: <Content>",
        (r"([\w-]+\.){2,}[\w-]+", _NUM), 0.7, 6),
}


def settings_to_config(s: DatasetSettings, num_partitions: int = 32) -> PipelineConfig:
    return PipelineConfig(
        drain=DrainParams(depth=s.depth, st=s.st, rex=s.rex),
        num_partitions=num_partitions,
    )


def parse_log_file(
    spark: SparkSession,
    path: str,
    settings: DatasetSettings,
    num_partitions: int = 32,
    strategy: str = "drain",
    sample_one_in: int = 1,
    strategy_params=None,
) -> DataFrame:
    """file → split headers → mask → mine → assign.

    Returns the reference's structured shape: LineId, headers…, Content,
    EventId, EventTemplate, ParameterList (+ ``matched``/``_corrupt``
    lanes the reference silently drops)."""
    cfg = settings_to_config(settings, num_partitions)
    raw = read_log_file(spark, path, settings.log_format)
    ok = raw.filter(~F.col("_corrupt")).withColumn("text", F.col("Content"))
    clusters = mine_templates(
        ok, cfg, sample_one_in=sample_one_in, strategy=strategy,
        partition_col="LineId", order_cols=("LineId",),
        strategy_params=strategy_params,
    )
    assigned = assign_templates(
        ok, clusters, cfg.drain, strategy=strategy,
        strategy_params=strategy_params,
    )
    headers = [h for h in raw.columns if h not in ("_corrupt", "_raw", "LineId")]
    return assigned.select(
        "LineId",
        *headers,
        F.col("event_id").alias("EventId"),
        F.col("template").alias("EventTemplate"),
        F.col("parameters").alias("ParameterList"),
        "matched",
    )


def evaluate_against_ground_truth(
    parsed: DataFrame, ground_truth: DataFrame
) -> DataFrame:
    """Join parsed output to a loghub-style structured CSV (LineId,
    EventId ground truth) and compute the pair-counting metrics."""
    joined = parsed.select("LineId", F.col("EventId").alias("pred")).join(
        ground_truth.select("LineId", F.col("EventId").alias("gt")), "LineId"
    )
    return grouping_accuracy(joined, "gt", "pred")


def run_benchmark(
    spark: SparkSession,
    entries: list[tuple[str, str, str | None]],
    num_partitions: int = 32,
    strategy: str = "drain",
    strategy_params=None,
) -> DataFrame:
    """Reference benchmark loop: ``entries`` is [(dataset_name, log_path,
    ground_truth_csv_or_None)]; returns one metrics row per dataset.

    The loop is driver-side over a handful of datasets; each iteration is
    a fully distributed parse + evaluate."""
    rows = []
    for name, log_path, gt_path in entries:
        s = BENCHMARK_SETTINGS[name]
        parsed = parse_log_file(
            spark, log_path, s, num_partitions, strategy,
            strategy_params=strategy_params,
        ).cache()
        n_lines = parsed.count()
        n_templates = parsed.select("EventId").distinct().count()
        if gt_path is not None:
            gt = spark.read.csv(gt_path, header=True, inferSchema=True)
            m = evaluate_against_ground_truth(parsed, gt).first()
            metrics = (m["precision"], m["recall"], m["f1"], m["parsing_accuracy"])
        else:
            metrics = (None, None, None, None)
        rows.append((name, n_lines, n_templates, *metrics))
        parsed.unpersist()
    return spark.createDataFrame(
        rows,
        "dataset string, n_lines long, n_templates long, precision double, "
        "recall double, f1 double, parsing_accuracy double",
    )
