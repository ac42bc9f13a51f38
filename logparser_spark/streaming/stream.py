"""Structured Streaming variant of the parse → enrich → aggregate path.

The reference is batch-only; this is the graft's continuous-ingest mode.
The same operators compose unchanged onto a streaming DataFrame:

* masking is stateless native ``regexp_replace``;
* template *assignment* is the stateless broadcast matcher (templates are
  mined offline in batch — the standard mine-offline/assign-online split);
* aggregation is a watermarked event-time tumbling window, so late turns
  beyond the watermark are dropped deterministically and state is bounded;
* the sink is parquet-append with a checkpointLocation, giving
  exactly-once per micro-batch on a real cluster.

Tested with ``trigger(availableNow=True)`` over a parquet directory —
same code path a Kafka/files source would take.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logparser_spark.config import PipelineConfig
from logparser_spark.drain import Cluster
from logparser_spark.operators.assign import assign_templates
from logparser_spark.operators.route import with_sink_id

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(path)


def streaming_assign(
    stream: DataFrame, clusters: list[Cluster], cfg: PipelineConfig | None = None
) -> DataFrame:
    cfg = cfg or PipelineConfig()
    assigned = assign_templates(stream, clusters, cfg.drain, with_params=False)
    return with_sink_id(assigned, cfg)


def streaming_sink_counts(
    routed: DataFrame,
    cfg: PipelineConfig | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-sink per-window template counts with late-data watermarking."""
    cfg = cfg or PipelineConfig()
    return (
        routed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", cfg.window_duration), "sink_id", "event_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("window.start").alias("win_start"), "sink_id", "event_id", "n_turns"
        )
    )


def run_streaming_pipeline(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint_path: str,
    clusters: list[Cluster],
    cfg: PipelineConfig | None = None,
    available_now: bool = True,
):
    """Wire source → assign → windowed counts → parquet sink; returns the
    started StreamingQuery (caller awaits termination)."""
    cfg = cfg or PipelineConfig()
    stream = read_transcript_stream(spark, in_path)
    routed = streaming_assign(stream, clusters, cfg)
    counts = streaming_sink_counts(routed, cfg)
    writer = (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
