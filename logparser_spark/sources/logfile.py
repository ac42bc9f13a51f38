"""Raw log-file source: the reference's S1/S2 entry path.

``log_format`` strings like ``'<Date> <Time> <Pid> <Level> <Component>:
<Content>'`` compile to a regex that splits each raw line into header
columns + the free-text ``Content`` (reference
``generate_logformat_regex`` ≈L325–340 / ``log_to_dataframe`` ≈L303–323).
Here the split is a chain of native ``regexp_extract`` projections over
``spark.read.text`` — codegen'd, no Python.  Unmatched lines are routed to
a ``_corrupt`` flag instead of silently dropped (dead-letter policy,
SURVEY §1.2).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def compile_log_format(log_format: str) -> tuple[list[str], str]:
    """Format spec → (header names, anchored match regex).

    Spaces between fields match arbitrary whitespace runs, mirroring the
    reference's ``\\s+`` splitter normalization.
    """
    headers: list[str] = []
    parts = re.split(r"(<[^<>]+>)", log_format)
    regex = ""
    for part in parts:
        if not part:
            continue
        if part.startswith("<") and part.endswith(">"):
            headers.append(part[1:-1])
            regex += "(.*?)" if part != "<Content>" else "(.*)"
        else:
            # re.escape escapes spaces; normalize any space run to \s+
            escaped = re.escape(part).replace("\\ ", " ")
            regex += re.sub(r" +", r"\\s+", escaped)
    return headers, "^" + regex + "$"


def read_log_file(
    spark: SparkSession,
    path: str,
    log_format: str,
    with_line_id: bool = True,
) -> DataFrame:
    """Read a raw log file into (LineId, headers..., Content, _corrupt).

    ``LineId`` is 1-based in file order (the reference's scheme,
    ``log_to_dataframe`` ≈L303–323), built scale-safely: a per-partition
    ``row_number`` (parallel — windows are partitioned by the input split)
    plus a broadcast-joined cumulative offset.  The only single-partition
    work is the running sum over the (file, partition)-row counts relation
    (KB-sized at any file size); the full data is never globally sorted.
    Cost: two scans of the file (counts + data), the standard
    dense-global-id construction.

    Multi-file inputs (directory/glob): LineId numbers the concatenation
    of the input files **sorted by file path** (within each file it is
    the 1-based file line number).  The cumulative offsets are keyed on
    ``(input_file_name, spark_partition_id)`` — not partition id alone —
    because Spark packs splits sorted by length DESCENDING, so partition
    order follows file *size* across files; within one file, equal-size
    chunks keep byte-offset order by sort stability and the short tail
    (highest offset) sorts last, so ``(file, partition_id)`` is monotone
    in file position.  Small files packed several-per-partition are
    separated by the ``_file`` key and ordered within the partition by
    ``monotonically_increasing_id`` (read order).
    """
    headers, rx = compile_log_format(log_format)
    df = spark.read.text(path)
    cols = [
        F.regexp_extract("value", rx, i + 1).alias(h) for i, h in enumerate(headers)
    ]
    out = df.select(
        F.input_file_name().alias("_file"),
        F.spark_partition_id().alias("_part"),
        F.monotonically_increasing_id().alias("_mid"),
        *cols,
        (~F.col("value").rlike(rx)).alias("_corrupt"),
        F.col("value").alias("_raw"),
    )
    if with_line_id:
        counts = out.groupBy("_file", "_part").agg(F.count(F.lit(1)).alias("_n"))
        w_off = (
            Window.orderBy("_file", "_part")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = counts.select(
            "_file",
            "_part",
            F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_offset"),
        )
        w_in = Window.partitionBy("_file", "_part").orderBy("_mid")
        out = (
            out.join(F.broadcast(offsets), ["_file", "_part"])
            .withColumn("LineId", (F.col("_offset") + F.row_number().over(w_in)).cast("long"))
            .drop("_offset")
        )
    return out.drop("_file", "_part", "_mid")
