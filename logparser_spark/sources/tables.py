"""Readers for the driver-provided parquet tables and pluggable sinks.

On a real cluster the input is an Iceberg table
(``spark.read.format('iceberg').load(...)`` — S1 in SURVEY §2.1); the
sandbox has no Iceberg jar, so the reader/writer pair is format-pluggable
with parquet as the stand-in.  Catalyst pushes filters/column pruning into
either scan the same way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def write_sink(df: DataFrame, path: str, *, fmt: str = "parquet",
               partition_by: tuple[str, ...] = (), mode: str = "overwrite") -> None:
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
