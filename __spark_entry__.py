"""Driver contract for the spark-graft builder (PySpark target).

Implementations live in :mod:`logparser_spark.entry_queries`; every
SQL-expressible operator has a DuckDB oracle with identical column
aliases.  Since r3 the flagship parse path (drain assignments, pipeline
sink counts) and eight engine template tables are hash-checked against a
DuckDB twin of the deterministic transcript generator
(:mod:`logparser_spark.oracle_twin`).  Since r4 EVERY registered query
carries an oracle: shiso/logsig check size-pinned literal template
tables over a pinned corpus, and multimodal decode — real BMP/PNG/WAV
codecs — checks decoded dims/format against the generator's
deterministic formulas (an encode→decode round-trip the twin can state
in plain SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from logparser_spark import entry_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse→enrich→route→aggregate over sf0.001-scale
    deterministic synthetic transcripts; returns per-sink windowed counts."""
    return EQ.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)
