"""Enrichment broadcast joins (J3 in SURVEY §2.3).

Lookup dims keyed on ``role`` / ``tool`` are tiny → explicit
``F.broadcast`` left joins: broadcast hash join, no shuffle of the fact
side, null-preserving for dim misses (dead rows route like any other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(df: DataFrame, lkp_role: DataFrame, lkp_tool: DataFrame) -> DataFrame:
    return df.join(F.broadcast(lkp_role), on="role", how="left").join(
        F.broadcast(lkp_tool), on="tool", how="left"
    )
