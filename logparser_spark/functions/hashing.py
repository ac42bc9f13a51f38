"""Stable hashing expressions.

``event_id_expr`` reproduces the reference's EventId scheme —
``md5(template)[:8]`` (``Drain/Drain.py`` ≈L205–210) — as a native
expression, byte-identical to :func:`logparser_spark.drain.event_id_of`.

``bucket_expr`` derives deterministic bucket ids from string keys using
md5 (not Murmur3 ``F.hash``) so the same value buckets identically in
Spark, DuckDB oracles, and plain Python — needed for checkpoint manifests
and salted aggregation to be engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def event_id_expr(template_col: Column | str) -> Column:
    c = F.col(template_col) if isinstance(template_col, str) else template_col
    return F.substring(F.md5(c), 1, 8)


def bucket_expr(key_col: Column | str, num_buckets: int) -> Column:
    """Deterministic bucket in [0, num_buckets): md5 low nibbles mod n.

    Uses the last 8 hex chars of md5 → bigint → pmod. ``conv(..., 16, 10)``
    on 8 hex chars fits in a signed 64-bit int, so no overflow wrap.
    """
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(F.conv(F.substring(F.md5(c), 25, 8), 16, 10).cast("long"), F.lit(num_buckets))


def bucket_sql(key_sql: str, num_buckets: int) -> str:
    """DuckDB-SQL equivalent of :func:`bucket_expr` (for oracles)."""
    return (
        f"(CAST(('0x' || substring(md5({key_sql}), 25, 8)) AS BIGINT) % {num_buckets})"
    )


def py_bucket(key: str, num_buckets: int) -> int:
    """Plain-Python equivalent of :func:`bucket_expr` (for the oracle tests
    and the manifest bookkeeping)."""
    import hashlib

    return int(hashlib.md5(key.encode("utf-8")).hexdigest()[24:32], 16) % num_buckets
