"""P1 "preprocess" masking as a native expression chain.

The reference applies each user regex with ``re.sub(rx, '<*>', text)`` per
row in Python (``Drain/Drain.py`` ≈L298–301 ``preprocess``).  Here the same
semantics compile to a chain of ``regexp_replace`` calls — pure Catalyst
expressions, whole-stage-codegen'd, zero Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

from logparser_spark.config import DEFAULT_REX, WILDCARD


def mask_expr(col: Column | str, rex: Iterable[str] = DEFAULT_REX) -> Column:
    """``text`` column → masked text (every regex match → ``<*>``)."""
    c = F.col(col) if isinstance(col, str) else col
    for rx in rex:
        c = F.regexp_replace(c, rx, WILDCARD)
    return c


def mask_sql(col_sql: str, rex: Iterable[str] = DEFAULT_REX) -> str:
    """The same masking chain as ANSI/DuckDB SQL text (for oracles).

    DuckDB's ``regexp_replace`` replaces only the first match unless the
    ``'g'`` flag is passed; Spark's replaces all — so the oracle form adds
    ``'g'``.
    """
    expr = col_sql
    for rx in rex:
        escaped = rx.replace("'", "''")
        expr = f"regexp_replace({expr}, '{escaped}', '<*>', 'g')"
    return expr
