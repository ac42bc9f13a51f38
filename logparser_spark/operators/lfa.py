"""Token-frequency templating — the LFA/SLCT/LogCluster algorithm family.

Reference analogs: ``LFA/LFA.py`` (token-frequency analysis, ≈L40–110)
and the C/Perl frequent-itemset parsers it wraps (``SLCT``/``LogCluster``,
S6 in SURVEY §2.1 — their engines are not ported; this operator covers
the shared semantics): a (position, token) pair occurring at least
``min_support`` times is a *constant*; everything else is a parameter
masked to ``<*>``; a line's template is its per-position constants.

Unlike Drain this is a pure relational computation — explode, count,
join, re-assemble — so it runs entirely JVM-side and scales as two
shuffles (token-frequency agg + per-line regroup), both map-side
combinable.  It doubles as a second, independent mining strategy for the
pipeline (mine-offline/assign-online works the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logparser_spark.config import WILDCARD
from logparser_spark.functions.text import tokens_expr


def lfa_assign(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_support: int = 10,
) -> DataFrame:
    """Per-row (id, template, event_id) via (position, token) support."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_expr(text_col)).alias("pos0", "token"),
    ).select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), "token")
    freq = toks.groupBy("pos", "token").agg(F.count(F.lit(1)).alias("cnt"))
    masked = toks.join(freq, ["pos", "token"]).select(
        F.col(id_col),
        "pos",
        F.when(F.col("cnt") >= min_support, F.col("token"))
        .otherwise(F.lit(WILDCARD))
        .alias("kept"),
    )
    assembled = masked.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "kept"))),
                lambda s: s["kept"],
            ),
        ).alias("template")
    )
    return assembled.select(
        F.col(id_col),
        "template",
        F.substring(F.md5("template"), 1, 8).alias("event_id"),
    )


def lfa_template_counts(
    df: DataFrame, id_col: str, text_col: str, min_support: int = 10
) -> DataFrame:
    """Distinct templates with occurrence counts (the template-table sink
    S4, computed by the LFA strategy)."""
    return (
        lfa_assign(df, id_col, text_col, min_support)
        .groupBy("event_id", "template")
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )


def lfa_assign_sql(table: str, id_col: str, text_col: str, min_support: int = 10) -> str:
    """DuckDB-SQL twin of :func:`lfa_assign`."""
    toks = f"list_filter(regexp_split_to_array(trim({text_col}), '\\s+'), t -> t <> '')"
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({toks}) AS token,
         unnest(generate_series(1, len({toks}))) AS pos
  FROM {table}
),
freq AS (SELECT pos, token, count(*) AS cnt FROM toks GROUP BY pos, token),
masked AS (
  SELECT {id_col}, pos,
         CASE WHEN cnt >= {min_support} THEN token ELSE '<*>' END AS kept
  FROM toks JOIN freq USING (pos, token)
),
assembled AS (
  SELECT {id_col}, string_agg(kept, ' ' ORDER BY pos) AS template
  FROM masked GROUP BY {id_col}
)
SELECT {id_col}, template, substring(md5(template), 1, 8) AS event_id FROM assembled
"""


def lfa_template_counts_sql(
    table: str, id_col: str, text_col: str, min_support: int = 10
) -> str:
    inner = lfa_assign_sql(table, id_col, text_col, min_support)
    return (
        f"SELECT event_id, template, count(*) AS occurrences FROM ({inner}) t "
        "GROUP BY event_id, template"
    )
