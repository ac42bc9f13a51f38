"""SLCT and LogCluster — the frequent-itemset templating engines, native.

Reference analogs: ``SLCT/SLCT.py`` and ``LogCluster/LogCluster.py``
(SURVEY §2.1 S6) are thin wrappers that shell out to Risto Vaarandi's C
``slct`` / Perl ``logcluster.pl`` binaries.  Rather than shelling out,
this module implements both algorithms from their published semantics as
pure relational plans — explode, support-count, candidate-key, threshold
— so they run entirely JVM-side (whole-stage codegen, no Python) and
scale as a handful of map-side-combinable shuffles.

Published semantics implemented:

- **SLCT** (Vaarandi, "A Data Clustering Algorithm for Mining Patterns
  from Event Logs", IPOM 2003): pass 1 counts (position, word) pairs and
  keeps those with support ≥ s ("frequent words"); pass 2 forms each
  line's *cluster candidate* — the set of frequent (position, word)
  pairs it contains — and counts candidate support; candidates with
  support ≥ s become clusters, their description being the frequent
  words at their positions with ``<*>`` elsewhere.  Lines whose
  candidate falls below the threshold (or who contain no frequent word)
  are **outliers** — the reference writes them to a separate outliers
  file; here they get ``is_outlier = true`` and the dead-letter-style
  ``<outlier>`` template so counts always reconcile.

- **LogCluster** (Vaarandi & Podiņš, "LogCluster — A Data Clustering
  and Pattern Mining Algorithm for Event Logs", CNSM 2015): word
  frequency is position-independent and counted once per line; each
  line's candidate is its in-order subsequence of frequent words; a
  cluster's pattern joins those words with variable-length wildcards
  ``*{m,n}`` where m/n are the min/max number of skipped words observed
  at that gap across the cluster's members (gaps with m = n = 0 render
  no wildcard).

Paper-ambiguity choices (documented, deterministic): SLCT cluster
descriptions render positions 1..max frequent position and append one
trailing ``<*>`` iff any member line extends past it; event ids are the
engine-portable 8-char md5 prefix of the rendered template.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logparser_spark.config import WILDCARD
from logparser_spark.functions.text import tokens_expr

OUTLIER_TEMPLATE = "<outlier>"


def _toks(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos (1-based), token, line_len) — one row per token."""
    arr = tokens_expr(text_col)
    return df.select(
        F.col(id_col),
        F.size(arr).alias("line_len"),
        F.posexplode(arr).alias("pos0", "token"),
    ).select(F.col(id_col), "line_len", (F.col("pos0") + 1).alias("pos"), "token")


def slct_assign(
    df: DataFrame,
    id_col: str,
    text_col: str,
    support: int = 10,
) -> DataFrame:
    """Per-row ``(id, template, event_id, is_outlier)`` via SLCT's
    two-level support thresholding.

    Plan shape (all JVM-side): explode → (pos, token) count → semi-join
    frequent pairs back → per-line candidate-key agg → candidate count →
    threshold + render.  Both counts are plain hash aggregates with
    map-side partials; the only per-line state is the sorted frequent
    pair list, built by ``array_sort(collect_list(struct))`` exactly like
    the LFA assembler.  Nothing is collected to the driver — at 100 TB
    the frequent-pair table is the (tiny) shuffled side and candidate
    counting shuffles one short key per line.
    """
    toks = _toks(df, id_col, text_col)
    freq = (
        toks.groupBy("pos", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= support)
        .select("pos", "token")
    )
    # per line: the ordered list of frequent (pos, token) pairs it holds
    fw = (
        toks.join(freq, ["pos", "token"])
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "token"))).alias("fpairs")
        )
    )
    lines = df.select(
        F.col(id_col), F.size(tokens_expr(text_col)).alias("line_len")
    ).join(fw, id_col, "left")
    lines = lines.withColumn(
        "cand_key",
        F.when(
            F.col("fpairs").isNull() | (F.size("fpairs") == 0), F.lit(None)
        ).otherwise(
            F.concat_ws(
                "\x01",
                F.transform(
                    "fpairs",
                    lambda s: F.concat_ws(":", s["pos"].cast("string"), s["token"]),
                ),
            )
        ),
    )
    cand = (
        lines.filter(F.col("cand_key").isNotNull())
        .groupBy("cand_key")
        .agg(
            F.count(F.lit(1)).alias("cand_cnt"),
            F.max("line_len").alias("max_len"),
            F.first("fpairs").alias("fpairs"),
        )
        .filter(F.col("cand_cnt") >= support)
    )
    # render: positions 1..max frequent pos as token-or-<*>, plus one
    # trailing <*> iff a member line extends past the last frequent word
    max_fpos = F.element_at(F.col("fpairs"), -1)["pos"]
    rendered = cand.select(
        "cand_key",
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), max_fpos),
                lambda p: F.coalesce(
                    F.element_at(
                        F.map_from_arrays(
                            F.transform("fpairs", lambda s: s["pos"]),
                            F.transform("fpairs", lambda s: s["token"]),
                        ),
                        p,
                    ),
                    F.lit(WILDCARD),
                ),
            ),
            F.when(F.col("max_len") > max_fpos, F.lit(WILDCARD)),
        ).alias("template"),
    )
    out = lines.join(rendered, "cand_key", "left").select(
        F.col(id_col),
        F.coalesce("template", F.lit(OUTLIER_TEMPLATE)).alias("template"),
        F.substring(
            F.md5(F.coalesce("template", F.lit(OUTLIER_TEMPLATE))), 1, 8
        ).alias("event_id"),
        F.col("template").isNull().alias("is_outlier"),
    )
    return out


def slct_template_counts(
    df: DataFrame, id_col: str, text_col: str, support: int = 10
) -> DataFrame:
    """Distinct SLCT cluster descriptions with member counts (the
    template-table sink S4 computed by the SLCT strategy; outliers
    aggregate under ``<outlier>`` like the reference's outliers file)."""
    return (
        slct_assign(df, id_col, text_col, support)
        .groupBy("event_id", "template")
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )


def logcluster_templates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    support: int = 10,
) -> DataFrame:
    """LogCluster patterns: ``(template, occurrences)`` where template is
    the frequent-word subsequence with ``*{m,n}`` gap wildcards.

    Plan shape: word-per-line distinct → word support → semi-join back →
    per-line ordered frequent subsequence + gap widths → candidate count
    + per-gap min/max → threshold + render.  The gap aggregation is the
    only extra shuffle vs SLCT and is keyed by the candidate word
    sequence — map-side combinable, skew bounded by the cluster sizes
    themselves.
    """
    toks = _toks(df, id_col, text_col)
    # position-independent support, counted once per line (CNSM'15 §III)
    freq = (
        toks.select(id_col, "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= support)
        .select("token")
    )
    fw = (
        toks.join(freq, "token")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "token"))).alias("fpairs"),
            F.first("line_len").alias("line_len"),
        )
        .filter(F.size("fpairs") > 0)
    )
    # candidate key = the in-order word sequence; gaps = words skipped
    # before/between/after the frequent words (k words -> k+1 gaps)
    fw = fw.select(
        F.col(id_col),
        F.concat_ws(
            "\x01", F.transform("fpairs", lambda s: s["token"])
        ).alias("cand_key"),
        F.transform("fpairs", lambda s: s["token"]).alias("words"),
        F.concat(
            F.array(F.element_at(F.col("fpairs"), 1)["pos"] - 1),
            F.zip_with(
                F.slice(
                    F.transform("fpairs", lambda s: s["pos"]),
                    2,
                    F.greatest(F.size("fpairs") - 1, F.lit(0)),
                ),
                F.slice(
                    F.transform("fpairs", lambda s: s["pos"]),
                    1,
                    F.greatest(F.size("fpairs") - 1, F.lit(0)),
                ),
                lambda nxt, prv: nxt - prv - 1,
            ),
            F.array(F.col("line_len") - F.element_at(F.col("fpairs"), -1)["pos"]),
        ).alias("gaps"),
    )
    gap = fw.select(
        "cand_key", F.posexplode("gaps").alias("gap_idx", "gap")
    ).groupBy("cand_key", "gap_idx").agg(
        F.min("gap").alias("gmin"), F.max("gap").alias("gmax")
    )
    gaps_per_cand = gap.groupBy("cand_key").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("gap_idx", "gmin", "gmax"))),
            lambda s: F.struct(s["gmin"].alias("gmin"), s["gmax"].alias("gmax")),
        ).alias("gapspec")
    )
    cand = (
        fw.groupBy("cand_key")
        .agg(F.count(F.lit(1)).alias("occurrences"), F.first("words").alias("words"))
        .filter(F.col("occurrences") >= support)
        .join(gaps_per_cand, "cand_key")
    )

    def _wc(g):
        # *{m,n} for a variable/nonzero gap; nothing when always 0 words
        return F.when(
            (g["gmin"] == 0) & (g["gmax"] == 0), F.lit("")
        ).otherwise(
            F.concat(
                F.lit("*{"),
                g["gmin"].cast("string"),
                F.lit(","),
                g["gmax"].cast("string"),
                F.lit("}"),
            )
        )

    # interleave gap0 w1 gap1 w2 ... wk gapk, dropping empty pieces
    pieces = F.flatten(
        F.zip_with(
            F.col("gapspec"),
            F.concat(F.col("words"), F.array(F.lit(None).cast("string"))),
            lambda g, w: F.array(_wc(g), F.coalesce(w, F.lit(""))),
        )
    )
    return cand.select(
        F.concat_ws(" ", F.filter(pieces, lambda p: p != "")).alias("template"),
        "occurrences",
    )


# -- DuckDB twins -------------------------------------------------------------


def _toks_sql(table: str, id_col: str, text_col: str) -> str:
    arr = f"list_filter(regexp_split_to_array(trim({text_col}), '\\s+'), t -> t <> '')"
    return f"""
  SELECT {id_col}, len({arr}) AS line_len,
         unnest({arr}) AS token,
         unnest(generate_series(1, len({arr}))) AS pos
  FROM {table}
"""


def slct_assign_sql(
    table: str, id_col: str, text_col: str, support: int = 10
) -> str:
    """DuckDB twin of :func:`slct_assign` (reachability of the same
    two-level thresholding in pure SQL)."""
    return f"""
WITH toks AS ({_toks_sql(table, id_col, text_col)}),
freq AS (
  SELECT pos, token FROM toks GROUP BY pos, token
  HAVING count(*) >= {support}
),
ftoks AS (
  SELECT t.* FROM toks t
  JOIN freq f ON t.pos = f.pos AND t.token = f.token
),
fw AS (
  SELECT {id_col},
         string_agg(pos || ':' || token, chr(1) ORDER BY pos) AS cand_key,
         max(pos) AS max_fpos,
         any_value(line_len) AS line_len
  FROM ftoks GROUP BY {id_col}
),
cand AS (
  SELECT cand_key, count(*) AS cand_cnt, max(line_len) AS max_len,
         min({id_col}) AS rep_id, any_value(max_fpos) AS max_fpos
  FROM fw GROUP BY cand_key HAVING count(*) >= {support}
),
-- DuckDB's generate_series can't take lateral column args: build one
-- global 1..max(max_fpos) series and filter per candidate instead
posns AS (
  SELECT unnest(generate_series(
           1, coalesce((SELECT max(max_fpos) FROM cand), 0))) AS p
),
cells AS (
  SELECT c.cand_key, p.p, c.max_len, c.max_fpos,
         coalesce(ft.token, '<*>') AS piece
  FROM cand c JOIN posns p ON p.p <= c.max_fpos
  LEFT JOIN ftoks ft ON ft.{id_col} = c.rep_id AND ft.pos = p.p
),
rendered AS (
  SELECT cand_key,
         string_agg(piece, ' ' ORDER BY p)
           || CASE WHEN any_value(max_len) > any_value(max_fpos)
                   THEN ' <*>' ELSE '' END AS template
  FROM cells GROUP BY cand_key
),
lines AS (SELECT {id_col} FROM {table})
SELECT l.{id_col},
       coalesce(r.template, '{OUTLIER_TEMPLATE}') AS template,
       substring(md5(coalesce(r.template, '{OUTLIER_TEMPLATE}')), 1, 8) AS event_id,
       r.template IS NULL AS is_outlier
FROM lines l
LEFT JOIN fw USING ({id_col})
LEFT JOIN rendered r ON r.cand_key = fw.cand_key
"""


def slct_template_counts_sql(
    table: str, id_col: str, text_col: str, support: int = 10
) -> str:
    inner = slct_assign_sql(table, id_col, text_col, support)
    return (
        f"SELECT event_id, template, count(*) AS occurrences FROM ({inner}) t "
        "GROUP BY event_id, template"
    )


def logcluster_templates_sql(
    table: str, id_col: str, text_col: str, support: int = 10
) -> str:
    """DuckDB twin of :func:`logcluster_templates`."""
    return f"""
WITH toks AS ({_toks_sql(table, id_col, text_col)}),
freq AS (
  SELECT token FROM (SELECT DISTINCT {id_col}, token FROM toks)
  GROUP BY token HAVING count(*) >= {support}
),
fp AS (
  SELECT t.{id_col}, t.pos, t.token, t.line_len,
         row_number() OVER (PARTITION BY t.{id_col} ORDER BY t.pos) AS seq,
         count(*) OVER (PARTITION BY t.{id_col}) AS nfw
  FROM toks t JOIN freq USING (token)
),
fw AS (
  SELECT {id_col},
         string_agg(token, chr(1) ORDER BY pos) AS cand_key,
         any_value(nfw) AS nfw
  FROM fp GROUP BY {id_col}
),
-- per line, gap g(i) = words skipped before the i-th frequent word
-- (i = 1..k) plus the tail gap at i = k+1
gaps AS (
  SELECT {id_col}, seq AS gap_idx, pos - 1 AS gap FROM fp WHERE seq = 1
  UNION ALL
  SELECT a.{id_col}, a.seq, a.pos - b.pos - 1
  FROM fp a JOIN fp b ON a.{id_col} = b.{id_col} AND b.seq = a.seq - 1
  UNION ALL
  SELECT {id_col}, nfw + 1, line_len - pos FROM fp WHERE seq = nfw
),
cand AS (
  SELECT cand_key, count(*) AS occurrences FROM fw
  GROUP BY cand_key HAVING count(*) >= {support}
),
gagg AS (
  SELECT fw.cand_key, g.gap_idx, min(g.gap) AS gmin, max(g.gap) AS gmax
  FROM gaps g JOIN fw USING ({id_col}) JOIN cand USING (cand_key)
  GROUP BY fw.cand_key, g.gap_idx
),
words AS (
  SELECT fw.cand_key, fp.seq, any_value(fp.token) AS token
  FROM fp JOIN fw USING ({id_col}) JOIN cand USING (cand_key)
  GROUP BY fw.cand_key, fp.seq
),
pieces AS (
  SELECT cand_key, gap_idx AS ord, 0 AS sub,
         CASE WHEN gmin = 0 AND gmax = 0 THEN NULL
              ELSE '*{{' || gmin || ',' || gmax || '}}' END AS piece
  FROM gagg
  UNION ALL
  SELECT cand_key, seq, 1, token FROM words
)
SELECT (SELECT string_agg(piece, ' ' ORDER BY ord, sub)
        FROM pieces p WHERE p.cand_key = c.cand_key AND piece IS NOT NULL
       ) AS template,
       occurrences
FROM cand c
"""
