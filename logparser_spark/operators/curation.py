"""Corpus-curation operators for training-data pipelines.

Operators a pretraining-data pipeline runs after dedup and before
tokenization, each relational (no UDFs) with a DuckDB SQL twin:

* :func:`decontaminate` — flag corpus docs sharing word n-grams with a
  benchmark/eval set (train-test contamination detection; the standard
  n-gram-overlap method, e.g. GPT-3 appendix C / PaLM §7).
* :func:`stratified_sample` — deterministic per-stratum Bernoulli
  sampling by md5 bucket (data mixing: "keep 30 % of lang=en, 100 % of
  lang=de").  Same rows from Spark, DuckDB, and Python — no RNG state.
* :func:`pack_sequences` — assign docs to fixed-token-budget training
  sequences by position in the concatenated id-ordered token stream,
  computed as a two-level distributed prefix sum (no global sort of the
  corpus, no single-partition window over data-sized input).
* :func:`chunk_documents` — fixed-width overlapping chunks
  (context-window prep), integer ceil-div split, zero shuffle (r4).
* :func:`pii_redact` — email/IPv4/SSN/phone → typed tokens via an
  RE2-safe regexp chain with per-rule match counts (r4).
* :func:`weighted_sample` — per-row importance sampling, keep prob
  min(1, rate·weight) on the md5 uniform — no RNG state (r4).

Scale notes
-----------
* decontaminate: the benchmark n-gram set is small by construction
  (eval sets are KB–MB) → broadcast; the corpus side explodes shingles
  but only JOIN MATCHES reach the per-doc aggregation shuffle.  The
  zero-overlap majority never shuffles — they join back broadcast-left.
* stratified_sample: pure filter, no shuffle, pushes into the scan.
* pack_sequences: per-bucket window + a bucket-totals exclusive prefix.
  The totals frame has |corpus|/bucket_width rows (a 10^12-doc corpus at
  width 2^20 → 10^6 rows), so its single-partition ordered window is a
  deliberately tiny driver-scale step; recurse the same trick if that
  frame ever stops being tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from logparser_spark.functions.hashing import bucket_expr, bucket_sql
from logparser_spark.operators.dedup import shingles_expr


# -- decontamination ----------------------------------------------------------


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Per-doc n-gram overlap against a benchmark set.

    Returns one row per corpus doc: ``(id, n_overlap, n_doc_ngrams,
    contaminated)`` where ``n_overlap`` counts the doc's DISTINCT word
    n-grams that also occur anywhere in ``bench`` and ``contaminated``
    is ``n_overlap >= min_overlap``.

    The benchmark n-gram dim is distinct-ed then broadcast — an eval
    set is small by construction, so the corpus-sized side never
    shuffles for the probe; only matching (doc, shingle) rows enter the
    per-doc count aggregation.
    """
    bench_grams = (
        bench.select(F.explode(shingles_expr(bench_text_col, n)).alias("shingle"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(shingles_expr(text_col, n)).alias("shingle")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    base = docs.select(
        F.col(id_col), F.size(shingles_expr(text_col, n)).alias("n_doc_ngrams")
    )
    return base.join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        "n_doc_ngrams",
        (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias("contaminated"),
    )


def decontaminate_sql(
    docs_sql: str,
    bench_sql: str,
    shingles_sql_fn,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 5,
    min_overlap: int = 1,
) -> str:
    """DuckDB twin of :func:`decontaminate`.  ``shingles_sql_fn(col, n)``
    must be the caller's shingle-list SQL builder (the same one its other
    oracles use, so tokenization stays identical)."""
    dg = shingles_sql_fn(text_col, n)
    bg = shingles_sql_fn(bench_text_col, n)
    return (
        f"WITH bgrams AS (SELECT DISTINCT unnest({bg}) AS shingle FROM ({bench_sql})), "
        f"dgrams AS (SELECT {id_col}, unnest({dg}) AS shingle FROM ({docs_sql})), "
        f"hits AS (SELECT {id_col}, count(*) AS n_overlap FROM dgrams "
        f"JOIN bgrams USING (shingle) GROUP BY {id_col}) "
        f"SELECT d.{id_col}, coalesce(h.n_overlap, 0) AS n_overlap, "
        f"len({dg}) AS n_doc_ngrams, "
        f"coalesce(h.n_overlap, 0) >= {min_overlap} AS contaminated "
        f"FROM ({docs_sql}) d LEFT JOIN hits h USING ({id_col})"
    )


# -- stratified sampling ------------------------------------------------------


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    key_col: str,
    denom: int = 10_000,
    default_rate: int = 0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample.

    ``rates`` maps stratum value → integer keep-threshold out of
    ``denom`` (e.g. ``{"en": 3000}`` keeps ~30 % of en rows).  A row is
    kept iff ``md5_bucket(key) < rate[stratum]`` — the md5 bucket is the
    repo's engine-portable hash (`functions/hashing.py`), so Spark,
    DuckDB, and plain Python all select the SAME rows, re-runs are
    byte-stable, and there is no RNG state to seed per partition.

    Integer thresholds (not float fractions) keep the comparison exact
    across engines.  Pure narrow filter: no shuffle, prunes at the scan.
    """
    cond = F.lit(default_rate)
    for value, rate in sorted(rates.items()):
        cond = F.when(F.col(strata_col) == value, F.lit(rate)).otherwise(cond)
    bucket = bucket_expr(F.col(key_col).cast("string"), denom)
    return df.filter(bucket < cond)


def stratified_sample_sql(
    src_sql: str,
    strata_col: str,
    rates: dict[str, int],
    key_col: str,
    denom: int = 10_000,
    default_rate: int = 0,
    select: str = "*",
) -> str:
    """DuckDB twin of :func:`stratified_sample` (same md5 bucketing)."""
    cases = " ".join(
        f"WHEN '{v}' THEN {r}" for v, r in sorted(rates.items())
    )
    bucket = bucket_sql(f"CAST({key_col} AS VARCHAR)", denom)
    return (
        f"SELECT {select} FROM ({src_sql}) WHERE {bucket} < "
        f"CASE {strata_col} {cases} ELSE {default_rate} END"
    )


# -- sequence packing ---------------------------------------------------------


def pack_sequences(
    docs: DataFrame,
    seq_budget: int,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    bucket_width: int = 65_536,
) -> DataFrame:
    """Assign each doc to a fixed-token-budget training sequence.

    Semantics: concatenate all docs in ``id_col`` order into one token
    stream; a doc belongs to the sequence its FIRST token falls in —
    ``seq_id = floor(exclusive_cumsum(len) / seq_budget)`` and
    ``tok_offset = exclusive_cumsum(len) % seq_budget`` (contiguous
    GPT-style chunking; long docs may straddle into the next chunk,
    which the trainer handles by splitting at read time).

    Distributed shape — a two-level prefix sum, NOT a global-sort
    window: docs bucket by ``id_col // bucket_width`` (ids need not be
    dense; buckets need not be equal-sized), per-bucket totals reduce to
    a tiny frame whose exclusive prefix gives each bucket's stream
    offset, broadcast back; the per-doc running sum is then a window
    WITHIN each bucket.  No stage ever sorts the full corpus in one
    partition.
    """
    ids_ok = docs.select(id_col, len_col)
    b = ids_ok.withColumn(
        "_bkt", F.floor(F.col(id_col) / F.lit(bucket_width)).cast("long")
    )
    totals = b.groupBy("_bkt").agg(F.sum(len_col).alias("_tot"))
    # tiny frame: |docs| / bucket_width rows — single-partition ordered
    # window here is deliberate (see module docstring)
    prior = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt", F.coalesce(F.sum("_tot").over(prior), F.lit(0)).alias("_off")
    )
    within = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ecs = F.col("_off") + F.coalesce(F.sum(len_col).over(within), F.lit(0))
    return (
        b.join(F.broadcast(offsets), "_bkt")
        .select(
            F.col(id_col),
            F.col(len_col),
            F.floor(ecs / F.lit(seq_budget)).cast("long").alias("seq_id"),
            F.pmod(ecs, F.lit(seq_budget)).cast("long").alias("tok_offset"),
        )
    )


def pack_sequences_sql(
    src_sql: str,
    seq_budget: int,
    id_col: str = "doc_id",
    len_expr: str = "n_tok",
) -> str:
    """DuckDB twin of :func:`pack_sequences`: the bucketed prefix sum
    collapses to one plain exclusive-cumsum window at oracle scale."""
    ecs = (
        f"coalesce(sum({len_expr}) OVER (ORDER BY {id_col} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    )
    return (
        f"SELECT {id_col}, {len_expr} AS n_tok, "
        f"CAST(floor({ecs} / {seq_budget}) AS BIGINT) AS seq_id, "
        f"CAST({ecs} % {seq_budget} AS BIGINT) AS tok_offset "
        f"FROM ({src_sql})"
    )


# -- chunking -----------------------------------------------------------------


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split long documents into fixed-width overlapping chunks:
    (*id*, chunk_idx, chunk_start, chunk_text).

    The context-window prep step: chunk k covers characters
    ``[k·stride, k·stride + chunk_chars)`` with ``stride = chunk_chars −
    overlap``; the last chunk starts at the final stride multiple below
    ``len − overlap`` (every character is covered, every chunk is
    non-degenerate).  Pure narrow ops — ``sequence`` + ``posexplode``,
    no shuffle at all; chunk counts use exact integer ceil-division so
    the SQL twin reproduces the split bit-for-bit.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = chunk_chars - overlap
    ln = F.length(F.col(text_col))
    # ceil((len - overlap) / stride) in exact integer arithmetic (the
    # double division is exact for any text length below 2^52 chars)
    n = F.when(ln <= chunk_chars, F.lit(1)).otherwise(
        F.floor((ln - overlap + (stride - 1)) / F.lit(stride))
    )
    return (
        docs.select(
            id_col,
            text_col,
            F.explode(F.sequence(F.lit(0), n.cast("int") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("chunk_idx") * stride).cast("int").alias("chunk_start"),
            F.substring(
                F.col(text_col), F.col("chunk_idx") * stride + 1, chunk_chars
            ).alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    src: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same integer ceil-div)."""
    stride = chunk_chars - overlap
    return f"""
WITH n AS (
  SELECT {id_col}, {text_col},
         CASE WHEN length({text_col}) <= {chunk_chars} THEN 1
              ELSE (length({text_col}) - {overlap} + {stride - 1}) // {stride}
         END AS n_chunks
  FROM {src})
SELECT {id_col},
       CAST(i AS INT) AS chunk_idx,
       CAST(i * {stride} AS INT) AS chunk_start,
       substring({text_col}, CAST(i * {stride} + 1 AS INT), {chunk_chars})
         AS chunk_text
FROM (SELECT {id_col}, {text_col}, UNNEST(range(0, n_chunks)) AS i FROM n)
"""


# -- PII redaction ------------------------------------------------------------

#: (pattern, replacement) — RE2-safe (no lookaround), identical strings
#: in Spark (java.util.regex) and DuckDB (RE2); order matters (SSN and
#: phone patterns overlap digit runs the IP pattern would also touch)
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
)


def pii_redact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Redact common PII shapes (emails, IPv4, SSN- and phone-shaped
    digit runs) before training: (*id*, redacted, n_pii).

    The privacy-scrubbing sibling of the log-masking rules
    (config.DrainParams.rex): a chain of native ``regexp_replace`` —
    stateless, shuffle-free, whole-stage-codegen — with ``n_pii``
    counting each rule's matches just before that rule rewrites them,
    so downstream filters can drop PII-dense documents entirely (the
    usual policy knob).
    """
    red = F.col(text_col)
    cnt = F.lit(0)
    for pat, token in PII_RULES:
        cnt = cnt + F.regexp_count(red, F.lit(pat))
        red = F.regexp_replace(red, pat, token)
    return docs.select(
        id_col,
        red.alias("redacted"),
        cnt.cast("bigint").alias("n_pii"),
    )


def pii_redact_sql(
    src: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`pii_redact` — same rule chain, counts via
    regexp_extract_all length (RE2 'g' flag for replace-all)."""
    red = text_col
    cnts = []
    for pat, token in PII_RULES:
        esc = pat.replace("'", "''")
        cnts.append(f"len(regexp_extract_all({red}, '{esc}'))")
        red = f"regexp_replace({red}, '{esc}', '{token}', 'g')"
    total = " + ".join(cnts)
    return (
        f"SELECT {id_col}, {red} AS redacted, "
        f"CAST({total} AS BIGINT) AS n_pii FROM {src}"
    )


# -- weighted sampling --------------------------------------------------------

#: 2^40 — the md5-derived uniform's exact denominator (10 hex chars)
_U_DENOM = float(1 << 40)


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    rate: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep each row with
    probability ``min(1, rate · weight)`` — importance sampling for data
    mixing ("upweight high-quality docs"), the per-row sibling of
    :func:`stratified_sample`'s per-stratum rates.

    The acceptance uniform is md5-derived (first 10 hex chars of
    ``md5(id)`` over 2^40 — an exact binary double, same construction as
    the repo's bucket idiom), so Spark, DuckDB, and plain Python keep
    the IDENTICAL row set: no RNG state, reproducible across retries and
    engines, and a pure filter that pushes into the scan (no shuffle).
    ``weight_col`` must be numeric; integer weights (token counts,
    quality tiers) make ``rate · weight`` bit-identical across engines.
    """
    h = F.md5(F.col(id_col).cast("string"))
    u = (F.conv(F.substring(h, 1, 10), 16, 10).cast("double") / _U_DENOM)
    p = F.least(F.lit(1.0), F.lit(rate) * F.col(weight_col).cast("double"))
    return docs.filter(u < p)


def weighted_sample_sql(
    src: str,
    weight_col: str,
    rate: float,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`weighted_sample` (same md5 uniform)."""
    u = (
        f"(CAST(('0x' || substring(md5(CAST({id_col} AS VARCHAR)), 1, 10)) "
        f"AS BIGINT) / {_U_DENOM!r})"
    )
    return (
        f"SELECT * FROM {src} WHERE {u} < "
        f"least(1.0, {rate:.17e} * CAST({weight_col} AS DOUBLE))"
    )
