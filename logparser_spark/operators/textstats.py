"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

Every operator is a pure native column expression (JVM, codegen — no
Python), and each has a matching ANSI-SQL generator used by the DuckDB
oracles, driven off the *same* constant tables so Spark and SQL can never
drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from logparser_spark.functions.text import tokens_expr

# stopword banks (tiny on purpose: heuristic language ID, SURVEY-extra ops)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "a", "of", "to", "in", "and", "is"),
    "es": ("el", "la", "de", "los", "y", "es", "un"),
    "fr": ("le", "la", "et", "les", "des", "est", "un"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"),
}

PUNCT_RX = r"[^A-Za-z0-9\s]"
BPE_ISH_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _toks(col: Column | str) -> Column:
    return tokens_expr(col)


# -- language id -------------------------------------------------------------


def lang_scores_expr(col: Column | str) -> dict[str, Column]:
    toks = _toks(col)
    return {
        lang: F.size(
            F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id_expr(col: Column | str) -> Column:
    """Predicted language: argmax stopword hits, alphabetical tie-break,
    'und' (undetermined) when no stopword matches."""
    scores = lang_scores_expr(col)
    mx = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when(scores[lang] == mx, F.lit(lang)).otherwise(pred)
    return F.when(mx == 0, F.lit("und")).otherwise(pred)


def lang_id_sql(col_sql: str) -> str:
    """DuckDB-SQL equivalent of :func:`lang_id_expr`."""
    toks = f"list_filter(regexp_split_to_array(trim({col_sql}), '\\s+'), t -> t <> '')"
    score = {
        lang: f"len(list_filter({toks}, t -> list_contains({list(words)!r}, t)))"
        for lang, words in LANG_STOPWORDS.items()
    }
    mx = "greatest(" + ", ".join(score.values()) + ")"
    cases = " ".join(
        f"WHEN {score[lang]} = {mx} THEN '{lang}'" for lang in sorted(LANG_STOPWORDS)
    )
    return f"CASE WHEN {mx} = 0 THEN 'und' {cases} ELSE 'und' END"


# -- quality scoring ---------------------------------------------------------


def quality_exprs(col: Column | str) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    toks = _toks(col)
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    punct = F.regexp_count(c, F.lit(PUNCT_RX))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in LANG_STOPWORDS["en"]]))
    )
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "punct_ratio": F.round(punct / F.greatest(n_chars, F.lit(1)), 4),
        "stop_ratio": F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 4),
        "mean_token_len": F.round(
            (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1)), 4
        ),
    }


def quality_sql(col_sql: str) -> dict[str, str]:
    toks = f"list_filter(regexp_split_to_array(trim({col_sql}), '\\s+'), t -> t <> '')"
    n_tokens = f"len({toks})"
    n_chars = f"length({col_sql})"
    punct = f"len(regexp_extract_all({col_sql}, '{PUNCT_RX}'))"
    stops = list(LANG_STOPWORDS["en"])
    stop_hits = f"len(list_filter({toks}, t -> list_contains({stops!r}, t)))"
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "punct_ratio": f"round({punct} / greatest({n_chars}, 1), 4)",
        "stop_ratio": f"round({stop_hits} / greatest({n_tokens}, 1), 4)",
        "mean_token_len": f"round(({n_chars} - ({n_tokens} - 1)) / greatest({n_tokens}, 1), 4)",
    }


# -- token counting ----------------------------------------------------------


def token_counts_exprs(col: Column | str) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    return {
        "ws_tokens": F.size(_toks(col)),
        "bpe_ish_tokens": F.regexp_count(c, F.lit(BPE_ISH_RX)),
    }


def token_counts_sql(col_sql: str) -> dict[str, str]:
    toks = f"list_filter(regexp_split_to_array(trim({col_sql}), '\\s+'), t -> t <> '')"
    return {
        "ws_tokens": f"len({toks})",
        "bpe_ish_tokens": f"len(regexp_extract_all({col_sql}, '{BPE_ISH_RX}'))",
    }


# -- fingerprinting ----------------------------------------------------------


def fingerprint_expr(col: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set (bag-of-words identity)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(_toks(col)))))


def fingerprint_sql(col_sql: str) -> str:
    toks = f"list_filter(regexp_split_to_array(trim({col_sql}), '\\s+'), t -> t <> '')"
    return f"md5(array_to_string(list_sort(list_distinct({toks})), ' '))"


def bottomk_sketch_expr(col: Column | str, k: int = 8, shingle_n: int = 3) -> Column:
    """Bottom-k sketch: the k lexicographically-smallest md5 digests of
    the doc's n-gram shingles (a similarity-preserving fingerprint; the
    rolling-hash analog done set-wise so it's distributable)."""
    from logparser_spark.operators.dedup import shingles_expr

    hashed = F.array_sort(F.transform(shingles_expr(col, shingle_n), F.md5))
    return F.slice(hashed, 1, k)


def bottomk_sketch_sql(col_sql: str, k: int = 8, shingle_n: int = 3) -> str:
    toks = f"list_filter(regexp_split_to_array(trim({col_sql}), '\\s+'), t -> t <> '')"
    kk = f"greatest(len({toks}) - {shingle_n - 1}, 1)"
    sh = (
        f"list_distinct(list_transform(generate_series(1, {kk}), "
        f"i -> array_to_string(list_slice({toks}, i, i + {shingle_n - 1}), ' ')))"
    )
    return f"list_slice(list_sort(list_transform({sh}, s -> md5(s))), 1, {k})"


# -- repetition filters (Gopher-style, Rae et al. 2021 appendix A1.1) --------


def ngrams_all_expr(col: Column | str, n: int = 2) -> Column:
    """ALL word n-grams (duplicates kept — unlike the dedup family's
    distinct shingles); a doc shorter than n tokens yields one gram."""
    toks = _toks(col)
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), k), lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )


def ngrams_all_sql(col_sql: str, n: int = 2) -> str:
    toks = (
        f"list_filter(regexp_split_to_array(trim({col_sql}), '\\s+'),"
        " t -> t <> '')"
    )
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 1)), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )


def ngram_repetition(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    max_dup_frac: float = 0.05,
    max_top_share: float = 0.06,
):
    """Per-doc repetition signals + keep verdict, the classic pretraining
    quality rule pair: ``dup_frac`` = fraction of n-grams that are
    repeats (1 − distinct/total) and ``top_share`` = the most frequent
    n-gram's share.  Both rounded to 4 dp and thresholded on the ROUNDED
    value (repo float invariant) so both engines keep/drop identically.

    Exploded-row shape (NOT per-row HOF counting — the repo's measured
    lesson): explode grams → groupBy(doc, gram) → groupBy(doc), both
    map-side combinable; shuffle keys are high-cardinality so no skew.
    """
    grams = docs.select(id_col, F.explode(ngrams_all_expr(text_col, n)).alias("gram"))
    per = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    agg = per.groupBy(id_col).agg(
        F.sum("c").alias("total_ngrams"),
        F.count(F.lit(1)).alias("_dn"),
        F.max("c").alias("_topc"),
    )
    dup = F.round(1 - F.col("_dn") / F.col("total_ngrams").cast("double"), 4)
    top = F.round(F.col("_topc") / F.col("total_ngrams").cast("double"), 4)
    return agg.select(
        id_col,
        "total_ngrams",
        dup.alias("dup_frac"),
        top.alias("top_share"),
        ((dup <= max_dup_frac) & (top <= max_top_share)).alias("keep"),
    )


def ngram_repetition_sql(
    src: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    max_dup_frac: float = 0.05,
    max_top_share: float = 0.06,
) -> str:
    """DuckDB-SQL twin of :func:`ngram_repetition`."""
    grams = ngrams_all_sql(text_col, n)
    return f"""
WITH g AS (
  SELECT {id_col}, unnest({grams}) AS gram FROM {src}),
per AS (SELECT {id_col}, gram, count(*) AS c FROM g GROUP BY {id_col}, gram),
agg AS (SELECT {id_col}, CAST(sum(c) AS BIGINT) AS total_ngrams,
               count(*) AS dn, max(c) AS topc
        FROM per GROUP BY {id_col})
SELECT {id_col}, total_ngrams,
       round(1 - dn / CAST(total_ngrams AS DOUBLE), 4) AS dup_frac,
       round(topc / CAST(total_ngrams AS DOUBLE), 4) AS top_share,
       (round(1 - dn / CAST(total_ngrams AS DOUBLE), 4) <= {max_dup_frac}
        AND round(topc / CAST(total_ngrams AS DOUBLE), 4) <= {max_top_share})
         AS keep
FROM agg
"""
