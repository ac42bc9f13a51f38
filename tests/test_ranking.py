"""BM25 ranking: hand-checked scores, twin equality, plan shape."""

from __future__ import annotations

import math

from logparser_spark.operators.ranking import bm25_scores, bm25_topk

SF = "/root/testdata/sf0.001"


def test_bm25_hand_example(spark):
    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat cat dog"), (3, "bird")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([(1, "cat")], "query_id int, query string")
    got = {r["doc_id"]: r["score_micro"]
           for r in bm25_scores(docs, queries).collect()}
    assert set(got) == {1, 2}  # doc 3 shares no term
    # mirror the exact formula (k1=1.2, b=0.75, N=3, df(cat)=2, avgdl=7/3)
    idf = math.log(1.0 + (3.0 - 2 + 0.5) / (2 + 0.5))
    for did, tf, dl in ((1, 1, 2), (2, 3, 4)):
        sat = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / (7 / 3))))
        assert got[did] == math.floor(idf * sat * 1_000_000 + 0.5), did
    # more occurrences of the term -> higher score (saturating, not linear)
    assert got[2] > got[1]


def test_bm25_topk_deterministic_and_bounded(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    queries = spark.createDataFrame(
        [(1, "spark table"), (2, "hash join")], "query_id int, query string"
    )
    got = bm25_topk(docs, queries, k=5).toPandas()
    assert (got.groupby("query_id")["rank"].max() <= 5).all()
    # ranks are dense from 1 and ordered by (score desc, doc_id)
    for _, g in got.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        keys = list(zip(-g["score_micro"], g["doc_id"]))
        assert keys == sorted(keys)


def test_bm25_plan_broadcasts_query_side_no_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    queries = spark.createDataFrame([(1, "spark")], "query_id int, query string")
    plan = (
        bm25_topk(docs, queries, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan
    assert "WindowGroupLimit" in plan  # top-k pruned map-side


def test_streaming_tok_regex_matches_tokens_expr(spark):
    """The streaming BM25 twin's python tokenizer must equal tokens_expr
    for ARBITRARY text — Java regex \\s is ASCII-only, so unicode
    whitespace (nbsp, ideographic space) stays INSIDE tokens, leading
    tabs produce a dropped empty, etc."""
    import re

    from pyspark.sql import functions as F

    from logparser_spark.functions.text import tokens_expr

    tok_re = re.compile(r"[^ \t\n\x0b\f\r]+")
    tricky = [
        "plain words here",
        "  leading and trailing  ",
        "\ttab\tseparated\t",
        "nb sp stays one token",
        "ideographic\u3000space too",
        "mixed \t \n runs \x0b\x0c of ws",
        "",
        "   ",
        "one",
    ]
    df = spark.createDataFrame([(t,) for t in tricky], "text string")
    got = {
        r["text"]: r["toks"]
        for r in df.select("text", tokens_expr("text").alias("toks")).collect()
    }
    for t in tricky:
        assert got[t] == tok_re.findall(t), repr(t)


def test_bm25_from_cells_plan_broadcasts_stats_no_python(spark):
    """Finalizer plan: window stats and df are broadcast back to the
    matched rows (no shuffle for the tiny sides), the top-k is map-side
    WindowGroupLimit, and nothing drops to python."""
    from logparser_spark.operators.ranking import bm25_topk_from_cells

    cells = spark.createDataFrame(
        [],
        "win_start timestamp, shard int, doc_id string, term string, "
        "tf bigint, dl bigint, n_docs bigint, total_tokens bigint",
    )
    queries = spark.createDataFrame([(1, "spark")], "query_id int, query string")
    plan = (
        bm25_topk_from_cells(cells, queries, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2 or "BroadcastExchange" in plan
    assert "Python" not in plan
    assert "WindowGroupLimit" in plan
