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
