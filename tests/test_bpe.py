"""BPE training + encoding: paper example, python-mirror equality, plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from logparser_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    encode_word,
    fit_merges,
)

SF = "/root/testdata/sf0.001"


def test_fit_merges_paper_style_example():
    # Sennrich et al. §3.2-style vocabulary
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = fit_merges(freqs, 4)
    # (e,s) and (s,t</w>) both count 9 -> lexicographic tie-break picks
    # (e,s); merged symbol then pairs with t</w> for the second merge
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t" + EOW)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks)[-1] == "est" + EOW
    # an unseen word degrades to characters + whatever merges apply
    assert "".join(encode_word("best", ranks)).replace(EOW, "") == "best"


def test_bpe_train_distributed_equals_sequential(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    merges = bpe_train(docs.repartition(7), n_merges=30)
    # sequential mirror: exact pandas word counts -> same greedy fit
    pdf = docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w")) \
              .toPandas()
    freqs = pdf[pdf["w"] != ""]["w"].value_counts().to_dict()
    assert merges == fit_merges(freqs, 30)
    assert len(merges) == 30


def test_bpe_encode_reassembles_words_in_order(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100).cache()
    merges = bpe_train(docs, n_merges=40)
    out = bpe_encode(docs, merges).toPandas().set_index("doc_id")
    src = docs.select("doc_id", "text").toPandas().set_index("doc_id")
    ranks = {p: i for i, p in enumerate(merges)}
    for did, row in out.iterrows():
        words = src.loc[did, "text"].split()
        # order-preserving: concatenated tokens == concatenated words
        assert "".join(row["bpe_tokens"]).replace(EOW, "") == "".join(words)
        # per-word mirror equality
        mirror = [t for w in words for t in encode_word(w, ranks)]
        assert list(row["bpe_tokens"]) == mirror
        assert row["n_bpe"] == len(mirror)


def test_bpe_encode_plan_pythons_only_distinct_words(spark):
    """The Arrow python stage must sit on the deduped word table (cost
    ∝ vocab) and join back broadcast — never evaluate python per token."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        bpe_encode(docs, [("e", "s")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BroadcastHashJoin" in plan
    # the python stage's child must contain the distinct (HashAggregate)
    arrow_at = plan.index("ArrowEvalPython")
    assert "HashAggregate" in plan[arrow_at:]


def test_bpe_train_vocab_cap_guards_driver(spark):
    import pytest

    docs = spark.range(3000).select(
        F.concat(F.lit("w"), F.col("id")).alias("text")
    )
    with pytest.raises(ValueError, match="vocab_cap"):
        bpe_train(docs, 5, vocab_cap=100)
