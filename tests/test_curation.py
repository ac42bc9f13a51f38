"""Corpus-curation operators: decontamination, stratified sampling,
sequence packing (logic checks; DuckDB parity runs in
test_entry_oracle_parity.py via the registry)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logparser_spark.functions.hashing import py_bucket
from logparser_spark.operators.curation import (
    decontaminate,
    pack_sequences,
    stratified_sample,
)


# -- decontaminate -------------------------------------------------------------


def test_decontaminate_counts_distinct_shared_ngrams(spark):
    docs = spark.createDataFrame(
        [
            # 8 tokens -> 4 distinct 5-grams; the first two 5-grams are in bench
            (1, "a b c d e f g h"),
            # no token in common with bench
            (2, "x y z w v u t s"),
            # shorter than n=5 tokens -> whole text is the single shingle
            (3, "a b c"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [("a b c d e f",)], "text string"  # 2 distinct 5-grams
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(docs, bench, n=5).collect()
    }
    assert got[1]["n_overlap"] == 2 and got[1]["contaminated"]
    assert got[1]["n_doc_ngrams"] == 4
    assert got[2]["n_overlap"] == 0 and not got[2]["contaminated"]
    assert got[3]["n_overlap"] == 0  # "a b c" is not a bench 5-gram
    assert got[3]["n_doc_ngrams"] == 1


def test_decontaminate_zero_overlap_docs_survive_with_full_row(spark):
    docs = spark.createDataFrame(
        [(i, f"unique tokens {i} only here nothing shared") for i in range(20)],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame([("completely different benchmark text",)],
                                  "text string")
    out = decontaminate(docs, bench, n=3)
    assert out.count() == 20
    assert out.filter("contaminated").count() == 0


def test_decontaminate_min_overlap_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id bigint, text string"
    )
    bench = spark.createDataFrame([("a b c d e",)], "text string")
    strict = decontaminate(docs, bench, n=5, min_overlap=2)
    assert strict.filter("contaminated").count() == 0
    loose = decontaminate(docs, bench, n=5, min_overlap=1)
    assert loose.filter("contaminated").count() == 1


# -- stratified sample ---------------------------------------------------------


@pytest.fixture(scope="module")
def strata_df(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "id bigint, grp string").cache()


def test_stratified_sample_edges_and_determinism(spark, strata_df):
    rates = {"a": 10_000, "b": 0}  # keep all a, drop all b, default-drop c
    out = stratified_sample(strata_df, "grp", rates, "id")
    got = out.groupBy("grp").count().collect()
    counts = {r["grp"]: r["count"] for r in got}
    assert counts == {"a": 1000}
    # deterministic: identical row set on re-run
    again = stratified_sample(strata_df, "grp", rates, "id")
    assert out.exceptAll(again).count() == 0


def test_stratified_sample_rate_is_roughly_proportional(spark, strata_df):
    out = stratified_sample(strata_df, "grp", {"a": 5000}, "id")
    n = out.count()
    assert 380 <= n <= 620  # ~500 of the 1000 'a' rows


def test_stratified_sample_matches_python_bucket_rule(spark, strata_df):
    rates = {"a": 2500, "b": 7500}
    got = {
        r["id"]
        for r in stratified_sample(strata_df, "grp", rates, "id").collect()
    }
    want = {
        i
        for i in range(3000)
        if py_bucket(str(i), 10_000) < rates.get(["a", "b", "c"][i % 3], 0)
    }
    assert got == want


# -- pack_sequences ------------------------------------------------------------


def test_pack_sequences_hand_example(spark):
    # lens 300,300,300 with budget 512: starts at 0,300,600 -> seqs 0,0,1
    docs = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 300)], "doc_id bigint, n_tok bigint"
    )
    got = {
        r["doc_id"]: (r["seq_id"], r["tok_offset"])
        for r in pack_sequences(docs, 512, bucket_width=2).collect()
    }
    assert got == {1: (0, 0), 2: (0, 300), 3: (1, 88)}


def test_pack_sequences_bucket_width_invariant_and_matches_pandas(spark):
    # sparse, non-dense ids; any bucket_width must give the same answer
    rows = [(i * 37 + (i % 5), (i * 211) % 900 + 1) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id bigint, n_tok bigint")
    ref = None
    for width in (16, 64, 100_000):
        got = (
            pack_sequences(docs, 1024, bucket_width=width)
            .orderBy("doc_id")
            .toPandas()
        )
        if ref is None:
            ref = got
        else:
            pd.testing.assert_frame_equal(ref, got)
    # pandas mirror: exclusive cumsum over id order
    mirror = pd.DataFrame(rows, columns=["doc_id", "n_tok"]).sort_values(
        "doc_id", ignore_index=True
    )
    ecs = mirror["n_tok"].cumsum() - mirror["n_tok"]
    assert (ref["seq_id"] == ecs // 1024).all()
    assert (ref["tok_offset"] == ecs % 1024).all()


def test_pack_sequences_no_full_corpus_single_partition_exchange(spark):
    """The corpus-sized side must never sort in one partition: the only
    single-partition window is over the tiny bucket-totals frame."""
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 700 + 1).alias("n_tok")
    )
    plan = (
        pack_sequences(docs, 2048, bucket_width=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one SinglePartition exchange is allowed: the bucket-totals
    # prefix (10k docs / width 64 = 157 rows); the 10k-doc side must not
    # add another
    assert plan.count("Exchange SinglePartition") <= 1


def test_chunk_documents_hand_example(spark):
    from logparser_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a" * 100), (2, "b" * 512), (3, "x" * 513), (4, "y" * 960),
         (5, "z" * 961)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_start"], len(r["chunk_text"]))
        for r in chunk_documents(docs, chunk_chars=512, overlap=64).collect()
    }
    # <=512 chars -> one chunk; 513 -> ceil(449/448)=2; 960 -> 2 (448+512
    # covers exactly); 961 -> ceil(897/448)=3
    assert got == {
        (1, 0): (0, 100),
        (2, 0): (0, 512),
        (3, 0): (0, 512), (3, 1): (448, 65),
        (4, 0): (0, 512), (4, 1): (448, 512),
        (5, 0): (0, 512), (5, 1): (448, 512), (5, 2): (896, 65),
    }
    # every char covered, chunks overlap by exactly `overlap` where split
    assert all(s % 448 == 0 for s, _ in got.values())


def test_chunk_documents_matches_sql_twin(spark):
    import duckdb

    from logparser_spark.operators.curation import (
        chunk_documents,
        chunk_documents_sql,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = (
        chunk_documents(docs)
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = (
        con.execute(chunk_documents_sql())
        .df()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pii_redact_hand_examples(spark):
    from logparser_spark.operators.curation import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "from 192.168.0.1 to 10.0.0.255"),
            (3, "ssn 123-45-6789 phone 555-867 5309 and 555 123-4567"),
            (4, "clean text, no pii 1234-5678"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["redacted"], r["n_pii"])
           for r in pii_redact(docs).collect()}
    assert got[1] == ("mail <EMAIL> now", 1)
    assert got[2] == ("from <IP> to <IP>", 2)
    # mixed-separator phones both match; the ssn matches the ssn rule
    assert got[3] == ("ssn <SSN> phone <PHONE> and <PHONE>", 3)
    assert got[4] == ("clean text, no pii 1234-5678", 0)


def test_pii_redact_matches_sql_twin(spark):
    import duckdb

    from logparser_spark.operators.curation import pii_redact, pii_redact_sql

    rows = [
        (1, "a@b.io or 1.2.3.4"),
        (2, "call 555-867-5309; ssn 000-11-2222"),
        (3, "plain"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = pii_redact(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = (
        con.execute(pii_redact_sql("t")).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_weighted_sample_matches_python_rule_and_is_proportional(spark):
    import hashlib

    from logparser_spark.operators.curation import weighted_sample

    # ids 0..9999, weight tiers 1/2/3 — keep prob 0.1/0.2/0.3
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3 + 1).alias("w")
    )
    got = {r["doc_id"] for r in weighted_sample(df, "w", 0.1).collect()}

    def u_of(i: int) -> float:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:10], 16) / 2**40

    want = {i for i in range(10_000)
            if u_of(i) < min(1.0, 0.1 * (i % 3 + 1))}
    assert got == want
    # proportionality: tier keep-rates track their probabilities
    for tier, p in ((0, 0.1), (1, 0.2), (2, 0.3)):
        n_kept = sum(1 for i in got if i % 3 == tier)
        assert abs(n_kept / (10_000 / 3) - p) < 0.03, (tier, n_kept)


def test_weighted_sample_matches_sql_twin(spark):
    import duckdb

    from logparser_spark.operators.curation import (
        weighted_sample,
        weighted_sample_sql,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", F.length("text").alias("w")
    )
    got = (
        weighted_sample(docs, "w", 0.002)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = (
        con.execute(weighted_sample_sql(
            "(SELECT doc_id, length(text) AS w FROM documents) s", "w", 0.002))
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert 0 < len(got) < docs.count()
