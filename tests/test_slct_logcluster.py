"""SLCT + LogCluster engines (S6): hand-computed fixtures + DuckDB twins.

The fixture is small enough to verify on paper (support = 2):

    1 "a b c"
    2 "a b d"
    3 "a x"
    4 "z z z"
    5 "a q q b"

SLCT frequent (pos, word) pairs: (1,a) x4, (2,b) x2.  Candidates:
{(1,a),(2,b)} from lines 1,2 (cluster, template "a b <*>") and {(1,a)}
from lines 3,5 (cluster, template "a <*>"); line 4 holds no frequent
pair -> outlier.

LogCluster frequent words (per-line support): a x4, b x3.  Candidate
"a b" covers lines 1,2,5 with gaps (before a, between, after b) of
(0,0,1), (0,0,1), (0,2,0) -> pattern "a *{0,2} b *{0,1}"; candidate "a"
(line 3) misses the support.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from logparser_spark.operators.slct import (
    OUTLIER_TEMPLATE,
    logcluster_templates,
    logcluster_templates_sql,
    slct_assign,
    slct_assign_sql,
    slct_template_counts,
    slct_template_counts_sql,
)

ROWS = [
    (1, "a b c"),
    (2, "a b d"),
    (3, "a x"),
    (4, "z z z"),
    (5, "a q q b"),
]


@pytest.fixture()
def lines(spark):
    return spark.createDataFrame(ROWS, "line_id bigint, text string")


def test_slct_two_level_support_and_outliers(spark, lines):
    got = {
        r["line_id"]: (r["template"], r["is_outlier"])
        for r in slct_assign(lines, "line_id", "text", support=2).collect()
    }
    assert got[1] == ("a b <*>", False)
    assert got[2] == ("a b <*>", False)
    assert got[3] == ("a <*>", False)
    assert got[4] == (OUTLIER_TEMPLATE, True)
    assert got[5] == ("a <*>", False)


def test_slct_template_counts(spark, lines):
    got = {
        r["template"]: r["occurrences"]
        for r in slct_template_counts(lines, "line_id", "text", 2).collect()
    }
    assert got == {"a b <*>": 2, "a <*>": 2, OUTLIER_TEMPLATE: 1}


def test_slct_no_trailing_wildcard_when_lengths_stop_at_last_frequent(spark):
    # all members end exactly at the last frequent position -> no tail <*>
    df = spark.createDataFrame(
        [(1, "up link"), (2, "up link")], "line_id bigint, text string"
    )
    got = slct_assign(df, "line_id", "text", support=2).collect()
    assert {r["template"] for r in got} == {"up link"}


def test_logcluster_variable_gap_pattern(spark, lines):
    got = {
        r["template"]: r["occurrences"]
        for r in logcluster_templates(lines, "line_id", "text", support=2).collect()
    }
    assert got == {"a *{0,2} b *{0,1}": 3}


def test_logcluster_word_support_counts_lines_not_occurrences(spark):
    # "q q q" repeats q three times in ONE line: per-line counting keeps
    # q infrequent at support=2 (occurrence counting would make it 3)
    df = spark.createDataFrame(
        [(1, "q q q"), (2, "m n"), (3, "m n")], "line_id bigint, text string"
    )
    got = {
        r["template"]
        for r in logcluster_templates(df, "line_id", "text", support=2).collect()
    }
    assert got == {"m n"}


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.register("lines_t", pd.DataFrame(ROWS, columns=["line_id", "text"]))
    return con


def test_slct_duckdb_twin_matches(spark, lines, duck):
    got = (
        slct_assign(lines, "line_id", "text", 2)
        .toPandas()
        .sort_values("line_id")
        .reset_index(drop=True)
    )
    want = (
        duck.execute(slct_assign_sql("lines_t", "line_id", "text", 2))
        .df()
        .sort_values("line_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["line_id", "template", "event_id", "is_outlier"]],
        want[["line_id", "template", "event_id", "is_outlier"]],
        check_dtype=False,
    )
    want_counts = duck.execute(
        slct_template_counts_sql("lines_t", "line_id", "text", 2)
    ).df()
    got_counts = slct_template_counts(lines, "line_id", "text", 2).toPandas()
    key = ["event_id", "template", "occurrences"]
    pd.testing.assert_frame_equal(
        got_counts[key].sort_values(key).reset_index(drop=True),
        want_counts[key].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_logcluster_duckdb_twin_matches(spark, lines, duck):
    got = logcluster_templates(lines, "line_id", "text", 2).toPandas()
    want = duck.execute(
        logcluster_templates_sql("lines_t", "line_id", "text", 2)
    ).df()
    key = ["template", "occurrences"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
