"""Sessionize / ASOF / range-join unit semantics (oracle parity is in
test_entry_oracle_parity; these cover edges the fixtures don't hit)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from logparser_spark.operators.sessions import asof_join, range_join, sessionize


def _ts(s: str):
    return datetime.fromisoformat(s)


def test_asof_duplicate_right_ts_is_deterministic(spark):
    """Several right rows at the same (key, ts): the greatest payload tuple
    wins, stably (ADVICE r1: was order-of-arrival nondeterministic)."""
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01T00:10:00"), "e1")], "user_id string, ts timestamp, event_id string"
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T00:00:00"), "ref_a"),
            ("u1", _ts("2024-01-01T00:00:00"), "ref_c"),
            ("u1", _ts("2024-01-01T00:00:00"), "ref_b"),
        ],
        "user_id string, ts timestamp, ref string",
    )
    outs = set()
    for _ in range(3):
        j = asof_join(left, right.repartition(3), "user_id", "ts", right_cols=["ref"])
        outs.add(j.first()["ref_r"])
    assert outs == {"ref_c"}  # max payload tuple, every run


def test_asof_left_before_any_right_gets_null(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2023-12-31T23:59:59"), "e0")], "user_id string, ts timestamp, event_id string"
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T00:00:00"), "ref_a")], "user_id string, ts timestamp, ref string"
    )
    j = asof_join(left, right, "user_id", "ts", right_cols=["ref"])
    assert j.first()["ref_r"] is None


def test_asof_equal_ts_matches_at_or_before(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01T00:00:00"), "e0")], "user_id string, ts timestamp, event_id string"
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T00:00:00"), "ref_a")], "user_id string, ts timestamp, ref string"
    )
    j = asof_join(left, right, "user_id", "ts", right_cols=["ref"])
    assert j.first()["ref_r"] == "ref_a"


def test_sessionize_gap_boundary(spark):
    df = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T00:00:00")),
            ("u1", _ts("2024-01-01T00:30:00")),  # exactly 30 min: same session
            ("u1", _ts("2024-01-01T01:00:01")),  # 30 min + 1 s: new session
        ],
        "user_id string, ts timestamp",
    )
    s = sessionize(df, "user_id", "ts", 30).orderBy("ts").collect()
    assert [r["session_id"] for r in s] == [0, 0, 1]
    assert [r["is_session_start"] for r in s] == [True, False, True]


def test_range_join_inclusive_bounds(spark):
    ev = spark.createDataFrame(
        [("u1", _ts("2024-01-01T00:00:00")), ("u1", _ts("2024-01-01T01:00:00")),
         ("u1", _ts("2024-01-01T01:00:01"))],
        "user_id string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [("u1", _ts("2024-01-01T00:00:00"), _ts("2024-01-01T01:00:00"))],
        "user_id string, start_ts timestamp, end_ts timestamp",
    )
    j = range_join(ev, iv, "user_id")
    assert j.count() == 2  # both endpoints inclusive, the +1s row excluded
