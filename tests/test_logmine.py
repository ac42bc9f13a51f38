"""LogMine (distance-clustering) mining strategy: kernel semantics +
distributed mine/assign equality vs the sequential oracle."""

from __future__ import annotations

import pytest

from logparser_spark.config import PipelineConfig
from logparser_spark.logmine import (
    LogMineParams,
    logmine_dist,
    logmine_fit,
    logmine_parse_sequential,
    merge_pair,
)
from logparser_spark.operators.assign import assign_templates
from logparser_spark.operators.mine import mine_templates
from logparser_spark.sources.transcripts import transcripts_df, transcripts_pdf

HDFS_LINES = [
    "Receiving block blk_-160899 src: /10.250.19.102:54106 dest: /10.250.19.102:50010",
    "Receiving block blk_750348 src: /10.251.215.16:55695 dest: /10.251.215.16:50010",
    "Received block blk_358750 of size 67108864 from /10.251.42.84",
    "Received block blk_540200 of size 67108864 from /10.251.214.112",
    "Verification succeeded for blk_-498091",
    "Verification succeeded for blk_894016",
]


def test_logmine_kernel_groups_hdfs_lines():
    recs, clusters = logmine_parse_sequential(HDFS_LINES)
    assert sorted(c.template for c in clusters) == [
        "Received block <*> of size <*> from /<*>",
        "Receiving block <*> src: /<*> dest: /<*>",
        "Verification succeeded for <*>",
    ]
    assert recs[0]["event_id"] == recs[1]["event_id"]
    assert sum(c.count for c in clusters) == len(HDFS_LINES)


def test_logmine_distance_semantics():
    assert logmine_dist("a b c".split(), "a b c".split()) == 0.0
    assert logmine_dist("a b c".split(), "a <*> c".split()) == 0.0  # wildcard matches
    assert logmine_dist("a b c".split(), "x y z".split()) == 1.0
    # length mismatch penalizes over the longer sequence
    assert logmine_dist("a b".split(), "a b c d".split()) == 0.5


def test_merge_pair_alignment():
    assert merge_pair("a b c d".split(), "a x c".split()) == ["a", "<*>", "c", "<*>"]
    assert merge_pair("a".split(), "a".split()) == ["a"]
    # disjoint sequences collapse to a single wildcard
    assert merge_pair("a b".split(), "x y".split()) == ["<*>"]


def test_logmine_max_dist_gate():
    # dist("send a", "send b") = 0.5 → separate at 0.3, merged at 0.6
    tight = logmine_fit({"send a": 1, "send b": 1})
    assert len(tight.clusters) == 2
    loose = logmine_fit({"send a": 1, "send b": 1}, LogMineParams(max_dist=0.6))
    assert [c.template for c in loose.clusters] == ["send <*>"]


def test_logmine_fit_order_free():
    recs, _ = logmine_parse_sequential(HDFS_LINES)
    w = {}
    for r in recs:
        w[r["masked"]] = w.get(r["masked"], 0) + 1
    a = logmine_fit(w)
    b = logmine_fit(dict(reversed(list(w.items()))))
    assert [(c.template, c.count) for c in a.clusters] == [
        (c.template, c.count) for c in b.clusters
    ]


def test_logmine_hierarchy_levels_merge_further():
    w = {"job alpha done": 1, "job beta done": 1, "task gamma done": 1}
    l1 = logmine_fit(w, LogMineParams(max_dist=0.3))
    l2 = logmine_fit(w, LogMineParams(max_dist=0.3, levels=2, relax=2.5))
    assert len(l2.clusters) <= len(l1.clusters)
    assert sum(c.count for c in l2.clusters) == 3


@pytest.fixture(scope="module")
def tdf(spark):
    return transcripts_df(spark, 2000, 30, 20).cache()


def test_distributed_logmine_matches_sequential_oracle(spark, tdf):
    cfg = PipelineConfig(num_partitions=8)
    mined = mine_templates(tdf, cfg, strategy="logmine")
    pdf = (
        transcripts_pdf(2000, 30, 20)
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    recs, oracle_clusters = logmine_parse_sequential(pdf["text"].tolist())
    assert sorted(c.template for c in mined) == sorted(
        c.template for c in oracle_clusters
    )
    assigned = assign_templates(
        tdf, mined, cfg.drain, with_params=False, strategy="logmine"
    )
    got = (
        assigned.select("conv_id", "turn_idx", "event_id", "matched")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    assert bool(got["matched"].all())
    assert got["event_id"].tolist() == [r["event_id"] for r in recs]
