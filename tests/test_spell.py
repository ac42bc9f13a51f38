"""Spell (LCS) mining strategy: kernel semantics + distributed equality."""

from __future__ import annotations

import pytest

from logparser_spark.config import PipelineConfig
from logparser_spark.operators.assign import assign_templates
from logparser_spark.operators.mine import mine_templates
from logparser_spark.sources.transcripts import transcripts_df, transcripts_pdf
from logparser_spark.spell import (
    SpellMap,
    align_template,
    lcs,
    merge_spell_sets,
    spell_parse_sequential,
)

HDFS_LINES = [
    "Receiving block blk_-160899 src: /10.250.19.102:54106 dest: /10.250.19.102:50010",
    "Receiving block blk_750348 src: /10.251.215.16:55695 dest: /10.251.215.16:50010",
    "Received block blk_358750 of size 67108864 from /10.251.42.84",
    "Received block blk_540200 of size 67108864 from /10.251.214.112",
    "Verification succeeded for blk_-498091",
    "Verification succeeded for blk_894016",
]


def test_lcs_basics():
    assert lcs(list("abcde"), list("ace")) == list("ace")
    assert lcs(["x"], ["y"]) == []
    assert align_template(["a", "c"], ["a", "b", "c", "d"]) == ["a", "<*>", "c", "<*>"]


def test_spell_kernel_groups_hdfs_lines():
    recs, clusters = spell_parse_sequential(HDFS_LINES)
    templates = sorted(c.template for c in clusters)
    assert templates == [
        "Received block <*> of size <*> from /<*>",
        "Receiving block <*> src: /<*> dest: /<*>",
        "Verification succeeded for <*>",
    ]
    assert recs[0]["event_id"] == recs[1]["event_id"]
    assert recs[2]["event_id"] == recs[3]["event_id"]


def test_spell_tau_rejects_dissimilar():
    smap = SpellMap()
    smap.add_message("alpha beta gamma delta".split())
    c = smap.add_message("one two three four".split())
    assert len(smap.clusters) == 2
    assert c.template == "one two three four"


def test_spell_merge_deterministic_and_count_conserving():
    _, clusters = spell_parse_sequential(HDFS_LINES)
    pairs = [(c.template, c.count) for c in clusters]
    merged_a = merge_spell_sets([pairs])
    merged_b = merge_spell_sets([list(reversed(pairs))])
    assert sorted(c.template for c in merged_a) == sorted(c.template for c in merged_b)
    assert sum(c.count for c in merged_a) == len(HDFS_LINES)


@pytest.fixture(scope="module")
def tdf(spark):
    return transcripts_df(spark, 2000, 30, 20).cache()


def test_distributed_spell_matches_sequential_oracle(spark, tdf):
    cfg = PipelineConfig(num_partitions=8)
    mined = mine_templates(tdf, cfg, strategy="spell")
    pdf = (
        transcripts_pdf(2000, 30, 20)
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    recs, oracle_clusters = spell_parse_sequential(pdf["text"].tolist())
    assert sorted(c.template for c in mined) == sorted(
        c.template for c in oracle_clusters
    )
    assigned = assign_templates(tdf, mined, cfg.drain, with_params=False, strategy="spell")
    got = (
        assigned.select("conv_id", "turn_idx", "event_id", "matched")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    assert bool(got["matched"].all())
    assert got["event_id"].tolist() == [r["event_id"] for r in recs]
