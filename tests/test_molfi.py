"""MoLFI (seeded NSGA-II multi-objective template search) mining
strategy: kernel semantics, seeded determinism, and distributed equality
vs the fixed-seed sequential oracle."""

from __future__ import annotations

import pytest

from logparser_spark.config import PipelineConfig
from logparser_spark.molfi import (
    MoLFIParams,
    _correct,
    _hill_climb_merge,
    _matches,
    _merge,
    molfi_fit,
    molfi_parse_sequential,
)
from logparser_spark.operators.assign import assign_templates
from logparser_spark.operators.mine import mine_templates
from logparser_spark.sources.transcripts import transcripts_df, transcripts_pdf

HDFS_LINES = [
    "Received block blk_358750 of size 67108864 from /10.251.42.84",
    "Received block blk_540200 of size 67108864 from /10.251.214.112",
    "Verification succeeded for blk_-498091",
    "Verification succeeded for blk_894016",
    "PacketResponder 1 for block blk_-160899 terminating",
    "PacketResponder 0 for block blk_750348 terminating",
]


def test_molfi_kernel_groups_hdfs_lines():
    recs, clusters = molfi_parse_sequential(HDFS_LINES)
    assert len(clusters) == 3
    assert sum(c.count for c in clusters) == len(HDFS_LINES)
    assert recs[0]["event_id"] == recs[1]["event_id"]
    assert recs[2]["event_id"] == recs[3]["event_id"]
    assert recs[4]["event_id"] == recs[5]["event_id"]


def test_molfi_fit_is_seed_deterministic():
    pdf = transcripts_pdf(1500, 30, 20)
    a = molfi_parse_sequential(pdf["text"].tolist())
    b = molfi_parse_sequential(pdf["text"].tolist())
    assert [(c.template, c.count) for c in a[1]] == [
        (c.template, c.count) for c in b[1]
    ]
    # a different seed may search differently but must still cover
    other = molfi_parse_sequential(
        pdf["text"].tolist(), MoLFIParams(seed=99)
    )
    assert sum(c.count for c in other[1]) == 1500


def test_merge_and_matches():
    a = ("send", "pkt", "to", "host1")
    b = ("send", "pkt", "to", "host2")
    m = _merge(a, b)
    assert m == ("send", "pkt", "to", "<*>")
    assert _matches(m, a) and _matches(m, b)
    assert not _matches(m, ("recv", "pkt", "to", "host1"))


def test_correct_covers_prunes_and_drops_allwild():
    msgs = [(("a", "x"), 3), (("a", "y"), 1), (("b", "z"), 1)]
    # all-wildcard dropped, unmatched added verbatim
    out = _correct([("<*>", "<*>")], msgs)
    assert ("<*>", "<*>") not in out
    assert all(any(_matches(t, m) for t in out) for m, _ in msgs)
    # redundant verbatim pruned once a generalization covers it
    out2 = _correct([("a", "<*>"), ("a", "x"), ("b", "z")], msgs)
    assert ("a", "x") not in out2
    assert ("a", "<*>") in out2 and ("b", "z") in out2


def test_hill_climb_generalizes_small_families():
    # a family entirely absent from any GA sample: the deterministic
    # full-data merge pass must still fold it into one template
    msgs = [(("job", f"j{i}", "done"), 1) for i in range(12)]
    sol = _hill_climb_merge([m for m, _ in msgs], msgs)
    assert sol == [("job", "<*>", "done")]


def test_molfi_guard():
    with pytest.raises(ValueError, match="max_fit_texts"):
        molfi_fit({f"t {i}": 1 for i in range(11)}, MoLFIParams(max_fit_texts=10))


@pytest.fixture(scope="module")
def tdf(spark):
    return transcripts_df(spark, 2000, 30, 20).cache()


def test_distributed_molfi_matches_sequential_oracle(spark, tdf):
    cfg = PipelineConfig(num_partitions=8)
    mined = mine_templates(tdf, cfg, strategy="molfi")
    pdf = (
        transcripts_pdf(2000, 30, 20)
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    recs, oracle_clusters = molfi_parse_sequential(pdf["text"].tolist())
    assert sorted((c.template, c.count) for c in mined) == sorted(
        (c.template, c.count) for c in oracle_clusters
    )
    assigned = assign_templates(
        tdf, mined, cfg.drain, with_params=False, strategy="molfi"
    )
    got = (
        assigned.select("conv_id", "turn_idx", "event_id", "matched")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    assert bool(got["matched"].all())
    assert got["event_id"].tolist() == [r["event_id"] for r in recs]
