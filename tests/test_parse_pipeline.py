"""Distributed mine→merge→assign vs the sequential oracle (SURVEY §5.2)."""

from __future__ import annotations

import pandas as pd
import pytest

from logparser_spark.config import PipelineConfig
from logparser_spark.drain import parse_sequential
from logparser_spark.operators.assign import assign_templates
from logparser_spark.operators.mine import mine_templates, with_masked
from logparser_spark.sources.transcripts import transcripts_df, transcripts_pdf

N, CONVS, SKEW = 3000, 40, 25


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def tdf(spark):
    return transcripts_df(spark, N, CONVS, SKEW).cache()


@pytest.fixture(scope="module")
def oracle():
    pdf = _sorted(transcripts_pdf(N, CONVS, SKEW))
    recs, clusters = parse_sequential(pdf["text"].tolist())
    pdf = pdf.assign(
        event_id=[r["event_id"] for r in recs],
        template=[r["template"] for r in recs],
        parameters=[r["parameters"] for r in recs],
    )
    return pdf, clusters


def test_generator_matches_pandas_mirror(spark, tdf):
    got = _sorted(tdf.toPandas())
    want = _sorted(transcripts_pdf(N, CONVS, SKEW))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_generator_overflow_boundary_t_2pow38(spark):
    """ADVICE r2 #9: the mod-reduced multiplies in the parameter
    derivation claim 64-bit safety for t < 2³⁹; pin Spark==pandas
    bit-equality for a window at t ≈ 2³⁸ (python ints never wrap, so any
    Spark-side int64 wrap would break equality).  ``ts`` is excluded:
    turn_idx*60 s at this t exceeds pandas' ns-epoch range — a mirror
    limitation, not a generator one.  n_convs is 200 (not the suite's
    40) so dense per-conv turn_idx ≈ 2³⁸/199 stays inside the schema's
    declared int32 — at real 10¹²-turn scale conv counts are in the
    millions; Spark correctly *refuses* (CAST_OVERFLOW, ANSI) rather
    than wraps when a generator parameterization breaks that bound."""
    t0 = 1 << 38
    convs = 200
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    got = _sorted(
        transcripts_df(spark, 2000, convs, SKEW, t_start=t0).select(*cols).toPandas()
    )
    want = _sorted(transcripts_pdf(2000, convs, SKEW, t_start=t0)[cols + ["ts"]])[cols]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_mined_template_set_equals_oracle(spark, tdf, oracle):
    _, oracle_clusters = oracle
    mined = mine_templates(tdf, PipelineConfig(num_partitions=8))
    assert sorted(c.template for c in mined) == sorted(
        c.template for c in oracle_clusters
    )
    # occurrence counts survive the merge
    assert sum(c.count for c in mined) == N


def test_assignment_matches_oracle_rowwise(spark, tdf, oracle):
    oracle_pdf, oracle_clusters = oracle
    cfg = PipelineConfig(num_partitions=8)
    mined = mine_templates(tdf, cfg)
    assigned = assign_templates(tdf, mined, cfg.drain)
    got = _sorted(
        assigned.select("conv_id", "turn_idx", "event_id", "template", "parameters", "matched").toPandas()
    )
    assert bool(got["matched"].all())
    assert got["event_id"].tolist() == oracle_pdf["event_id"].tolist()
    assert got["template"].tolist() == oracle_pdf["template"].tolist()
    assert [list(p) for p in got["parameters"]] == oracle_pdf["parameters"].tolist()


def test_mining_on_sample_still_covers_templates(spark, tdf, oracle):
    """Scale path: mine on a 1-in-2 conversation sample, assign everywhere."""
    _, oracle_clusters = oracle
    cfg = PipelineConfig(num_partitions=8)
    mined = mine_templates(tdf, cfg, sample_one_in=2)
    assigned = assign_templates(tdf, mined, cfg.drain)
    # every template in the bank appears in every decent-sized sample, so
    # full-data assignment still matches everything
    assert assigned.filter("NOT matched").count() == 0


def test_assignment_is_pure_function_of_template_set(spark, tdf):
    """Same template set → same assignment regardless of partitioning."""
    cfg = PipelineConfig(num_partitions=8)
    mined = mine_templates(tdf, cfg)
    a = _sorted(assign_templates(tdf.repartition(3), mined, cfg.drain).select("conv_id", "turn_idx", "event_id").toPandas())
    b = _sorted(assign_templates(tdf.repartition(11), mined, cfg.drain).select("conv_id", "turn_idx", "event_id").toPandas())
    assert a.equals(b)


def test_masked_column_native(spark, tdf):
    m = with_masked(tdf, PipelineConfig().drain)
    row = m.filter("text LIKE 'Received block%'").select("text", "masked").first()
    assert row["masked"].startswith("Received block <*> of size <*> from")
