"""Property-based tests (hypothesis) for kernel invariants — SURVEY §5.2.5.

Pure-Python (no Spark session): masking idempotence, event-id stability,
template self-matching, merge determinism under permutation.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from logparser_spark.config import DrainParams
from logparser_spark.drain import (
    DrainTree,
    compile_rex,
    event_id_of,
    mask_text,
    merge_template_sets,
    parse_sequential,
    tokenize,
)

PATTERNS = compile_rex(DrainParams().rex)

# word-ish tokens + loghub-style parameter shapes
token = st.one_of(
    st.sampled_from(["alpha", "beta", "load", "done", "error", "ok", "x1y"]),
    st.integers(0, 10**9).map(str),
    st.integers(0, 10**7).map(lambda n: f"blk_{n}"),
    st.tuples(st.integers(0, 255), st.integers(0, 255)).map(
        lambda t: f"10.0.{t[0]}.{t[1]}"
    ),
    st.integers(0, 2**31).map(lambda n: f"0x{n:x}"),
)
line = st.lists(token, min_size=1, max_size=12).map(" ".join)


@given(line)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_masking_is_idempotent(text):
    once = mask_text(text, PATTERNS)
    assert mask_text(once, PATTERNS) == once


@given(line)
@settings(max_examples=100, deadline=None, derandomize=True)
def test_masking_preserves_token_count(text):
    # each regex matches within single whitespace-delimited tokens
    assert len(tokenize(mask_text(text, PATTERNS))) == len(tokenize(text))


@given(st.lists(line, min_size=1, max_size=40))
@settings(max_examples=50, deadline=None, derandomize=True)
def test_assignment_matcher_agrees_with_oracle(lines):
    """The distributed assignment matcher (U3 semantics, pure-python API)
    reproduces the oracle's per-line event ids given the oracle's final
    template set — including the all-wildcard-template edge where
    similarity search can't match and the exact-template fallback kicks
    in."""
    import numpy as np

    from logparser_spark.operators.assign import _Matcher

    recs, clusters = parse_sequential(lines)
    matcher = _Matcher(sorted(c.template for c in clusters), DrainParams(), False)
    masked = np.array([mask_text(t, PATTERNS) for t in lines], dtype=object)
    results = matcher.match_unique(masked)
    for rec, (tpl, eid, matched) in zip(recs, results):
        assert matched, (rec, tpl)
        assert eid == rec["event_id"]


@given(st.lists(line, min_size=1, max_size=30), st.randoms())
@settings(max_examples=50, deadline=None, derandomize=True)
def test_merge_is_permutation_invariant(lines, rnd):
    _, clusters = parse_sequential(lines)
    pairs = [(c.template, c.count) for c in clusters]
    shuffled = list(pairs)
    rnd.shuffle(shuffled)
    a = sorted(c.template for c in merge_template_sets([pairs]))
    b = sorted(c.template for c in merge_template_sets([shuffled]))
    assert a == b


@given(st.lists(line, min_size=2, max_size=30))
@settings(max_examples=50, deadline=None, derandomize=True)
def test_counts_conserved_through_merge(lines):
    _, clusters = parse_sequential(lines)
    merged = merge_template_sets([[(c.template, c.count) for c in clusters]])
    assert sum(c.count for c in merged) == len(lines)
