"""Template assignment (U3 in SURVEY §2.10): broadcast + vectorized match.

Assignment is a *pure function* of the final template set: each turn's
masked text is matched through a read-only Drain tree rebuilt from the
broadcast template list (same ``treeSearch``/``fastMatch`` semantics as the
reference, ≈L55–88/L167–187) — no generalization happens here, so the
operation is embarrassingly parallel, order-insensitive, and deterministic.

Vectorization: within each Arrow batch, masked texts are factorized and
each *unique* text is matched once; per-row work is a dictionary-codes
take.  A worker-global memo cache persists matches across batches, so hot
templates cost one tree walk per executor, not per row.  Parameter
extraction compiles one regex per template (reference
``get_parameter_list`` quirks preserved — see
:func:`logparser_spark.drain.template_to_param_regex`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logparser_spark.config import DrainParams
from logparser_spark.drain import (
    Cluster,
    DrainTree,
    event_id_of,
    extract_parameters,
)
from logparser_spark.operators.mine import with_masked

ASSIGN_FIELDS = [
    T.StructField("masked", T.StringType()),
    T.StructField("template", T.StringType()),
    T.StructField("event_id", T.StringType()),
    T.StructField("parameters", T.ArrayType(T.StringType())),
    T.StructField("matched", T.BooleanType()),
]


class _Matcher:
    """Read-only matcher over a fixed template set, with memoization."""

    def __init__(self, templates: list[str], params: DrainParams, with_params: bool):
        self.params = params
        self.with_params = with_params
        self.tree = DrainTree(params)
        for t in templates:
            self.tree.insert(Cluster(tokens=t.split(" ") if t else [""]))
        # masked text → (template, event_id, matched); params are per *raw*
        # text (the reference extracts them from the original Content), so
        # they get their own memo keyed on raw.
        self.memo: dict[str, tuple[str, str, bool]] = {}
        self.param_memo: dict[str, list[str]] = {}

    def match_masked(self, masked: str) -> tuple[str, str, bool]:
        hit = self.memo.get(masked)
        if hit is not None:
            return hit
        cluster = self.tree.search(masked.split())
        if cluster is None:
            template, matched = masked, False
        else:
            template, matched = cluster.template, True
        res = (template, event_id_of(template), matched)
        if len(self.memo) < 1_000_000:  # bound executor memory
            self.memo[masked] = res
        return res

    def params_for(self, raw: str, template: str, matched: bool) -> list[str]:
        if not (self.with_params and matched):
            return []
        hit = self.param_memo.get(raw)
        if hit is None:
            hit = extract_parameters(raw, template)
            if len(self.param_memo) < 1_000_000:
                self.param_memo[raw] = hit
        return hit


# worker-global cache: one matcher per (templates identity, params) per worker
_MATCHER_CACHE: dict[tuple, _Matcher] = {}


def _assign_fn(bc_templates, token: str, params: DrainParams, with_params: bool, out_cols: list[str]):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        key = (token, params, with_params)
        matcher = _MATCHER_CACHE.get(key)
        if matcher is None:
            matcher = _Matcher(bc_templates.value, params, with_params)
            if len(_MATCHER_CACHE) > 8:
                _MATCHER_CACHE.clear()
            _MATCHER_CACHE[key] = matcher
        for pdf in batches:
            codes, uniques = pd.factorize(pdf["masked"])
            results = [matcher.match_masked(u) for u in uniques]
            out = pdf.copy()
            out["template"] = pd.array([results[c][0] for c in codes], dtype=object)
            out["event_id"] = pd.array([results[c][1] for c in codes], dtype=object)
            out["matched"] = pd.array([results[c][2] for c in codes], dtype=bool)
            if with_params:
                out["parameters"] = pd.array(
                    [
                        matcher.params_for(raw, results[c][0], results[c][2])
                        for raw, c in zip(pdf["text"], codes)
                    ],
                    dtype=object,
                )
            else:
                out["parameters"] = pd.array([[] for _ in codes], dtype=object)
            yield out[out_cols]

    return fn


def assign_templates(
    df: DataFrame,
    clusters: list[Cluster],
    params: DrainParams | None = None,
    with_params: bool = True,
) -> DataFrame:
    """Attach ``masked, template, event_id, parameters, matched`` columns."""
    params = params or DrainParams()
    if "masked" not in df.columns:
        df = with_masked(df, params)
    templates = sorted(c.template for c in clusters)
    import hashlib

    token = hashlib.md5("\n".join(templates).encode("utf-8")).hexdigest()
    bc = df.sparkSession.sparkContext.broadcast(templates)
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name not in {x.name for x in ASSIGN_FIELDS}]
        + ASSIGN_FIELDS
    )
    out_cols = [f.name for f in out_schema.fields]
    return df.mapInPandas(_assign_fn(bc, token, params, with_params, out_cols), out_schema)
