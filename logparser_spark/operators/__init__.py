from logparser_spark.operators.mine import mine_templates
from logparser_spark.operators.assign import assign_templates
from logparser_spark.operators.enrich import enrich
from logparser_spark.operators.route import with_sink_id, route_write
from logparser_spark.operators.aggregate import (
    grouped_percentiles,
    salted_agg,
    sink_window_counts,
    turn_window_counts,
)
from logparser_spark.operators.bpe import bpe_encode, bpe_train
from logparser_spark.operators.dedup import (
    dedup_keep_canonical,
    duplicate_clusters,
    incremental_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)
from logparser_spark.operators.curation import (
    chunk_documents,
    decontaminate,
    pack_sequences,
    pii_redact,
    stratified_sample,
    weighted_sample,
)
from logparser_spark.operators.ranking import (
    bm25_scores,
    bm25_topk,
    bm25_topk_from_cells,
)
from logparser_spark.operators.sketches import (
    cms_heavy_hitters,
    cms_sketch,
    hll_distinct,
    hll_registers,
    quantile_sketch,
)

__all__ = [
    "mine_templates",
    "assign_templates",
    "enrich",
    "with_sink_id",
    "route_write",
    "salted_agg",
    "sink_window_counts",
    "turn_window_counts",
    "grouped_percentiles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "duplicate_clusters",
    "dedup_keep_canonical",
    "incremental_dedup",
    "bpe_train",
    "bpe_encode",
    "bm25_scores",
    "bm25_topk",
    "bm25_topk_from_cells",
    "chunk_documents",
    "decontaminate",
    "pack_sequences",
    "pii_redact",
    "stratified_sample",
    "weighted_sample",
    "cms_sketch",
    "cms_heavy_hitters",
    "hll_registers",
    "hll_distinct",
    "quantile_sketch",
]
