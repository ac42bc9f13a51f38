from logparser_spark.plans.pipeline import run_pipeline, PipelineResult
from logparser_spark.plans.manifest import (
    committed_buckets,
    read_manifest,
    write_manifest_rows,
    load_templates,
    save_templates,
)

__all__ = [
    "run_pipeline",
    "PipelineResult",
    "committed_buckets",
    "read_manifest",
    "write_manifest_rows",
    "load_templates",
    "save_templates",
]
