"""logparser_spark — a PySpark-native log parse → enrich → route → aggregate engine.

A from-scratch, Spark-first re-expression of the query/data-processing
capabilities of the ``nbaoping/logparser`` template-mining toolkit
(Drain-style fixed-depth prefix-tree templating + regex preprocessing),
re-architected for distributed execution:

* **parse**  — native ``regexp_replace`` masking + a mine/merge/assign
  scheme: per-partition Drain mining inside Arrow-batched ``mapInPandas``,
  a tiny driver-side template merge, and a broadcast vectorized assignment.
* **enrich** — broadcast hash joins against small lookup dimensions.
* **route**  — deterministic ``sink_id = f(template, role)`` and a single
  fan-out ``partitionBy`` write.
* **aggregate** — two-stage salted (skew-proof) windowed grouped counts.

Everything is DataFrame/Catalyst-native except the mining kernel, which is
inherently sequential and runs as a per-partition Arrow batch operator.
"""

from logparser_spark.config import DrainParams, PipelineConfig

__all__ = ["DrainParams", "PipelineConfig"]
__version__ = "0.1.0"
