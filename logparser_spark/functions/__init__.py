"""Column-expression helpers (all native ``pyspark.sql.functions`` —
JVM-side, whole-stage-codegen'd; no Python UDFs in this package)."""

from logparser_spark.functions.masking import mask_expr, mask_sql
from logparser_spark.functions.hashing import event_id_expr, bucket_expr
from logparser_spark.functions.text import tokens_expr

__all__ = ["mask_expr", "mask_sql", "event_id_expr", "bucket_expr", "tokens_expr"]
