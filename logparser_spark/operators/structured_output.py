"""Reference-shape structured CSV output (analog of ``outputResult``
≈L202–235): ``<name>_structured.csv`` with ``LineId, headers…, Content,
EventId, EventTemplate, ParameterList`` and ``<name>_templates.csv`` with
``EventId, EventTemplate, Occurrences`` — drop-in for consumers of the
reference's files.

``ParameterList`` is rendered as the Python-list literal the reference
writes (``"['a', 'b']"``, ``[]`` when empty) with native concat/
array_join expressions — no UDF.  Parameters containing a single quote
render with escaped quotes (``\\'``), a documented divergence from
CPython's repr switching to double quotes for that edge.

At scale the writer emits a directory of part CSVs (one per partition,
ordered within partitions); ``single_file=True`` coalesces to one
part file for small-scale drop-in parity with the reference's single
CSV.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parameter_list_expr(col: str = "ParameterList"):
    quoted = F.transform(
        F.col(col),
        lambda x: F.concat(
            F.lit("'"), F.regexp_replace(x, r"'", r"\\'"), F.lit("'")
        ),
    )
    return F.concat(F.lit("["), F.array_join(quoted, ", "), F.lit("]"))


def structured_frame(parsed: DataFrame) -> DataFrame:
    """Stringify ParameterList and order columns reference-style."""
    cols = [c for c in parsed.columns if c not in ("ParameterList", "matched")]
    return parsed.select(
        *cols, parameter_list_expr("ParameterList").alias("ParameterList")
    )


def template_frame(parsed: DataFrame) -> DataFrame:
    return (
        parsed.groupBy("EventId", "EventTemplate")
        .agg(F.count(F.lit(1)).alias("Occurrences"))
        .orderBy(F.desc("Occurrences"), "EventId")
    )


def _write_csv(df: DataFrame, dest: str, single_file: bool) -> None:
    if single_file:
        df = df.coalesce(1)
    tmp = dest + "._spark_tmp"
    df.write.mode("overwrite").option("header", True).csv(tmp)
    if single_file:
        part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
        shutil.move(part, dest)
        shutil.rmtree(tmp)
    else:
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        shutil.move(tmp, dest)


def write_structured_csv(
    parsed: DataFrame, out_dir: str, name: str, single_file: bool = False
) -> tuple[str, str]:
    """Write ``<name>_structured.csv`` + ``<name>_templates.csv`` under
    ``out_dir``; returns the two paths.  ``parsed`` is the output of
    :func:`logparser_spark.benchmark.parse_log_file`."""
    os.makedirs(out_dir, exist_ok=True)
    structured = structured_frame(parsed).orderBy("LineId")
    templates = template_frame(parsed)
    s_path = os.path.join(out_dir, f"{name}_structured.csv")
    t_path = os.path.join(out_dir, f"{name}_templates.csv")
    _write_csv(structured, s_path, single_file)
    _write_csv(templates, t_path, single_file)
    return s_path, t_path
