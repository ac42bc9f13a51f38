"""The north rule's deployment contract, tested literally: the job runs
via ``spark-submit --py-files dist/logparser_spark.zip`` from a FOREIGN
cwd (so imports resolve from the zip, not from the repo checkout) and
writes the routed fan-out + metrics."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_from_foreign_cwd():
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles_zip.py")],
        check=True,
        cwd=REPO,
        capture_output=True,
    )
    zip_path = os.path.join(REPO, "dist", "logparser_spark.zip")
    assert os.path.exists(zip_path)
    out = tempfile.mkdtemp(prefix="submit_smoke_")
    cwd = tempfile.mkdtemp(prefix="foreign_cwd_")  # NOT the repo
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    proc = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            os.path.join(REPO, "jobs", "run_pipeline.py"),
            "--synthetic-turns",
            "5000",
            "--out",
            os.path.join(out, "routed"),
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # routed fan-out exists (ckpt_bucket= then sink_id= partition dirs),
    # and the per-run metrics JSON was emitted; run_pipeline lays out
    # <out>/{routed, _manifest, _templates.json, agg_sink_window}
    routed = os.path.join(out, "routed", "routed")
    buckets = [d for d in os.listdir(routed) if d.startswith("ckpt_bucket=")]
    assert buckets, os.listdir(routed)
    sinks = [
        d
        for d in os.listdir(os.path.join(routed, buckets[0]))
        if d.startswith("sink_id=")
    ]
    assert sinks
    metrics_line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert metrics_line, proc.stdout[-2000:]
    m = json.loads(metrics_line[-1])
    assert m["routed_rows"] == 5000 and m["n_templates"] > 0, m


def test_spark_submit_curation_job_from_foreign_cwd():
    """The curation entry point ships the same way: spark-submit with
    --py-files from a foreign cwd, over the sf0.001 documents table,
    exercising dedup → decontaminate → sample → redact → chunk → pack
    and emitting per-stage counts."""
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles_zip.py")],
        check=True, cwd=REPO, capture_output=True,
    )
    zip_path = os.path.join(REPO, "dist", "logparser_spark.zip")
    out = tempfile.mkdtemp(prefix="curation_smoke_")
    cwd = tempfile.mkdtemp(prefix="foreign_cwd_")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "run_curation.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", os.path.join(out, "curated"),
            # only zh named: the other langs must keep EVERYTHING (the
            # documented absent-langs-keep-10000 contract — a default
            # of drop-absent would zero out the corpus here)
            "--rate", "zh=0",
            "--jaccard-threshold", "0.99",
            "--chunk-chars", "128", "--chunk-overlap", "32",
            "--seq-budget", "512",
        ],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics_line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert metrics_line, proc.stdout[-2000:]
    m = json.loads(metrics_line[-1])
    assert m["input"] == 500
    assert 0 < m["after_sample"] < m["after_dedup"] <= m["input"], (
        "zh must be dropped and every unnamed lang kept in full"
    )
    assert m["chunks_written"] >= m["after_sample"]
    assert m["n_sequences"] >= 1
    import glob

    files = glob.glob(os.path.join(out, "curated", "*.parquet"))
    assert files


def test_spark_submit_curation_incremental_corpus_rejects_known_docs(spark):
    """The job's --incremental-corpus arm: a batch whose every document
    already exists in the canonical corpus (under different ids — the
    globally-unique-id contract) admits NOTHING, and the empty pipeline
    tail (redact → chunk → pack over zero rows) degrades cleanly."""
    from pyspark.sql import functions as F

    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    zip_path = os.path.join(REPO, "dist", "logparser_spark.zip")
    if not os.path.exists(zip_path):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles_zip.py")],
            check=True, cwd=REPO, capture_output=True,
        )
    d = tempfile.mkdtemp(prefix="curation_inc_")
    corpus_path = os.path.join(d, "corpus")
    (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn("doc_id", F.col("doc_id") + 10_000)
        .write.parquet(corpus_path)
    )
    cwd = tempfile.mkdtemp(prefix="foreign_cwd_")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "run_curation.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", os.path.join(d, "curated"),
            "--incremental-corpus", corpus_path,
            "--cc-strategy", "two_phase",
            "--jaccard-threshold", "0.99",
        ],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    m = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert m["input"] == 500
    assert m["after_dedup"] == 0
    assert m["chunks_written"] == 0 and m["n_sequences"] == 0
