#!/usr/bin/env python
"""spark-submit entry point for the training-data curation pipeline.

Runs the composed flow over a documents table
(``doc_id bigint, lang string, text string``):

    near-dup resolve (MinHash→LSH→Jaccard→connected components →
    keep canonical) → benchmark decontamination → per-language
    stratified sampling → PII redaction → fixed-width chunking →
    fixed-budget sequence packing

and writes the packed chunk assignments plus per-stage row counts.

Cluster usage:

    python scripts/make_pyfiles_zip.py               # → dist/logparser_spark.zip
    spark-submit --py-files dist/logparser_spark.zip \\
        jobs/run_curation.py --input <documents-parquet> --out <dir> \\
        [--incremental-corpus <canonical-parquet>] \\
        [--bench <eval-set-parquet>] [--rate en=3000,de=10000] \\
        [--seq-budget 4096] [--chunk-chars 2048 --chunk-overlap 256]

With ``--incremental-corpus`` the input is treated as a NEW batch and
deduped against the existing canonical corpus via
:func:`logparser_spark.operators.dedup.incremental_dedup` (corpus×corpus
pairs never materialize) instead of self-resolving.

Local smoke:

    spark-submit --master 'local[8]' --py-files dist/logparser_spark.zip \\
        jobs/run_curation.py --input /root/testdata/sf0.001/documents.parquet \\
        --out /tmp/curated
"""

from __future__ import annotations

import argparse
import json


def _parse_rates(spec: str) -> dict[str, int]:
    """"en=3000,de=10000" → {lang: per-10k keep rate}; absent langs keep 10000."""
    out: dict[str, int] = {}
    for part in spec.split(","):
        if not part:
            continue
        k, v = part.split("=", 1)
        out[k.strip()] = int(v)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (the batch)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--incremental-corpus",
                    help="existing canonical corpus parquet: dedup the batch "
                         "against it (and itself) instead of self-resolving")
    ap.add_argument("--bench", help="eval-set parquet (a `text` column) for "
                                    "decontamination; omit to skip the stage")
    ap.add_argument("--rate", default="",
                    help="per-lang keep rates out of 10000, e.g. en=3000,zh=0")
    ap.add_argument("--jaccard-threshold", type=float, default=0.8)
    ap.add_argument("--num-hashes", type=int, default=16)
    ap.add_argument("--rows-per-band", type=int, default=4)
    ap.add_argument("--shingle-n", type=int, default=3)
    ap.add_argument("--decon-ngram", type=int, default=5)
    ap.add_argument("--chunk-chars", type=int, default=2048)
    ap.add_argument("--chunk-overlap", type=int, default=256)
    ap.add_argument("--seq-budget", type=int, default=4096)
    ap.add_argument("--cc-strategy", default="label_prop",
                    choices=["label_prop", "two_phase"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from logparser_spark.functions.text import tokens_expr
    from logparser_spark.operators.curation import (
        chunk_documents,
        decontaminate,
        pack_sequences,
        pii_redact,
        stratified_sample,
    )
    from logparser_spark.operators.dedup import (
        dedup_keep_canonical,
        duplicate_clusters,
        incremental_dedup,
        jaccard_pairs,
        lsh_candidate_pairs,
    )

    spark = SparkSession.builder.appName("logparser_spark_curation").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(args.input)
    counts: dict[str, int] = {"input": docs.count()}

    # 1. near-dup resolution
    if args.incremental_corpus:
        corpus = spark.read.parquet(args.incremental_corpus)
        kept = incremental_dedup(
            docs, corpus,
            num_hashes=args.num_hashes, rows_per_band=args.rows_per_band,
            shingle_n=args.shingle_n, threshold=args.jaccard_threshold,
            strategy=args.cc_strategy,
        )
    else:
        cands = lsh_candidate_pairs(
            docs, "doc_id", "text",
            args.num_hashes, args.rows_per_band, args.shingle_n,
        )
        verified = jaccard_pairs(
            docs, "doc_id", "text", args.jaccard_threshold,
            args.shingle_n, candidates=cands,
        )
        clusters = duplicate_clusters(verified, strategy=args.cc_strategy)
        kept = dedup_keep_canonical(docs, clusters, "doc_id")
    kept = kept.localCheckpoint()  # the dedup subtree is reused below
    counts["after_dedup"] = kept.count()

    # 2. decontamination
    if args.bench:
        bench = spark.read.parquet(args.bench).select("text")
        decon = decontaminate(
            kept.select("doc_id", "text"), bench, "doc_id", "text",
            n=args.decon_ngram,
        )
        kept = kept.join(
            decon.filter(~F.col("contaminated")).select("doc_id"),
            "doc_id", "left_semi",
        )
        counts["after_decontaminate"] = kept.count()

    # 3. stratified sampling (skipped when no rates given); langs absent
    # from --rate keep everything, per the documented contract
    if args.rate:
        kept = stratified_sample(
            kept, "lang", _parse_rates(args.rate), "doc_id",
            default_rate=10_000,
        )
        counts["after_sample"] = kept.count()

    # 4. PII redaction → 5. chunking → 6. packing
    red = pii_redact(kept.select("doc_id", "text"))
    chunks = chunk_documents(
        red.select("doc_id", F.col("redacted").alias("text")),
        chunk_chars=args.chunk_chars, overlap=args.chunk_overlap,
    )
    # chunk_uid must be injective + orderable: chunk_idx < 2^20 covers
    # docs up to ~2 GB of text at the default stride, but --chunk-chars /
    # --chunk-overlap can shrink the stride arbitrarily, so the overflow
    # branch aborts loudly instead of silently aliasing the next doc's
    # chunks (raise_error sits in the never-taken branch — free when ok)
    chunk_uid = (
        F.when(
            F.col("chunk_idx") >= (1 << 20),
            F.raise_error(F.concat(
                F.lit("run_curation: chunk_idx overflows the 2^20 "
                      "chunk_uid space for doc_id "),
                F.col("doc_id"),
                F.lit(" — raise --chunk-chars or split the document"),
            )).cast("bigint"),
        )
        .otherwise(F.col("doc_id") * (1 << 20) + F.col("chunk_idx"))
        .cast("bigint").alias("chunk_uid")
    )
    packed = pack_sequences(
        chunks.select(
            chunk_uid,
            F.size(tokens_expr("chunk_text")).alias("n_tok"),
        ),
        args.seq_budget, id_col="chunk_uid",
    )
    out_df = chunks.select(
        chunk_uid, "doc_id", "chunk_idx", "chunk_start", "chunk_text",
    ).join(packed, "chunk_uid")
    out_df.write.mode("overwrite").parquet(args.out)
    # read the counters back from the written files — recomputing them
    # from `packed` would re-execute the whole redact→chunk→pack lineage
    written = spark.read.parquet(args.out)
    counts["chunks_written"] = written.count()
    counts["n_sequences"] = int(
        written.agg(F.max("seq_id")).first()[0] or 0
    ) + 1 if counts["chunks_written"] else 0
    print(json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()
