#!/usr/bin/env python3
"""Cluster entrypoint: end-to-end corpus near-dup deduplication.

    bash tools/submit/make_zip.sh                    # → dist/engine.zip
    spark-submit --py-files dist/engine.zip \
        tools/submit/dedup_job.py \
        --input  <dir containing documents.parquet> \
        --output <output dir> \
        [--n-hashes 128] [--n-bands 16] [--shuffle-partitions N]

Composes the dedup family into the pipeline every production corpus
runs: verified near-dup edges (MinHash-LSH candidates that pass the
exact-Jaccard verify stage, union SimHash-within-Hamming pairs) →
connected components (iterative min-label propagation — the iterated
state is (doc_id, cluster_id), never text) → keeper-representative
filter → the deduplicated corpus written next to a cluster map and a
one-line metrics JSON.  At 100 TB the text column crosses the wire
exactly once (the final keeper semi-join); all clustering joins move
ids only.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-hashes", type=int, default=128)
    ap.add_argument("--n-bands", type=int, default=16)
    ap.add_argument("--max-iter", type=int, default=25)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from html_parser_spark.operators.dedup import dedup_cluster_keep_list
    from html_parser_spark.plans.session import get_spark

    spark = get_spark(
        app_name="corpus-dedup",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    clusters = dedup_cluster_keep_list(
        spark,
        args.input,
        max_iter=args.max_iter,
        n_hashes=args.n_hashes,
        n_bands=args.n_bands,
    ).persist()

    clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    keepers = clusters.filter(F.col("is_keeper") == 1).select("doc_id")
    # broadcast-threshold left to Catalyst/AQE: keepers is ids-only
    kept = docs.join(keepers, "doc_id", "left_semi")
    kept.write.mode("overwrite").parquet(f"{args.output}/documents")

    agg = clusters.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_keeper").cast("long")).alias("n_kept"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    ).first()
    summary = {
        "n_docs": agg["n_docs"],
        "n_kept": agg["n_kept"],
        "n_removed": agg["n_docs"] - agg["n_kept"],
        "n_clusters": agg["n_clusters"],
        "n_hashes": args.n_hashes,
        "n_bands": args.n_bands,
    }
    with open_metrics(args.output) as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))
    clusters.unpersist()
    spark.stop()


def open_metrics(output: str):
    import os

    os.makedirs(output, exist_ok=True)
    return open(f"{output}/metrics.json", "w")


if __name__ == "__main__":
    main()
