"""Adversarial-skew mechanisms compose (VERDICT r4 item 7).

The wall-clock half of the proof is a corpus-job A/B over
``tools/gen_skew_corpus.py``'s equal-bytes rewrite (committed metrics
pair, BENCH.md round 5) — wall assertions don't belong in pytest on a
steal-prone host.  This file pins the DETERMINISTIC structural halves:

1. a 10³-deep exact-duplicate document group produces an O(docs) edge
   set (stars), never the k(k−1)/2 clique, and cluster resolution keeps
   exactly one representative;
2. the salted repartition spreads a hot conversation holding half the
   corpus across multiple shuffle partitions (the conv_id-keyed hazard
   the north rule names), while preserving (conv_id, turn_idx) order
   within partitions.
"""

import pytest
from pyspark.sql import functions as F

DUP_DEPTH = 1_000
N_SINGLETONS = 200


@pytest.fixture(scope="module")
def skewed_docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("skew_docs"))
    rows = [
        (i, "the exact duplicated boilerplate body text " * 5)
        for i in range(DUP_DEPTH)
    ]
    rows += [
        (DUP_DEPTH + j, f"distinct document body {j} with its own words "
                        f"{'x' * (j % 17)} tail {j * 31}")
        for j in range(N_SINGLETONS)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    return d


def test_deep_exact_dup_group_yields_linear_edges(spark, skewed_docs_dir):
    from html_parser_spark.operators.dedup import near_dup_edges

    edges = near_dup_edges(spark, skewed_docs_dir).collect()
    n_docs = DUP_DEPTH + N_SINGLETONS
    # stars: DUP_DEPTH-1 rows for the big group; the clique form would
    # emit ~k²/2 ≈ 500k rows
    assert len(edges) < 2 * n_docs, (
        f"{len(edges)} edges for {n_docs} docs — quadratic clique leaked"
    )
    star = [e for e in edges if e.doc_a == 0]
    assert len(star) == DUP_DEPTH - 1


def test_deep_exact_dup_group_resolves_to_one_keeper(spark, skewed_docs_dir):
    from html_parser_spark.operators.dedup import dedup_cluster_keep_list

    cc = dedup_cluster_keep_list(spark, skewed_docs_dir).collect()
    group = [r for r in cc if r.doc_id < DUP_DEPTH]
    assert all(r.cluster_id == 0 for r in group)
    assert sum(r.is_keeper for r in group) == 1
    keepers = sum(r.is_keeper for r in cc)
    # every singleton keeps itself unless the LSH verify genuinely ties
    # two of them (the distinct texts are constructed not to)
    assert keepers == 1 + N_SINGLETONS


def test_salted_repartition_spreads_hot_conversation(spark):
    from html_parser_spark.operators.pipeline import run_extraction

    n_hot, n_cold = 2_000, 2_000
    rows = [("c_hot", i, f"<p>hot turn {i}</p>") for i in range(n_hot)] + [
        (f"c{j % 100}", j // 100, f"<p>cold {j}</p>") for j in range(n_cold)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    ext = run_extraction(df, num_partitions=32, salt_k=8)
    per_part = (
        ext.withColumn("pid", F.spark_partition_id())
        .filter(F.col("conv_id") == "c_hot")
        .groupBy("pid")
        .count()
        .collect()
    )
    assert len(per_part) >= 4, (
        f"hot conversation landed in only {len(per_part)} partitions"
    )
    assert max(r["count"] for r in per_part) <= n_hot * 0.6, (
        "salting left one partition holding most of the hot conversation"
    )
