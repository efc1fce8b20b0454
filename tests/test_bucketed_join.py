"""Bucketed co-located join: the scale story behind the Iceberg DDL.

sources/tables.py partitions `transcripts` and `extracted` with
``bucket(512, conv_id)`` so the resume anti-join and any
transcript⋈extracted join are bucket-local.  This test proves the
mechanism on Spark's own bucketed tables (in-session catalog): joining
two tables bucketed+sorted on the same key plans a SortMergeJoin with
NO shuffle exchange on either side.
"""

import pytest
from pyspark.sql import functions as F

from html_parser_spark.fixtures import ensure_transcripts


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    t = spark.read.parquet(ensure_transcripts(0.001))
    base = tmp_path_factory.mktemp("buckets")
    for name, df in (
        ("t_a", t.select("conv_id", "turn_idx", "text")),
        ("t_b", t.select("conv_id", "turn_idx", "role")),
    ):
        (
            df.write.bucketBy(8, "conv_id")
            .sortBy("conv_id")
            .option("path", str(base / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "t_a", "t_b"
    for name in ("t_a", "t_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    a, b = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(a).join(spark.table(b), "conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # sanity: the join actually produces rows
        assert joined.limit(1).count() == 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucket_pruning_groups_within_bucket(spark, bucketed):
    a, _ = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = spark.table(a).groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        # aggregation on the bucket key needs no shuffle either
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_docs_semi_join_no_text_exchange(spark, tmp_path_factory):
    """The corpus job's --bucket-docs contract: with the documents
    checkpoint bucketed+sorted on doc_id, the keeper semi-join plans
    with NO exchange on the text side even when the id list is too big
    to broadcast — only the id side hashes into the bucket layout.
    This is what keeps 100 TB of text from re-shuffling at every stage
    once keeper/contaminated/train id lists outgrow broadcast."""
    base = tmp_path_factory.mktemp("bdocs")
    docs = spark.range(0, 2000).selectExpr(
        "id AS doc_id",
        "concat('body ', id) AS text",
        "'s' AS source",
        "10 AS n_chars",
    )
    (
        docs.write.bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .option("path", str(base / "docs"))
        .mode("overwrite")
        .saveAsTable("docs_bucket_test")
    )
    try:
        keepers = spark.range(0, 2000, 3).selectExpr("id AS doc_id")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("docs_bucket_test").join(
                keepers, "doc_id", "left_semi"
            )
            plan = (
                joined._jdf.queryExecution().executedPlan().toString()
            )
            assert "SortMergeJoin" in plan
            # exactly ONE exchange (the id side); the bucketed text scan
            # feeds the join directly
            n_ex = plan.count("Exchange hashpartitioning")
            assert n_ex == 1, plan
            # and the exchange is NOT over the text column
            for line in plan.splitlines():
                if "Exchange hashpartitioning" in line:
                    assert "text" not in line, line
            assert joined.count() == 667
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS docs_bucket_test")
