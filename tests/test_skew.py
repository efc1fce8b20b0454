"""Skew evidence (SURVEY.md §7 step 4): salting measurably spreads a
pathological hot conversation.

A conversation with ~half the corpus's turns is the worst case for
conv_id-partitioned work: without salting it serializes behind one task.
The assertion is structural (partition spread), not wall-clock — timing
on the shared sandbox is noise-dominated; BENCH.md carries the measured
throughput effect of partition granularity instead.
"""

import pytest
from pyspark.sql import functions as F

from html_parser_spark.fixtures import ensure_transcripts
from html_parser_spark.operators.pipeline import run_extraction


@pytest.fixture(scope="module")
def skewed(spark):
    """sf0.001 corpus + one synthetic 1,000-turn hot conversation."""
    base = spark.read.parquet(ensure_transcripts(0.001))
    hot = (
        spark.range(1000)
        .select(
            F.lit("conv_hot").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("<p>turn "), F.col("id"), F.lit(" text</p>")).alias(
                "text"
            ),
            F.lit("").alias("tool"),
            F.current_timestamp().alias("ts"),
        )
    )
    return base.unionByName(hot)


def _spread(df, conv_id):
    return (
        df.filter(F.col("conv_id") == conv_id)
        .withColumn("pid", F.spark_partition_id())
        .select("pid")
        .distinct()
        .count()
    )


def test_unsalted_hot_conversation_serializes(spark, skewed):
    out = run_extraction(skewed, num_partitions=16, salt_k=1)
    assert _spread(out, "conv_hot") == 1  # the straggler the salt fixes


def test_salted_hot_conversation_spreads(spark, skewed):
    out = run_extraction(skewed, num_partitions=16, salt_k=8)
    spread = _spread(out, "conv_hot")
    assert spread >= 4  # ~min(salt_k, partitions) modulo hash collisions


def test_salting_preserves_results(spark, skewed):
    a = run_extraction(skewed, num_partitions=16, salt_k=1)
    b = run_extraction(skewed, num_partitions=16, salt_k=8)
    ka = {(r.conv_id, r.turn_idx, r.main_text) for r in a.collect()}
    kb = {(r.conv_id, r.turn_idx, r.main_text) for r in b.collect()}
    assert ka == kb


def test_long_text_routing_identical_results(spark):
    """long_text_threshold must only change the physical routing, never
    the output; long rows spread round-robin across partitions."""
    base = spark.read.parquet(ensure_transcripts(0.001))
    plain = run_extraction(base, num_partitions=8)
    routed = run_extraction(base, num_partitions=8, long_text_threshold=4096)
    ka = {(r.conv_id, r.turn_idx, r.main_text, r.err_count) for r in plain.collect()}
    kb = {(r.conv_id, r.turn_idx, r.main_text, r.err_count) for r in routed.collect()}
    assert ka == kb
    assert len(kb) == base.count()
