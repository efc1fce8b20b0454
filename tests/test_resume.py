"""Resumability contract: kill-and-resume never loses or duplicates turns."""

import pytest
from pyspark.sql import functions as F

from html_parser_spark.fixtures import ensure_transcripts
from html_parser_spark.operators.resume import (
    filter_uncommitted,
    run_resumable,
)


@pytest.fixture(scope="module")
def transcripts(spark):
    return spark.read.parquet(ensure_transcripts(0.001))


def test_interrupted_run_resumes_exactly(spark, transcripts, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume_out"))
    # simulate a killed first run: only half the conversations committed
    half = transcripts.filter(F.crc32("conv_id") % 2 == 0)
    r1 = run_resumable(spark, half, out, num_partitions=4)
    assert r1["n_written"] == half.count() > 0

    # resume over the FULL input: only the missing half is processed
    r2 = run_resumable(spark, transcripts, out, num_partitions=4)
    assert r2["n_new"] == transcripts.count() - r1["n_written"]

    final = spark.read.parquet(f"{out}/extracted")
    assert final.count() == transcripts.count()
    assert final.select("conv_id", "turn_idx").distinct().count() == transcripts.count()

    # idempotent re-run: nothing new, nothing written
    r3 = run_resumable(spark, transcripts, out, num_partitions=4)
    assert r3["n_new"] == 0
    assert spark.read.parquet(f"{out}/extracted").count() == transcripts.count()


def test_lineage_covers_all_turns(spark, transcripts, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lineage_out"))
    run_resumable(spark, transcripts, out, num_partitions=4)
    lineage = spark.read.parquet(f"{out}/lineage")
    agg = lineage.agg(
        F.sum("n_turns").alias("turns"), F.count(F.lit(1)).alias("parts")
    ).first()
    assert agg["turns"] == transcripts.count()
    assert 0 < agg["parts"] <= 4
    metrics = spark.read.parquet(f"{out}/metrics")
    assert metrics.filter(F.col("parse_status") == "ok").count() == 1


def test_filter_uncommitted_none_passthrough(transcripts):
    assert filter_uncommitted(transcripts, None) is transcripts
