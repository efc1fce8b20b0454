"""End-to-end Spark pipeline tests (SURVEY.md §7 step 3).

Equality gate: the distributed pipeline must produce byte-identical
(main_text, spans, err_count, parse_status) to the pure-Python extractor
for every (conv_id, turn_idx) — the same per-turn text-equality contract
the driver applies against reference goldens.
"""

import os

import pytest

from html_parser_spark.fixtures import ensure_transcripts
from html_parser_spark.functions.extract import extract
from html_parser_spark.operators.pipeline import (
    extraction_metrics,
    run_extraction,
)

SF = 0.001


@pytest.fixture(scope="module")
def transcripts(spark):
    path = ensure_transcripts(SF)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def extracted(spark, transcripts):
    return run_extraction(transcripts, num_partitions=8).cache()


def test_row_level_equality_vs_pure_python(transcripts, extracted):
    raw = {
        (r.conv_id, r.turn_idx): r.text
        for r in transcripts.select("conv_id", "turn_idx", "text").collect()
    }
    got = extracted.collect()
    assert len(got) == len(raw) > 0
    for row in got:
        want = extract(raw[(row.conv_id, row.turn_idx)])
        assert row.main_text == want["main_text"], (row.conv_id, row.turn_idx)
        assert [[s.start, s.end] for s in row.spans] == [
            w[:2] for w in want["spans"]
        ]
        assert row.err_count == want["err_count"]
        assert row.parse_status == want["parse_status"]


def test_plan_shape(transcripts):
    """Scan must prune to the 3 needed columns; UDF must run on the Arrow
    path; exactly one exchange (the salted repartition).

    clearCache first: if an earlier test persisted a matching plan
    subtree (the entry-contract frame cache does), Spark substitutes an
    InMemoryRelation whose stored plan text carries its own Exchange —
    the assertion is about the FRESH plan."""
    transcripts.sparkSession.catalog.clearCache()
    plan = run_extraction(transcripts)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert plan.count("Exchange") == 1
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    read_schema = scan_line.split("ReadSchema: ")[1]
    assert read_schema == "struct<conv_id:string,turn_idx:int,text:string>"


def test_dom_plan_shape(transcripts):
    """The DOM pipeline keeps the flagship's plan discipline: pruned
    scan, one exchange, Arrow UDF path."""
    from html_parser_spark.operators.pipeline import run_dom_extraction

    transcripts.sparkSession.catalog.clearCache()  # see test_plan_shape
    plan = (
        run_dom_extraction(transcripts)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert plan.count("Exchange") == 1
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    read_schema = scan_line.split("ReadSchema: ")[1]
    assert read_schema == "struct<conv_id:string,turn_idx:int,text:string>"


def test_metrics_rollup(spark, extracted):
    m = {r.parse_status: r for r in extraction_metrics(extracted).collect()}
    assert "ok" in m
    total = sum(r.turns for r in m.values())
    assert total == extracted.count()
    assert m["ok"].tokens > 0 and m["ok"].main_text_chars > 0


def test_salting_spreads_hot_conversations(spark, transcripts):
    """A hot conversation's turns must land in >1 partition after the
    salted repartition (the whole point of the salt)."""
    from pyspark.sql import functions as F

    hot = (
        transcripts.groupBy("conv_id")
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    if hot["count"] < 16:
        pytest.skip("fixture too small to contain a hot conversation")
    parts = (
        run_extraction(transcripts, num_partitions=8, salt_k=8)
        .filter(F.col("conv_id") == hot.conv_id)
        .withColumn("pid", F.spark_partition_id())
        .select("pid")
        .distinct()
        .count()
    )
    assert parts > 1


def test_stable_turn_ordering_within_partitions(spark, transcripts):
    """north_star contract: rows are ordered by (conv_id, turn_idx)
    within every output partition (sortWithinPartitions)."""
    from pyspark.sql import functions as F

    out = run_extraction(transcripts, num_partitions=8).withColumn(
        "pid", F.spark_partition_id()
    )

    def check(it):
        import pandas as pd

        for pdf in it:
            keys = list(zip(pdf["conv_id"], pdf["turn_idx"]))
            yield pd.DataFrame({"ok": [keys == sorted(keys)]})

    res = (
        out.select("pid", "conv_id", "turn_idx")
        .mapInPandas(check, schema="ok boolean")
        .collect()
    )
    assert res and all(r.ok for r in res)


def test_source_partitioned_skips_shuffle(spark, transcripts):
    """Bucketed-source mode: zero exchanges, identical results."""
    from pyspark.sql import functions as F

    noshuffle = run_extraction(transcripts, source_partitioned=True)
    plan = noshuffle._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan

    want = {
        (r.conv_id, r.turn_idx, r.main_text)
        for r in run_extraction(transcripts, num_partitions=8).collect()
    }
    got = {(r.conv_id, r.turn_idx, r.main_text) for r in noshuffle.collect()}
    assert got == want


def test_edge_inputs_flow_through(spark):
    """NULL / empty / whitespace / markup-only / huge-token turns survive
    the full distributed path with sane outputs."""
    rows = [
        ("c0", 0, None),
        ("c0", 1, ""),
        ("c0", 2, "   \t\n"),
        ("c0", 3, "<div></div>"),
        ("c0", 4, "x" * 100_000),
        ("c0", 5, "<p>" + "y" * 50_000 + "</p>"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {r.turn_idx: r for r in run_extraction(df, num_partitions=2).collect()}
    assert got[0].parse_status == "null_input" and got[0].main_text == ""
    assert got[1].main_text == "" and got[1].parse_status == "ok"
    assert got[2].main_text == ""
    assert got[3].main_text == "" and got[3].n_blocks == 0
    assert got[4].main_text == "x" * 100_000
    assert got[5].main_text == "y" * 50_000


def test_assemble_conversations_orders_turns(spark):
    """Assembly is (conv_id, turn_idx)-ordered regardless of input order,
    and the md5 fingerprints the joined text exactly."""
    import hashlib

    from html_parser_spark.operators.pipeline import assemble_conversations

    rows = [("c1", 2, "third"), ("c1", 0, "first"), ("c1", 1, "second"),
            ("c2", 0, "solo")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {r.conv_id: r for r in assemble_conversations(df).collect()}
    joined = "first\nsecond\nthird"
    assert got["c1"].n_turns == 3
    assert got["c1"].n_chars == len(joined)
    assert got["c1"].text_md5 == hashlib.md5(joined.encode()).hexdigest()
    assert got["c2"].text_md5 == hashlib.md5(b"solo").hexdigest()


def test_assemble_conversations_caps_mega_conversation(spark):
    """A pathological conversation past max_turns is truncated to the
    first max_turns turns and flagged overflow=1; normal conversations
    pass through overflow=0 untouched (VERDICT r03 item 7)."""
    import hashlib

    from html_parser_spark.operators.pipeline import assemble_conversations

    mega = [("mega", i, f"t{i}") for i in range(10)]
    tiny = [("tiny", 0, "a"), ("tiny", 1, "b")]
    df = spark.createDataFrame(
        mega + tiny, "conv_id string, turn_idx int, text string"
    )
    got = {r.conv_id: r for r in assemble_conversations(df, max_turns=4).collect()}
    kept = "\n".join(f"t{i}" for i in range(4))
    assert got["mega"].n_turns == 10           # true size still reported
    assert got["mega"].overflow == 1
    assert got["mega"].n_chars == len(kept)    # output bounded at the cap
    assert got["mega"].text_md5 == hashlib.md5(kept.encode()).hexdigest()
    assert got["tiny"].overflow == 0
    assert got["tiny"].text_md5 == hashlib.md5(b"a\nb").hexdigest()
