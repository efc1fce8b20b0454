"""Round-3 corpus-statistics operators: n-gram top-k and eval-set
decontamination.  Value equality vs DuckDB is covered by the entry
contract (both queries are registered with oracles); here we pin the
semantics and the PLAN SHAPE the 100-TB story depends on."""

import duckdb
import pytest

from html_parser_spark.operators import dedup, textstats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    yield con
    con.close()


def test_ngram_topk_matches_duckdb(spark, duck):
    srows = sorted(map(tuple, textstats.ngram_topk(spark, SF_DIR).collect()))
    drows = sorted(map(tuple, duck.execute(textstats.ngram_topk_sql()).fetchall()))
    assert srows == drows
    assert len(srows) == 20


def test_ngram_topk_counts_all_occurrences(spark, duck):
    """Unlike dedup shingles, frequency counting must NOT dedupe grams
    within a document."""
    total_grams = duck.execute(
        "SELECT sum(greatest(len(string_split(trim(regexp_replace(lower(text),"
        " '[ \t\n\x0b\f\r]+', ' ', 'g')), ' ')) - 2, 0)) FROM documents"
    ).fetchone()[0]
    counted = duck.execute(
        f"SELECT sum(n_occurrences) FROM ({textstats.ngram_topk_sql(n_top=10**9)})"
    ).fetchone()[0]
    assert counted == total_grams


def test_decontaminate_matches_duckdb(spark, duck):
    for width in (3, 8):
        srows = sorted(
            map(tuple, dedup.decontaminate(spark, SF_DIR, gram_width=width).collect())
        )
        drows = sorted(
            map(tuple, duck.execute(dedup.decontaminate_sql(gram_width=width)).fetchall())
        )
        assert srows == drows, f"width {width}"


def test_decontaminate_excludes_eval_docs(spark):
    ids = [r.doc_id for r in dedup.decontaminate(spark, SF_DIR, gram_width=3).collect()]
    assert ids == sorted(ids)
    assert all(i % 25 != 0 for i in ids)


def test_decontaminate_plan_broadcasts_eval_side(spark):
    plan = dedup.decontaminate(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the training side must not sort-merge (no full shuffle for the join)
    assert "SortMergeJoin" not in plan


def test_ngram_topk_plan_is_partial_agg_topk(spark):
    plan = textstats.ngram_topk(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # map-side combine: two HashAggregates (partial + final) around ONE exchange
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 2
