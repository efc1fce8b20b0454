"""Deterministic split/sample operators (operators/sampling.py): value
equality vs the DuckDB twin, reproducibility, stratification sanity, and
the zero-shuffle plan shape the 100-TB story depends on."""

import duckdb
import pytest

from html_parser_spark.operators import sampling

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    yield con
    con.close()


def test_corpus_splits_matches_duckdb(spark, duck):
    srows = sorted(map(tuple, sampling.corpus_splits(spark, SF_DIR).collect()))
    drows = sorted(map(tuple, duck.execute(sampling.corpus_splits_sql()).fetchall()))
    assert srows == drows
    assert len(srows) == 500


def test_sample_matches_duckdb(spark, duck):
    for rate in (1000, 2500):
        srows = sorted(
            map(tuple, sampling.sample_documents(spark, SF_DIR, rate_bp=rate).collect())
        )
        drows = sorted(
            map(tuple, duck.execute(sampling.sample_documents_sql(rate_bp=rate)).fetchall())
        )
        assert srows == drows, rate


def test_splits_partition_the_corpus(spark):
    rows = sampling.corpus_splits(spark, SF_DIR).collect()
    assert len({r.doc_id for r in rows}) == len(rows) == 500
    frac = {s: sum(r.split == s for r in rows) / len(rows) for s in ("train", "val", "test")}
    assert sum(frac.values()) == 1.0
    # 500 docs, 90/5/5 targets: binomial noise allows a few points
    assert abs(frac["train"] - 0.90) < 0.05
    assert abs(frac["val"] - 0.05) < 0.04
    assert abs(frac["test"] - 0.05) < 0.04


def test_split_is_seed_versioned_and_deterministic(spark):
    a = sorted(map(tuple, sampling.corpus_splits(spark, SF_DIR).collect()))
    b = sorted(map(tuple, sampling.corpus_splits(spark, SF_DIR).collect()))
    assert a == b
    c = sorted(map(tuple, sampling.corpus_splits(spark, SF_DIR, seed="split-v2").collect()))
    assert a != c  # bumping the seed reshuffles
    assert [r[0] for r in a] == [r[0] for r in c]  # ...but covers the same docs


def test_sample_rate_and_subset(spark):
    full = {r.doc_id for r in sampling.sample_documents(spark, SF_DIR, rate_bp=10000).collect()}
    ten = {r.doc_id for r in sampling.sample_documents(spark, SF_DIR, rate_bp=1000).collect()}
    assert full == set(range(len(full)))  # rate 100% keeps everything
    assert ten <= full
    assert 0.05 < len(ten) / len(full) < 0.16  # ~10% +- binomial noise


def test_plans_have_no_shuffle(spark):
    for df in (
        sampling.corpus_splits(spark, SF_DIR),
        sampling.sample_documents(spark, SF_DIR),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
