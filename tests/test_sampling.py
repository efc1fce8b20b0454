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


def test_chunking_matches_duckdb(spark, duck):
    from html_parser_spark.operators import chunking

    for ct, ov in ((128, 32), (16, 4)):
        srows = sorted(map(tuple, chunking.chunk_documents(spark, SF_DIR, ct, ov).collect()))
        drows = sorted(map(tuple, duck.execute(chunking.chunk_documents_sql(chunk_tokens=ct, overlap=ov)).fetchall()))
        assert srows == drows, (ct, ov)
        assert len(srows) >= 500  # every doc yields >= 1 chunk


def test_chunking_window_invariants(spark):
    from html_parser_spark.operators import chunking

    rows = chunking.chunk_documents(spark, SF_DIR, 16, 4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    import duckdb as d

    con = d.connect()
    toks = dict(
        con.execute(
            "SELECT doc_id, len(string_split(trim(regexp_replace(lower(text),"
            f" '[ \t\n\x0b\f\r]+', ' ', 'g')), ' ')) FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    con.close()
    stride = 12
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = toks[doc_id]
        # contiguous ids, full windows except possibly the last, clamped tail
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        for c in chunks[:-1]:
            assert c.chunk_tokens == 16
        assert chunks[-1].chunk_tokens == min(16, n - (len(chunks) - 1) * stride)
        # every token index is covered by some window
        covered = set()
        for c in chunks:
            start = c.chunk_idx * stride
            covered.update(range(start, start + c.chunk_tokens))
        assert covered == set(range(n))


def test_chunking_rejects_bad_overlap(spark):
    from html_parser_spark.operators import chunking

    with pytest.raises(ValueError):
        chunking.chunk_documents(spark, SF_DIR, 16, 16)


def test_mix_matches_duckdb(spark, duck):
    srows = sorted(map(tuple, sampling.mix_documents(spark, SF_DIR).collect()))
    drows = sorted(map(tuple, duck.execute(sampling.mix_documents_sql()).fetchall()))
    assert srows == drows
    custom = {"src3": 10000, "src4": 0}
    srows = sorted(
        map(tuple, sampling.mix_documents(spark, SF_DIR, rates_bp=custom, default_bp=500).collect())
    )
    drows = sorted(
        map(tuple, duck.execute(sampling.mix_documents_sql(rates_bp=custom, default_bp=500)).fetchall())
    )
    assert srows == drows


def test_mix_respects_rates(spark):
    rows = sampling.mix_documents(
        spark, SF_DIR, rates_bp={"src0": 10000, "src1": 0}, default_bp=0
    ).collect()
    srcs = {r.source for r in rows}
    assert srcs == {"src0"}  # rate-0 sources vanish, rate-10000 keeps all
    import duckdb as d

    con = d.connect()
    n_src0 = con.execute(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet' WHERE source = 'src0'"
    ).fetchone()[0]
    con.close()
    assert len(rows) == n_src0


def test_mix_independent_of_split(spark):
    """Different seeds: the mixing decision must not correlate with the
    split assignment (both are md5 buckets but over different keys)."""
    mix_ids = {r.doc_id for r in sampling.mix_documents(
        spark, SF_DIR, rates_bp={}, default_bp=5000).collect()}
    splits = {r.doc_id: r.split for r in sampling.corpus_splits(spark, SF_DIR).collect()}
    picked_train = sum(1 for i in mix_ids if splits[i] == "train")
    # ~90% of the mixed half should be train; gross correlation would skew it
    assert 0.8 < picked_train / len(mix_ids) < 1.0
