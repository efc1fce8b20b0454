"""HLL sketch accuracy vs exact cardinality."""

from html_parser_spark.operators.textstats import (
    distinct_counts,
    distinct_counts_approx,
)

SF_DIR = "/root/testdata/sf0.01"


def test_hll_within_5pct_of_exact(spark):
    exact = {r.source: r.n_distinct for r in distinct_counts(spark, SF_DIR).collect()}
    approx = {
        r.source: r.n_distinct_approx
        for r in distinct_counts_approx(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for src, n in exact.items():
        assert abs(approx[src] - n) <= max(2, 0.05 * n), (src, n, approx[src])


def test_approx_quantiles_rank_error_bounded(spark):
    """approx_percentile guarantees RANK error (not value error): the
    returned value's rank in the group must be within ~3% of the target
    quantile's rank (accuracy=10000 → 1/accuracy rank error + discrete
    data slack)."""
    import bisect

    from html_parser_spark.operators.textstats import length_quantiles_approx

    vals = {}
    for r in (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source", "n_chars")
        .collect()
    ):
        vals.setdefault(r.source, []).append(r.n_chars)
    for v in vals.values():
        v.sort()
    approx = {r.source: (r.p25, r.p50, r.p90, r.p99)
              for r in length_quantiles_approx(spark, SF_DIR).collect()}
    targets = (0.25, 0.5, 0.9, 0.99)
    for src, qs in approx.items():
        v = vals[src]
        n = len(v)
        for target, a in zip(targets, qs):
            lo = bisect.bisect_left(v, a) / n
            hi = bisect.bisect_right(v, a) / n
            assert lo - 0.03 <= target <= hi + 0.03, (src, target, a, lo, hi)
