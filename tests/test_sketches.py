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


def test_approx_quantiles_close_to_exact(spark):
    from html_parser_spark.operators.textstats import (
        length_quantiles,
        length_quantiles_approx,
    )

    exact = {r.source: (r.p25, r.p50, r.p90, r.p99)
             for r in length_quantiles(spark, SF_DIR).collect()}
    approx = {r.source: (r.p25, r.p50, r.p90, r.p99)
              for r in length_quantiles_approx(spark, SF_DIR).collect()}
    # approx_percentile returns actual data values (rank-error bound, no
    # interpolation) — with ~50 docs/source the tail quantiles can sit a
    # few percent from the interpolated exact value
    for src, ex in exact.items():
        for a, e in zip(approx[src], ex):
            assert abs(a - e) <= max(20, 0.05 * e), (src, a, e)
