"""Cluster resolution (connected components) + MinHash geometry params.

The corpus-level truth for ``dedup_cluster_keep_list`` lives in the
entry-contract mirror (recursive-CTE DuckDB twin); these tests pin the
component solver on crafted graphs where the expected partition is known
by hand, and prove the parameterized MinHash geometry (VERDICT r02
item 4) actually varies with its arguments.
"""

import pytest

from html_parser_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"


def _cc(spark, doc_ids, pairs):
    docs = spark.createDataFrame([(d,) for d in doc_ids], "doc_id long")
    edges = spark.createDataFrame(
        pairs or [(-1, -2)], "doc_a long, doc_b long"
    )
    if not pairs:
        edges = edges.filter("doc_a > 0")
    rows = dedup.connected_components(docs, edges).collect()
    return {r.doc_id: (r.cluster_id, r.is_keeper) for r in rows}


def test_chain_triangle_singleton(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple rounds), triangle
    # 10-11-12, singleton 99
    got = _cc(spark, [1, 2, 3, 4, 10, 11, 12, 99],
              [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)])
    assert got == {
        1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (1, 0),
        10: (10, 1), 11: (10, 0), 12: (10, 0),
        99: (99, 1),
    }


def test_no_edges_all_keepers(spark):
    got = _cc(spark, [5, 6, 7], [])
    assert got == {5: (5, 1), 6: (6, 1), 7: (7, 1)}


def test_bridge_merges_components(spark):
    # two triangles joined by one edge → ONE component (the failure mode
    # the verified-edges policy guards against, shown explicitly)
    got = _cc(spark, [1, 2, 3, 7, 8, 9],
              [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9), (3, 7)])
    assert {v[0] for v in got.values()} == {1}
    assert sum(v[1] for v in got.values()) == 1


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError):
        _cc_long = dedup.connected_components(
            spark.createDataFrame([(i,) for i in range(6)], "doc_id long"),
            spark.createDataFrame(
                [(i, i + 1) for i in range(5)], "doc_a long, doc_b long"
            ),
            max_iter=2,  # label needs 5 hops down the chain
        ).collect()


def test_minhash_geometry_is_parameterized(spark):
    sig_default = dedup.minhash_signatures(spark, SF_DIR)  # 128 hashes
    assert len(sig_default.columns) == 1 + dedup.N_HASHES == 129
    sig_gate = dedup.minhash_signatures(
        spark, SF_DIR, n_hashes=dedup.GATE_N_HASHES
    )
    assert len(sig_gate.columns) == 1 + 8
    keys = dedup.minhash_band_keys(sig_default)  # 16 bands
    bands = {r.band for r in keys.select("band").distinct().collect()}
    assert bands == set(range(dedup.N_BANDS)) and len(bands) == 16


def test_default_geometry_finds_planted_dup(spark, tmp_path):
    """The 128/16 corpus-scale geometry end to end on a planted corpus:
    an exact duplicate has identical signatures at ANY geometry, so the
    banded self-join must surface exactly that pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dup = "the same long document text appears twice in this corpus " * 3
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [dup, dup, "a completely different short text"],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    cand = dedup.minhash_candidates(spark, str(tmp_path)).collect()
    assert [(r.doc_a, r.doc_b) for r in cand] == [(1, 2)]
