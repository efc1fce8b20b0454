"""SimHash family: UDF vs pure-Python oracle, pigeonhole pair recall."""

import pytest
from pyspark.sql import functions as F

from html_parser_spark.functions.textnorm import ascii_words
from html_parser_spark.operators.dedup import (
    simhash64,
    simhash_near_dups,
    simhash_sketches,
)

SF_DIR = "/root/testdata/sf0.001"


def test_udf_matches_python_oracle(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    got = {r.doc_id: r.simhash for r in simhash_sketches(spark, SF_DIR).collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        want = format(
            simhash64(ascii_words((text or "").lower())), "016x"
        )
        assert got[doc_id] == want, doc_id


def test_near_dup_pairs_match_bruteforce(spark):
    """The bucketed join must find EXACTLY the brute-force ≤3-bit pairs
    (pigeonhole guarantees recall; distinct guarantees no dups)."""
    sk = {r.doc_id: int(r.simhash, 16) for r in simhash_sketches(spark, SF_DIR).collect()}
    ids = sorted(sk)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(sk[a] ^ sk[b]).count("1") <= 3:
                want.add((a, b))
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dups(spark, SF_DIR).collect()
    }
    assert set(got) == want
    for (a, b), h in got.items():
        assert bin(sk[a] ^ sk[b]).count("1") == h


def _planted_corpus(tmp_path):
    """Identical-sketch groups + one-word variants (small hamming) +
    unrelated texts — exercises the star, rep-edge, and singleton arms."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = {
        1: base * 3,
        2: base * 3,          # identical to 1
        3: base * 3,          # identical to 1 (group of 3 → star)
        4: (base * 3).replace("lazy", "sleepy"),   # near variant
        5: "completely unrelated text about spark catalyst planning",
        6: "another distinct document mentioning parquet and arrow",
        7: "third loner with its own vocabulary entirely separate",
    }
    pq.write_table(
        pa.table(
            {"doc_id": list(rows), "text": [rows[k] for k in rows]}
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def _components(ids, edges):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return frozenset(
        frozenset(i for i in ids if find(i) == r)
        for r in {find(i) for i in ids}
    )


def test_component_edges_equal_full_pair_components(spark, tmp_path):
    """simhash_component_edges (stars + rep edges over distinct sketch
    values) must yield EXACTLY the components of the full pair set, with
    no more edges than pairs."""
    from html_parser_spark.operators.dedup import simhash_component_edges

    sf = _planted_corpus(tmp_path)
    ids = [r.doc_id for r in simhash_sketches(spark, sf).select("doc_id").collect()]
    pairs = [
        (r.doc_a, r.doc_b) for r in simhash_near_dups(spark, sf).collect()
    ]
    edges = [
        (r.doc_a, r.doc_b)
        for r in simhash_component_edges(spark, sf).collect()
    ]
    assert pairs, "planted corpus must produce near-dup pairs"
    assert _components(ids, edges) == _components(ids, pairs)
    assert len(edges) <= len(pairs)
    # the identical group {1,2,3} must be one component either way
    comp = {frozenset(c) for c in _components(ids, edges) if 1 in c}
    assert {1, 2, 3} <= set(next(iter(comp)))


def test_near_dups_invariant_in_n_blocks(spark, tmp_path):
    """The generalized pigeonhole is recall-lossless at any geometry: the
    exact hamming filter makes the output invariant in n_blocks."""
    sf = _planted_corpus(tmp_path)
    for m in (4, 6, 8):
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in simhash_near_dups(spark, sf, n_blocks=m).collect()
        }
        if m == 4:
            want = got
        else:
            assert got == want, m


def test_pigeonhole_recall_property():
    """The generalized pigeonhole NEVER misses: for ANY pair of 64-bit
    sketches within max_hamming bits, at least one (combo, packed-block)
    bucket key is shared, at every block geometry.  Pure-Python twin of
    the _pigeonhole_keys block/shift layout (xxhash64 over equal inputs
    is equal, so tuple equality here implies key equality there)."""
    import random
    from itertools import combinations

    def keys(v, n_blocks, max_hamming):
        agree = n_blocks - max_hamming
        base, rem = divmod(64, n_blocks)
        widths = [base + (1 if i < rem else 0) for i in range(n_blocks)]
        shifts = [sum(widths[:i]) for i in range(n_blocks)]
        blocks = [(v >> shifts[i]) & ((1 << widths[i]) - 1) for i in range(n_blocks)]
        out = set()
        for ci, combo in enumerate(combinations(range(n_blocks), agree)):
            packed = 0
            for i in combo:
                packed = (packed << widths[i]) | blocks[i]
            out.add((ci, packed))
        return out

    rng = random.Random(20260818)
    for _ in range(500):
        a = rng.getrandbits(64)
        h = rng.randint(0, 3)
        flip = rng.sample(range(64), h)
        b = a
        for bit in flip:
            b ^= 1 << bit
        for m in (4, 5, 6, 8):
            assert keys(a, m, 3) & keys(b, m, 3), (hex(a), flip, m)


def test_numpy_simhash_twin_equals_reference_loop():
    """The vectorized vote/threshold must equal the pure-Python
    definition bit-for-bit (it feeds the oracled sketches)."""
    import random

    from html_parser_spark.operators.dedup import _simhash64_np, simhash64

    rng = random.Random(20260817)
    for _ in range(200):
        words = ["w%d" % rng.randrange(400) for _ in range(rng.randrange(0, 200))]
        assert simhash64(words) == _simhash64_np(words)
    assert _simhash64_np([]) == 0 == simhash64([])


def test_sketch_lp_hoisted_equals_per_round_control(spark):
    """The round-5 hoisted-keys LP and the round-4 per-round-keys
    control (`per_round_keys=True`) must produce the identical
    component labeling — the A/B lever is pure physical shape."""
    from pyspark.sql import functions as F

    from html_parser_spark.operators.dedup import _sketch_components

    # a chain of close sketches (bit flips) plus isolated values
    base = 0x0123456789ABCDEF
    vals = [base, base ^ 1, base ^ 3, base ^ (1 << 40)]
    vals += [0x1111111111111111, 0x7EDCBA9876543210]
    nodes = spark.createDataFrame(
        [(v,) for v in vals], "sh64 long"
    ).select(F.col("sh64"))
    a = {
        (r.sh64, r.comp)
        for r in _sketch_components(nodes, 3, 6, 25, per_round_keys=False).collect()
    }
    b = {
        (r.sh64, r.comp)
        for r in _sketch_components(nodes, 3, 6, 25, per_round_keys=True).collect()
    }
    assert a == b
    # the 4-element chain collapses to one component
    comp_of = dict(a)
    assert len({comp_of[v] for v in vals[:4]}) == 1
