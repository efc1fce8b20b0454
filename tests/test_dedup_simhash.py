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
