"""PNG decode: pure-stdlib encoder/decoder round trip + failure routing.

The gate query (``multimodal_metadata``) value-oracles the decode against
the generator's stored ground truth; these tests pin the decoder's spec
behavior directly — all five filter inverses, both color types, and the
honest rejection of profiles the decoder does not implement.
"""

import random

import pytest

from html_parser_spark.fixtures import encode_png, ensure_png_blobs
from html_parser_spark.operators.multimodal import decode_png


def test_round_trip_all_filters_and_color_types():
    rng = random.Random(99)
    for _ in range(40):
        w, h = rng.randint(1, 64), rng.randint(1, 64)
        ch = rng.choice([1, 3])
        raw = bytes(rng.randrange(256) for _ in range(w * h * ch))
        got = decode_png(encode_png(raw, w, h, ch))
        assert got == (w, h, ch, raw)


def test_single_row_image_exercises_each_filter_type():
    # encode_png cycles filters by row index; a 5-row image uses 0..4
    rng = random.Random(7)
    raw = bytes(rng.randrange(256) for _ in range(5 * 8 * 3))
    w, h, ch, out = decode_png(encode_png(raw, 8, 5, 3))
    assert (w, h, ch) == (8, 5, 3) and out == raw


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png at all")


def test_unsupported_profile_rejected():
    import struct
    import zlib

    # hand-build a 16-bit-depth IHDR: decoder must refuse, not garble
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_fixture_ground_truth_matches_decoder():
    """Every blob in the committed-fixture table decodes to the stored
    expectations (single-process truth; the Spark gate re-checks the
    same via the DuckDB oracle)."""
    import hashlib

    import pyarrow.parquet as pq

    t = pq.read_table(ensure_png_blobs(0.001))
    rows = t.to_pylist()
    assert len(rows) >= 64
    for r in rows[:128]:
        w, h, ch, raw = decode_png(r["payload"])
        assert (w, h, ch) == (r["exp_width"], r["exp_height"], r["exp_channels"])
        assert hashlib.md5(raw).hexdigest() == r["exp_pixel_md5"]
