"""Link harvesting: crafted token-stream semantics + Spark parity.

Corpus-level value truth lives in the entry-contract mirror
(`extract_links` vs committed engine goldens); these tests pin the link
policy on inputs where the expected output is known by hand.
"""

from html_parser_spark.functions.links import extract_links


def _pairs(text):
    return [(r["href"], r["anchor_text"]) for r in extract_links(text)]


def test_basic_link_and_order():
    assert _pairs('<a href="/x">one</a> mid <a href="/y">two</a>') == [
        ("/x", "one"),
        ("/y", "two"),
    ]
    idxs = [r["link_idx"] for r in extract_links('<a href=a>1</a><a href=b>2</a>')]
    assert idxs == [0, 1]


def test_entity_decoded_href_and_anchor():
    # &amp; in query strings resolves through the tokenizer's CHAR_REF
    # machinery; anchor text entities decode too
    assert _pairs('<a href="/q?a=1&amp;b=2">x &lt; y</a>') == [
        ("/q?a=1&b=2", "x < y")
    ]


def test_new_anchor_implies_close():
    # WHATWG in-body <a> rule, tokenizer-level: the second <a> closes the
    # first; text after it belongs to the second link
    assert _pairs('<a href=1>first <a href=2>second</a>') == [
        ("1", "first "),
        ("2", "second"),
    ]


def test_anchor_without_href():
    # no link opened, but an open link still implies-closed
    assert _pairs("<a>plain</a>") == []
    assert _pairs("<a href=1>one<a>two</a>") == [("1", "one")]


def test_self_closing_and_eof():
    assert _pairs('<a href="/s"/>tail') == [("/s", "")]
    # EOF closes an open link with accumulated text
    assert _pairs('<a href=e>unclosed at eof') == [("e", "unclosed at eof")]


def test_nested_markup_inside_anchor():
    # inline tags inside the anchor don't break text accumulation
    assert _pairs('<a href=n>bold <b>mid</b> end</a>') == [("n", "bold mid end")]


def test_first_href_wins():
    [(href, _)] = _pairs('<a href=first href=second>t</a>')
    assert href == "first"


def test_spans_cover_anchor_text_runs():
    text = 'pre <a href="/x">anchor text</a> post'
    [r] = extract_links(text)
    assert text[r["src_start"]:r["src_end"]] == "anchor text"
    # empty anchors carry the -1 sentinel
    [e] = extract_links('<a href=y></a>')
    assert (e["src_start"], e["src_end"]) == (-1, -1)


def test_spark_matches_pure_python(spark):
    rows = [
        ("c0", 0, 'x <a href="/a?p=1&amp;q=2">link &amp; co</a> y <a href=b>z</a>'),
        ("c0", 1, "no links here"),
        ("c1", 0, '<a href=only>open till eof'),
        ("c1", 1, None),
    ]
    from html_parser_spark.operators.linkops import run_link_extraction

    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = sorted(
        map(tuple, run_link_extraction(df, num_partitions=4).collect())
    )
    want = sorted(
        (cid, tid, r["link_idx"], r["href"], r["anchor_text"],
         r["src_start"], r["src_end"])
        for cid, tid, text in rows
        if text is not None
        for r in extract_links(text)
    )
    assert got == want


def test_links_robustness_fuzz():
    """Adversarial garbage in → no crash, invariants out (same pattern
    as the tree/DOM/PDF robustness fuzz): hrefs non-null, link_idx
    contiguous from 0, spans either the (-1, -1) empty sentinel or a
    valid in-bounds range."""
    import random

    atoms = [
        "<a", "<a>", "</a>", "<a href=", "<a href='", '<a href="',
        "href=x", "/>", ">", "<", "&amp;", "&#x41;", "&", "a", " ",
        "<b>", "</b>", "<!--", "-->", "<a href=a href=b>", "\x00",
        "<A HREF=U>", "</A>", "é", '"', "'", "=", "<a/>", "<a >",
    ]
    rng = random.Random(20260817)
    for _ in range(400):
        text = "".join(rng.choice(atoms) for _ in range(rng.randint(0, 25)))
        links = extract_links(text)
        for i, r in enumerate(links):
            assert r["link_idx"] == i
            assert r["href"] is not None
            s, e = r["src_start"], r["src_end"]
            if (s, e) != (-1, -1):
                assert 0 <= s <= e <= len(text), (text, r)


def test_fused_extraction_links_matches_separate(spark):
    """run_extraction_with_links must reproduce both separate operators
    exactly — same extraction columns, same exploded link rows."""
    from pyspark.sql import functions as F

    from html_parser_spark.fixtures import ensure_transcripts
    from html_parser_spark.operators.linkops import run_link_extraction
    from html_parser_spark.operators.pipeline import (
        run_extraction,
        run_extraction_with_links,
    )

    df = spark.read.parquet(ensure_transcripts(0.001))
    fused = run_extraction_with_links(df, num_partitions=8)
    ext_cols = [c for c in fused.columns if c != "links"]

    got_ext = sorted(map(str, fused.select(*ext_cols).collect()))
    want_ext = sorted(map(str, run_extraction(df, num_partitions=8).collect()))
    assert got_ext == want_ext

    got_links = sorted(
        map(
            tuple,
            fused.select(
                "conv_id", "turn_idx", F.explode("links").alias("lk")
            ).select("conv_id", "turn_idx", "lk.*").collect(),
        )
    )
    want_links = sorted(
        map(tuple, run_link_extraction(df, num_partitions=8).collect())
    )
    assert got_links == want_links


def test_full_fused_extraction_matches_all_three(spark):
    """run_extraction_full must reproduce the token policy, the DOM
    policy, AND the link harvest exactly from its single tokenize."""
    from pyspark.sql import functions as F

    from html_parser_spark.fixtures import ensure_transcripts
    from html_parser_spark.operators.linkops import run_link_extraction
    from html_parser_spark.operators.pipeline import (
        run_dom_extraction,
        run_extraction,
        run_extraction_full,
    )

    df = spark.read.parquet(ensure_transcripts(0.001))
    fused = run_extraction_full(df, num_partitions=8)

    ext_cols = ["conv_id", "turn_idx", "main_text", "spans", "err_count",
                "parse_status", "n_tokens", "n_blocks", "n_kept_blocks"]
    got_ext = sorted(map(str, fused.select(*ext_cols).collect()))
    want_ext = sorted(map(str, run_extraction(df, num_partitions=8).collect()))
    assert got_ext == want_ext

    dom = run_dom_extraction(df, num_partitions=8)
    got_dom = sorted(
        map(
            str,
            fused.select(
                "conv_id",
                "turn_idx",
                F.col("dom_main_text").alias("main_text"),
                F.col("dom_spans").alias("spans"),
                "err_count",
                "parse_status",
                F.col("dom_n_blocks").alias("n_blocks"),
                F.col("dom_n_kept_blocks").alias("n_kept_blocks"),
            ).collect(),
        )
    )
    want_dom = sorted(map(str, dom.collect()))
    assert got_dom == want_dom

    got_links = sorted(
        map(
            tuple,
            fused.select(
                "conv_id", "turn_idx", F.explode("links").alias("lk")
            ).select("conv_id", "turn_idx", "lk.*").collect(),
        )
    )
    want_links = sorted(
        map(tuple, run_link_extraction(df, num_partitions=8).collect())
    )
    assert got_links == want_links
