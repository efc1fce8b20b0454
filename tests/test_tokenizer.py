"""Tokenizer unit tests: reference unit tests verbatim, probe-case goldens,
and quirk-ledger assertions (no Spark)."""

from html_parser_spark.functions.tokenizer import tokenize
from html_parser_spark.functions.entities import ENTITIES


def as_golden(tokens):
    out = []
    for t in tokens:
        k = t[0]
        if k == "chars":
            out.append(["chars", t[1]])
        elif k in ("start", "end"):
            out.append([k, t[1], [list(a) for a in t[2]], t[3]])
        elif k == "comment":
            out.append(["comment", t[1]])
        elif k == "doctype":
            out.append(["doctype", t[1], t[2], t[3], t[4]])
        else:
            out.append(["eof"])
    return out


def test_reference_unit_test_comment():
    # reference: mod.rs:3831-3837
    toks, status, _ = tokenize("<!--Hello World-->")
    assert status == "ok"
    assert as_golden(toks) == [["comment", "Hello World"], ["eof"]]


def test_reference_unit_test_basic_html():
    # reference: mod.rs:3839-3873 (27 tokens; Char runs coalesced here)
    toks, status, _ = tokenize(
        "<!DOCTYPE html><html><head><title>Test</title></head>"
        "<body><h1>Hello World</h1></body></html>"
    )
    assert status == "ok"
    assert as_golden(toks) == [
        ["doctype", "html", None, None, False],
        ["start", "html", [], False],
        ["start", "head", [], False],
        ["start", "title", [], False],
        ["chars", "Test"],
        ["end", "title", [], False],
        ["end", "head", [], False],
        ["start", "body", [], False],
        ["start", "h1", [], False],
        ["chars", "Hello World"],
        ["end", "h1", [], False],
        ["end", "body", [], False],
        ["end", "html", [], False],
        ["eof"],
    ]


def test_probe_cases(probe_cases):
    """Every curated case must match the reference binary's observed output."""
    for case in probe_cases:
        toks, status, _ = tokenize(case["text"])
        if case["status"] == "hang":
            assert status == "hang_in_reference", case["text"]
        elif case["status"] == "panic":
            assert status == "panic_in_reference", case["text"]
        else:
            assert status == "ok", (case["text"], status)
            assert as_golden(toks) == case["tokens"], case["text"]


def test_golden_corpus_tokens(golden_sf0001):
    """Token-stream equality vs the reference on all 1,000 sf0.001 turns."""
    from html_parser_spark.fixtures import gen_rows

    texts = {(r["conv_id"], r["turn_idx"]): r["text"] for r in gen_rows(0.001)}
    assert len(texts) == len(golden_sf0001)
    for g in golden_sf0001:
        text = texts[(g["conv_id"], g["turn_idx"])]
        toks, status, _ = tokenize(text)
        assert status == "ok"
        assert as_golden(toks) == g["tokens"], (g["conv_id"], g["turn_idx"])


def test_entity_table_size():
    assert len(ENTITIES) == 2221
    # spot-check the 10 deliberate omissions and key quirks
    assert "&nbsp" not in ENTITIES and "&nbsp;" in ENTITIES
    assert "&lt" not in ENTITIES and "&lt;" in ENTITIES
    assert ENTITIES["&AMP"] == "&"


def test_stack_poisoning_quirk():
    toks, _, err = tokenize("<body><br></body>")
    assert as_golden(toks) == [
        ["start", "body", [], False],
        ["start", "br", [], False],
        ["eof"],
    ]
    assert err == 1  # dropped </body>


def test_spans_within_bounds(golden_sf0001):
    from html_parser_spark.fixtures import gen_rows

    for r in list(gen_rows(0.001))[:200]:
        toks, _, _ = tokenize(r["text"])
        n = len(r["text"])
        for t in toks:
            if t[0] == "chars":
                assert 0 <= t[2] <= t[3] <= n, (r["conv_id"], r["turn_idx"], t[2:])


def test_abrupt_comment_close_not_swallowed_by_fast_path():
    """"<!-->" is an abrupt close (empty comment, reprocess the rest) —
    the bulk comment regex must not swallow it (round-2 fuzz find:
    ref emitted comment "" + chars "x-->"; the fast path said ">x")."""
    from html_parser_spark.functions.tokenizer import tokenize

    toks, status, _ = tokenize("<!-->x-->")
    assert status == "ok"
    assert toks[0] == ("comment", "")
    assert toks[1][:2] == ("chars", "x-->")

    toks2, _, _ = tokenize("q<!-->x-->z")
    assert [t[:2] for t in toks2[:3]] == [
        ("chars", "q"),
        ("comment", ""),
        ("chars", "x-->z"),
    ]
