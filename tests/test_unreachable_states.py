"""RCDATA / RAWTEXT / script-data / PLAINTEXT family tests.

These 27 states are unreachable from Data in the reference (no
tree-builder feedback — SURVEY.md §2.4; ✓probe: ``<script>1 < 2</script>``
tokenizes as ordinary markup).  Since probe protocol v2 the content entry
states (RCDATA/RAWTEXT/ScriptData/PLAINTEXT/CDATASection) ARE binary
differential-tested (test_differential_hypothesis.py::
test_content_states_match_reference); the expectations below pin the
WHATWG spec arms the reference transcribed, including its deviation: the
"appropriate end tag" check compares against ``open_tags[-1]``, which is
empty when entering via ``initial_state`` — so end tags in these
families always take the anything-else (re-emit as text) path here.
"""

import pytest

from html_parser_spark.functions.tokenizer import (
    DATA,
    PLAINTEXT,
    RAWTEXT,
    RCDATA,
    SCRIPT_DATA,
    tokenize,
)


def chars_of(tokens):
    return "".join(t[1] for t in tokens if t[0] == "chars")


def kinds(tokens):
    return [t[0] for t in tokens]


def test_plaintext_identity():
    text = "a <p>b</p> & c <!-- d -->"
    toks, status, err = tokenize(text, PLAINTEXT)
    assert status == "ok" and err == 0
    assert set(kinds(toks)) == {"chars", "eof"}
    assert chars_of(toks) == text


def test_plaintext_nul_replaced():
    toks, _, _ = tokenize("a\x00b", PLAINTEXT)
    assert chars_of(toks) == "a�b"  # vs as-is in DATA (probe ledger)
    toks_data, _, _ = tokenize("a\x00b", DATA)
    assert chars_of(toks_data) == "a\x00b"


def test_rawtext_tags_are_text():
    text = "p { color: red } </style>done"
    toks, _, _ = tokenize(text, RAWTEXT)
    assert set(kinds(toks)) == {"chars", "eof"}
    assert chars_of(toks) == text  # empty stack → never appropriate


def test_rcdata_decodes_entities_but_not_tags():
    toks, _, _ = tokenize("a &amp; b </title>x", RCDATA)
    assert set(kinds(toks)) == {"chars", "eof"}
    assert chars_of(toks) == "a & b </title>x"


def test_script_data_comment_like_escape_roundtrip():
    text = "a<!--b--c-->d"
    toks, _, _ = tokenize(text, SCRIPT_DATA)
    assert set(kinds(toks)) == {"chars", "eof"}
    assert chars_of(toks) == text


def test_script_data_double_escape_roundtrip():
    text = "x<!--<script>if (a<b) { c(); }</script>-->y"
    toks, _, _ = tokenize(text, SCRIPT_DATA)
    assert set(kinds(toks)) == {"chars", "eof"}
    # reference deviation from spec (mod.rs:3176-3181, 3373-3378): when
    # the temp buffer equals "script", the double-escape transition arm
    # switches state WITHOUT emitting the terminator char — the '>' after
    # each "script" is swallowed (spec would emit it)
    assert chars_of(toks) == "x<!--<scriptif (a<b) { c(); }</script-->y"


@pytest.mark.parametrize("st", [RCDATA, RAWTEXT, SCRIPT_DATA])
@pytest.mark.parametrize("tail", ["<", "</", "</ti", "</ti "])
def test_eof_mid_end_tag_reemits_and_terminates(st, tail):
    toks, status, _ = tokenize("x" + tail, st)
    assert toks[-1] == ("eof",)
    if tail == "</ti" and st in (RAWTEXT, SCRIPT_DATA):
        # probe-v2 differential discovery: the reference's rawtext/script
        # end-tag-name arms have NO EOF branch (unlike the rcdata and
        # script-escaped twins) and hang forever — quirks #4 and #5
        assert status == "hang_in_reference"
        assert chars_of(toks) == "x"
    else:
        assert status == "ok"
        assert chars_of(toks) == "x" + tail


def test_script_escaped_eof_terminates():
    toks, status, _ = tokenize("a<!--b", SCRIPT_DATA)
    assert toks[-1] == ("eof",)
    assert chars_of(toks) == "a<!--b"


def test_content_entry_states_terminate():
    """The entry states a WHATWG tree builder would ever select (Data,
    RCDATA, RAWTEXT, ScriptData, PLAINTEXT, CDATA).  Mid-automaton states
    assume live registers (e.g. the temp buffer) — entering them cold
    would panic the reference too (Rust ``Option::unwrap`` on None)."""
    from html_parser_spark.functions.tokenizer import CDATA_SECTION

    for st in (DATA, RCDATA, RAWTEXT, SCRIPT_DATA, PLAINTEXT, CDATA_SECTION):
        for text in ("ab<c>&amp;", "", "<", "</x", "a<!--b", "\x00"):
            toks, _, _ = tokenize(text, st)
            assert toks, (st, text)
            assert toks[-1] == ("eof",), (st, text)


def test_default_topology_unchanged():
    """<script> bodies still tokenize as ordinary Data-state markup from
    the default entry point (the reference's observed behavior)."""
    toks, _, _ = tokenize("<script>1 < 2</script>")
    assert ("start", "script", [], False) in toks
    assert ("end", "script", [], False) in toks
