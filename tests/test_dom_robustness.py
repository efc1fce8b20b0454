"""Robustness: the tree builder / DOM scorer / PDF parser must never
throw on adversarial input — at 10^12 turns every weird byte sequence
WILL occur.  Invariants: no exception, well-formed tree (parent links
consistent, no cycles), serializer total, dom_extract returns the
contract keys."""

from hypothesis import HealthCheck, given, settings, strategies as st

from html_parser_spark.functions.domextract import dom_extract
from html_parser_spark.functions.pdftext import extract_pdf_text
from html_parser_spark.functions.treebuilder import (
    Element,
    parse_html,
    serialize_tree,
)

_atoms = st.sampled_from(
    list("<>&;/-!=\"' \t\n\x00abpXé💡")
    + [
        "<p>", "</p>", "<b>", "</b>", "<i>", "</i>", "<a href=x>", "</a>",
        "<div class=nav>", "</div>", "<table>", "<tr>", "<td>", "</td>",
        "</tr>", "</table>", "<li>", "<ul>", "</ul>", "<h1>", "</h2>",
        "<br>", "<img/>", "<head>", "<title>", "</title>", "</head>",
        "<body>", "</body>", "<html>", "</html>", "<script>", "</script>",
        "<!--", "-->", "<!DOCTYPE html>", "<marquee>", "</marquee>",
        "<applet>", "</object>", "<caption>", "</caption>",
    ]
)
soup = st.lists(_atoms, min_size=0, max_size=40).map("".join)


def _check_tree(node: Element, seen: set) -> None:
    assert id(node) not in seen, "cycle in DOM"
    seen.add(id(node))
    for ch in node.children:
        if isinstance(ch, Element):
            assert ch.parent is node
            _check_tree(ch, seen)


@given(soup)
@settings(
    max_examples=600,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_tree_builder_total_and_well_formed(s):
    doc, status, _err = parse_html(s)
    _check_tree(doc, set())
    serialize_tree(doc)  # total


@given(soup)
@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_dom_extract_total(s):
    r = dom_extract(s)
    assert set(r) == {
        "main_text",
        "spans",
        "err_count",
        "parse_status",
        "n_blocks",
        "n_kept_blocks",
    }
    assert r["n_kept_blocks"] <= r["n_blocks"]
    # spans are in-bounds, ordered source ranges of the raw input
    for start, end in r["spans"]:
        assert 0 <= start <= end <= len(s)
    if not r["main_text"]:
        assert r["spans"] == []


@given(st.binary(min_size=0, max_size=400))
@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_pdf_parser_total_on_garbage(b):
    r = extract_pdf_text(b"%PDF-1.4\n" + b)
    assert "status" in r and isinstance(r["pages"], list)
