"""Cross-engine whitespace contract: the shared class (textnorm.py) must
tokenize identically in Python, DuckDB SQL twins, and (by construction)
Java \\s — including \\x0b and NBSP, where the three engines' defaults
all disagree (reviewer-found)."""

import duckdb

from html_parser_spark.functions.pdftext import extract_pdf_text
from html_parser_spark.functions.textnorm import ascii_words
from html_parser_spark.operators.dedup import simhash64, simhash_sketches_sql
from html_parser_spark.operators.pdfops import doc_to_pdf, pdf_page_text_sql

NASTY = [
    "\x0bvertical\x0btab\x0b",
    "nbsp stays joined",
    "\nlead", "trail\r\n", "", "a\tb\fc", " mixed \x0b  soup ",
]


def _con():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(NASTY):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    return con


def test_ascii_words_contract():
    assert ascii_words("\x0ba\x0bb") == ["a", "b"]  # Java \\s includes VT
    assert ascii_words("x y") == ["x y"]  # NBSP is NOT whitespace
    assert ascii_words("  ") == [] == ascii_words(None)


def test_simhash_oracle_parity_on_nasty_whitespace():
    rows = dict(_con().execute(simhash_sketches_sql()).fetchall())
    for i, t in enumerate(NASTY):
        want = format(simhash64(ascii_words(t.lower())), "016x")
        assert rows[i] == want, (i, repr(t))


def test_pdf_oracle_parity_on_nasty_whitespace():
    got = sorted(_con().execute(pdf_page_text_sql()).fetchall())
    exp = []
    for i, t in enumerate(NASTY):
        r = extract_pdf_text(doc_to_pdf(t, compress=bool(i % 2 == 0)))
        if not r["pages"]:
            exp.append((i, 0, "", 0, 0, r["status"]))
        else:
            for idx, pg in enumerate(r["pages"]):
                exp.append(
                    (i, idx, "\n".join(pg["lines"]), len(pg["lines"]),
                     len(pg["blocks"]), r["status"])
                )
    assert got == sorted(exp)
