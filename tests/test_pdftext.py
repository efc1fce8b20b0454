"""PDF text/layout extraction — writer↔parser round trip + edge cases."""

import zlib

from html_parser_spark.functions.pdftext import (
    build_pdf,
    extract_pdf_text,
)

PAGES = [
    [
        (72, 720, "Hello (world) \\ with specials"),
        (72, 706, "second line é \U0001f4a1"),
        (72, 650, "new paragraph after a large gap"),
    ],
    [(72, 720, "page two line 1"), (72, 706, "page two line 2")],
]


def test_round_trip_uncompressed_and_flate():
    for compress in (False, True):
        r = extract_pdf_text(build_pdf(PAGES, compress=compress))
        assert r["status"] == "ok"
        assert len(r["pages"]) == 2
        assert r["pages"][0]["lines"] == [t for _x, _y, t in PAGES[0]]
        assert r["pages"][1]["lines"] == [t for _x, _y, t in PAGES[1]]


def test_layout_blocks_split_on_large_gap():
    r = extract_pdf_text(build_pdf(PAGES))
    blocks = r["pages"][0]["blocks"]
    assert len(blocks) == 2  # 14pt leading, 56pt gap → paragraph break
    assert blocks[0] == [PAGES[0][0][2], PAGES[0][1][2]]
    assert blocks[1] == [PAGES[0][2][2]]


def test_line_order_is_top_down_and_x_sorted():
    # runs emitted out of order must sort by -y then x
    pages = [[(300, 700, "right"), (72, 714, "top"), (72, 700, "left ")]]
    r = extract_pdf_text(build_pdf(pages))
    assert r["pages"][0]["lines"] == ["top", "left right"]


def test_control_bytes_round_trip():
    pages = [[(72, 720, "a\x00b\tc and () parens \\ backslash")]]
    r = extract_pdf_text(build_pdf(pages))
    assert r["pages"][0]["lines"] == ["a\x00b\tc and () parens \\ backslash"]


def test_not_pdf_and_empty_page():
    assert extract_pdf_text(b"plain text")["status"] == "not_pdf"
    r = extract_pdf_text(build_pdf([[]]))
    assert r["status"] == "ok"
    assert r["pages"][0]["lines"] == []
    assert r["pages"][0]["blocks"] == []


def test_unsupported_filter_reported():
    pdf = build_pdf([[(72, 720, "x")]])
    assert b"/Filter" not in pdf
    bad = pdf.replace(b"/Length", b"/Filter /DCTDecode /Length")
    r = extract_pdf_text(bad)
    assert r["status"] in ("unsupported_filter", "no_pages")


def test_tj_array_and_tstar_operators():
    # hand-written content exercising TJ arrays, TD/T*, ' (quote) shows
    content = (
        b"BT /F0 12 Tf 14 TL 1 0 0 1 72 720 Tm"
        b" [(Hel) -20 (lo) ] TJ"
        b" 0 -14 TD (second) Tj"
        b" T* (third) Tj"
        b" (fourth) '"
        b" ET"
    )
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"2 0 obj\n<< /Type /Catalog /Pages 1 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 1 0 R /Contents 4 0 R >>\nendobj\n"
        b"%%EOF\n"
    )
    r = extract_pdf_text(pdf)
    assert r["status"] == "ok"
    assert r["pages"][0]["lines"] == ["Hello", "second", "third", "fourth"]


def test_multi_content_stream_page():
    c1 = b"BT 1 0 0 1 72 720 Tm (part one) Tj ET"
    c2 = b"BT 1 0 0 1 72 706 Tm (part two) Tj ET"
    z2 = zlib.compress(c2)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n"
        b"5 0 obj\n<< /Type /Catalog /Pages 1 0 R >>\nendobj\n"
        b"3 0 obj\n<< /Length " + str(len(c1)).encode() + b" >>\n"
        b"stream\n" + c1 + b"\nendstream\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(z2)).encode()
        + b" /Filter /FlateDecode >>\n"
        b"stream\n" + z2 + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Type /Page /Parent 1 0 R /Contents [3 0 R 4 0 R] >>\n"
        b"endobj\n%%EOF\n"
    )
    r = extract_pdf_text(pdf)
    assert r["status"] == "ok"
    assert r["pages"][0]["lines"] == ["part one", "part two"]
