"""PDF text extraction (operators/pdf.py) — fixture round-trips across
all three string forms, escape sequences, compression on/off, page
counting, rejection edges, and the Spark operator."""

from __future__ import annotations

import zlib

import pytest

from rq_spark.operators import pdf as P


@pytest.mark.parametrize("compress", [True, False])
def test_pdf_roundtrip(compress):
    pages = [[b"Hello ", b"middle ", b"world."], [b"Second page."]]
    data = P.build_pdf_bytes(pages, compress=compress)
    assert P.is_pdf(data)
    assert P.page_count(data) == 2
    assert P.extract_text(data) == "Hello middle world.\nSecond page."


def test_pdf_escapes_and_special_chars():
    tricky = b"parens (nested (deep)) and \\ backslash ) end"
    data = P.build_pdf_bytes([[tricky]])
    assert P.extract_text(data).encode("latin-1") == tricky


def test_pdf_octal_and_line_continuation():
    # hand-written content stream with octal escape and continuation
    content = b"BT (A\\101\\n line\\\ncont) Tj ET"
    comp = zlib.compress(content)
    raw = (
        b"%PDF-1.7\n1 0 obj\n<< /Type /Page >>\nendobj\n2 0 obj\n"
        + b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
        + comp
        + b"\nendstream\nendobj\n"
    )
    assert P.extract_text(raw) == "AA\n line\ncont".replace("\ncont", "cont")


def test_pdf_hex_strings_and_tj_arrays():
    content = b"BT [(ab) -120 (cd)] TJ <20> Tj <4546> Tj ET"
    raw = (
        b"%PDF-1.7\n1 0 obj\n" + b"<< /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream\nendobj\n"
    )
    assert P.extract_text(raw) == "abcd EF"


def test_pdf_non_show_strings_ignored():
    # strings bound to non-text operators must not leak into the text
    content = b"BT (shown) Tj ET (not shown) Td"
    raw = (
        b"%PDF-1.7\n1 0 obj\n" + b"<< /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream\nendobj\n"
    )
    assert P.extract_text(raw) == "shown"


def test_pdf_empty_pages_counted_but_silent():
    data = P.build_pdf_bytes([[b"only text"], [], []])
    assert P.page_count(data) == 3
    assert P.extract_text(data) == "only text"


def test_pdf_rejections():
    with pytest.raises(P.PdfFormatError):
        P.extract_text(b"not a pdf")
    with pytest.raises(P.PdfFormatError):
        P.page_count(b"plain text")
    enc = P.build_pdf_bytes([[b"x"]]) + b"<< /Encrypt 9 0 R >>"
    with pytest.raises(P.PdfFormatError):
        P.extract_text(enc)
    bad = P.build_pdf_bytes([[b"x"]]).replace(b"FlateDecode", b"LZWDecode")
    with pytest.raises(P.PdfFormatError):
        P.extract_text(bad)


def test_pdf_corrupt_flate_raises():
    data = bytearray(P.build_pdf_bytes([[b"payload here"]]))
    pos = data.find(b"stream\n") + 10
    data[pos] ^= 0xFF
    with pytest.raises(P.PdfFormatError):
        P.extract_text(bytes(data))


def test_pdf_to_text_operator(spark):
    data = P.build_pdf_bytes([[b"spark ", b"rows"]])
    df = spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(b"binary junk"))],
        "id long, payload binary",
    )
    rows = {r.id: r for r in P.pdf_to_text(df).collect()}
    assert rows[1].pdf_text == "spark rows" and rows[1].pdf_pages == 1
    assert rows[2].pdf_text is None and rows[2].pdf_pages is None
