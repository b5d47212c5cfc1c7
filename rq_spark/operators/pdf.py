"""Minimal-but-real PDF text extraction.

Implemented from the public PDF 1.7 specification (ISO 32000-1):
objects are located by scanning for ``N G obj … endobj`` (robust
against the xref complexity real-world files accumulate — linearized
files, incremental updates, broken offsets), stream objects decode
their ``/Filter /FlateDecode`` bodies with stdlib zlib, pages are
counted from ``/Type /Page`` dictionaries, and text is recovered from
content-stream text operators:

* ``(string) Tj`` and ``(string) '`` / ``"`` — literal strings with
  the spec's escape sequences (``\\(``, ``\\)``, ``\\\\``, ``\\n``,
  octal codes) and balanced unescaped parentheses;
* ``[(a) -120 (b)] TJ`` — array shows, kerning numbers ignored;
* ``<48656C6C6F> Tj`` — hex strings;
* ``BT``/``ET`` blocks delimit text objects; a newline separates them.

Scope (documented, loud): simple (byte-aligned, non-CID) fonts —
i.e. the string bytes ARE the text, which holds for the latin-text
PDFs a corpus pipeline most wants, and exactly matches what the
fixture builder emits. CID/Type0 composite fonts need a ToUnicode CMap
(wire a full PDF library for those); encrypted files raise.

Spark shape: `pdf_to_text` is Arrow-batched `mapInPandas`, pure
Python + zlib per payload. Reference parity note: dflemstr/rq has no
document operators; this is extension-layer (SURVEY.md §2.2).
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..errors import RqError


class PdfFormatError(RqError):
    """Raised when bytes do not parse as (supported) PDF."""


def is_pdf(data: bytes) -> bool:
    return data[:5] == b"%PDF-"


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


def _iter_objects(data: bytes):
    """Yield (obj_num, dict_bytes, stream_bytes|None) by scanning —
    no xref required."""
    for m in _OBJ_RE.finditer(data):
        start = m.end()
        end = data.find(b"endobj", start)
        if end < 0:
            continue
        body = data[start:end]
        sm = _STREAM_RE.search(body)
        if sm:
            se = body.find(b"endstream", sm.end())
            if se < 0:
                raise PdfFormatError("pdf: unterminated stream")
            yield int(m.group(1)), body[: sm.start()], body[sm.end() : se]
        else:
            yield int(m.group(1)), body, None


def _decode_stream(dict_bytes: bytes, stream: bytes) -> bytes:
    if b"/FlateDecode" in dict_bytes:
        try:
            return zlib.decompress(stream)
        except zlib.error as e:
            raise PdfFormatError(f"pdf: bad Flate stream: {e}") from e
    if b"/Filter" in dict_bytes:
        raise PdfFormatError("pdf: unsupported stream filter")
    return stream


_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t", ord("b"): b"\b",
    ord("f"): b"\f", ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _read_literal_string(b: bytes, pos: int) -> tuple[bytes, int]:
    """b[pos] == '(' → (unescaped bytes, position after ')')."""
    out = bytearray()
    depth = 1
    pos += 1
    while pos < len(b):
        c = b[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= len(b):
                break
            e = b[pos]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                pos += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray()
                while pos < len(b) and len(oct_digits) < 3 and 0x30 <= b[pos] <= 0x37:
                    oct_digits.append(b[pos])
                    pos += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                pos += 1
                if e == 0x0D and pos < len(b) and b[pos] == 0x0A:
                    pos += 1
            else:
                out.append(e)
                pos += 1
        elif c == 0x28:  # nested (
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    raise PdfFormatError("pdf: unterminated literal string")


def _extract_stream_text(content: bytes) -> list[bytes]:
    """Text-showing strings from one content stream, in order; a None
    marker (b'\\n') is appended at each ET."""
    out: list[bytes] = []
    pos = 0
    n = len(content)
    pending: list[bytes] = []

    def flush_op(op: bytes):
        nonlocal pending
        if op in (b"Tj", b"'", b'"', b"TJ"):
            out.extend(pending)
        if op == b"ET":
            out.append(b"\n")
        pending = []

    while pos < n:
        c = content[pos]
        if c == 0x28:  # (
            s, pos = _read_literal_string(content, pos)
            pending.append(s)
        elif c == 0x3C and pos + 1 < n and content[pos + 1] != 0x3C:  # < hex
            end = content.find(b">", pos)
            if end < 0:
                raise PdfFormatError("pdf: unterminated hex string")
            hx = re.sub(rb"\s", b"", content[pos + 1 : end])
            if len(hx) % 2:
                hx += b"0"
            pending.append(bytes.fromhex(hx.decode()))
            pos = end + 1
        elif c == 0x3C:  # << dict — skip balanced
            depth = 0
            while pos + 1 < n:
                if content[pos : pos + 2] == b"<<":
                    depth += 1
                    pos += 2
                elif content[pos : pos + 2] == b">>":
                    depth -= 1
                    pos += 2
                    if depth == 0:
                        break
                else:
                    pos += 1
        elif (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A) or c in (0x27, 0x22):
            m = re.match(rb"[A-Za-z'\"]+", content[pos:])
            flush_op(m.group(0))
            pos += m.end()
        else:
            pos += 1
    return out


def page_count(data: bytes) -> int:
    if not is_pdf(data):
        raise PdfFormatError("pdf: missing %PDF- header")
    count = 0
    for _num, dict_bytes, _stream in _iter_objects(data):
        if re.search(rb"/Type\s*/Page\b(?!s)", dict_bytes):
            count += 1
    return count


def extract_text(data: bytes) -> str:
    """Visible text of all content streams, BT/ET blocks newline-
    separated, whitespace preserved within strings."""
    if not is_pdf(data):
        raise PdfFormatError("pdf: missing %PDF- header")
    if b"/Encrypt" in data[-2048:]:
        raise PdfFormatError("pdf: encrypted files unsupported")
    pieces: list[bytes] = []
    for _num, dict_bytes, stream in _iter_objects(data):
        if stream is None:
            continue
        # content streams are the streams that contain text operators;
        # image XObjects and fonts self-identify via /Subtype
        if re.search(rb"/Subtype\s*/(Image|Type1C|CIDFontType0C)", dict_bytes):
            continue
        body = _decode_stream(dict_bytes, stream)
        if b"BT" not in body:
            continue
        pieces.extend(_extract_stream_text(body))
    text = b"".join(pieces).decode("latin-1")
    return re.sub(r"\n{2,}", "\n", text).strip("\n")


def pdf_to_text(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Spark operator: PDF payloads → (pdf_text, pdf_pages).
    Arrow-batched; non-PDF payloads yield nulls."""
    import pandas as pd

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("pdf_text", T.StringType()),
            T.StructField("pdf_pages", T.IntegerType()),
        ]
    )

    def run(batches):
        for pdf_batch in batches:
            texts, pages = [], []
            for p in pdf_batch[payload_col]:
                b = bytes(p)
                if is_pdf(b):
                    texts.append(extract_text(b))
                    pages.append(page_count(b))
                else:
                    texts.append(None)
                    pages.append(None)
            yield pdf_batch.assign(pdf_text=texts, pdf_pages=pages)

    return df.mapInPandas(run, out_schema)


# ---- fixture builder ------------------------------------------------------


def _escape_string(s: bytes) -> bytes:
    return (
        s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def build_pdf_bytes(pages: list[list[bytes]], compress: bool = True) -> bytes:
    """A complete single-xref PDF: one content stream per page, each
    page's text chunks emitted as alternating Tj / TJ / hex shows (so
    every string form the extractor supports appears in fixtures).
    `extract_text` must return the chunk concatenation with one
    newline per page."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)  # 1-based object number

    n_pages = len(pages)
    # object layout: 1 catalog, 2 pages-root, then per page (page, content)
    page_obj_nums = [3 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % n for n in page_obj_nums)
    add(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )  # 2
    for i, chunks in enumerate(pages):
        content_num = page_obj_nums[i] + 1
        add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 << /Type /Font /Subtype /Type1 "
            b"/BaseFont /Helvetica >> >> >> /Contents %d 0 R >>" % content_num
        )
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for j, chunk in enumerate(chunks):
            form = j % 3
            if form == 0:
                ops.append(b"(" + _escape_string(chunk) + b") Tj")
            elif form == 1:
                ops.append(
                    b"[(" + _escape_string(chunk) + b") -120 ()] TJ"
                )
            else:
                ops.append(b"<" + chunk.hex().encode() + b"> Tj")
        ops.append(b"ET")
        body = b" ".join(ops)
        if compress:
            comp = zlib.compress(body)
            add(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
                + comp
                + b"\nendstream"
            )
        else:
            add(
                b"<< /Length %d >>\nstream\n" % len(body)
                + body
                + b"\nendstream"
            )

    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % (i + 1) + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_pos)
    )
    return bytes(out)
