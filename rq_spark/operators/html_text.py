"""HTML → visible text extraction for crawl processing.

The step between a WARC response payload and the text pipeline
(language ID, quality scoring, dedup): strip markup, drop
script/style/head content, decode entities, and normalize whitespace.
Built on the stdlib ``html.parser`` (public HTML5 tokenizer rules —
no external deps), so it tolerates the malformed tag soup real crawls
contain rather than requiring well-formed documents.

Extraction rules (the common-denominator of public text-extraction
pipelines):

* ``script``, ``style``, ``template``, ``noscript``, ``head`` subtrees
  contribute nothing;
* block-level boundaries (p, div, br, li, headings, tr, …) separate
  text so words from adjacent blocks never concatenate;
* character and entity references decode (``&amp;`` → ``&``);
* runs of whitespace collapse to single spaces, leading/trailing
  trimmed — the same normalization the dedup oracles use, which is
  what lets the driver hash compare an extraction round trip against
  SQL-normalized source text.

`html_features` additionally surfaces the title, link count, and raw
markup-to-text ratio — cheap crawl-quality signals.

Spark shape: Arrow-batched `mapInPandas`, pure Python per payload,
O(bytes) single pass. Reference parity note: dflemstr/rq has no HTML
operators; this is extension-layer (SURVEY.md §2.2).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SKIP_TAGS = {"script", "style", "template", "noscript", "head"}
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
    "footer", "nav", "aside", "blockquote", "pre", "hr", "form",
}
_WS = re.compile(r"\s+")


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.n_links = 0
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        if tag == "title":
            self._in_title = True
        if tag == "a":
            self.n_links += 1
        if tag in _BLOCK_TAGS:
            self.parts.append(" ")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth:
            self._skip_depth -= 1
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK_TAGS:
            self.parts.append(" ")

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        elif not self._skip_depth:
            self.parts.append(data)


def extract_text(html: str) -> str:
    """Visible text of an HTML document, whitespace-normalized."""
    p = _Extractor()
    p.feed(html)
    p.close()
    return _WS.sub(" ", "".join(p.parts)).strip()


def extract_features(html: str) -> tuple[str, str, int, float]:
    """(text, title, n_links, text_ratio) — text_ratio is visible
    chars / markup chars, the classic boilerplate signal."""
    p = _Extractor()
    p.feed(html)
    p.close()
    text = _WS.sub(" ", "".join(p.parts)).strip()
    title = _WS.sub(" ", "".join(p.title_parts)).strip()
    return text, title, p.n_links, len(text) / max(1, len(html))


def html_to_text(df: DataFrame, html_col: str = "payload") -> DataFrame:
    """Spark operator: binary-or-string HTML column → (html_text,
    html_title, html_links, html_text_ratio). Arrow-batched."""
    import pandas as pd

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("html_text", T.StringType()),
            T.StructField("html_title", T.StringType()),
            T.StructField("html_links", T.IntegerType()),
            T.StructField("html_text_ratio", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            texts, titles, links, ratios = [], [], [], []
            for v in pdf[html_col]:
                s = (
                    bytes(v).decode("utf-8", "replace")
                    if not isinstance(v, str)
                    else v
                )
                text, title, n, ratio = extract_features(s)
                texts.append(text)
                titles.append(title)
                links.append(n)
                ratios.append(ratio)
            yield pdf.assign(
                html_text=texts,
                html_title=titles,
                html_links=links,
                html_text_ratio=ratios,
            )

    return df.mapInPandas(run, out_schema)
