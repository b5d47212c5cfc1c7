"""HTML text extraction (operators/html_text.py) and the end-to-end
crawl pipeline: WARC → HTML extraction → quality → dedup → WebDataset
shards — the full training-data ingestion chain composed from the
repo's own operators."""

from __future__ import annotations

import numpy as np
import pytest

from rq_spark.operators import html_text as H


def test_basic_extraction():
    doc = (
        "<html><head><title>T</title><style>p{}</style>"
        "<script>var a='<p>x</p>';</script></head>"
        "<body><h1>Head</h1><p>One &amp; two.</p><div>Three<br>Four</div>"
        "</body></html>"
    )
    assert H.extract_text(doc) == "Head One & two. Three Four"


def test_features_title_links_ratio():
    doc = (
        "<html><head><title>My  Page</title></head><body>"
        '<p>text</p><a href="a">x</a><a href="b">y</a></body></html>'
    )
    text, title, links, ratio = H.extract_features(doc)
    assert title == "My Page" and links == 2
    assert text == "text xy"  # anchors are inline: no separator injected
    assert 0 < ratio < 1


def test_malformed_soup_tolerated():
    assert H.extract_text("<p>un<b>closed <p>next & last") == (
        "unclosed next & last"  # inline <b> joins; <p> separates
    )
    assert H.extract_text("") == ""
    assert H.extract_text("plain, no tags") == "plain, no tags"


def test_inline_tags_do_not_split_words():
    # inline formatting must not inject separators mid-word
    assert H.extract_text("<p>un<b>break</b>able</p>") == "unbreakable"


def test_block_tags_separate_words():
    assert H.extract_text("<div>one</div><div>two</div>") == "one two"
    assert H.extract_text("<td>a</td><td>b</td>") == "a b"


def test_noscript_and_nested_skip():
    doc = "<body>keep<noscript><p>drop</p></noscript><script>s</script></body>"
    assert H.extract_text(doc) == "keep"


def test_html_to_text_operator(spark):
    payload = b"<html><head><title>T1</title></head><body><p>body one</p></body></html>"
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"no markup at all"))],
        "id long, payload binary",
    )
    rows = {r.id: r for r in H.html_to_text(df).collect()}
    assert rows[1].html_text == "body one"
    assert rows[1].html_title == "T1"
    assert rows[2].html_text == "no markup at all"


def test_end_to_end_crawl_pipeline(spark, tmp_path):
    """WARC files → records → HTML extraction → quality filter →
    exact dedup → WebDataset shards, all with the repo's operators —
    the complete crawl-to-training-data chain."""
    from pyspark.sql import functions as F

    from rq_spark.operators import warc as W
    from rq_spark.operators import webdataset as WDS
    from rq_spark.operators.dedup import exact_dedup_groups

    pages = {
        "http://ex.com/a": "<html><title>A</title><p>The quick brown fox "
        "jumps over the lazy dog repeatedly.</p></html>",
        "http://ex.com/a2": "<html><title>A2</title><p>The  quick  brown "
        "fox jumps over the lazy dog repeatedly.</p></html>",  # dup of a
        "http://ex.com/b": "<html><title>B</title><p>Completely different "
        "content about distributed query engines and shuffles.</p></html>",
        "http://ex.com/junk": "<html><script>only();</script></html>",  # empty
    }
    recs = [
        {"uri": uri, "body": html.encode(), "status": 200,
         "content_type": "text/html"}
        for uri, html in pages.items()
    ]
    (tmp_path / "crawl-00000.warc.gz").write_bytes(W.build_warc_bytes(recs))

    records = W.read_warc(spark, str(tmp_path)).filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    )
    texts = H.html_to_text(records, "payload").select(
        "target_uri", "html_text", "html_title"
    )
    quality = texts.filter(F.length("html_text") > 20)  # junk page drops
    assert quality.count() == 3

    docs = quality.withColumn(
        "doc_id", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .orderBy("target_uri")
        ).cast("long")
    )
    groups = exact_dedup_groups(docs, "html_text", "doc_id")
    reps = groups.count()
    assert reps == 2  # a and a2 collapse (whitespace-normalized dup)

    kept = docs.join(
        groups.select(F.col("rep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    shards = WDS.shard_documents(
        kept.select("doc_id", F.col("html_text").alias("text")),
        "doc_id", {"txt": "text"}, docs_per_shard=10,
    )
    samples = WDS.samples_from_shards(
        shards.select("shard_bytes"), exts=["txt"]
    ).collect()
    assert len(samples) == 2
    contents = {bytes(s.m_txt) for s in samples}
    assert any(b"distributed query engines" in c for c in contents)
