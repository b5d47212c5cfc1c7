"""WARC reader (operators/warc.py) — record/HTTP parsing, gzip
multi-member handling, malformed-input rejection, and the Spark
binaryFile scan path."""

from __future__ import annotations

import gzip
import io

import pytest

from rq_spark.operators import warc as W


def _recs():
    return [
        {
            "uri": "http://a.example/x",
            "body": b"hello page",
            "status": 200,
            "content_type": "text/html; charset=utf-8",
            "record_id": "<urn:uuid:1>",
            "date": "2021-06-01T10:00:00Z",
        },
        {"uri": "http://b.example/y", "body": b"second", "status": 404},
        {"warc_type": "warcinfo", "body": b"software: fixture"},
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_warc_roundtrip(gz):
    out = list(W.iter_records(W.build_warc_bytes(_recs(), gzip_per_record=gz)))
    assert [r["warc_type"] for r in out] == ["response", "response", "warcinfo"]
    assert out[0]["target_uri"] == "http://a.example/x"
    assert out[0]["http_status"] == 200
    assert out[0]["http_content_type"] == "text/html; charset=utf-8"
    assert bytes(out[0]["payload"]) == b"hello page"
    assert out[0]["record_id"] == "<urn:uuid:1>"
    assert out[0]["date"] == "2021-06-01T10:00:00Z"
    assert out[1]["http_status"] == 404
    assert out[2]["http_status"] is None
    assert bytes(out[2]["payload"]) == b"software: fixture"


def test_warc_content_length_covers_http_message():
    [rec] = list(
        W.iter_records(
            W.build_warc_bytes([{"uri": "u", "body": b"abc", "status": 200}])
        )
    )
    # content_length is the full HTTP message, payload is the body only
    assert rec["content_length"] > 3
    assert bytes(rec["payload"]) == b"abc"


def test_warc_binary_body_survives():
    blob = bytes(range(256)) * 2
    [rec] = list(
        W.iter_records(W.build_warc_bytes([{"uri": "u", "body": blob}]))
    )
    assert bytes(rec["payload"]) == blob


def test_warc_multiple_records_per_plain_block():
    data = W.build_warc_bytes(_recs(), gzip_per_record=False)
    assert len(list(W.iter_records(data))) == 3


def test_warc_rejections():
    with pytest.raises(W.WarcFormatError):
        list(W.iter_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    ok = W.build_warc_bytes([{"uri": "u", "body": b"abc"}], gzip_per_record=False)
    with pytest.raises(W.WarcFormatError):
        list(W.iter_records(ok[:-6]))  # missing record separator
    # corrupt gzip member
    gz = bytearray(W.build_warc_bytes([{"uri": "u", "body": b"abc"}]))
    gz[12] ^= 0xFF
    with pytest.raises(W.WarcFormatError):
        list(W.iter_records(bytes(gz)))


def test_warc_non_http_response_body_passthrough():
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 7\r\n\r\n"
        b"not-web\r\n\r\n"
    )
    [rec] = list(W.iter_records(raw))
    assert rec["http_status"] is None and bytes(rec["payload"]) == b"not-web"


def test_read_warc_binaryfile_scan(spark, tmp_path):
    (tmp_path / "crawl-00000.warc.gz").write_bytes(W.build_warc_bytes(_recs()))
    (tmp_path / "crawl-00001.warc").write_bytes(
        W.build_warc_bytes(
            [{"uri": "http://c.example/z", "body": b"third file"}],
            gzip_per_record=False,
        )
    )
    (tmp_path / "notes.txt").write_bytes(b"ignored by the glob")
    rows = W.read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 4
    responses = [r for r in rows if r.warc_type == "response"]
    assert {r.target_uri for r in responses} == {
        "http://a.example/x", "http://b.example/y", "http://c.example/z",
    }
    by_uri = {r.target_uri: r for r in responses}
    assert bytes(by_uri["http://c.example/z"].payload) == b"third file"
    assert by_uri["http://a.example/x"].warc_path.endswith("crawl-00000.warc.gz")
