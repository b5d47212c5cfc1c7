"""Multimodal plumbing: binary payloads + metadata, stubbed decode,
Arrow-batched feature extraction — schema and determinism are the
contract (codec libs absent by design)."""

from __future__ import annotations

import hashlib

import pytest

from rq_spark.operators import multimodal as M
from rq_spark.queries.helpers import table


def _docs(spark, sf_dir, n=20):
    return M.with_binary_payload(
        table(spark, sf_dir, "documents").limit(n), "text"
    )


def test_payload_metadata_matches_python(spark, sf_dir):
    rows = _docs(spark, sf_dir).select("text", "payload", "media_meta").collect()
    for r in rows:
        raw = r.text.encode("utf-8")
        assert bytes(r.payload) == raw
        assert r.media_meta.size_bytes == len(raw)
        assert r.media_meta.sha256 == hashlib.sha256(raw).hexdigest()
        assert r.media_meta.mime == "text/plain"


def test_decode_strict_raises(spark, sf_dir):
    df = M.decode_image(_docs(spark, sf_dir), strict=True)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        df.collect()


def test_decode_fake_is_deterministic(spark, sf_dir):
    a = {(r.doc_id, r.width, r.height, r.channels)
         for r in M.decode_image(_docs(spark, sf_dir), strict=False).collect()}
    b = {(r.doc_id, r.width, r.height, r.channels)
         for r in M.decode_image(_docs(spark, sf_dir), strict=False).collect()}
    assert a == b
    assert all(16 <= w <= 255 and 1 <= c <= 4 for (_, w, _h, c) in a)


def test_feature_extraction_shape_and_range(spark, sf_dir):
    rows = M.extract_features(_docs(spark, sf_dir), dim=16).collect()
    assert all(len(r.features) == 16 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r.features)


def test_frame_sampling_covers_payload(spark, sf_dir):
    rows = M.sample_frames(_docs(spark, sf_dir), n_frames=4).collect()
    for r in rows:
        assert len(r.frames) == 4
        assert sum(len(bytes(f)) for f in r.frames) <= r.media_meta.size_bytes
