"""WebDataset tar-shard operators (operators/webdataset.py) — tar
round-trips, sample grouping rules, determinism, the Spark shard
write/read paths, and the binaryFile source scan."""

from __future__ import annotations

import numpy as np
import pytest

from rq_spark.operators import webdataset as W


def test_tar_roundtrip_and_determinism():
    samples = [
        ("000001", {"txt": b"hello", "json": b"{}"}),
        ("000002", {"txt": b"world", "json": b'{"x":1}'}),
    ]
    b = W.build_shard_bytes(samples)
    assert list(W.iter_samples(b)) == samples
    assert W.build_shard_bytes(samples) == b


def test_multi_dot_extension_rule():
    # WebDataset rule: key = before FIRST dot, ext = the rest
    samples = [("img007", {"seg.png": b"\x89PNG", "txt": b"t"})]
    out = list(W.iter_samples(W.build_shard_bytes(samples)))
    assert out == [("img007", {"seg.png": b"\x89PNG", "txt": b"t"})]


def test_directory_prefix_stripped():
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo(name="data/train/000009.txt")
        payload = b"nested"
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    [(key, members)] = list(W.iter_samples(buf.getvalue()))
    assert key == "000009" and members == {"txt": b"nested"}


def test_empty_member_and_binary_content():
    blob = bytes(range(256)) * 3
    samples = [("k1", {"bin": blob, "txt": b""})]
    assert list(W.iter_samples(W.build_shard_bytes(samples))) == samples


def test_shard_documents_and_samples_roundtrip(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(120)], "doc_id long, text string"
    ).withColumn("meta_json", F.to_json(F.struct("doc_id")))
    shards = W.shard_documents(
        df, "doc_id", {"txt": "text", "json": "meta_json"}, docs_per_shard=50
    )
    srows = shards.collect()
    assert sorted(r.shard_id for r in srows) == [0, 1, 2]
    assert sorted(r.n_samples for r in srows) == [20, 50, 50]
    samples = W.samples_from_shards(
        shards.select("shard_id", "shard_bytes"), exts=["txt", "json"]
    ).collect()
    assert len(samples) == 120
    by_key = {int(r.key): r for r in samples}
    assert bytes(by_key[7].m_txt) == b"doc number 7"
    assert b'"doc_id":119' in bytes(by_key[119].m_json)
    # shard member ordering is key-sorted within a shard
    in_shard0 = [int(r.key) for r in samples if r.shard_id == 0]
    assert in_shard0 == sorted(in_shard0)


def test_samples_map_mode(spark):
    df = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    shards = W.shard_documents(df, "doc_id", {"txt": "text"}, docs_per_shard=10)
    [row] = W.samples_from_shards(shards.select("shard_bytes")).collect()
    assert row.key == "000000000001"
    assert bytes(row.members["txt"]) == b"alpha"


def test_read_webdataset_binaryfile_scan(spark, tmp_path):
    # write two shards to disk, scan with the binaryFile source
    for sid in (0, 1):
        samples = [
            (f"{sid}_{i:04d}", {"txt": f"s{sid} item {i}".encode()})
            for i in range(5)
        ]
        (tmp_path / f"shard-{sid:05d}.tar").write_bytes(
            W.build_shard_bytes(samples)
        )
    (tmp_path / "ignore.bin").write_bytes(b"not a tar")  # glob-filtered
    out = W.read_webdataset(spark, str(tmp_path), exts=["txt"]).collect()
    assert len(out) == 10
    assert {r.shard_path.rsplit("/", 1)[-1] for r in out} == {
        "shard-00000.tar",
        "shard-00001.tar",
    }
    assert sorted(bytes(r.m_txt) for r in out)[0] == b"s0 item 0"
