"""zstd integration across the source/sink surface: .jsonl.zst
corpus shards (the dominant public-LLM-corpus shape), .csv.zst,
raw-text .zst, .warc.zst, and .tar.zst WebDataset shards."""

from __future__ import annotations

import os

from rq_spark.formats import spark_io
from rq_spark.formats.codecs.zstd_pure import compress, decompress


def test_jsonl_zst_write_read_round_trip(spark, tmp_path):
    rows = [(i, f"doc {i}", float(i) / 3) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, text string, score double").repartition(4)
    out = str(tmp_path / "corpus")
    spark_io.write(df, "json", out, compression="zstd")
    parts = sorted(p for p in os.listdir(out) if p.endswith(".jsonl.zst"))
    assert len(parts) == 4
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    # every part is a real zstd frame with ndjson inside
    blob = decompress(open(os.path.join(out, parts[0]), "rb").read())
    assert blob.lstrip()[:1] == b"{"
    back = spark_io.read(spark, "json", out + "/*.zst")
    assert back.count() == 500
    got = {(r["id"], r["text"], round(r["score"], 9)) for r in back.collect()}
    assert got == {(i, f"doc {i}", round(float(i) / 3, 9)) for i in range(500)}


def test_raw_and_csv_zst_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(f"line {i}",) for i in range(100)], "value string")
    out = str(tmp_path / "raw")
    spark_io.write(df.coalesce(1), "raw", out, compression="zstd")
    back = spark_io.read(spark, "raw", out + "/*.zst")
    assert sorted(r["value"] for r in back.collect()) == sorted(
        f"line {i}" for i in range(100)
    )

    df2 = spark.createDataFrame([(i, f"v{i}") for i in range(50)], "a long, b string")
    out2 = str(tmp_path / "csv")
    spark_io.write(df2.coalesce(1), "csv", out2, compression="zstd")
    back2 = spark_io.read(spark, "csv", out2 + "/*.zst")
    assert back2.count() == 50
    assert sorted((r[0], r[1]) for r in back2.collect()) == sorted(
        (str(i), f"v{i}") for i in range(50)
    )


def test_container_zst_and_gzip_native(spark, tmp_path):
    # .cbor.zst shard through the binaryFiles path
    from rq_spark.formats import encode_records

    recs = [{"a": i, "b": f"x{i}"} for i in range(20)]
    shard = tmp_path / "data.cbor.zst"
    shard.write_bytes(compress(encode_records("cbor", recs), mode="lz"))
    back = spark_io.read(spark, "cbor", str(shard))
    assert back.count() == 20
    assert {r["a"] for r in back.collect()} == set(range(20))

    # gzip rides the native writer and reads back transparently
    df = spark.createDataFrame([(i, f"v{i}") for i in range(30)], "a long, b string")
    out = str(tmp_path / "gz")
    spark_io.write(df.coalesce(1), "json", out, compression="gzip")
    assert any(p.endswith(".gz") for p in os.listdir(out))
    assert spark_io.read(spark, "json", out).count() == 30


def test_xz_jsonl_and_container_read(spark, tmp_path):
    import lzma

    lines = "\n".join('{"id": %d}' % i for i in range(40)).encode()
    (tmp_path / "part.jsonl.xz").write_bytes(lzma.compress(lines))
    df = spark_io.read(spark, "json", str(tmp_path / "*.xz"))
    assert sorted(r["id"] for r in df.collect()) == list(range(40))

    from rq_spark.formats import encode_records

    recs = [{"k": i} for i in range(10)]
    (tmp_path / "d.msgpack.xz").write_bytes(
        lzma.compress(encode_records("msgpack", recs))
    )
    back = spark_io.read(spark, "msgpack", str(tmp_path / "d.msgpack.xz"))
    assert back.count() == 10


def test_lz4_jsonl_and_tar_shard(spark, tmp_path):
    from rq_spark.formats.codecs.lz4_pure import compress as lz4_c
    from rq_spark.operators import webdataset as wds

    lines = "\n".join('{"id": %d}' % i for i in range(25)).encode()
    (tmp_path / "part.jsonl.lz4").write_bytes(lz4_c(lines))
    df = spark_io.read(spark, "json", str(tmp_path / "*.lz4"))
    assert sorted(r["id"] for r in df.collect()) == list(range(25))

    samples = [(f"{i:04d}", {"txt": f"t{i}".encode()}) for i in range(5)]
    tar = wds.build_shard_bytes(samples)
    got = dict(wds.iter_samples(lz4_c(tar)))
    assert got["0003"]["txt"] == b"t3"


def test_warc_zst_records(tmp_path):
    from rq_spark.operators import warc

    recs = [
        {
            "record_id": f"<urn:uuid:{i:032d}>",
            "uri": f"http://x.example/{i}",
            "date": "2026-01-01T00:00:00Z",
            "status": 200,
            "content_type": "text/html",
            "body": (f"<html>{i}</html>").encode(),
        }
        for i in range(5)
    ]
    plain = warc.build_warc_bytes(recs, gzip_per_record=False)
    zst = compress(plain, mode="lz")
    got = list(warc.iter_records(zst))
    assert [r["target_uri"] for r in got] == [r["uri"] for r in recs]
    assert got[3]["payload"] == b"<html>3</html>"


def test_webdataset_tar_zst_shard(spark, tmp_path):
    from rq_spark.operators import webdataset as wds

    samples = [
        (f"{i:04d}", {"txt": f"text {i}".encode(), "cls": str(i % 3).encode()})
        for i in range(8)
    ]
    tar = wds.build_shard_bytes(samples)
    shard = tmp_path / "shard-0000.tar.zst"
    shard.write_bytes(compress(tar, mode="lz"))
    # direct iteration sees through the compression
    got = dict(wds.iter_samples(shard.read_bytes()))
    assert got["0005"]["txt"] == b"text 5"
    # and the DataFrame source scans .tar.zst shards
    df = wds.read_webdataset(spark, str(tmp_path / "*.tar.zst"))
    rows = {r["key"]: r for r in df.collect()}
    assert len(rows) == 8
