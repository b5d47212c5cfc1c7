"""DataFrame-level format readers/writers (the Spark surface of the
faithful layer; per-format semantics in formats/__init__.py).

Scale design:
* json/csv/raw use Spark's native readers — splittable, predicate
  pushdown, schema inference (rq's schema-on-read, SURVEY §1.3).
* avro/cbor/msgpack/protobuf are container/stream formats with no
  built-in datasource in this environment → `binaryFiles` RDD: one
  task per file, the pure-Python codec decodes executor-side, then
  Spark's JSON inference builds the columnar schema. Parallelism =
  number of files, which is how these container formats shard at
  scale anyway (one container per task is the Avro/Kafka convention).
* toml/yaml are whole-input single-record formats in the reference —
  here each FILE is one record (wholetext), preserving that semantic
  per shard.
* writers place one container/stream per partition under the output
  dir (part-NNNNN files, Hadoop convention); `preserve_order=True` on
  read attaches an input-order index (rq's strict FIFO, SURVEY §4 —
  off by default for analytics).
"""

from __future__ import annotations

import json as _json
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import IllegalRecordError, IllegalSequenceError, UnimplementedError
from . import decode_records, encode_records


def _bytes_default(o):
    if isinstance(o, (bytes, bytearray)):
        return bytes(o).hex()
    from .values import OrderedPairs

    if isinstance(o, OrderedPairs):
        # SURVEY §1.2 item 2: duplicate/ordered-key maps surface as
        # array<struct<key,value>> on the columnar path
        return [{"key": k, "value": v} for k, v in o.items()]
    raise TypeError(f"not JSON-serializable: {type(o).__name__}")


def _records_to_df(spark: SparkSession, rdd) -> DataFrame:
    """Schema-on-read: python records → JSON lines → Spark inference
    (the engine's analog of rq's deserialize_any visitor)."""
    jrdd = rdd.map(lambda v: _json.dumps(v, default=_bytes_default))
    return spark.read.json(jrdd)


def _zst_lines(spark: SparkSession, path: str):
    """RDD[str] of text lines from ``*.zst`` / ``*.xz`` files (one
    shard = one task). Neither format is splittable — the same
    constraint every engine has for gzip — so at 100 TB the corpus
    must arrive sharded, which public ``.jsonl.zst`` corpora already
    are (thousands of ~100 MB-1 GB shards); parallelism = file count,
    decompression runs executor-side via the bundled pure zstd codec
    (streaming, O(window) memory) or stdlib lzma."""
    def chunks_of(name: str, blob: bytes):
        if name.endswith(".xz"):
            import lzma

            d = lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
            for i in range(0, len(blob), 1 << 20):
                yield d.decompress(blob[i : i + (1 << 20)])
        elif name.endswith(".lz4"):
            from .codecs.lz4_pure import decompress as lz4_d

            yield lz4_d(blob)
        else:
            from .codecs.zstd_pure import iter_decompress

            yield from iter_decompress(blob)

    def lines(kv):
        # STREAMING decode: the task retains only the codec window
        # (zstd: the declared frame window, typically 2-8 MB) plus one
        # partial line, not the whole decompressed shard
        carry = b""
        for chunk in chunks_of(kv[0], kv[1]):
            carry += chunk
            *done, carry = carry.split(b"\n")
            for ln in done:
                yield ln.decode("utf-8")
        if carry:
            yield carry.decode("utf-8")

    return spark.sparkContext.binaryFiles(path).flatMap(lines)


def _is_zst(path: str) -> bool:
    """True for the extensions the pure-codec line reader handles
    (.zst and .lz4 via the bundled codecs; .xz via stdlib lzma)."""
    return path.endswith((".zst", ".xz", ".lz4"))


def _unwrap_zst(name: str, data: bytes) -> bytes:
    """Transparent shard decompression for the binaryFiles container
    formats (`a.cbor.zst`, `a.msgpack.xz`, …) — gated on the FILENAME,
    not a magic sniff, because container payloads can legitimately
    start with the codec magic bytes."""
    if name.endswith(".zst"):
        from .codecs.zstd_pure import decompress

        return decompress(data)
    if name.endswith(".xz"):
        import lzma

        return lzma.decompress(data, format=lzma.FORMAT_XZ)
    if name.endswith(".lz4"):
        from .codecs.lz4_pure import decompress

        return decompress(data)
    return data


def read(spark: SparkSession, fmt: str, path: str, preserve_order: bool = False,
         **opts) -> DataFrame:
    if fmt == "json":
        if _is_zst(path):
            df = spark.read.option("mode", opts.pop("mode", "FAILFAST")).json(
                _zst_lines(spark, path)
            )
        else:
            df = spark.read.option("mode", opts.pop("mode", "FAILFAST")).json(path)
    elif fmt == "csv":
        # headerless, all-string (S2); as_sequence=True gives rq's
        # row-as-Sequence shape (one array<string> column)
        if _is_zst(path):
            df = spark.read.csv(_zst_lines(spark, path), header=False,
                                inferSchema=False)
        else:
            df = spark.read.csv(path, header=False, inferSchema=False)
        if opts.get("as_sequence"):
            df = df.select(F.array(*df.columns).alias("value"))
    elif fmt == "raw":
        if _is_zst(path):
            df = _zst_lines(spark, path).map(lambda s: (s,)).toDF(["value"])
        else:
            df = spark.read.text(path)
    elif fmt in ("avro", "cbor", "msgpack", "toml", "yaml"):
        files = spark.sparkContext.binaryFiles(path)
        df = _records_to_df(
            spark,
            files.flatMap(
                lambda kv: list(decode_records(fmt, _unwrap_zst(kv[0], kv[1]), **opts))
            ),
        )
    elif fmt == "protobuf":
        message, registry = opts["message"], opts["registry"]
        types = registry.types() if hasattr(registry, "types") else registry
        files = spark.sparkContext.binaryFiles(path)
        df = _records_to_df(
            spark,
            files.flatMap(
                lambda kv: list(decode_records("protobuf", kv[1], message=message,
                                               registry=types))
            ),
        )
    else:
        raise IllegalRecordError(f"unknown input format {fmt!r}")
    if preserve_order:
        df = df.withColumn("_input_order", F.monotonically_increasing_id())
    return df


def _atomic_only(df: DataFrame) -> None:
    for name, dtype in df.dtypes:
        if dtype.startswith(("array", "map", "struct", "binary")):
            raise IllegalSequenceError(
                f"csv can only output sequences of scalars; column {name} is {dtype}"
            )


def _native_writer(df: DataFrame, opts: dict):
    """Spark-native writer with the optional Hadoop codec attached."""
    w = df.write.mode(opts.pop("mode", "overwrite"))
    codec = opts.pop("_native_codec", None)
    if codec:
        w = w.option("compression", codec)
    return w


def _write_zstd_text(df: DataFrame, path: str, suffix: str, fmt_rows) -> None:
    """Committed write of zstd-compressed text shards — the
    ``.jsonl.zst`` corpus shape. Same FileOutputCommitter-v1 protocol
    as the codec committer in write(); one frame per part file
    (executor-side compression via the bundled pure codec), so reading
    the directory back parallelizes over parts."""
    import shutil
    import uuid

    from .codecs.zstd_pure import compress

    os.makedirs(path, exist_ok=True)
    tmp_dir = os.path.join(path, "_temporary")
    os.makedirs(tmp_dir, exist_ok=True)

    def write_partition(idx: int, rows: Iterator) -> Iterator:
        rows = list(rows)
        if rows or idx == 0:
            blob = compress(fmt_rows(rows).encode("utf-8"), mode="lz")
            attempt = os.path.join(tmp_dir, f"part-{idx:05d}-{uuid.uuid4().hex}")
            with open(attempt, "wb") as f:
                f.write(blob)
            yield idx, attempt

    try:
        winners = df.rdd.mapPartitionsWithIndex(write_partition).collect()
        for idx, attempt in winners:
            os.replace(attempt, os.path.join(path, f"part-{idx:05d}{suffix}"))
        with open(os.path.join(path, "_SUCCESS"), "wb"):
            pass
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)


def write(df: DataFrame, fmt: str, path: str, **opts) -> None:
    # Order preservation (SURVEY §4): a global sort's range partitions
    # are written as part files in partition order on EVERY output
    # path (Spark-native writers and the codec committer below alike),
    # so concatenating parts in name order reproduces the reference
    # pipe's byte order. Hoisted here because the native json/csv/raw
    # branches would otherwise silently drop the option.
    sort_col = opts.pop("order_by", None)
    if sort_col:
        df = df.orderBy(sort_col)
    compression = opts.pop("compression", None)
    if compression not in (None, "zstd", "gzip"):
        raise IllegalRecordError(f"unknown compression {compression!r}")
    if compression == "gzip":
        # gzip rides Spark's native text writers (Hadoop GzipCodec)
        if fmt not in ("json", "csv", "raw"):
            raise IllegalRecordError(f"gzip compression unsupported for {fmt!r}")
        opts["_native_codec"] = "gzip"
    zstd_out = compression == "zstd"
    if fmt == "json":
        if zstd_out:
            _write_zstd_text(
                df, path, ".jsonl.zst",
                lambda rows: "\n".join(
                    _json.dumps(r.asDict(recursive=True), default=_bytes_default)
                    for r in rows
                ),
            )
            return
        _native_writer(df, opts).json(path)
        return
    if fmt == "csv":
        _atomic_only(df)
        if zstd_out:
            import csv as _csv
            import io as _io

            def _fmt_csv(rows):
                buf = _io.StringIO()
                w = _csv.writer(buf, lineterminator="\n")
                for r in rows:
                    w.writerow(list(r))
                return buf.getvalue().rstrip("\n")

            _write_zstd_text(df, path, ".csv.zst", _fmt_csv)
            return
        _native_writer(df, opts).csv(path)
        return
    if fmt == "raw":
        dtypes = dict(df.dtypes)
        if list(dtypes.values()) != ["string"]:
            raise IllegalRecordError("raw can only output a single string column")
        if zstd_out:
            _write_zstd_text(df, path, ".txt.zst",
                             lambda rows: "\n".join(r[0] for r in rows))
            return
        _native_writer(df, opts).text(path)
        return
    if zstd_out:
        raise IllegalRecordError(f"zstd compression unsupported for {fmt!r}")
    if fmt == "protobuf":
        raise UnimplementedError("protobuf serialization")  # rq.rs:237-240
    if fmt not in ("cbor", "msgpack", "avro", "toml", "yaml"):
        raise IllegalRecordError(f"unknown output format {fmt!r}")

    # Committed write, FileOutputCommitter-v1 shape: every task attempt
    # writes its container to _temporary/ under a unique attempt name;
    # only attempts that SUCCEED return their name to the driver, which
    # renames the winners into place and drops a _SUCCESS marker. No
    # partial/duplicate output is ever visible under its final name —
    # speculative or retried attempts leave only orphan temp files,
    # removed with _temporary. Requires the output dir to be one
    # filesystem shared by driver and executors (local mode, NFS, …);
    # on node-local disks the commit rename fails LOUDLY instead of
    # silently scattering files per node.
    import shutil
    import uuid

    os.makedirs(path, exist_ok=True)
    tmp_dir = os.path.join(path, "_temporary")
    os.makedirs(tmp_dir, exist_ok=True)

    def write_partition(idx: int, rows: Iterator) -> Iterator:
        values = [r.asDict(recursive=True) for r in rows]
        if values or idx == 0:  # part-00000 always exists, like Hadoop
            blob = encode_records(fmt, values, **opts)
            attempt = os.path.join(tmp_dir, f"part-{idx:05d}-{uuid.uuid4().hex}")
            with open(attempt, "wb") as f:
                f.write(blob)
            yield idx, attempt

    try:
        winners = df.rdd.mapPartitionsWithIndex(write_partition).collect()
        for idx, attempt in winners:
            os.replace(attempt, os.path.join(path, f"part-{idx:05d}"))
        with open(os.path.join(path, "_SUCCESS"), "wb"):
            pass
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)


def transcode_path(spark: SparkSession, in_fmt: str, in_path: str,
                   out_fmt: str, out_path: str,
                   in_opts: dict | None = None, out_opts: dict | None = None) -> None:
    """Distributed version of the reference's identity pipe."""
    df = read(spark, in_fmt, in_path, **(in_opts or {}))
    write(df, out_fmt, out_path, **(out_opts or {}))
