"""WebDataset-style tar-shard source/sink for multimodal corpora.

The de-facto standard layout for large-scale multimodal training data
(the public WebDataset convention: POSIX tar shards whose members are
grouped into samples by basename — ``000017.jpg`` + ``000017.txt`` +
``000017.json`` form one sample keyed ``000017``; shards of a few
hundred MB are the unit of parallelism). This module re-expresses that
layout Spark-first:

* the SHARD is the parallelism unit: `read_webdataset` scans shards
  with Spark's ``binaryFile`` source (one row per shard, distributed
  across executors, partition pruning on path), and each shard parses
  executor-side inside an Arrow batch — at 100 TB nothing but sample
  rows ever leaves the worker that read the shard;
* writing is a `groupBy(shard_id).applyInPandas` — samples for one
  shard collect on one executor, the tar builds in memory, one binary
  row comes back (in production, write the column to object storage
  with a per-row sink);
* tars are built deterministically (zeroed mtime/uid/gid, sorted
  members, USTAR format) so byte-identical inputs yield byte-identical
  shards — which is what lets the driver hash cover the whole
  round-trip in `mm_pipeline`.

Pure stdlib ``tarfile``; no external deps.

Reference parity note: dflemstr/rq has no archive operators; this is
extension-layer (SURVEY.md §2.2, training-data pipeline operations).
"""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def build_shard_bytes(samples: list[tuple[str, dict[str, bytes]]]) -> bytes:
    """[(key, {ext: content})] → deterministic USTAR bytes. Members are
    emitted sample-major, extensions sorted, metadata zeroed."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for key, members in samples:
            for ext in sorted(members):
                data = members[ext]
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def iter_samples(tar_bytes: bytes):
    """tar bytes → yields (key, {ext: content}) grouped by basename
    prefix (everything before the FIRST dot, the WebDataset rule —
    ``a.seg.png`` has key ``a`` and extension ``seg.png``)."""
    if tar_bytes[:4] == b"\x28\xb5\x2f\xfd":
        # .tar.zst shard (zstd-compressed WebDataset convention) —
        # transparent decompress via the bundled pure codec
        from ..formats.codecs.zstd_pure import decompress as _zstd_d

        tar_bytes = _zstd_d(tar_bytes)
    elif tar_bytes[:4] == b"\x04\x22\x4d\x18":
        # .tar.lz4 shard (magic sniff is safe here: a POSIX tar never
        # starts with either frame magic)
        from ..formats.codecs.lz4_pure import decompress as _lz4_d

        tar_bytes = _lz4_d(tar_bytes)
    cur_key: str | None = None
    cur: dict[str, bytes] = {}
    with tarfile.open(fileobj=io.BytesIO(tar_bytes), mode="r:") as tf:
        for member in tf:
            if not member.isfile():
                continue
            name = member.name.rsplit("/", 1)[-1]
            key, _, ext = name.partition(".")
            if cur_key is not None and key != cur_key:
                yield cur_key, cur
                cur = {}
            cur_key = key
            fh = tf.extractfile(member)
            cur[ext] = fh.read() if fh is not None else b""
    if cur_key is not None:
        yield cur_key, cur


def shard_documents(
    df: DataFrame,
    key_col: str,
    content_cols: dict[str, str],
    docs_per_shard: int = 50,
) -> DataFrame:
    """Pack rows into WebDataset shards: → (shard_id, n_samples,
    shard_bytes). ``content_cols`` maps extension → binary/string
    column. Keys are zero-padded so tar order == key order. One
    shuffle (groupBy shard_id); shard bytes never visit the driver."""
    import pandas as pd

    exts = dict(content_cols)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_wds_key")
        samples = []
        for _, row in pdf.iterrows():
            members = {}
            for ext, col in exts.items():
                v = row[col]
                members[ext] = (
                    v.encode("utf-8") if isinstance(v, str) else bytes(v or b"")
                )
            samples.append((row["_wds_key"], members))
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["_wds_shard"].iloc[0])],
                "n_samples": [len(samples)],
                "shard_bytes": [build_shard_bytes(samples)],
            }
        )

    keyed = df.withColumn(
        "_wds_key", F.lpad(F.col(key_col).cast("string"), 12, "0")
    ).withColumn(
        # integer division, not float-divide-and-cast: keys above 2^53
        # would lose precision in a double and land in the wrong shard
        "_wds_shard",
        F.expr(f"CAST({key_col} AS BIGINT) div {docs_per_shard}"),
    )
    return keyed.groupBy("_wds_shard").applyInPandas(
        build, "shard_id bigint, n_samples int, shard_bytes binary"
    )


def samples_from_shards(
    df: DataFrame, payload_col: str = "shard_bytes", exts: list[str] | None = None
) -> DataFrame:
    """Explode shard binaries into per-sample rows: every input column
    except the payload is carried through, plus (key, member map or
    one binary column per ext). Arrow-batched; memory is O(one shard)
    per task."""
    import pandas as pd

    carry = [f.name for f in df.schema.fields if f.name != payload_col]
    if exts is None:
        out_schema = T.StructType(
            [f for f in df.schema.fields if f.name != payload_col]
            + [
                T.StructField("key", T.StringType()),
                T.StructField(
                    "members", T.MapType(T.StringType(), T.BinaryType())
                ),
            ]
        )
    else:
        out_schema = T.StructType(
            [f for f in df.schema.fields if f.name != payload_col]
            + [T.StructField("key", T.StringType())]
            + [T.StructField(f"m_{e}", T.BinaryType()) for e in exts]
        )

    def run(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                base = [row[c] for c in carry]
                for key, members in iter_samples(bytes(row[payload_col])):
                    if exts is None:
                        rows.append(base + [key, members])
                    else:
                        rows.append(
                            base + [key] + [members.get(e) for e in exts]
                        )
            cols = carry + ["key"] + (
                ["members"] if exts is None else [f"m_{e}" for e in exts]
            )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, out_schema)


def read_webdataset(
    spark: SparkSession, path_glob: str, exts: list[str] | None = None
) -> DataFrame:
    """Scan tar shards with the binaryFile source and explode into
    samples. The scan distributes shards across executors (partition
    pruning applies to the path glob); `pathGlobFilter` keeps
    non-tar files out at the source."""
    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar*")  # .tar and .tar.zst shards
        .load(path_glob)
        .select(F.col("path").alias("shard_path"), F.col("content").alias("shard_bytes"))
    )
    return samples_from_shards(shards, "shard_bytes", exts)
