"""Multimodal columns: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the *decode* step is
stubbed two ways (SURVEY.md build brief):

* ``decode_image(strict=True)`` raises ``NotImplementedError`` — the
  honest production placeholder;
* ``decode_image(strict=False)`` produces a deterministic fake
  (dimensions derived from the payload hash) so the Spark-side
  plumbing — schema, batching, partitioning, UDF signatures — is real
  and testable end-to-end.

Scale notes: payloads stay in executors (never collected); mapInPandas
streams Arrow batches so one task holds O(batch) payloads, not
O(partition); metadata-only transforms prune the binary column away
entirely (column pruning works through struct fields).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the typed metadata struct attached to every payload
MEDIA_META_SCHEMA = "struct<size_bytes:bigint,sha256:string,mime:string>"


def with_binary_payload(df: DataFrame, text_col: str, mime: str = "text/plain") -> DataFrame:
    """Demo source: treat a text column as an opaque binary payload with
    typed metadata (in production the payload comes off parquet/tar)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.length(payload).alias("size_bytes"),
            F.sha2(payload, 256).alias("sha256"),
            F.lit(mime).alias("mime"),
        ),
    )


def decode_image(df: DataFrame, payload_col: str = "payload", *, strict: bool = True) -> DataFrame:
    """Decode payloads to (width, height, channels) via mapInPandas.

    strict=True raises NotImplementedError (no codec libs in this
    container — wire Pillow/libvips here in production). strict=False
    derives deterministic fake dimensions from the payload hash so the
    distributed plumbing is exercised for real.
    """
    # copy: StructType.add mutates in place (would corrupt df's schema)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode requires a codec library (Pillow/libvips); "
                    "not available in this environment"
                )
            dims = [_fake_dims(p) for p in pdf[payload_col]]
            pdf = pdf.assign(
                width=[d[0] for d in dims],
                height=[d[1] for d in dims],
                channels=[d[2] for d in dims],
            )
            yield pdf

    return df.mapInPandas(run, out_schema)


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    h = hashlib.sha256(bytes(payload)).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 1 + h[2] % 4


def extract_features(df: DataFrame, payload_col: str = "payload", dim: int = 16) -> DataFrame:
    """Deterministic feature vector per payload (stands in for a model
    forward pass; Arrow-batched so a real model would amortize per batch)."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                d = hashlib.sha256(bytes(p)).digest()
                arr = np.frombuffer((d * ((dim * 4) // len(d) + 1))[: dim * 4], dtype="<u4")
                feats.append((arr.astype(np.float32) / np.float32(2**32)).tolist())
            yield pdf.assign(features=feats)

    return df.mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, payload_col: str = "payload", n_frames: int = 4) -> DataFrame:
    """'Video' frame sampling stub: split the payload into n equal
    chunks (JVM-side slice — no Python needed for byte slicing)."""
    size = F.length(F.col(payload_col))
    frame = lambda i: F.substring(  # noqa: E731
        F.col(payload_col), (size * i / n_frames).cast("int") + 1, (size / n_frames).cast("int")
    )
    return df.withColumn("frames", F.array(*[frame(i) for i in range(n_frames)]))


def resize_image(
    df: DataFrame,
    payload_col: str = "payload",
    width: int = 64,
    height: int = 64,
) -> DataFrame:
    """'Resize' payloads to width×height, channels preserved from the
    (fake) decode — the third multimodal pipeline stage (decode →
    resize → features). The pixel resample itself is stubbed (no image
    libs in this container): the resized payload is the input bytes
    tiled/truncated to exactly width·height·channels bytes, which is
    deterministic and keeps the REAL plumbing under test — binary in,
    binary out through Arrow, per-batch memory O(batch·frame), output
    column sized by data-dependent channels.

    In production the body of the loop becomes
    ``PIL.Image.open(...).resize((width, height))``.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("resized", T.BinaryType()),
            T.StructField("out_channels", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized, chans = [], []
            for p in pdf[payload_col]:
                b = bytes(p)
                c = _fake_dims(b)[2]  # channels from the shared decode rule
                n = width * height * c
                resized.append((b * (n // len(b) + 1))[:n] if b else bytes(n))
                chans.append(c)
            yield pdf.assign(resized=resized, out_channels=chans)

    return df.mapInPandas(run, out_schema)
