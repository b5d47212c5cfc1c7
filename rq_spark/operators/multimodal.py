"""Multimodal columns: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched pandas UDFs.

Decode is REAL for PNG payloads (operators/png.py — a pure-Python
codec from the public PNG spec; zlib + numpy, no image libs needed):
``decode_image`` reads true dimensions/channels, ``resize_image``
nearest-neighbor-resamples actual pixels and re-encodes, and
``extract_features`` computes a normalized grayscale histogram of the
decoded image. Other formats (JPEG etc.) still need a codec lib, so
they keep the two documented stub modes (SURVEY.md build brief):

* ``decode_image(strict=True)`` raises ``NotImplementedError`` for
  non-PNG payloads — the honest production placeholder;
* ``decode_image(strict=False)`` produces a deterministic fake
  (dimensions derived from the payload hash) so the Spark-side
  plumbing — schema, batching, partitioning, UDF signatures — is real
  and testable end-to-end for any payload.

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

    PNG payloads decode for REAL (operators/png.py — true header +
    pixel validation, not just magic sniffing). For other formats:
    strict=True raises NotImplementedError (wire Pillow/libvips here
    in production), strict=False derives deterministic fake dimensions
    from the payload hash so the distributed plumbing is exercised for
    real on any payload.
    """
    from . import png

    # copy: StructType.add mutates in place (would corrupt df's schema)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
        ]
    )

    def dims(p) -> tuple[int, int, int]:
        b = bytes(p)
        if png.is_png(b):
            arr = png.decode(b)
            return arr.shape[1], arr.shape[0], arr.shape[2]
        if strict:
            raise NotImplementedError(
                "only PNG decodes without a codec library; wire "
                "Pillow/libvips here for other formats"
            )
        return _fake_dims(b)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [dims(p) for p in pdf[payload_col]]
            yield pdf.assign(
                width=[d[0] for d in out],
                height=[d[1] for d in out],
                channels=[d[2] for d in out],
            )

    return df.mapInPandas(run, out_schema)


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    h = hashlib.sha256(bytes(payload)).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 1 + h[2] % 4


def extract_features(df: DataFrame, payload_col: str = "payload", dim: int = 16) -> DataFrame:
    """Feature vector per payload. PNG payloads get REAL content
    features: the dim-bin normalized grayscale histogram of the decoded
    pixels (deterministic, resolution-invariant — the classic cheap
    visual signature). Other payloads get the deterministic sha256
    fake (stands in for a model forward pass; Arrow-batched so a real
    model would amortize per batch)."""
    from . import png

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def feat(p) -> list[float]:
        b = bytes(p)
        if png.is_png(b):
            arr = png.decode(b)
            gray = arr.mean(axis=2, dtype=np.float64).ravel()
            hist, _ = np.histogram(gray, bins=dim, range=(0.0, 256.0))
            return (hist.astype(np.float32) / np.float32(max(gray.size, 1))).tolist()
        d = hashlib.sha256(b).digest()
        arr = np.frombuffer((d * ((dim * 4) // len(d) + 1))[: dim * 4], dtype="<u4")
        return (arr.astype(np.float32) / np.float32(2**32)).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf.assign(features=[feat(p) for p in pdf[payload_col]])

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
    """Resize payloads to width×height, channels preserved — the third
    multimodal pipeline stage (decode → resize → features). PNG
    payloads are resized for REAL: decoded, nearest-neighbor
    resampled, and re-encoded as PNG (operators/png.py — binary in,
    binary out, true pixels). Other payloads keep the stub (the input
    bytes tiled/truncated to exactly width·height·channels bytes,
    channels from the shared fake-decode rule), which is deterministic
    and keeps the plumbing under test for any payload: Arrow both
    ways, per-batch memory O(batch·frame), output column sized by
    data-dependent channels. In production the non-PNG branch becomes
    ``PIL.Image.open(...).resize((width, height))``.
    """
    from . import png

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
                if png.is_png(b):
                    arr = png.decode(b)
                    resized.append(png.encode(png.resize_nearest(arr, width, height)))
                    chans.append(arr.shape[2])
                    continue
                c = _fake_dims(b)[2]  # channels from the shared decode rule
                n = width * height * c
                resized.append((b * (n // len(b) + 1))[:n] if b else bytes(n))
                chans.append(c)
            yield pdf.assign(resized=resized, out_channels=chans)

    return df.mapInPandas(run, out_schema)
