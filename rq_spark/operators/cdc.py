"""Content-defined chunking (Gear rolling hash) for byte-level dedup.

Fixed-size chunking breaks on a one-byte insertion (every later chunk
shifts); CONTENT-DEFINED chunking (Muthitacharoen et al., LBFS 2001;
Xia et al., FastCDC 2016) cuts where a rolling hash of the last ~64
bytes hits a mask, so boundaries re-synchronize right after an edit
and shared byte ranges between near-identical blobs keep producing
identical chunks. On a training-data engine this is the sub-document
dedup layer under the token-level family (operators/dedup.py): shared
boilerplate, quoted passages, and re-crawled pages dedup at the chunk
level even when document-level hashes all differ — the storage/dedup
shape used by code-dataset and CommonCrawl pipelines.

Algorithm: Gear hash h' = ((h << 1) + GEAR[byte]) mod 2^64 — the
shift expires a byte's influence after 64 steps, giving an implicit
64-byte window with one add per byte. Cut after a byte where
(h & (avg_size-1)) == 0, subject to min_size (skip the mask test
entirely inside the minimum — FastCDC's "cut-point skipping") and
max_size (forced cut). The GEAR table is DERIVED, not magic: entry i
is the first 8 bytes of sha256("rq-gear-<i>") — reproducible by
anyone from the docstring.

Scale shape: chunking is one `mapInPandas` pass (embarrassingly
parallel, no state across rows); chunk identity is sha256 of the
chunk bytes, so global dup analysis is a groupBy on the chunk-hash
column — shuffle ∝ number of chunks, the same regime as every other
dedup family here. Nothing is collected; the per-doc report joins
chunk multiplicities back by hash.

Evidence: the catalog branch certifies LOSSLESSNESS per document
cross-engine (md5 of the re-concatenated chunks == the oracle's md5
of the original text — the excise-branch trick) plus the exact-twin
containment invariant (byte-identical docs must have every chunk
shared). Boundary-level behavior — shift-resynchronization, bound
enforcement, reference parity against a naive byte-loop — is pinned
in tests/test_cdc.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CDC_MIN = 16
CDC_AVG = 32
CDC_MAX = 128

_MASK64 = (1 << 64) - 1


def gear_table() -> list[int]:
    """The 256-entry Gear table: first 8 bytes (big-endian) of
    sha256("rq-gear-<i>")."""
    return [
        int.from_bytes(hashlib.sha256(f"rq-gear-{i}".encode()).digest()[:8], "big")
        for i in range(256)
    ]


_GEAR_NP: dict = {}  # dtype-keyed cached numpy gear tables


def _gear_np(_gear: list[int] | None, dtype):
    """Gear table as a numpy array of `dtype` — truncation to a small
    unsigned dtype keeps exactly the LOW bits, which is all the mask
    test reads (see chunk_boundaries). Cached per dtype for the
    default table."""
    import numpy as np

    if _gear is not None:
        return np.array([v & _MASK64 for v in _gear], dtype=np.uint64).astype(
            dtype
        )
    key = np.dtype(dtype).name
    if key not in _GEAR_NP:
        _GEAR_NP[key] = np.array(gear_table(), dtype=np.uint64).astype(dtype)
    return _GEAR_NP[key]


def chunk_boundaries(
    data: bytes,
    min_size: int = CDC_MIN,
    avg_size: int = CDC_AVG,
    max_size: int = CDC_MAX,
    _gear: list[int] | None = None,
) -> list[tuple[int, int]]:
    """(offset, length) chunk spans covering `data` exactly.

    The rolling hash is NOT reset at cut points (the last 64 bytes
    simply keep rolling); min_size applies per chunk via cut-point
    skipping, max_size forces a cut, and the final chunk may be
    shorter than min_size.

    Vectorized (r9): because the hash never resets, h_i is a pure
    64-tap window — h_i = Σ_{j<64} GEAR[byte_{i-j}]·2^j mod 2^64.
    The cut test only reads h & (avg_size−1): a term shifted by
    j ≥ m = log2(avg_size) contributes nothing below the mask, so
    candidate positions need just m shifted adds (5 for the default
    avg=32, NOT 64), and since only the low m bits matter the
    arithmetic runs in the smallest unsigned dtype that holds them
    (uint16 here — wraps mod 2^16 preserve bits < m ≤ 16; this
    numpy's uint64 lane is ~40× slower, measured). The min/max cut
    rules then walk only the mask-hit candidates (expected
    n/avg_size of them) with C bisect. Bit-identical to the per-byte
    reference (`_chunk_boundaries_scalar`, kept for the property
    tests' A/B); ~10-30× the reference's throughput on corpus-shaped
    docs."""
    if not 0 < min_size <= avg_size <= max_size:
        raise ValueError(
            f"cdc: need 0 < min={min_size} <= avg={avg_size} <= max={max_size}"
        )
    if avg_size & (avg_size - 1):
        raise ValueError(f"cdc: avg_size={avg_size} must be a power of two")
    n = len(data)
    if n == 0:
        return []
    import bisect

    import numpy as np

    m = max(1, (avg_size - 1).bit_length())  # taps that reach the mask
    dtype = np.uint16 if m <= 16 else np.uint32 if m <= 32 else np.uint64
    gv = _gear_np(_gear, dtype)[np.frombuffer(bytes(data), dtype=np.uint8)]
    h = gv.copy()
    for j in range(1, min(m, n)):
        h[j:] += gv[:-j] << dtype(j)
    cand = np.nonzero((h & dtype(avg_size - 1)) == 0)[0].tolist()

    out = []
    start = 0
    ncand = len(cand)
    while start < n:
        lo = start + min_size - 1  # first index where a mask cut counts
        forced = start + max_size - 1
        pos = bisect.bisect_left(cand, lo)
        cut = min(cand[pos], forced) if pos < ncand else forced
        if cut >= n:  # no boundary inside the data: trailing chunk
            out.append((start, n - start))
            break
        out.append((start, cut - start + 1))
        start = cut + 1
    return out


def _chunk_boundaries_scalar(
    data: bytes,
    min_size: int = CDC_MIN,
    avg_size: int = CDC_AVG,
    max_size: int = CDC_MAX,
    _gear: list[int] | None = None,
) -> list[tuple[int, int]]:
    """The naive per-byte reference implementation of
    `chunk_boundaries` — the executable spec the vectorized form is
    A/B-tested against (tests/test_cdc.py, tests/test_r8_properties)."""
    g = _gear if _gear is not None else gear_table()
    mask = avg_size - 1
    out = []
    h = 0
    start = 0
    clen = 0
    for i, b in enumerate(data):
        h = ((h << 1) + g[b]) & _MASK64
        clen += 1
        if (clen >= min_size and (h & mask) == 0) or clen >= max_size:
            out.append((start, clen))
            start = i + 1
            clen = 0
    if clen:
        out.append((start, clen))
    return out


_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc", T.LongType()),
        T.StructField("idx", T.IntegerType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("size", T.IntegerType()),
        T.StructField("chunk_sha", T.StringType()),
        T.StructField("recon_md5", T.StringType()),
    ]
)


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_size: int = CDC_MIN,
    avg_size: int = CDC_AVG,
    max_size: int = CDC_MAX,
) -> DataFrame:
    """(doc, idx, offset, size, chunk_sha, recon_md5): the CDC chunk
    relation over a text column's utf-8 bytes. `recon_md5` is the md5
    of the chunks re-concatenated in order — constant per doc, carried
    on every row so downstream aggregates can certify losslessness
    without rereading the corpus. A doc with empty text emits ONE row
    with size 0 (idx 0, chunk_sha of b"") so every document stays
    observable in the report."""
    # validate eagerly on the driver, not per executor batch
    chunk_boundaries(b"", min_size, avg_size, max_size)

    def run(batches):
        import pandas as pd

        g = gear_table()
        for pdf in batches:
            rows = []
            for doc, text in zip(pdf[id_col], pdf[text_col]):
                data = (text or "").encode("utf-8")
                spans = chunk_boundaries(
                    data, min_size, avg_size, max_size, _gear=g
                ) or [(0, 0)]
                recon = hashlib.md5(
                    b"".join(data[o : o + n] for o, n in spans)
                ).hexdigest()
                for idx, (o, n) in enumerate(spans):
                    rows.append(
                        (
                            int(doc),
                            idx,
                            o,
                            n,
                            hashlib.sha256(data[o : o + n]).hexdigest(),
                            recon,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _CHUNK_SCHEMA])

    return df.select(id_col, text_col).mapInPandas(run, _CHUNK_SCHEMA)


def cdc_doc_report(chunks: DataFrame) -> DataFrame:
    """Per-document chunk-dedup report off the chunk relation:
    (doc, n_chunks, total_bytes, dup_bytes, recon_md5) where
    dup_bytes counts bytes in chunks whose content appears in ≥ 2
    DISTINCT documents. One groupBy on chunk_sha (shuffle ∝ chunks)
    builds the multiplicity table; the join back is hash-to-hash."""
    mult = chunks.groupBy("chunk_sha").agg(
        F.count_distinct("doc").alias("_docs")
    )
    return (
        chunks.join(mult, "chunk_sha")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("size").cast("bigint").alias("total_bytes"),
            F.sum(F.when(F.col("_docs") >= 2, F.col("size")).otherwise(0))
            .cast("bigint")
            .alias("dup_bytes"),
            F.first("recon_md5").alias("recon_md5"),
        )
    )
