"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Design for 100 TB (the whole point of these over a pairwise loop):

* exact: one hash-shuffle on the normalized key — Spark's groupBy does
  map-side partial aggregation, so shuffled bytes ∝ distinct keys.
* n-gram Jaccard: explode *distinct* shingles, self-join on shingle.
  Cost ∝ Σ postings² per shingle — fine for verification and small
  corpora, quadratic in the worst case; the scale path is MinHash-LSH.
* MinHash-LSH: signatures in one pass per document (aggregate fold,
  no Python), banding → candidates via equi-join on (band, hash) —
  work ∝ true near-duplicates, not n². Candidates are then verified
  with *exact* Jaccard, and that verification is candidate-bounded
  (join candidates→shingles, never shingles→shingles).
* SimHash: 64-bit signature via a vectorized pandas UDF, near-dup
  candidates by exact-match on 16-bit bands (Hamming ≤ 3 guarantee
  needs ≥ 4 bands), verified by popcount on the XOR.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

I64_MAX = (1 << 63) - 1

# --------------------------------------------------------------------------
# normalization / exact
# --------------------------------------------------------------------------


def normalize_text(col: Column) -> Column:
    """lower + collapse whitespace + trim (the canonical dedup key)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct normalized text: representative id + count."""
    return (
        df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("_norm"))
        .groupBy("_norm")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("rep_id", "n_dups")
    )


# --------------------------------------------------------------------------
# shingling + exact jaccard
# --------------------------------------------------------------------------


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) pairs, distinct per document."""
    norm = normalize_text(F.col(text_col)).alias("_norm")
    words = F.split(F.col("_norm"), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return (
        df.select(F.col(id_col).alias("doc"), norm)
        .select("doc", F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def jaccard_pairs(
    sh: DataFrame, threshold: float, candidates: DataFrame | None = None
) -> DataFrame:
    """Exact Jaccard over shingle sets.

    Without candidates: full shingle self-join (verification tool).
    With candidates (a_id, b_id): candidate-bounded — intersections are
    computed by joining candidates→shingles, so cost ∝ |candidates|.
    """
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    if candidates is None:
        a = sh.select(F.col("doc").alias("a_id"), "shingle")
        b = sh.select(F.col("doc").alias("b_id"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("a_id") < F.col("b_id"))
            .groupBy("a_id", "b_id")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    else:
        a_sh = candidates.join(
            sh.select(F.col("doc").alias("a_id"), "shingle"), "a_id"
        )
        inter = (
            a_sh.join(
                sh.select(F.col("doc").alias("b_id"), "shingle"),
                ["b_id", "shingle"],
            )
            .groupBy("a_id", "b_id")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    sa = sizes.select(F.col("doc").alias("a_id"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc").alias("b_id"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            (F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 128
) -> DataFrame:
    """Per-doc MinHash signature as num_hashes algebraic MIN aggregates:
    sig[k] = min over shingles of xxhash64(shingle, k).

    min() is algebraic, so Spark computes partial minima map-side and
    shuffles ONE num_hashes-wide row per (doc, partition) — versus a
    collect_list of every per-shingle hash array, whose shuffle bytes
    grow with total shingle count. At 100 TB that difference is the
    whole ballgame: shuffled bytes ∝ docs, not ∝ corpus tokens."""
    mins = [
        F.min(F.xxhash64("shingle", F.lit(k))).alias(f"_h{k}")
        for k in range(num_hashes)
    ]
    return (
        sh.groupBy("doc")
        .agg(*mins)
        .select("doc", F.array(*[f"_h{k}" for k in range(num_hashes)]).alias("sig"))
    )


def lsh_candidates(sig: DataFrame, bands: int, rows: int) -> DataFrame:
    """Band the signature, hash each band, equi-join on (band, hash).
    This is the scale path: a shuffle on band-hash instead of n²."""
    banded = sig.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice("sig", b * rows + 1, rows)),
            )
        ).alias("band", "bhash"),
    )
    a = banded.select(F.col("doc").alias("a_id"), "band", "bhash")
    b = banded.select(F.col("doc").alias("b_id"), "band", "bhash")
    return (
        a.join(b, ["band", "bhash"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Full pipeline: shingle → MinHash → LSH candidates → exact-Jaccard
    verify. With 32 bands × 4 rows, P(miss) at j=0.8 is (1-0.8⁴)³² ≈ 5e-8,
    so the verified output equals the exact-Jaccard pair set w.h.p. —
    which is what the DuckDB oracle checks."""
    sh = shingles(df, text_col, id_col, n=shingle_n)
    sig = minhash_signatures(sh, num_hashes=num_hashes)
    cand = lsh_candidates(sig, bands=bands, rows=num_hashes // bands)
    return jaccard_pairs(sh, threshold, candidates=cand)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


@F.pandas_udf(T.LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens (vectorized per Arrow batch).

    Bit-twiddling over variable-length token lists is the rare case
    where a pandas UDF beats 64 fold expressions; the hash itself is
    Python's blake2b (stable, seedless) so results are deterministic
    across workers and runs.
    """
    import hashlib

    out = []
    for t in texts:
        votes = [0] * 64
        for tok in (t or "").lower().split():
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
            )
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        v = 0
        for i in range(64):
            if votes[i] > 0:
                v |= 1 << i
        # to signed 64-bit
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return pd.Series(out, dtype="int64")


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash banding: split the 64-bit signature
    into 4×16-bit bands — any pair within Hamming distance 3 shares at
    least one exact band (pigeonhole) — then verify with popcount."""
    sig = df.select(
        F.col(id_col).alias("doc"), simhash64_udf(F.col(text_col)).alias("sig")
    )
    banded = sig.select(
        "doc",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("sig", b * 16).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band", "bval"),
    )
    a = banded.select(
        F.col("doc").alias("a_id"), F.col("sig").alias("a_sig"), "band", "bval"
    )
    b = banded.select(
        F.col("doc").alias("b_id"), F.col("sig").alias("b_sig"), "band", "bval"
    )
    return (
        a.join(b, ["band", "bval"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sig", "b_sig")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
