"""Content-defined chunking (operators/cdc.py).

The catalog branches dedup_text/'cdc' and 'cdc_dup' are
driver-hash-checked (losslessness + exact-twin containment); these
tests pin the boundary-level behavior the oracle can't see: the cut
rule against an independently re-derived rolling hash, bound
enforcement, and the defining CDC property — boundaries re-synchronize
after an insertion, so shared byte ranges keep producing identical
chunks (fixed-size chunking loses all of them).
"""

from __future__ import annotations

import hashlib
import random

import pytest

from rq_spark.operators.cdc import (
    CDC_AVG,
    CDC_MAX,
    CDC_MIN,
    cdc_chunks,
    cdc_doc_report,
    chunk_boundaries,
    gear_table,
)

random.seed(7)
DATA = bytes(random.randrange(256) for _ in range(4096))


def test_spans_cover_exactly_and_respect_bounds():
    spans = chunk_boundaries(DATA)
    pos = 0
    for o, n in spans:
        assert o == pos
        pos += n
    assert pos == len(DATA)
    for o, n in spans[:-1]:
        assert CDC_MIN <= n <= CDC_MAX
    assert 0 < spans[-1][1] <= CDC_MAX


def test_cuts_match_independently_rederived_gear_hash():
    """Re-derive the table and the rolling hash from the docstring
    spec (sha256("rq-gear-<i>") first 8 bytes, h' = (h<<1)+g[b] mod
    2^64) and verify every non-forced cut hits the mask and no
    eligible position before a cut was skipped."""
    g = [
        int.from_bytes(hashlib.sha256(f"rq-gear-{i}".encode()).digest()[:8], "big")
        for i in range(256)
    ]
    assert g == gear_table()
    mask = CDC_AVG - 1
    h = 0
    hits = []  # 1-based positions where the masked hash fires
    for i, b in enumerate(DATA):
        h = ((h << 1) + g[b]) & ((1 << 64) - 1)
        if h & mask == 0:
            hits.append(i + 1)
    hitset = set(hits)
    end = 0
    for o, n in chunk_boundaries(DATA)[:-1]:
        end = o + n
        if n < CDC_MAX:  # a content cut, not a forced one
            assert end in hitset, (o, n)
        # cut-point skipping: no eligible hit inside (o+MIN, end)
        assert not any(o + CDC_MIN <= p < end for p in hits), (o, n)


def test_boundaries_resync_after_insertion():
    """THE content-defined property: prepend 7 bytes and most chunk
    hashes survive, because boundaries depend on local content, not
    absolute offsets. Fixed-size chunking keeps zero."""
    shifted = b"junk-7b" + DATA
    orig = {hashlib.sha256(DATA[o : o + n]).digest() for o, n in chunk_boundaries(DATA)}
    moved = {
        hashlib.sha256(shifted[o : o + n]).digest()
        for o, n in chunk_boundaries(shifted)
    }
    assert len(orig & moved) >= len(orig) * 0.8
    fixed_orig = {DATA[i : i + CDC_AVG] for i in range(0, len(DATA), CDC_AVG)}
    fixed_moved = {shifted[i : i + CDC_AVG] for i in range(0, len(shifted), CDC_AVG)}
    assert not fixed_orig & fixed_moved


def test_validation_and_degenerates():
    assert chunk_boundaries(b"") == []
    assert chunk_boundaries(b"abc") == [(0, 3)]  # shorter than MIN
    with pytest.raises(ValueError):
        chunk_boundaries(DATA, min_size=0)
    with pytest.raises(ValueError):
        chunk_boundaries(DATA, avg_size=33)  # not a power of two
    with pytest.raises(ValueError):
        chunk_boundaries(DATA, min_size=64, avg_size=32)


def test_spark_chunks_match_driver_and_report(spark):
    texts = [
        (0, "alpha beta gamma delta " * 20),
        (1, "alpha beta gamma delta " * 20),  # exact twin of 0
        (2, "completely different content with no repeats here"),
        (3, ""),  # empty doc stays observable
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    chunks = cdc_chunks(df, "text", "doc_id")
    got = {}
    for r in chunks.collect():
        got.setdefault(r["doc"], []).append((r["idx"], r["offset"], r["size"], r["chunk_sha"]))
    for doc, text in texts:
        data = text.encode()
        want = chunk_boundaries(data) or [(0, 0)]
        rows = sorted(got[doc])
        assert [(o, n) for _, o, n, _ in rows] == want
        for _, o, n, sha in rows:
            assert sha == hashlib.sha256(data[o : o + n]).hexdigest()

    rep = {r["doc"]: r for r in cdc_doc_report(chunks).collect()}
    for doc in (0, 1):  # exact twins: every chunk shared
        assert rep[doc]["dup_bytes"] == rep[doc]["total_bytes"] > 0
        assert rep[doc]["recon_md5"] == hashlib.md5(texts[doc][1].encode()).hexdigest()
    assert rep[2]["dup_bytes"] == 0
    assert rep[3]["total_bytes"] == 0 and rep[3]["n_chunks"] == 1
    assert rep[3]["recon_md5"] == hashlib.md5(b"").hexdigest()


def test_vectorized_boundaries_equal_scalar_reference():
    """The tap-pruned uint16 form must reproduce the naive per-byte
    walk boundary-for-boundary on arbitrary data and parameters —
    including the dtype-selection edges (avg 65536 → uint16 limit,
    131072 → uint32)."""
    import random

    from rq_spark.operators.cdc import _chunk_boundaries_scalar

    rng = random.Random(42)
    cases = [(4, 16, 32), (1, 1, 8), (2, 2, 2), (8, 64, 64),
             (1, 2, 300), (1, 65536, 70000), (3, 131072, 200000)]
    for trial in range(120):
        n = rng.choice([0, 1, 2, 15, 16, 17, 63, 64, 65, 127, 128, 500])
        data = bytes(rng.randrange(256) for _ in range(n))
        assert chunk_boundaries(data) == _chunk_boundaries_scalar(data)
        mn, av, mx = cases[trial % len(cases)]
        g = [rng.getrandbits(64) for _ in range(256)]
        assert chunk_boundaries(data, mn, av, mx, _gear=g) == (
            _chunk_boundaries_scalar(data, mn, av, mx, _gear=g)
        )


def test_vectorized_boundaries_outrun_scalar_reference():
    """Load-immune throughput floor: the tap-pruned numpy form must
    beat the naive per-byte walk by ≥2x on the same input measured
    back-to-back (measured ~4-8x; both paths slow equally under
    ambient load, so the RATIO holds where an absolute wall floor
    would flake)."""
    import random
    import time

    from rq_spark.operators.cdc import _chunk_boundaries_scalar

    rng = random.Random(9)
    data = bytes(rng.randrange(256) for _ in range(512 * 1024))
    chunk_boundaries(data)  # warm the cached gear table
    fast_t, ref_t = [], []
    for _ in range(3):  # interleaved best-of-3: noise hits both sides
        t0 = time.perf_counter()
        fast = chunk_boundaries(data)
        t1 = time.perf_counter()
        ref = _chunk_boundaries_scalar(data)
        t2 = time.perf_counter()
        fast_t.append(t1 - t0)
        ref_t.append(t2 - t1)
    assert fast == ref
    assert min(ref_t) >= 2.0 * min(fast_t), (
        f"vectorized {min(fast_t):.3f}s vs scalar {min(ref_t):.3f}s — "
        "regressed toward the per-byte shape"
    )
