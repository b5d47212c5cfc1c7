"""Noise-immune ratio sentinels (rq_spark/bench_ref.py, r9 verdict
task #3): the interleaved sample/reference ratio must FLIP under a
synthetic slowdown of the measured key while staying flat when both
sides scale together (the ambient-load case wall-clock medians cannot
separate). Perf assertions follow the repo rule: ratios against a
kept reference measured in the same interleaved run, never absolute
wall time.
"""

from __future__ import annotations

import time

from rq_spark.bench_ref import pairwise_ratio, reference_job


def test_pairwise_ratio_arithmetic():
    # uniform load: both sides double -> ratio unchanged
    assert pairwise_ratio([2.0, 4.0, 2.0], [1.0, 2.0, 1.0]) == 2.0
    # regression: key doubles, reference flat -> ratio doubles
    assert pairwise_ratio([4.0, 4.0], [1.0, 1.0]) == 4.0
    # cancelled reference pairs drop; all-cancelled -> None
    assert pairwise_ratio([2.0, 3.0], [None, 1.0]) == 3.0
    assert pairwise_ratio([2.0], [None]) is None
    assert pairwise_ratio([], []) is None


def test_reference_job_is_pinned_and_data_independent():
    import inspect

    src = inspect.getsource(reference_job)
    # the yardstick must not read any table or scale with sf
    assert "read" not in src and "sf" not in src
    from rq_spark.bench_ref import REF_ROWS, REF_SLICES

    assert REF_ROWS == 800_000_000 and REF_SLICES == 32


def test_sleep_injection_flips_ratio_ambient_load_does_not(spark):
    """End-to-end mechanics on the live session: time a cheap 'key'
    interleaved with the reference, then the SAME key with an injected
    sleep — the ratio must rise by at least the injected share. Both
    measurements interleave the same reference in the same process, so
    ambient load cancels out of the comparison (the test_cdc.py
    comparative-floor pattern)."""

    from pyspark.sql import functions as F
    from rq_spark.bench_ref import REF_SLICES

    # one smoke run of the REAL pinned job (full size is ~4 s on the
    # 4-cpu test session; the interleave mechanics below use a
    # same-shape 1/100 twin to keep the suite fast)
    assert reference_job(spark).collect()[0][0] is not None

    def ref_once() -> float:
        t0 = time.time()
        (
            spark.range(0, 8_000_000, 1, REF_SLICES)
            .select(F.xxhash64(F.xxhash64(F.xxhash64("id"))).alias("h"))
            .agg(F.expr("bit_xor(h)"))
            .write.format("noop").mode("overwrite").save()
        )
        return time.time() - t0

    def key_once(sleep: float) -> float:
        t0 = time.time()
        # a small fixed JVM job standing in for a catalog key
        spark.range(0, 4_000_000, 1, 8).selectExpr(
            "bit_xor(xxhash64(id)) as s"
        ).write.format("noop").mode("overwrite").save()
        time.sleep(sleep)
        return time.time() - t0

    clean_s, clean_r, slow_s, slow_r = [], [], [], []
    for _ in range(3):
        clean_r.append(ref_once())
        clean_s.append(key_once(0.0))
        slow_r.append(ref_once())
        slow_s.append(key_once(0.75))
    clean = pairwise_ratio(clean_s, clean_r)
    slow = pairwise_ratio(slow_s, slow_r)
    assert clean is not None and slow is not None
    # the injected 0.75 s dwarfs the ~0.1-0.3 s clean key: the ratio
    # must at least double; ambient load cannot produce this because
    # it inflates the interleaved reference too
    assert slow / clean >= 2.0, (clean, slow)
