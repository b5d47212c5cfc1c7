"""Pinned reference computation for bench.py's noise-immune ratio
sentinels (r10, r9 verdict task #3).

Problem: per-key wall-clock medians on this box carry ±30% ambient
machine noise between runs (documented across r8/r9 — identical code
measured 5.4-15.9 s), so a real 25% regression on a heavy key is
indistinguishable from a loud neighbor process in the driver artifact.

Fix: interleave every timed sample of a priority key with a PINNED
reference computation — fixed row count, fixed parallelism, fixed
expression, zero data dependence — and report the median of the
pairwise sample/reference ratios. Ambient CPU contention inflates both
sides of a pair (both are scheduler-bound JVM work on the same cores
at the same moment); a code regression inflates only the key. The
same discipline as tests/test_cdc.py's comparative throughput floors:
assert ratios against a kept reference, never absolute seconds.

The reference is sized to ~0.5-1 s on the 32-thread harness — long
enough to sample the machine's current throughput, short enough that
3 interleaved pairs per priority key cost the bench <20 s total.
"""

from __future__ import annotations

import statistics

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fixed size/parallelism: NEVER scale these with sf — the reference
#: must measure the machine, not the data. Sized (measured, r10) so
#: one run is ~0.5 s on the 32-thread harness: big enough that the
#: ~±0.05 s scheduling jitter is <10% of the denominator, small
#: enough that 3 interleaved pairs per priority key cost <10 s.
REF_ROWS = 800_000_000
REF_SLICES = 32


def reference_job(spark: SparkSession) -> DataFrame:
    """The pinned yardstick: a whole-stage-codegen chained-xxhash64
    fold over a fixed range — CPU-bound on every core, shuffle-light
    (one scalar per slice), byte-stable across rounds. The fold is
    bit_xor, not sum: full 64-bit hashes overflow an ANSI-mode long
    sum. Callers must run it 1-2 times UNCOUNTED first (bench.py
    does): the first runs carry codegen compile + JIT warm-in. Any
    change here invalidates ratio comparisons against earlier
    artifacts; bump ``REF_ROWS`` only with a note in SURVEY."""
    return (
        spark.range(0, REF_ROWS, 1, REF_SLICES)
        .select(F.xxhash64(F.xxhash64(F.xxhash64("id"))).alias("h"))
        .agg(F.expr("bit_xor(h)").alias("s"))
    )


#: fixed size/parallelism for the SHUFFLE sentinel (r13, r12 verdict
#: task #4) — like REF_ROWS, these measure the machine, never the
#: data. Sized so one run is ~0.5 s on the 32-thread harness.
SHUF_ROWS = 12_000_000
SHUF_PARTS = 32


def shuffle_reference_job(spark: SparkSession) -> DataFrame:
    """A pinned SHUFFLE-BOUND yardstick next to the CPU-bound one: a
    fixed-size repartition + hash aggregation whose cost is dominated
    by the exchange (row serialization → transfer → hash-agg), not
    arithmetic. Why two sentinels: the xxhash fold above co-scales with
    ambient CPU contention only — r12's driver run showed a memory/IO
    saturation mode that inflated the shuffle-heavy keys 2× while the
    CPU denominator barely moved, so the ratio READ HIGH under pure
    machine load (the judge needed an idle-box reproduction to
    adjudicate it). The (cpu_ref, shuffle_ref) PAIR on the final line
    makes that mode self-diagnosing: cpu up → CPU-bound ambient load;
    shuffle up with cpu flat → memory/IO pressure (distrust the heavy
    keys' ratios); both flat with a key up → a real regression. Timed
    ONCE per bench run (not per pair — it characterizes the run's
    environment, not each sample's). Any size change invalidates
    comparisons with earlier artifacts; note it in SURVEY §6."""
    return (
        spark.range(0, SHUF_ROWS, 1, SHUF_PARTS)
        .select(
            (F.col("id") % 1_000_003).alias("k"),
            F.xxhash64("id").alias("v"),
        )
        .repartition(SHUF_PARTS, F.col("k"))
        .groupBy("k")
        .agg(F.expr("bit_xor(v)").alias("s"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(s)").alias("x"))
    )


def pairwise_ratio(samples: list[float], refs: list[float]) -> float | None:
    """Median of the per-pair sample/reference ratios. Pairs where the
    reference was cancelled/failed (None or 0) are dropped; returns
    None when no valid pair remains (the artifact then simply omits
    the key's ratio rather than carrying a fake one)."""
    pairs = [
        s / r
        for s, r in zip(samples, refs)
        if s is not None and r is not None and r > 0
    ]
    if not pairs:
        return None
    return statistics.median(pairs)
