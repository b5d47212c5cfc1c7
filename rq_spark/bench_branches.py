"""Per-branch bench attribution for the multi-branch headline keys.

A BENCH total per catalog key cannot distinguish "regression" from
"added work" once a key carries 2-9 tagged branches (r8: the asof key
read 4.8x its r7 time purely because it grew from one merge_asof
direction to three). This registry exposes a SOLO
``(spark, sf_dir) -> DataFrame`` callable per tagged branch of every
multi-branch headline key, so ``bench.py`` records a per-branch
median in the driver artifact (``BENCH_r{N}.json["branches"]``) and
branch growth stays separable from regressions WITHOUT session-local
A/B notes.

Two isolation mechanisms:

* **filter-pruned** (default): for union-tagged keys,
  ``key(...).filter(op == tag)`` pushes the filter into each union
  child where ``lit(tag) == tag`` constant-folds, so Catalyst prunes
  every other branch to an empty LocalRelation — the remaining plan
  is exactly the branch's own scan/shuffle work
  (tests/test_bench_branches.py asserts the pruned plan shape).
* **solo builders**: branches whose work happens at BUILD time get
  explicit single-branch builders calling the underlying operators
  with the catalog's exact parameters — the explode-fused asof
  directions (the catalog computes all three in one window pass, so a
  post-explode filter would still pay the fused pass) and the graph
  family (driver-side iteration loops with per-round checkpoints run
  during construction, before any filter could prune).

Branch-cost semantics: a solo number INCLUDES the branch's required
inputs (e.g. each graph solo rebuilds the LSH edge relation the
catalog key shares across its three branches; each asof solo pays its
own shuffle+sort where the catalog pays one for all three). Solo
times therefore need not sum to the key total — the DELTA is the
fusion win, which this registry makes measurable per round.

``stream_stateful`` gets solo builders too (r10, r9 verdict task #2):
each branch runs ALONE as its own bounded streaming query through the
same `run_many_to_memory` runner and no-data-microbatch setting the
catalog key uses. A solo stream pays its own micro-batch fixed costs
that the concurrent catalog key overlaps — per the branch-cost
semantics above, the solos need not sum to the key total and the
delta IS the concurrency win (r9 session notes measured solo
interval_join 8.3s + first_seen 4.5s + running 3.5s vs the 14.3s
concurrent key).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# headline keys whose union-tagged branches prune under an `op` filter
FILTER_PRUNED: dict[str, tuple[str, ...]] = {
    "distinct_sort_sample": (
        "distinct", "sort_limit", "sample", "stratified", "mixture",
        "mixture_budget", "mixture_temp", "mixture_unimax", "domain_cap",
    ),
    "set_ops": (
        "union", "intersect", "except",
        "diff_added", "diff_removed", "diff_changed",
    ),
    "agg_groupby_distinct": (
        "groupby", "distinct", "topk_words", "copair", "copair_stats",
    ),
    "rollup_cube_gsets": ("rollup", "cube", "gsets"),
    "window_frames": ("running", "trailing_30d", "ewma"),
    "window_agg_time": ("tumble", "slide", "transition"),
    "event_sessions_rate": ("session", "rate", "funnel", "retention"),
    "sim_topk_cosine": ("cosine", "bm25"),
    "dedup_text": (
        "exact", "minhash_lsh", "ngram_jaccard", "span", "excise",
        "cdc", "cdc_dup",
    ),
    "dedup_incremental": (
        "ingest_probe", "decontam", "bloom_decontam", "bloom_stats",
        "sem_decontam", "blocklist",
    ),
    "explode_ops": ("posexplode", "explode_outer", "chunk"),
    "udf_grouped_table": ("apply_in_pandas", "udtf"),
}

#: headline keys with tagged branches that a filter cannot isolate —
#: each must have explicit solo builders below, or be excluded with a
#: reason in EXCLUDED.
SOLO_BUILT = ("join_asof_event", "dedup_connected_groups", "stream_stateful")
EXCLUDED: tuple[str, ...] = ()


def _asof_solo(direction: str) -> Callable[[SparkSession, str], DataFrame]:
    """The catalog's asof inputs through the SINGLE-direction operator
    (operators/asof.py:asof_join) — the r1 headline shape, so the solo
    number is directly comparable to the r1 BASELINE key."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .operators.asof import asof_join
        from .queries.helpers import table

        e = table(spark, sf_dir, "events")
        views = e.filter(F.col("event_type") == "view").select(
            "user_id", "ts", F.col("value").alias("view_value")
        )
        purchases = e.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        )
        return asof_join(purchases, views, "user_id", "ts", direction=direction)

    return q


def _graph_solo(which: str) -> Callable[[SparkSession, str], DataFrame]:
    """One graph branch over the catalog's exact LSH edge relation
    (the shared input is rebuilt per solo — included cost, see module
    doc)."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .operators import dedup as D
        from .operators.graph import pagerank_fixed, triangle_counts
        from .queries.dedup import _JACCARD_T
        from .queries.helpers import table
        from .util import release_caches

        release_caches("bench_branch_graph")
        docs = table(spark, sf_dir, "documents")
        # localCheckpoint, mirroring the catalog key (r14 opt): a solo
        # that kept persist+count would time the giant-plan driver
        # re-optimization the key no longer pays, attributing a cost
        # that does not exist in the branch it stands for
        pairs = D.minhash_dedup_pairs(
            docs, "text", "doc_id", threshold=_JACCARD_T
        ).localCheckpoint()
        nodes = docs.select(F.col("doc_id").alias("node"))
        if which == "components":
            return D.connected_components(pairs, nodes)
        if which == "pagerank":
            return pagerank_fixed(pairs, nodes)
        if which == "inc_components":
            from .queries.dedup import inc_components_branch

            return inc_components_branch(pairs, nodes)
        if which == "inc_standing":
            from .queries.dedup import inc_components_standing

            return inc_components_standing(pairs, nodes)
        if which == "evict_components":
            from .queries.dedup import evict_components_branch

            return evict_components_branch(pairs, nodes)
        if which == "evict_delta":
            from .queries.dedup import evict_delta_branch

            return evict_delta_branch(pairs, nodes)
        return triangle_counts(pairs, nodes)

    return q


def phase_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Attribution-only PHASE solos (r12, r11 verdict task #5) — NOT
    registry branches: they carry no catalog `op` tag, so they are
    kept out of `branch_queries()` (whose tags must mirror the keys'
    own output, tests/test_bench_branches.py) and out of the bench
    sweep budget. `inc_standing` runs the inc_components branch's
    standing fixed point with the SAME shared-edge build as the full
    solo, so the two chained absorbs' true marginal cost is
    t(dedup_connected_groups/inc_components) − t(inc_standing) — the
    branch recomputes the standing fixed point every run (inherent to
    a read-only driver), and the key's total alone cannot say whether
    the absorb step or the standing recompute is what costs. Measured
    per round into SURVEY §6."""
    return {"dedup_connected_groups/inc_standing": _graph_solo("inc_standing")}


def _stream_solo(which: str) -> Callable[[SparkSession, str], DataFrame]:
    """One stream_stateful branch as a SOLO bounded streaming query —
    same source, operator, output mode, runner, and no-data-microbatch
    setting as the catalog key, minus the other two concurrent streams.
    The streaming work happens at BUILD time (run_many_to_memory drains
    the query before returning), matching the graph solos' semantics."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .streaming import (
            first_seen_per_user,
            interval_join,
            run_many_to_memory,
            running_user_stats,
            stream_events,
        )

        nodata = "spark.sql.streaming.noDataMicroBatches.enabled"
        prev = spark.conf.get(nodata, "true")
        spark.conf.set(nodata, "false")
        try:
            if which == "first_seen":
                sdf = first_seen_per_user(stream_events(spark, sf_dir))
            elif which == "interval_join":
                sdf = interval_join(
                    stream_events(spark, sf_dir), stream_events(spark, sf_dir)
                )
            else:
                sdf = running_user_stats(stream_events(spark, sf_dir))
            (res,) = run_many_to_memory([(sdf, "append")])
        finally:
            spark.conf.set(nodata, prev)
        return res

    return q


def _pruned(
    key: str, tag: str
) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .queries import all_queries

        return all_queries()[key](spark, sf_dir).filter(F.col("op") == tag)

    return q


def branch_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """``{"key/tag": callable}`` for every attributed branch."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for key, tags in FILTER_PRUNED.items():
        for tag in tags:
            out[f"{key}/{tag}"] = _pruned(key, tag)
    for d in ("backward", "forward", "nearest"):
        out[f"join_asof_event/{d}"] = _asof_solo(d)
    for g in (
        "components", "pagerank", "triangles", "inc_components",
        "evict_components", "evict_delta",
    ):
        out[f"dedup_connected_groups/{g}"] = _graph_solo(g)
    for s in ("first_seen", "interval_join", "running"):
        out[f"stream_stateful/{s}"] = _stream_solo(s)
    return out
