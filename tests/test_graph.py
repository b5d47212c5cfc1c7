"""Fixed-point PageRank (operators/graph.py).

The catalog branch dedup_connected_groups/'pagerank' is
driver-hash-checked against the unrolled-CTE DuckDB oracle; these
tests pin the operator against an INDEPENDENT float reference (same
update rule in numpy-style Python) and its structural invariants:
mass conservation, singleton floor, and validation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rq_spark.operators.graph import pagerank_fixed

EDGES = [(1, 2), (1, 3), (1, 4), (2, 3), (5, 6)]
NODES = list(range(1, 10))  # 7, 8, 9 are isolated sinks; 1 is a hub
SCALE = 10**10


def _float_pagerank(edges, nodes, iters=5, damping=0.85):
    """Independent reference: synchronous PageRank with uniform
    teleport + dangling redistribution, plain floats."""
    out = {}
    sym = edges + [(b, a) for a, b in edges]
    for a, _ in sym:
        out[a] = out.get(a, 0) + 1
    n = len(nodes)
    r = {v: 1.0 for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for a, b in sym:
            contrib[b] += r[a] / out[a]
        dang = sum(r[v] for v in nodes if v not in out)
        r = {v: (1 - damping) + damping * (contrib[v] + dang / n) for v in nodes}
    return r


@pytest.fixture(scope="module")
def ranked(spark):
    edges = spark.createDataFrame(EDGES, ["a_id", "b_id"])
    nodes = spark.createDataFrame([(v,) for v in NODES], ["node"])
    return {r["node"]: r["pr"] for r in pagerank_fixed(edges, nodes).collect()}


def test_matches_float_reference(ranked):
    ref = _float_pagerank(EDGES, NODES)
    for v in NODES:
        assert ranked[v] / SCALE == pytest.approx(ref[v], abs=1e-6), v


def test_mass_conserved_and_ordering(ranked):
    # floor-division loses < 1 unit per node per round
    total = sum(ranked.values())
    assert len(NODES) * SCALE - len(NODES) * 10 <= total <= len(NODES) * SCALE
    # the hub outranks the detached pair, which outranks isolated sinks
    assert ranked[1] > ranked[5] > ranked[7]
    # isolated sinks all get the identical teleport+dangling share
    assert ranked[7] == ranked[8] == ranked[9]


def test_directed_mode(spark):
    """undirected=False must NOT symmetrize: 1→2 gives 2 rank but 1
    none back (1 becomes a non-sink source, 2 a sink)."""
    edges = spark.createDataFrame([(1, 2)], ["a_id", "b_id"])
    nodes = spark.createDataFrame([(1,), (2,)], ["node"])
    r = {x["node"]: x["pr"] for x in pagerank_fixed(edges, nodes, undirected=False).collect()}
    assert r[2] > r[1]


def test_validation(spark):
    edges = spark.createDataFrame([(1, 2)], ["a_id", "b_id"])
    nodes = spark.createDataFrame([(1,), (2,)], ["node"])
    with pytest.raises(ValueError):
        pagerank_fixed(edges, nodes, iters=0)
    with pytest.raises(ValueError):
        pagerank_fixed(edges, nodes, damping_pct=100)
    with pytest.raises(ValueError):
        pagerank_fixed(edges, nodes, scale=1 << 62)


def test_triangle_counts(spark):
    """K4 on {1,2,3,4} (4 triangles, 3 per node), a pendant 4-5, an
    isolated 6: counts match combinatorics; every node appears."""
    from rq_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 5)], ["a_id", "b_id"])
    nodes = spark.createDataFrame([(v,) for v in range(1, 7)], ["node"])
    got = {r["node"]: r["tri"] for r in triangle_counts(edges, nodes).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0}


def test_pagerank_plan_depth_is_bounded_by_checkpoint(spark):
    """The scale contract of the iterative loop: each round's eager
    (local)checkpoint truncates lineage, so the FINAL plan reads a
    materialized RDD scan instead of replaying all prior rounds — the
    plan depth is O(1) in iters, not O(iters)."""
    from rq_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame(EDGES, ["a_id", "b_id"])
    nodes = spark.createDataFrame([(v,) for v in NODES], ["node"])
    def ops(iters):
        p = (
            pagerank_fixed(edges, nodes, iters=iters)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Scan ExistingRDD" in p  # reads the checkpoint, not lineage
        return p.count("Join"), p.count("Exchange")

    # doubling the iterations must not grow the consumer-visible plan:
    # same operator counts, because rounds 1..n-1 live behind the
    # materialized checkpoint scan
    assert ops(6) == ops(3)
