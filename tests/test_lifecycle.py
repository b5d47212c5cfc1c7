"""Composed takedown orchestration (r14, r13 verdict task #2).

A complete takedown used to be 4-5 manual calls in a pinned order; a
crash BETWEEN families left a cross-family inconsistency (index says
deleted, labels still cluster the doc) that nothing detected or
repaired. `lifecycle.takedown` composes the order under a write-ahead
intent journal. Pinned here, per the verdict's DONE criteria:

* the composed takedown leaves every family consistent: the index
  stops serving the ids, the ledger stops serving their edges, the
  labels equal a full CC recompute over the surviving graph, and the
  journal is clean;
* EVERY inter-family crash window is failure-injected: the crash
  leaves a DETECTABLE pending intent (and `assert_taken_down` shows
  which families are stale), and `resume_takedowns` replays to the
  exact clean-run end state — idempotent re-delete proven for the
  COMPOSITION, not just per family;
* a replay of an already-completed takedown is a no-op.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from rq_spark import lifecycle as L
from rq_spark.operators import dedup as D

JOURNAL = None  # journal_base defaults to labels_base


def _s64(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def _corpus():
    """Signatures with planted near-dups so the hamming index, the
    ledger, and the labels all have real structure: docs 1000+i are
    2-bit flips of docs i (i < 12)."""
    rnd = random.Random(7)
    base = [rnd.getrandbits(64) for _ in range(40)]
    rows = [(i, _s64(v)) for i, v in enumerate(base)]
    for i in range(12):
        rows.append(
            (1000 + i, _s64(base[i] ^ (1 << i) ^ (1 << (i + 17))))
        )
    return rows


def _drop_all(spark, ibase, lbase, ebase):
    for b, suf in (
        (ibase, ("hbands", "meta", "state", "tombstones")),
        (lbase, ("labels", "meta", "state", "tombstones", "tdlog")),
        (ebase, ("edges", "meta", "state", "tombstones")),
    ):
        for t in suf:
            spark.sql(f"DROP TABLE IF EXISTS {b}_{t}")
    for b, t in ((lbase, "labels"), (lbase, "meta"), (ebase, "edges"), (ebase, "meta")):
        for extra in ("__rewrite", "__prewrite"):
            spark.sql(f"DROP TABLE IF EXISTS {b}_{t}{extra}")


def _labels(df):
    return {(r.node, r.rep) for r in df.collect()}


def _eset(df):
    return {(r.a_id, r.b_id) for r in df.collect()}


def _stand_up(spark, ibase, lbase, ebase, tag):
    """Day 0 of the loop: index + pair ledger + labels, all persisted."""
    rows = _corpus()
    sig = spark.createDataFrame(rows, "doc long, sig long")
    D.write_hamming_index(sig, ibase, bands=4)
    pairs = D.hamming_near_pairs_from_index(spark, ibase).select(
        "a_id", "b_id"
    ).localCheckpoint()
    nodes = sig.select(F.col("doc").alias("node"))
    labels = D.connected_components(pairs, nodes, scope=f"lc_cc0_{tag}")
    D.write_labels(labels, lbase)
    D.write_edge_ledger(pairs, ebase)
    return rows, _eset(pairs)


def _expected_after(spark, rows, pairs, victims, tag):
    """The clean-run end state, recomputed independently: labels = CC
    over the surviving graph; ledger = surviving edges; index = no
    victim in any probe."""
    surv_edges = [(a, b) for a, b in pairs if not ({a, b} & set(victims))]
    surv_nodes = [(d,) for d, _ in rows if d not in victims]
    want = _labels(
        D.connected_components(
            spark.createDataFrame(surv_edges or [(None, None)], "a_id long, b_id long").filter(
                F.col("a_id").isNotNull()
            ),
            spark.createDataFrame(surv_nodes, "node long"),
            scope=f"lc_ccf_{tag}",
        )
    )
    return want, set(surv_edges)


def _final_state(spark, ibase, lbase, ebase):
    scan = {
        (r.a_id, r.b_id)
        for r in D.hamming_near_pairs_from_index(spark, ibase).collect()
    }
    return scan, _labels(D.read_labels(spark, lbase)), _eset(
        D.read_edge_ledger(spark, ebase)
    )


def test_takedown_composes_and_journal_closes(spark):
    ibase, lbase, ebase = "t_lc_idx", "t_lc_lbl", "t_lc_led"
    victims = [2, 1003]  # a corpus doc and a near-dup twin
    try:
        rows, pairs = _stand_up(spark, ibase, lbase, ebase, "c1")
        ids = spark.createDataFrame([(v,) for v in victims], "node long")
        td = L.takedown(
            spark, ids, {ibase: "doc"}, labels_base=lbase, ledger_base=ebase,
            evict_kwargs={"scope": "lc_ev_c1"},
        )
        assert L.pending_takedowns(spark, lbase) == []
        want_labels, want_edges = _expected_after(
            spark, rows, pairs, victims, "c1"
        )
        scan, got_labels, got_edges = _final_state(spark, ibase, lbase, ebase)
        assert got_labels == want_labels
        assert got_edges == want_edges
        assert all(not ({a, b} & set(victims)) for a, b in scan)
        status = L.assert_taken_down(
            spark, ids, {ibase: "doc"}, labels_base=lbase, ledger_base=ebase
        )
        assert set(status.values()) == {0}, status

        # replaying the SAME completed takedown is a no-op
        L.resume_takedowns(
            spark, {ibase: "doc"}, labels_base=lbase, ledger_base=ebase,
            evict_kwargs={"scope": "lc_ev_c1r"},
        )
        assert _final_state(spark, ibase, lbase, ebase) == (
            scan, got_labels, got_edges,
        )
        assert isinstance(td, str) and td
    finally:
        _drop_all(spark, ibase, lbase, ebase)


@pytest.mark.parametrize(
    "crash_step",
    [
        "index_tombstone",
        "ledger_prune",
        "labels_evict",
        "labels_append",
        "labels_tombstone",
        "labels_write_full",
        "done_marker",
    ],
)
def test_takedown_crash_windows_detect_and_resume(spark, monkeypatch, crash_step):
    """Every seam of the composition dies once; each crash leaves a
    PENDING journal intent (detectable), `assert_taken_down` exposes
    the stale families, and one `resume_takedowns` converges to the
    exact clean-run end state. The label seams cover BOTH modes:
    the default ∝-touched path (`labels_append` = crash between the
    delta compute and its append; `labels_tombstone` = the
    append-then-tombstone window, survivors already relabeled while
    the victims still stand — the detectable direction the order is
    chosen for) and the full-rewrite path (`labels_write_full`, run
    with ``incremental_labels=False``; its resume deliberately runs
    the DEFAULT mode, pinning that a replay may switch modes)."""
    from rq_spark import bucketing as B

    ibase, lbase, ebase = "t_lcc_idx", "t_lcc_lbl", "t_lcc_led"
    victims = [2, 1003]
    tag = f"x_{crash_step}"
    incremental = crash_step != "labels_write_full"
    try:
        rows, pairs = _stand_up(spark, ibase, lbase, ebase, tag)
        ids = spark.createDataFrame([(v,) for v in victims], "node long")

        originals = {
            "index_tombstone": (B, "add_tombstones"),
            "ledger_prune": (D, "prune_edge_ledger"),
            "labels_evict": (D, "evict_nodes"),
            "labels_append": (D, "append_labels"),
            "labels_tombstone": (B, "add_tombstones"),
            "labels_write_full": (D, "write_labels"),
            "done_marker": (L, "_journal_done"),
        }
        mod, name = originals[crash_step]
        real = getattr(mod, name)

        if crash_step == "labels_tombstone":
            # die only on the LABELS-base tombstone call (id_col
            # "node"), after the index step's "doc" tombstones and the
            # delta append already landed
            def dying(spark_, base_, ids_, id_col="id", **kw):
                if id_col == "node":
                    raise RuntimeError(
                        f"injected crash at {crash_step}"
                    )
                return real(spark_, base_, ids_, id_col, **kw)
        else:
            def dying(*a, **kw):
                raise RuntimeError(f"injected crash at {crash_step}")

        monkeypatch.setattr(mod, name, dying)
        with pytest.raises(RuntimeError, match="injected crash"):
            L.takedown(
                spark, ids, {ibase: "doc"},
                labels_base=lbase, ledger_base=ebase,
                evict_kwargs={"scope": f"lc_ev_{tag}"},
                incremental_labels=incremental,
            )
        monkeypatch.setattr(mod, name, real)

        # DETECTABLE: the intent is journaled but not closed
        pend = L.pending_takedowns(spark, lbase)
        assert len(pend) == 1
        # the journaled id set is exactly the takedown's
        got_ids = {
            r.node for r in L.takedown_ids(spark, lbase, pend[0]).collect()
        }
        assert got_ids == set(victims)
        # the checker exposes stale families for the early crashes
        status = L.assert_taken_down(
            spark, ids, {ibase: "doc"}, labels_base=lbase, ledger_base=ebase
        )
        if crash_step == "index_tombstone":
            assert status[ibase] > 0  # index still serves the victims
        if crash_step in ("index_tombstone", "ledger_prune"):
            assert status[ebase] > 0  # ledger still serves their edges
        if crash_step != "done_marker":
            assert status[lbase] > 0  # labels still cluster them

        # RESUME converges to the clean-run end state
        replayed = L.resume_takedowns(
            spark, {ibase: "doc"}, labels_base=lbase, ledger_base=ebase,
            evict_kwargs={"scope": f"lc_evr_{tag}"},
        )
        assert replayed == pend
        assert L.pending_takedowns(spark, lbase) == []
        want_labels, want_edges = _expected_after(
            spark, rows, pairs, victims, tag
        )
        scan, got_labels, got_edges = _final_state(spark, ibase, lbase, ebase)
        assert got_labels == want_labels
        assert got_edges == want_edges
        assert all(not ({a, b} & set(victims)) for a, b in scan)
        status = L.assert_taken_down(
            spark, ids, {ibase: "doc"}, labels_base=lbase, ledger_base=ebase
        )
        assert set(status.values()) == {0}, status
    finally:
        _drop_all(spark, ibase, lbase, ebase)


def test_takedown_requires_paired_labels_and_ledger(spark):
    from rq_spark.errors import IllegalStateError

    ids = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(IllegalStateError, match="labels_base and ledger_base"):
        L.takedown(spark, ids, {}, labels_base="t_lc_only_lbl")
    with pytest.raises(IllegalStateError, match="nothing to act on"):
        L.takedown(spark, ids, {})


def test_takedown_across_multiple_index_families(spark, monkeypatch):
    """The real loop shape: a doc and its embedding share an id, and a
    takedown must land on EVERY family serving it. One composed call
    tombstones the Hamming AND ANN families, prunes the ledger, evicts
    the labels; a crash between the two FAMILIES (the seam the
    single-family test cannot reach) leaves a pending intent whose
    resume converges — and the second family, untouched by the crash,
    ends identical to the clean path."""
    import pytest

    from pyspark.sql import functions as F2
    from rq_spark import bucketing as B
    from rq_spark.operators import similarity as S
    from rq_spark.queries.helpers import table

    ibase, abase = "t_lcm_idx", "t_lcm_ann"
    lbase, ebase = "t_lcm_lbl", "t_lcm_led"
    victims = [2, 1003]
    try:
        rows, pairs = _stand_up(spark, ibase, lbase, ebase, "mf")
        vecs = table(spark, "/root/testdata/sf0.01", "embeddings").filter(
            F2.col("vec_id") < 100
        )
        S.write_ann_index(vecs, abase, n_centroids=4, m=4, n_codes=8, iters=1)
        ids = spark.createDataFrame([(v,) for v in victims], "node long")
        fams = {ibase: "doc", abase: "neighbor_id"}  # the ANN
        # tables store the id as neighbor_id — the same column the
        # family probes filter_tombstoned on

        # crash BETWEEN the two index families: the second
        # add_tombstones call dies
        real = B.add_tombstones
        n = {"c": 0}

        def dying(*a, **kw):
            n["c"] += 1
            if n["c"] == 2:
                raise RuntimeError("injected crash between families")
            real(*a, **kw)

        monkeypatch.setattr(B, "add_tombstones", dying)
        with pytest.raises(RuntimeError, match="between families"):
            L.takedown(
                spark, ids, fams, labels_base=lbase, ledger_base=ebase,
                evict_kwargs={"scope": "lc_ev_mf"},
            )
        monkeypatch.setattr(B, "add_tombstones", real)

        status = L.assert_taken_down(
            spark, ids, fams, labels_base=lbase, ledger_base=ebase
        )
        assert status[ibase] == 0 and status[abase] > 0  # the seam, visible
        assert len(L.pending_takedowns(spark, lbase)) == 1

        L.resume_takedowns(
            spark, fams, labels_base=lbase, ledger_base=ebase,
            evict_kwargs={"scope": "lc_evr_mf"},
        )
        status = L.assert_taken_down(
            spark, ids, fams, labels_base=lbase, ledger_base=ebase
        )
        assert set(status.values()) == {0}, status
        assert L.pending_takedowns(spark, lbase) == []
        # ANN really stopped serving the victims (probe-level check,
        # not just the row scan): top-k over victim queries returns
        # no victim neighbors
        k = S.ivfpq_topk_join_from_index(
            spark, vecs.filter(F2.col("vec_id").isin(victims)), abase, k=3
        )
        assert all(r.neighbor_id not in victims for r in k.collect())
        # and the labels/index/ledger equal the clean-run end state
        want_labels, want_edges = _expected_after(
            spark, rows, pairs, victims, "mf"
        )
        _scan, got_labels, got_edges = _final_state(spark, ibase, lbase, ebase)
        assert got_labels == want_labels and got_edges == want_edges
    finally:
        _drop_all(spark, ibase, lbase, ebase)
        for t in ("codes", "vectors", "centroids", "codebooks", "meta",
                  "state", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS t_lcm_ann_{t}")


def test_compact_takedown_journal(spark, monkeypatch):
    """Journal maintenance: closed intents are dropped, PENDING ones
    kept verbatim (crash recovery unaffected); a crash between the
    compaction's two renames leaves the journal under the backup name
    only — loud, never a silently emptied WAL — and the next run
    recovers it."""
    lbase = "t_lcj_lbl"
    t = f"{lbase}_tdlog"
    try:
        ids1 = spark.createDataFrame([(1,), (2,)], "node long")
        ids2 = spark.createDataFrame([(3,)], "node long")
        L._journal_begin(spark, lbase, "td_done", ids1)
        L._journal_done(spark, lbase, "td_done")
        L._journal_begin(spark, lbase, "td_open", ids2)
        assert L.pending_takedowns(spark, lbase) == ["td_open"]

        L.compact_takedown_journal(spark, lbase)
        assert L.pending_takedowns(spark, lbase) == ["td_open"]
        rows = spark.table(t).collect()
        assert {r.td_id for r in rows} == {"td_open"}  # closed intent gone

        # crash between the renames: journal under the backup name
        # only; pending reads fail LOUD; the next compaction recovers
        import pytest

        renames = {"n": 0}
        real_sql = spark.sql

        def dying_sql(q, *a, **kw):
            if q.startswith("ALTER TABLE") and "RENAME TO" in q:
                renames["n"] += 1
                if renames["n"] == 2:
                    raise RuntimeError("injected crash mid-compaction")
            return real_sql(q, *a, **kw)

        monkeypatch.setattr(spark, "sql", dying_sql)
        with pytest.raises(RuntimeError, match="injected crash"):
            L.compact_takedown_journal(spark, lbase)
        monkeypatch.setattr(spark, "sql", real_sql)
        assert not spark.catalog.tableExists(t)
        assert spark.catalog.tableExists(f"{t}__precompact")

        L.compact_takedown_journal(spark, lbase)  # recovers, completes
        assert L.pending_takedowns(spark, lbase) == ["td_open"]
        assert not spark.catalog.tableExists(f"{t}__precompact")
    finally:
        for suf in ("", "__precompact", "__compacting"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{suf}")
