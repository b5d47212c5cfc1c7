"""Composed takedown orchestration across index families, the edge
ledger, and the persisted cluster labels (r14, r13 verdict task #2).

A complete takedown of a document set touches up to THREE kinds of
durable state — every index family serving the docs (tombstones), the
edge ledger (prune), and the standing cluster labels (evict + rewrite)
— and before this module it was 4-5 manual calls in a pinned order
(tests/test_e2e_ingest_loop.py did the ordering by hand). Each
family's own crash windows are failure-injected, but a crash BETWEEN
families left a cross-family inconsistency (index says deleted, labels
still cluster the doc) that nothing detected or repaired.

`takedown` composes the pinned order under a WRITE-AHEAD intent
journal, the minimal mechanism that makes every inter-family crash
window DETECTABLE and the whole composition idempotently RE-RUNNABLE:

    1. journal BEGIN — the takedown's id set appended to
       ``{journal}_tdlog`` before any state is touched. From here to
       DONE, a crash leaves a pending intent `pending_takedowns`
       surfaces and `resume_takedowns` replays.
    2. per index family: `bucketing.add_tombstones` — idempotent
       (a duplicate tombstone row for an id changes no probe result;
       pinned per family by the lifecycle fuzzer).
    3. ledger prune: `operators.dedup.prune_edge_ledger` — same
       tombstone idempotence, applied to both endpoints at read.
    4. labels: evict over the (now pruned) ledger read and rewrite —
       `evict_nodes` ignores ids already absent from the labels, and
       `write_labels` is a full crash-safe staged rewrite whose own
       mid-swap crash `read_labels` recovers, so a re-run after ANY
       crash inside this step converges to the same final labels.
       Running the evict over the PRUNED ledger is exact: the touched
       components are found through the LABELS (where the deleted ids
       still stand until this step), and the pruned rows are exactly
       the deleted-touching edges `evict_nodes` discards anyway.
    5. journal DONE — the intent is closed; replays become no-ops at
       the journal layer (and would be harmless below it).

The journal rows are ∝ the takedown (one row per deleted id), the
tombstone appends are ∝ the takedown, the ledger/labels reads are
map-side against broadcast deletion-sized relations, and the label
recompute is ∝ touched components (`evict_nodes`' contract) — nothing
corpus-sized moves, restart or not.

Single-writer contract (inherited): one orchestrator at a time per
journal; concurrent mutations of the same index family are detected by
the per-family writer nonce, not prevented.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .errors import IllegalStateError

_TDLOG = "_tdlog"


def _journal_table(journal_base: str) -> str:
    return f"{journal_base}{_TDLOG}"


def takedown(
    spark: SparkSession,
    deleted: DataFrame,
    index_bases: dict[str, str],
    labels_base: str | None = None,
    ledger_base: str | None = None,
    journal_base: str | None = None,
    td_id: str | None = None,
    node_col: str = "node",
    evict_kwargs: dict | None = None,
    incremental_labels: bool = True,
) -> str:
    """Run one composed takedown in the pinned order (module
    docstring). ``deleted``: a one-column DataFrame of doc ids (column
    ``node_col``). ``index_bases``: ``{base_or_alias: id_col}`` for
    every index family serving the docs. ``labels_base`` /
    ``ledger_base``: the persisted labels and edge ledger — both or
    neither (the labels evict NEEDS the standing edge relation, and
    the ledger exists precisely so a takedown never regenerates it
    corpus-sized; callers holding edges elsewhere should call
    `evict_nodes` directly). ``journal_base`` defaults to
    ``labels_base`` or the first index base. Returns the takedown id
    (pass to `resume_takedowns` diagnostics); ``td_id`` lets a resume
    replay under the original id.

    ``incremental_labels`` (r14, default): the labels step runs
    ∝-touched end-to-end — `operators.dedup.evict_labels` appends the
    relabeled survivors gen-stamped and tombstones the deleted ids —
    instead of `evict_nodes` + a corpus-sized `write_labels` rewrite
    per takedown. Both modes are replay-idempotent and converge to the
    same `read_labels` view (a resume may even switch modes); False
    keeps the full-rewrite shape, which doubles as compaction."""
    if (labels_base is None) != (ledger_base is None):
        raise IllegalStateError(
            "takedown needs labels_base and ledger_base together: the "
            "labels evict re-clusters over the standing edge ledger "
            "(without it the only exact alternative is a corpus-sized "
            "pair regeneration, which this orchestrator refuses to hide)."
        )
    if journal_base is None:
        journal_base = labels_base or next(iter(index_bases), None)
    if journal_base is None:
        raise IllegalStateError(
            "takedown has nothing to act on: no index families and no "
            "labels/ledger were named."
        )
    ids = deleted.select(F.col(node_col).alias("node")).distinct()
    ids = ids.localCheckpoint()  # pin the id set: the journal, the
    # tombstones, and the evict must all see ONE batch, not a lazy
    # plan re-read across mutations
    if td_id is None:
        td_id = uuid.uuid4().hex
        _journal_begin(spark, journal_base, td_id, ids)
    _apply_takedown(
        spark, ids, index_bases, labels_base, ledger_base,
        evict_kwargs=evict_kwargs, incremental_labels=incremental_labels,
    )
    _journal_done(spark, journal_base, td_id)
    return td_id


def _apply_takedown(
    spark: SparkSession,
    ids: DataFrame,
    index_bases: dict[str, str],
    labels_base: str | None,
    ledger_base: str | None,
    evict_kwargs: dict | None = None,
    incremental_labels: bool = True,
) -> None:
    """Steps 2-4 — every one idempotent, so a resume replays all of
    them unconditionally instead of guessing where the crash was."""
    from .bucketing import add_tombstones
    from .operators.dedup import (
        evict_labels,
        evict_nodes,
        prune_edge_ledger,
        read_edge_ledger,
        read_labels,
        write_labels,
    )

    for base, id_col in index_bases.items():
        add_tombstones(
            spark, base, ids.withColumnRenamed("node", id_col), id_col
        )
    if ledger_base is not None:
        prune_edge_ledger(spark, ledger_base, ids, "node")
    if labels_base is not None:
        if incremental_labels:
            evict_labels(
                spark,
                labels_base,
                read_edge_ledger(spark, ledger_base),
                ids,
                **(evict_kwargs or {}),
            )
        else:
            survived = evict_nodes(
                read_labels(spark, labels_base),
                read_edge_ledger(spark, ledger_base),
                ids,
                **(evict_kwargs or {}),
            )
            write_labels(survived, labels_base)


def _journal_begin(
    spark: SparkSession, journal_base: str, td_id: str, ids: DataFrame
) -> None:
    from .bucketing import _require_no_orphan_location

    t = _journal_table(journal_base)
    _require_no_orphan_location(spark, t)
    ids.select(
        F.lit(td_id).alias("td_id"),
        F.col("node").cast("long").alias("node"),
        F.lit("begin").alias("phase"),
    ).write.mode("append").format("parquet").saveAsTable(t)


def _journal_done(spark: SparkSession, journal_base: str, td_id: str) -> None:
    spark.createDataFrame(
        [(td_id, None, "done")], "td_id string, node long, phase string"
    ).write.mode("append").format("parquet").saveAsTable(
        _journal_table(journal_base)
    )


def pending_takedowns(spark: SparkSession, journal_base: str) -> list[str]:
    """Takedown ids journaled BEGIN but never DONE — the detectable
    state every inter-family crash window leaves (a clean journal
    means every composed takedown ran to completion). One scan of the
    takedown-sized journal."""
    t = _journal_table(journal_base)
    if not spark.catalog.tableExists(t):
        return []
    log = spark.table(t)
    done = log.filter(F.col("phase") == "done").select("td_id")
    return [
        r.td_id
        for r in log.filter(F.col("phase") == "begin")
        .select("td_id")
        .distinct()
        .join(done, "td_id", "left_anti")
        .collect()
    ]


def takedown_ids(
    spark: SparkSession, journal_base: str, td_id: str
) -> DataFrame:
    """The journaled id set of one takedown, back as (node) — what a
    resume replays."""
    return (
        spark.table(_journal_table(journal_base))
        .filter((F.col("phase") == "begin") & (F.col("td_id") == td_id))
        .select("node")
        .distinct()
    )


def resume_takedowns(
    spark: SparkSession,
    index_bases: dict[str, str],
    labels_base: str | None = None,
    ledger_base: str | None = None,
    journal_base: str | None = None,
    evict_kwargs: dict | None = None,
    incremental_labels: bool = True,
) -> list[str]:
    """Replay every pending takedown (crash recovery, run at loop
    start): each journaled-but-unfinished id set is re-applied through
    the same pinned order — every step is idempotent, so re-running
    steps that DID complete before the crash changes nothing — and
    closed with its DONE marker. Returns the replayed ids. The label
    mode need not match the crashed run's (both converge to the same
    `read_labels` view; see `takedown`)."""
    if journal_base is None:
        journal_base = labels_base or next(iter(index_bases), None)
    if journal_base is None:
        raise IllegalStateError("resume_takedowns: no journal base named.")
    replayed = []
    for td_id in pending_takedowns(spark, journal_base):
        ids = takedown_ids(spark, journal_base, td_id).localCheckpoint()
        _apply_takedown(
            spark, ids, index_bases, labels_base, ledger_base,
            evict_kwargs=evict_kwargs,
            incremental_labels=incremental_labels,
        )
        _journal_done(spark, journal_base, td_id)
        replayed.append(td_id)
    return replayed


def compact_takedown_journal(spark: SparkSession, journal_base: str) -> None:
    """Drop CLOSED intents from the journal (maintenance; the journal
    grows ∝ ids ever taken down — tiny, but unbounded). Pending
    intents are kept verbatim, so crash recovery is unaffected. The
    rewrite uses the same rename discipline as table compaction: the
    new journal is written under a temp name, the live one renamed
    aside, the rewrite renamed in, backup dropped — a crash between
    the renames leaves the journal under the backup name only, which
    fails LOUDLY (never a silently emptied WAL) and is restored by the
    next compaction run."""
    t = _journal_table(journal_base)
    backup, tmp = f"{t}__precompact", f"{t}__compacting"
    # recover FIRST: a previous compaction that died between its two
    # renames left the journal under the backup name only
    if not spark.catalog.tableExists(t) and spark.catalog.tableExists(backup):
        spark.sql(f"ALTER TABLE {backup} RENAME TO {t}")
    if not spark.catalog.tableExists(t):
        return
    spark.sql(f"DROP TABLE IF EXISTS {backup}")
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    log = spark.table(t)
    done = log.filter(F.col("phase") == "done").select("td_id").distinct()
    log.join(F.broadcast(done), "td_id", "left_anti").write.mode(
        "overwrite"
    ).format("parquet").saveAsTable(tmp)
    spark.sql(f"ALTER TABLE {t} RENAME TO {backup}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {t}")
    spark.sql(f"DROP TABLE {backup}")


def assert_taken_down(
    spark: SparkSession,
    ids: DataFrame,
    index_bases: dict[str, str],
    labels_base: str | None = None,
    ledger_base: str | None = None,
) -> dict[str, int]:
    """Cross-family consistency CHECK: how many of ``ids`` each family
    still SERVES (live index rows after the tombstone anti-join,
    standing label rows, surviving ledger edges). All-zero means the
    takedown is complete everywhere; a nonzero family after a crash is
    exactly the inconsistency `resume_takedowns` repairs. Diagnostic
    tier — a catalog prefix scan per family, not a hot path."""
    from .bucketing import filter_tombstoned, resolve_index_base
    from .operators.dedup import read_edge_ledger, read_labels

    idset = ids.select(F.col(ids.columns[0]).alias("_chk_id")).distinct()
    out: dict[str, int] = {}
    for base, id_col in index_bases.items():
        resolved = resolve_index_base(spark, base)
        n = 0
        for t in spark.catalog.listTables():
            if not t.name.startswith(resolved.lower() + "_"):
                continue
            if t.name.endswith(("_state", "_tombstones", "_meta", "_ptr")):
                continue
            tbl = spark.table(t.name)
            if id_col not in tbl.columns:
                continue
            live = filter_tombstoned(spark, resolved, tbl, id_col)
            n += live.join(
                F.broadcast(idset),
                F.col(id_col) == F.col("_chk_id"),
                "left_semi",
            ).count()
        out[base] = n
    if labels_base is not None:
        lbl = read_labels(spark, labels_base)
        out[labels_base] = lbl.join(
            F.broadcast(idset), F.col("node") == F.col("_chk_id"), "left_semi"
        ).count()
    if ledger_base is not None:
        e = read_edge_ledger(spark, ledger_base)
        out[ledger_base] = e.join(
            F.broadcast(idset),
            (F.col("a_id") == F.col("_chk_id"))
            | (F.col("b_id") == F.col("_chk_id")),
            "left_semi",
        ).count()
    return out
