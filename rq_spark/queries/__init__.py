"""Query catalog: every operator from SURVEY.md §2.2, as
(spark, sf_dir) -> DataFrame callables plus a DuckDB oracle SQL string.

Each pack module exposes ``QUERIES: dict[str, callable]`` and
``ORACLE: dict[str, str]``; this module merges them. Keys without an
ORACLE entry get the driver's weaker rows-only check (reserved for
genuinely non-SQL-expressible operators, e.g. MinHash-LSH).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import core

_PACKS = [core]


def _load_extra_packs() -> None:
    """Packs land incrementally; a missing module is fine, a broken one
    must surface loudly (ModuleNotFoundError only for the pack itself)."""
    import importlib

    # Order = driver execution order. The dedup pack carries the only
    # multi-second queries in the catalog, so it registers LAST: a
    # budget-limited correctness run records every other pack first.
    for name in ("joins", "windows", "funcs", "events", "text",
                 "similarity", "nested", "udfs", "dedup"):
        try:
            m = importlib.import_module(f".{name}", __package__)
        except ModuleNotFoundError as e:
            if e.name and e.name.endswith(name):
                continue
            raise
        if m not in _PACKS:
            _PACKS.append(m)


_load_extra_packs()


def _last_driver_round() -> dict[str, int]:
    """Map query key -> latest round whose driver CORRECTNESS file recorded
    it. The driver caps each round's record at a fixed row budget in
    ``queries()`` iteration order, so keys it has never reached must be
    surfaced first (see ``all_queries``). Unknown/missing files are fine:
    an empty map degrades to plain catalog order."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path, encoding="utf-8") as f:
                keys = json.load(f).keys()
        except (OSError, ValueError):
            continue
        for k in keys:
            last[k] = max(last.get(k, -1), rnd)
    return last


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for pack in _PACKS:
        dup = set(out) & set(pack.QUERIES)
        if dup:
            raise ValueError(f"duplicate query keys: {dup}")
        out.update(pack.QUERIES)
    # Rotate: least-recently-driver-checked first (never-checked = -1),
    # ties broken by catalog position. With a catalog larger than the
    # driver's per-round row budget this guarantees every key gets a
    # current-round driver verdict within ceil(len/budget) rounds.
    last = _last_driver_round()
    pos = {k: i for i, k in enumerate(out)}
    return {k: out[k] for k in sorted(out, key=lambda k: (last.get(k, -1), pos[k]))}


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for pack in _PACKS:
        out.update(pack.ORACLE)
    return out
