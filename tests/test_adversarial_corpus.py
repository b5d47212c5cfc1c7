"""Adversarial-corpus gate (r10, r9 verdict task #6): the edge-input
probing that found 6 real crashes in r9 (ANSI DIVIDE_BY_ZERO in
quality ratios and profiling at n=0, numpy AxisError on zero-vector
ANN training, bare ZeroDivisionError in mixture shares, np.stack on
NULL embeddings, ADC stride past a shrunken codebook), promoted from
session tooling to a pytest any regression trips.

Two synthetic sf-shaped corpora, built as SINGLE parquet files (the
stream readers' pathGlobFilter matches file names — a directory named
events.parquet yields zero stream rows):

* **edge** — normal baseline rows PLUS the pathological ones: empty /
  whitespace-only / NULL text, control characters, astral-plane and
  combining unicode, a 50 KB document, punctuation-only text; NULL and
  zero embeddings with the corpus smaller than the default PQ code
  count (the shrunken-codebook stride edge); events with NULL props /
  NULL value / empty-string event_type.
* **empty** — the same three tables with zero rows, schemas intact.

Policy under test (the NULL-or-named-ValueError rule): every
documents/embeddings/events-driven catalog key either returns a
well-formed result or raises ValueError with a message — never a
raw numpy/ANSI/ZeroDivision error surfacing through Py4J.

Embeddings are dim 64 — the trained hyperplane matmuls reject other
widths by design, so the fixture must match.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

SRC = "/root/testdata/sf0.001"

#: catalog keys that read documents / embeddings / events (directly or
#: through helpers) — the tables the edge corpus perturbs. TPC-H-driven
#: keys see byte-identical copies and are out of scope here.
EDGE_KEYS = [
    "agg_approx_distinct",
    "agg_groupby_distinct",
    "corpus_curation",
    "dedup_connected_groups",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_incremental",
    "dedup_simhash",
    "dedup_text",
    "distinct_sort_sample",
    "event_sessions_rate",
    "explode_ops",
    "func_json_variant",
    "join_asof_event",
    "join_range_price_band",
    "mm_pipeline",
    "mm_real_decode",
    "set_ops",
    "sim_ann_topk",
    "sim_topk_cosine",
    "text_metrics",
    "window_agg_time",
    "window_analytic",
    "window_frames",
    "stream_agg_dedup",
    "stream_stateful",
]

#: zero-row probe list: the streams are excluded (an empty bounded
#: stream exercises only micro-batch machinery at ~10 s/key; the
#: batch keys cover every derivation the r9 probes crashed)
EMPTY_KEYS = [k for k in EDGE_KEYS if not k.startswith("stream_")]

_EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (10_000, "", "xx", "edge"),
    (10_001, "   \t  \n ", "xx", "edge"),
    (10_002, None, "xx", "edge"),
    (10_003, "control \x01\x02\x1f chars \x7f here", "xx", "edge"),
    (10_004, "astral 🌍🚀 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 é combining \U0001f9ea", "xx", "edge"),
    (10_005, "!!! ... ??? --- ***", "xx", "edge"),
    (10_006, "dup " * 5_000 + "tail",  # ~20 KB repeated token
     "xx", "edge"),
    (10_007, ("lorem ipsum dolor sit amet " * 2_000)[:50_000], "xx", "edge"),
    (10_008, "one", "xx", "edge"),
]


@pytest.fixture(scope="module")
def edge_sf(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("adv_edge")
    for f in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        shutil.copy(f"{SRC}/{f}.parquet", d / f"{f}.parquet")
    con = duckdb.connect()
    con.execute("SET threads=2")
    edges = ", ".join(
        "(%d, %s, '%s', '%s')"
        % (i, "NULL" if t is None else "'%s'" % t.replace("'", "''"), la, so)
        for i, t, la, so in _EDGE_DOCS
    )
    con.execute(f"""
        COPY (
          SELECT * FROM '{SRC}/documents.parquet'
          UNION ALL
          SELECT doc_id, text, lang, source, length(text) AS n_chars
          FROM (VALUES {edges}) v(doc_id, text, lang, source)
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
    """)
    # 20 normal vectors (< default n_codes=32: shrunken-codebook edge)
    # + a NULL embedding + an all-zero vector; dim 64 to match the
    # trained hyperplanes
    con.execute(f"""
        COPY (
          SELECT vec_id, embedding, label
          FROM '{SRC}/embeddings.parquet' LIMIT 20
        ) TO '{d}/_emb_base.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT * FROM '{d}/_emb_base.parquet'
          UNION ALL
          SELECT 90_001, NULL, 0
          UNION ALL
          SELECT 90_002,
                 CAST(list_transform(generate_series(1, 64), x -> 0.0)
                      AS FLOAT[]),
                 1
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT * FROM '{SRC}/events.parquet'
          UNION ALL
          SELECT 90_101, TIMESTAMP '2024-01-02 00:00:00', 1,
                 '', 0.0, NULL
          UNION ALL
          SELECT 90_102, TIMESTAMP '2024-01-02 00:00:01', 1,
                 'purchase', NULL, 'not json {{'
          UNION ALL
          SELECT 90_103, TIMESTAMP '2024-01-02 00:00:02', NULL,
                 'view', 1.0, '{{"k": 1}}'
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
    """)
    (d / "_emb_base.parquet").unlink()
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("adv_empty")
    for f in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        shutil.copy(f"{SRC}/{f}.parquet", d / f"{f}.parquet")
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet' WHERE 1=0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


def _run_key(spark, key: str, sf_dir: str) -> None:
    """Run one catalog key under the NULL-or-named-ValueError policy:
    either a well-formed collect or a ValueError with a message."""
    from rq_spark.queries import all_queries

    try:
        rows = all_queries()[key](spark, sf_dir).collect()
    except ValueError as e:  # the named degenerate-input policy
        assert str(e), f"{key}: ValueError without a message"
        return
    assert isinstance(rows, list)


@pytest.mark.parametrize("key", EDGE_KEYS)
def test_edge_corpus_key(spark, edge_sf, key):
    _run_key(spark, key, edge_sf)


@pytest.mark.parametrize("key", EMPTY_KEYS)
def test_empty_tables_key(spark, empty_sf, key):
    _run_key(spark, key, empty_sf)


@pytest.fixture(scope="module")
def all_empty_sf(tmp_path_factory) -> str:
    """EVERY table zero rows, schemas intact — the strongest form of
    the r9 'empty-table behavior defined' policy, extended to the
    TPC-H-driven keys too (r9's probes fixed profile_columns and the
    quality ratios at n=0; this pins the policy for the whole
    catalog)."""
    d = tmp_path_factory.mktemp("adv_all_empty")
    con = duckdb.connect()
    for f in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings", "events"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{f}.parquet' WHERE 1=0) "
            f"TO '{d}/{f}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


def test_every_catalog_key_handles_all_empty_tables(spark, all_empty_sf):
    """Run the ENTIRE 50-key catalog over a corpus where every table
    has zero rows: each key must return a well-formed (usually empty)
    result or raise a named ValueError — never an ANSI arithmetic
    error, a numpy shape error, or a bare ZeroDivisionError through
    Py4J. One loop, failures collected, so a regression names every
    broken key at once."""
    from rq_spark.queries import all_queries

    failures = {}
    for key, fn in sorted(all_queries().items()):
        try:
            rows = fn(spark, all_empty_sf).collect()
            assert isinstance(rows, list)
        except ValueError as e:
            if not str(e):
                failures[key] = "ValueError without a message"
        except Exception as e:  # noqa: BLE001 — the point of the gate
            failures[key] = f"{type(e).__name__}: {e}"[:200]
    assert not failures, failures
