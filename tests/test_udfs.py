"""UDF-surface pack: the UDTF whitespace contract must hold on the
edges the testdata never exercises (empty docs, whitespace-only docs,
Unicode whitespace inside tokens) — Spark and the DuckDB oracle have
to agree row-for-row there, not just on the happy path."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from rq_spark.queries.udfs import _UDTF_SQL, udf_udtf_split_terms

ADVERSARIAL_DOCS = [
    (0, "plain words here"),
    (1, ""),  # empty: must yield zero rows on both engines
    (2, " \t \r\n "),  # ASCII-whitespace-only: normalizes to '' → zero rows
    (3, "  leading and trailing  "),
    (4, "tabs\tand\nnewlines\fand\rreturns"),
    (5, "a b c"),  # NBSP is NOT a separator in the shared contract
    (6, "UPPER Case MiXeD"),
    (7, "one two three four five six seven"),  # truncation at 5 terms
]


def _write_docs(tmp_path) -> str:
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in ADVERSARIAL_DOCS], pa.int64()),
            "text": pa.array([t for _, t in ADVERSARIAL_DOCS], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_udtf_split_terms_matches_oracle_on_edge_docs(spark, tmp_path):
    sf_dir = _write_docs(tmp_path)
    got = {
        (r.doc_id, r.term, r.pos)
        for r in udf_udtf_split_terms(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {(d, t, p) for d, t, p in con.sql(_UDTF_SQL).fetchall()}
    assert got == want
    # the edges behave as contracted, not just identically-wrong
    by_doc = {}
    for d, t, p in got:
        by_doc.setdefault(d, []).append((p, t))
    assert 1 not in by_doc and 2 not in by_doc  # empty/ws-only → no rows
    assert sorted(by_doc[3]) == [(0, "leading"), (1, "and"), (2, "trailing")]
    assert sorted(by_doc[5]) == [(0, "a b"), (1, "c")]  # NBSP kept
    assert len(by_doc[7]) == 5  # truncated


def test_udtf_leaves_session_catalog_clean(spark, sf_dir):
    before = {v.name for v in spark.catalog.listTables()}
    udf_udtf_split_terms(spark, sf_dir).count()
    after = {v.name for v in spark.catalog.listTables()}
    assert after == before


def test_bpe_encode_reconstruction_is_lossless(spark, sf_dir):
    """r8: the certified-encode branch — every document's BPE pieces
    must concatenate back to its normalized text exactly (not just the
    md5 the driver hash checks), and the piece-count bounds must hold
    with real trained merges."""
    from pyspark.sql import functions as F

    from rq_spark.operators.bpe import EOW, bpe_tokens, fit_bpe
    from rq_spark.operators.dedup import normalize_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    merges = fit_bpe(docs, "text", n_merges=25)
    assert len(merges) == 25
    toks = bpe_tokens(merges, F.col("text"))
    bad = (
        docs.select(
            normalize_text(F.col("text")).alias("nt"),
            F.trim(F.regexp_replace(F.array_join(toks, ""), EOW, " ")).alias(
                "recon"
            ),
            F.size(toks).alias("np"),
        )
        .filter(
            (F.col("recon") != F.col("nt"))
            | (
                (F.col("nt") != "")
                & (
                    (F.col("np") < F.size(F.split(F.col("nt"), " ")))
                    | (
                        F.col("np")
                        > F.length(F.regexp_replace(F.col("nt"), " ", ""))
                    )
                )
            )
        )
        .count()
    )
    assert bad == 0
