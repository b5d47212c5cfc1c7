"""BM25 lexical retrieval (operators/retrieval.py).

The catalog branch sim_topk_cosine/'bm25' is driver-hash-checked in
the log-free mode against the DuckDB CTE oracle; these tests pin the
PRODUCTION form (log_idf=True, Lucene-style ln(1 + odds) idf) against
an independent pure-Python BM25 plus structural invariants: rank
determinism, single-term agreement between the two idf forms, and
validation.
"""

from __future__ import annotations

import math

import pytest

from rq_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_topk,
    tokenize_query,
)

DOCS = [
    (0, "spark spark spark join"),
    (1, "join hash join hash join"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "hash table scan"),
    (4, "spark streaming window agg window"),
    (5, "empty  \t "),
    (6, "fox fox fox fox fox fox fox fox fox fox fox fox"),
]
QUERIES = ["spark join", "fox", "hash table"]


def _python_bm25(docs, queries, k1=BM25_K1, b=BM25_B, log_idf=True):
    """Independent reference: textbook Okapi BM25 over
    lower+whitespace tokenization, dict-and-loop style."""
    toks = {d: [w for w in t.lower().split() if w] for d, t in docs}
    toks = {d: ws for d, ws in toks.items() if ws}
    n = len(toks)
    avgdl = sum(len(ws) for ws in toks.values()) / n
    df = {}
    for ws in toks.values():
        for t in set(ws):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qi, q in enumerate(queries):
        scores = {}
        for d, ws in toks.items():
            s = 0.0
            for t in sorted(set(q.lower().split())):
                tf = ws.count(t)
                if tf == 0 or t not in df:
                    continue
                odds = (n - df[t] + 0.5) / (df[t] + 0.5)
                idf = math.log(1 + odds) if log_idf else odds
                s += idf * (tf * (k1 + 1)) / (
                    tf + k1 * ((1 - b) + b * len(ws) / avgdl)
                )
            if s:
                scores[d] = s
        out[qi] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _ranked(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["rk"], r["doc"], r["score"]))
    return {q: sorted(v) for q, v in out.items()}


def test_matches_python_reference_log_mode(docs_df):
    got = _ranked(bm25_topk(docs_df, "text", "doc_id", QUERIES, k=10))
    ref = _python_bm25(DOCS, QUERIES)
    for qi in range(len(QUERIES)):
        assert [d for _, d, _ in got[qi]] == [d for d, _ in ref[qi]], qi
        for (_, _, s), (_, rs) in zip(got[qi], ref[qi]):
            assert s == pytest.approx(rs, rel=1e-12)


def test_matches_python_reference_odds_mode(docs_df):
    got = _ranked(
        bm25_topk(docs_df, "text", "doc_id", QUERIES, k=10, log_idf=False)
    )
    ref = _python_bm25(DOCS, QUERIES, log_idf=False)
    for qi in range(len(QUERIES)):
        assert [d for _, d, _ in got[qi]] == [d for d, _ in ref[qi]], qi


def test_semantics(docs_df):
    got = _ranked(bm25_topk(docs_df, "text", "doc_id", QUERIES, k=10))
    # 'fox': doc 6 is saturated-tf fox spam, doc 2 one mention — spam
    # ranks first but tf saturation keeps it within (k1+1)× of doc 2
    fox = {d: s for _, d, s in got[1]}
    assert list(fox) and max(fox, key=fox.get) == 6
    assert fox[6] < (BM25_K1 + 1) * fox[2] * 1.5
    # whitespace-only doc 5 never appears; zero-match docs absent
    assert all(d != 5 for ranks in got.values() for _, d, _ in ranks)
    # 'hash table': doc 3 contains both terms, beats single-term docs
    assert got[2][0][1] == 3


def test_single_term_rankings_agree_between_idf_forms(docs_df):
    """Both idf forms are monotone in df, so one-term queries must
    rank identically (multi-term queries may legitimately differ)."""
    a = _ranked(bm25_topk(docs_df, "text", "doc_id", ["fox"], k=10))
    b = _ranked(
        bm25_topk(docs_df, "text", "doc_id", ["fox"], k=10, log_idf=False)
    )
    assert [d for _, d, _ in a[0]] == [d for _, d, _ in b[0]]


def test_bit_determinism_odds_mode(docs_df):
    """The hash-exact contract: identical bits across evaluations."""
    runs = [
        {
            (r["query_id"], r["doc"]): r["score"].hex()
            for r in bm25_topk(
                docs_df, "text", "doc_id", QUERIES, k=10, log_idf=False
            ).collect()
        }
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


def test_tokenize_query_and_validation(docs_df):
    assert tokenize_query("Join  HASH join") == ["hash", "join"]
    with pytest.raises(ValueError):
        bm25_topk(docs_df, "text", "doc_id", [], k=5)
    with pytest.raises(ValueError):
        bm25_topk(docs_df, "text", "doc_id", ["x"], k=0)
    with pytest.raises(ValueError):
        bm25_topk(docs_df, "text", "doc_id", ["x"], b=1.5)
    # term-less queries are rejected loudly, not silently empty
    with pytest.raises(ValueError, match="zero terms"):
        bm25_topk(docs_df, "text", "doc_id", ["   "], k=5)


def test_cte_sql_escapes_and_validates():
    from rq_spark.operators.retrieval import bm25_cte_sql

    sql = bm25_cte_sql("documents", "text", "doc_id", ["customer's order"])
    assert "'customer''s'" in sql  # SQL-escaped term literal
    with pytest.raises(ValueError, match="zero terms"):
        bm25_cte_sql("documents", "text", "doc_id", [" \t "])
