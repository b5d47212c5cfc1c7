"""End-to-end duplicate-graph + retrieval audit over the r8 operators —
the curation shape AFTER near-dup pairs exist:

MinHash-LSH pairs → connected components (pick representatives) →
PageRank duplication centrality + triangle density over the SAME
graph → dedup to representatives → BM25 audit queries over the
deduped corpus → CDC chunk-level residual-duplication report.

Every stage is the production operator; the assertions are structural
invariants that tie the stages together (conservation, consistency,
rank separation), not golden numbers."""

from __future__ import annotations

from pyspark.sql import functions as F

from rq_spark.operators.cdc import cdc_chunks, cdc_doc_report
from rq_spark.operators.dedup import connected_components, minhash_dedup_pairs
from rq_spark.operators.graph import pagerank_fixed, triangle_counts
from rq_spark.operators.retrieval import bm25_topk

SF = "/root/testdata/sf0.001"


def test_graph_dedup_then_retrieval_audit(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()

    # --- near-dup pair graph (the candidate-bounded scale path)
    pairs = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.8).persist()
    nodes = docs.select(F.col("doc_id").alias("node"))

    # --- components: every doc labeled, rep = component minimum
    comp = connected_components(pairs, nodes).persist()
    assert comp.count() == n_docs
    # rep consistency: both endpoints of every edge share a rep
    a = comp.select(F.col("node").alias("a_id"), F.col("rep").alias("ra"))
    b = comp.select(F.col("node").alias("b_id"), F.col("rep").alias("rb"))
    joined = pairs.join(a, "a_id").join(b, "b_id")
    assert joined.filter("ra <> rb").count() == 0
    # rep is a member ≤ all its members
    assert comp.filter("rep > node").count() == 0

    # --- pagerank on the same graph: connected nodes hold mass that
    # isolated nodes lose to teleport+dangling, so min(connected) >
    # max(isolated) whenever any pair exists
    pr = pagerank_fixed(pairs, nodes).persist()
    con = pairs.select(F.col("a_id").alias("node")).unionAll(
        pairs.select(F.col("b_id").alias("node"))
    ).distinct()
    if con.count() > 0:
        mn_con = pr.join(con, "node").agg(F.min("pr")).collect()[0][0]
        mx_iso = (
            pr.join(con, "node", "left_anti").agg(F.max("pr")).collect()[0][0]
        )
        assert mn_con > mx_iso

    # --- triangle counts bound by combinatorics: a node in T triangles
    # has degree ≥ 2 and Σtri ≡ 0 (mod 3)
    tri = triangle_counts(pairs, nodes)
    total_tri = tri.agg(F.sum("tri")).collect()[0][0]
    assert total_tri % 3 == 0

    # --- dedup: keep only representatives; removed = n_docs - reps
    reps = comp.select(F.col("rep").alias("doc_id")).distinct()
    kept = docs.join(reps, "doc_id").persist()
    n_kept = kept.count()
    n_groups = comp.select("rep").distinct().count()
    assert n_kept == n_groups <= n_docs

    # --- BM25 audit over the DEDUPED corpus: full top-k per query,
    # results only from kept docs
    hits = bm25_topk(kept, "text", "doc_id", ["customer query", "table scan"], k=5)
    got = hits.join(reps, hits["doc"] == reps["doc_id"], "left_anti").count()
    assert got == 0
    per_q = {r["query_id"]: r["n"] for r in hits.groupBy("query_id").count().withColumnRenamed("count", "n").collect()}
    assert all(n == 5 for n in per_q.values()), per_q

    # --- CDC residual report: chunk-level duplication SURVIVES doc-level
    # dedup (boilerplate shared below the near-dup threshold) — the
    # reason byte-level dedup exists as its own layer
    rep_report = cdc_doc_report(cdc_chunks(kept, "text", "doc_id"))
    agg = rep_report.agg(
        F.sum("dup_bytes").alias("d"), F.sum("total_bytes").alias("t")
    ).collect()[0]
    assert agg["t"] > 0 and 0 < agg["d"] < agg["t"]

    for df in (pairs, comp, pr, kept):
        df.unpersist()
