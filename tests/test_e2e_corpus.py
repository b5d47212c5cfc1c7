"""End-to-end TEXT corpus pipeline over the late-r6 operators — the
shape of a real pretraining-data job:

.jsonl.zst shards → text metrics (incl. PII counts + repetition) →
curation + sequence packing → benchmark decontamination filter →
mixture downsampling → packed .tar.zst WebDataset text shards.

Every stage is the production operator, not a test shim; the zstd
codec carries both ends (source shards in, shard archive out)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rq_spark.formats import spark_io
from rq_spark.formats.codecs.zstd_pure import compress, decompress
from rq_spark.operators import webdataset as wds
from rq_spark.operators.dedup import decontaminate
from rq_spark.operators.text import mixture_sample

SF = "/root/testdata/sf0.001"


def test_end_to_end_text_corpus_pipeline(spark, tmp_path):
    # --- 0: stage the corpus as .jsonl.zst shards (the public-corpus
    # wire shape), then ingest through the zstd source path
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    staged = str(tmp_path / "corpus")
    spark_io.write(docs.repartition(3), "json", staged, compression="zstd")
    corpus = spark_io.read(spark, "json", staged + "/*.zst")
    assert corpus.count() == docs.count()

    # --- 1: curate + pack (lang/quality/token-band filter, then
    # concat-and-chunk context placement)
    from rq_spark.queries.text import corpus_curation

    packed = corpus_curation(spark, SF)  # same table, catalog operator
    kept_ids = {r["doc_id"] for r in packed.select("doc_id").collect()}
    assert 0 < len(kept_ids) < docs.count()

    # --- 2: decontaminate vs the held-out eval slice
    eval_df = corpus.filter(F.col("doc_id") % 11 == 0)
    train = corpus.filter(F.col("doc_id") % 11 != 0)
    dirty = {
        r["train_id"]
        for r in decontaminate(train, eval_df, "text", "doc_id", n=5).collect()
    }
    clean = packed.filter(~F.col("doc_id").isin(list(dirty | {-1})))

    # --- 3: mixture-downsample the crawliest sources and join text back
    sampled = mixture_sample(clean, "doc_id", F.lit("c000"))  # ~3/4 keep
    final = sampled.join(corpus.select("doc_id", "text"), "doc_id")
    n_final = final.count()
    assert 0 < n_final <= len(kept_ids)

    # --- 4: ship as zstd-compressed WebDataset text shards
    tar = wds.build_shard_bytes(
        [
            (f"{r['doc_id']:08d}", {"txt": r["text"].encode()})
            for r in final.orderBy("doc_id").collect()
        ]
    )
    shard = tmp_path / "train-00000.tar.zst"
    shard.write_bytes(compress(tar, mode="lz"))
    assert len(shard.read_bytes()) < len(tar)  # really compressed

    # and the shard reads back through the WebDataset source
    back = wds.read_webdataset(spark, str(tmp_path / "*.tar.zst"))
    rows = back.collect()
    assert len(rows) == n_final
    got_ids = {int(r["key"]) for r in rows}
    assert got_ids == {r["doc_id"] for r in final.collect()}
    # no contaminated doc survived into the shards
    assert not (got_ids & dirty)


def test_zst_round_trip_is_bitexact_through_pipeline():
    # belt-and-braces: the codec used at both ends round-trips the
    # exact tar bytes (no newline/encoding munging in between)
    payload = b"sample tar-ish \x00\x01 payload " * 1000
    assert decompress(compress(payload, mode="lz")) == payload
