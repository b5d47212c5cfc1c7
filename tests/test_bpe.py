"""BPE tokenizer training: the distributed trainer is pinned against
an independent naive reference (merge-for-merge equality on identical
data), plus losslessness and replay properties — the `fit_logistic`
evidence tier (no SQL oracle exists for an iterative argmax loop)."""

from __future__ import annotations

import collections

from rq_spark.operators import bpe

SF = "/root/testdata/sf0.001"


def naive_bpe(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Textbook reference (Sennrich et al. pseudocode): recount EVERY
    pair from scratch each round — O(vocab) per round, deliberately
    nothing shared with the engine's inverted-index implementation."""
    vocab = {
        tuple(w[:-1]) + (w[-1] + bpe.EOW,): c for w, c in word_counts.items() if w
    }
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        out = {}
        for syms, c in vocab.items():
            s, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    s.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    s.append(syms[j])
                    j += 1
            out[tuple(s)] = out.get(tuple(s), 0) + c
        vocab = out
    return merges


def corpus_word_counts(spark) -> dict[str, int]:
    rows = bpe.word_vocab(
        spark.read.parquet(f"{SF}/documents.parquet"), "text"
    ).collect()
    return {r["w"]: r["c"] for r in rows}


def test_fit_matches_naive_reference(spark):
    wc = corpus_word_counts(spark)
    got = bpe.fit_bpe(
        spark.read.parquet(f"{SF}/documents.parquet"), "text", n_merges=40
    )
    want = naive_bpe(wc, 40)
    assert got == want
    assert len(got) == 40  # corpus is rich enough to supply all rounds


def test_truncated_vocab_is_deterministic_prefix_rule(spark):
    sdf = spark.read.parquet(f"{SF}/documents.parquet")
    wc = corpus_word_counts(spark)
    keep = sorted(wc.items(), key=lambda t: (-t[1], t[0]))[:25]
    got = bpe.fit_bpe(sdf, "text", n_merges=15, max_vocab_words=25)
    assert got == naive_bpe(dict(keep), 15)


def test_encode_replays_training_symbols():
    # On the words BPE was trained on, inference must reproduce the
    # exact final training segmentation (rank replay property).
    wc = {"lower": 5, "lowest": 2, "newer": 6, "wider": 3, "new": 2}
    merges = naive_bpe(wc, 10)
    ranks = {p: i for i, p in enumerate(merges)}

    vocab = {tuple(w[:-1]) + (w[-1] + bpe.EOW,): c for w, c in wc.items()}
    for m in merges:
        out = {}
        for syms, c in vocab.items():
            s, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == m:
                    s.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    s.append(syms[j])
                    j += 1
            out[tuple(s)] = c
        vocab = out
    final = {"".join(s).replace(bpe.EOW, ""): list(s) for s in vocab}
    for w in wc:
        assert bpe.encode_word(w, ranks) == final[w]


def test_spark_encode_roundtrip_and_compression(spark):
    from pyspark.sql import functions as F

    from rq_spark.operators.dedup import normalize_text

    sdf = spark.read.parquet(f"{SF}/documents.parquet")
    merges = bpe.fit_bpe(sdf, "text", n_merges=60)
    out = sdf.select(
        normalize_text(F.col("text")).alias("norm"),
        bpe.bpe_tokens(merges, F.col("text")).alias("toks"),
        F.size(F.split(normalize_text(F.col("text")), " ")).alias("n_words"),
    ).collect()
    assert out
    for r in out:
        # lossless: decoding the tokens reproduces the normalized text
        assert bpe.decode_tokens(r["toks"]) == r["norm"]
        # tokens never split across words, so counts are ≥ words…
        assert len(r["toks"]) >= r["n_words"]
    # …but 60 merges on a tiny-vocabulary corpus must actually compress
    # vs characters: far fewer tokens than characters overall.
    n_toks = sum(len(r["toks"]) for r in out)
    n_chars = sum(len(r["norm"]) for r in out)
    assert n_toks < 0.5 * n_chars


def test_exhausted_corpus_stops_early(spark):
    import re

    sdf = spark.read.parquet(f"{SF}/documents.parquet").limit(1)
    # more merges than the one-document vocabulary can supply: the
    # trainer stops when no pair remains; every training word then
    # encodes to a SINGLE symbol (fully merged) and decodes losslessly
    merges = bpe.fit_bpe(sdf, "text", n_merges=10_000)
    assert len(merges) < 10_000
    ranks = {p: i for i, p in enumerate(merges)}
    text = sdf.collect()[0]["text"]
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    for w in set(norm.split(" ")):
        toks = bpe.encode_word(w, ranks)
        assert len(toks) == 1
        assert bpe.decode_tokens(toks) == w


def test_default_vocab_bound_matches_unbounded_and_is_distributed(spark):
    """r8: the driver-vocab bound is ON by default and changes nothing
    when the vocabulary fits it; the truncation itself compiles to
    TakeOrderedAndProject (per-partition heap), never a vocab sort."""
    sdf = spark.read.parquet(f"{SF}/documents.parquet")
    assert bpe.fit_bpe(sdf, "text", n_merges=20) == bpe.fit_bpe(
        sdf, "text", n_merges=20, max_vocab_words=None
    )
    plan = (
        bpe.truncated_vocab(sdf, "text", 25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
