"""Line-level corpus quality rules from the two canonical published
filter sets — Gopher/MassiveText (Rae et al. 2021, appendix A) and C4
(Raffel et al. 2020, §2.2) — the document/line heuristics every LLM
pretraining pipeline runs after PII scrubbing and before dedup.

Everything here is a pure Column expression over a pre-split
``array<string>`` of lines: no UDF, no shuffle, no second scan — the
rules ride inside the same single 'score every document once'
projection as the rest of text_metrics. The duplicate-line-character
rule is O(lines² per document), which is constant per document and
embarrassingly parallel — at 100 TB it is still a scan.

Rule fidelity vs the papers:
- Gopher repetition: duplicate line fraction ≤ 0.30, duplicate line
  CHARACTER fraction ≤ 0.20 (Table A2; the n-gram repetition family
  is covered by operators/text.py dup_ngram_frac).
- Gopher quality: word count in [50, 100_000], mean word length in
  [3, 10], symbol-to-word ratio ('#' or '...') ≤ 0.1, ≤ 90% of lines
  starting with a bullet, ≤ 30% ending in an ellipsis, ≥ 80% of words
  containing an alphabetic character, ≥ `min_stop_hits` distinct
  stop words present (paper: 2 of the 8-word set).
- C4 line filter: keep lines that end in terminal punctuation AND
  have at least `min_words` words (paper: 3); document-level 'at
  least N sentences' is expressible as a threshold on the kept-line
  count downstream.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import normalize_text, word_count

# The Gopher paper's stop-word set (appendix A1).
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def _dbl(c: Column) -> Column:
    return c.cast("double")


def _is_terminal(x: Column) -> Column:
    return x.endswith(".") | x.endswith("!") | x.endswith("?")


def line_rules(lines: Column) -> dict[str, Column]:
    """The per-document line-shape signals, as exact-count ratios
    (single IEEE division each, engine-portable)."""
    n = F.size(lines)
    # chars in EXCESS copies of duplicated lines (first occurrence
    # excluded) — the same convention as frac_dup_lines' 1−distinct/n,
    # and the published MassiveText counting; iterating DISTINCT lines
    # keeps the nested count O(distinct·lines) and each copy counted
    # once
    dup_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0),
        lambda acc, x: acc
        + (F.size(F.filter(lines, lambda y: y == x)) - 1) * F.length(x),
    )
    total_chars = F.aggregate(lines, F.lit(0), lambda acc, x: acc + F.length(x))
    return {
        "n_lines": n,
        "frac_bullet_lines": _dbl(F.size(F.filter(lines, lambda x: x.startswith("- ")))) / n,
        "frac_ellipsis_lines": _dbl(F.size(F.filter(lines, lambda x: x.endswith("...")))) / n,
        "frac_terminal_lines": _dbl(F.size(F.filter(lines, _is_terminal))) / n,
        "frac_dup_lines": F.lit(1.0) - _dbl(F.size(F.array_distinct(lines))) / n,
        # all-empty lines → 0 total chars: the ratio is undefined, NULL
        # (ANSI double division raises DIVIDE_BY_ZERO — r10 adversarial
        # probe, whitespace-only document)
        "frac_dup_line_chars": _dbl(dup_chars)
        / F.nullif(_dbl(total_chars), F.lit(0.0)),
    }


def symbol_word_ratio(text: Column, n_words: Column) -> Column:
    """Gopher's symbol rule: '#' and ellipsis occurrences per word."""
    symbols = F.regexp_count(text, F.lit("#")) + F.regexp_count(
        text, F.lit(r"\.\.\.")
    )
    return _dbl(symbols) / n_words


def frac_alpha_words(text: Column) -> Column:
    """Fraction of words containing at least one alphabetic char."""
    words = F.split(normalize_text(text), " ")
    return _dbl(F.size(F.filter(words, lambda x: x.rlike("[a-z]")))) / F.size(words)


def stop_hits(text: Column) -> Column:
    """How many DISTINCT Gopher stop words appear in the text."""
    return sum(
        ((word_count(text, w) > 0).cast("int") for w in GOPHER_STOPWORDS),
        F.lit(0),
    )


def gopher_keep(
    text: Column,
    lines: Column,
    *,
    min_stop_hits: int = 2,
) -> Column:
    """The full Gopher accept/reject conjunction over the published
    thresholds (see module docstring), as an int 0/1 column.
    ``min_stop_hits`` exists because the rule is corpus-relative: the
    paper's 2-of-8 assumes natural English; a corpus whose vocabulary
    carries only one of the stop words needs 1 to stay discriminative.
    """
    words = F.split(normalize_text(text), " ")
    n_words = F.size(words)
    mean_wl = _dbl(F.length(F.concat_ws("", words))) / n_words
    r = line_rules(lines)
    keep = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (mean_wl >= 3.0)
        & (mean_wl <= 10.0)
        & (symbol_word_ratio(F.array_join(lines, "\n"), n_words) <= 0.1)
        & (r["frac_bullet_lines"] <= 0.9)
        & (r["frac_ellipsis_lines"] <= 0.3)
        & (frac_alpha_words(text) >= 0.8)
        & (stop_hits(text) >= min_stop_hits)
        & (r["frac_dup_lines"] <= 0.30)
        & (r["frac_dup_line_chars"] <= 0.20)
    )
    return keep.cast("int")


def c4_keep_lines(lines: Column, min_words: int = 3) -> Column:
    """C4's line filter: the array of retained lines (terminal
    punctuation + at least ``min_words`` words). The cleaned document
    is ``array_join(kept, '\\n')``; a document-level 'enough
    sentences' gate is ``size(kept) >= N``."""
    return F.filter(
        lines,
        lambda x: _is_terminal(x) & (F.size(F.split(x, " ")) >= min_words),
    )
