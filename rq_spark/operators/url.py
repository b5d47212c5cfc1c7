"""URL canonicalization + domain operators — the URL-level hygiene
pass of a web-corpus pipeline (C4/RefinedWeb-style: dedup documents by
canonical URL, cap any one domain's share of the corpus).

Pure `pyspark.sql.functions` expressions (codegen, zero Python, zero
shuffle) built ONLY from regex/string/array primitives that DuckDB
mirrors verbatim, so every output is oracle-checkable:

* scheme and authority lowercased (RFC 3986 §6.2.2.1 case
  normalization — scheme and host are case-insensitive; path/query
  are NOT touched),
* default ports stripped (http:80 / https:443, §6.2.3),
* fragments dropped (never sent to the server, §3.5),
* tracking query parameters removed (utm_*, fbclid, gclid — the
  standard crawl-dedup scrub) and the REMAINING parameters sorted
  byte-wise, so param order never splits one logical URL into two
  dedup keys,
* trailing path slashes collapsed ('' and '/' both canonicalize to
  '/', deeper paths lose the trailing slash).

`url_domain` is the naive registrable domain (last two labels) — the
honest approximation available without the Public Suffix List (which
is versioned data, not an algorithm; production swaps in a PSL lookup
table via a broadcast join without changing the plan shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# one master parse regex, group numbering identical in Java regex and
# RE2: 1=scheme, 2=authority, 3=path, 5=query (4 wraps the '?')
_PARTS = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?([^#]*))?(#.*)?$"

# the standard crawl-scrub list: analytics/click identifiers that vary
# per visit but never change the fetched content
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref_src)="


def _scheme(col: Column) -> Column:
    return F.lower(F.regexp_extract(col, _PARTS, 1))


def _authority(col: Column) -> Column:
    return F.lower(F.regexp_extract(col, _PARTS, 2))


def url_host(col: Column) -> Column:
    """Lowercased host with any :port stripped; '' for non-URLs."""
    return F.regexp_replace(_authority(col), r":[0-9]*$", "")


def url_domain(col: Column) -> Column:
    """Naive registrable domain: the last two dot-labels of the host
    (module docstring discusses the PSL caveat); the full host when it
    has fewer than two labels."""
    host = url_host(col)
    tail = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(tail != "", tail).otherwise(host)


def url_normalize(col: Column) -> Column:
    """Canonical URL string (module docstring lists the rules).
    Non-URL inputs (no scheme://authority) canonicalize to NULL so
    callers can filter or count them explicitly."""
    scheme = _scheme(col)
    auth = _authority(col)
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    host = F.regexp_replace(auth, r":[0-9]*$", "")
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    authority = F.when(default | (port == ""), host).otherwise(
        F.concat(host, F.lit(":"), port)
    )
    raw_path = F.regexp_extract(col, _PARTS, 3)
    trimmed = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(col, _PARTS, 5), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.array_join(params, "&")
    tail = F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query))
    return F.when(
        scheme != "",
        F.concat(scheme, F.lit("://"), authority, path, tail),
    )


def domain_cap(
    df: DataFrame,
    url_col: str,
    order_col: str,
    max_per_domain: int,
) -> DataFrame:
    """Per-domain frequency capping — no domain contributes more than
    ``max_per_domain`` documents (the anti-boilerplate guard of crawl
    corpora, where one template site can dominate a shard). Adds
    `domain`, `domain_rank` (1-based, deterministic: ordered by
    ``order_col``) and `domain_keep`.

    Scale shape: ONE hash-partitioned window on `domain` — shuffle
    keyed on the capping key itself, state O(1) per row. A pathological
    mega-domain (half the crawl is one host) makes that key hot; the
    standard fix composes from existing pieces — pre-filter with
    `mixture_sample` on the hot domains before ranking."""
    w = Window.partitionBy("domain").orderBy(order_col)
    return (
        df.withColumn("domain", url_domain(F.col(url_col)))
        .withColumn("domain_rank", F.row_number().over(w))
        .withColumn("domain_keep", F.col("domain_rank") <= max_per_domain)
    )
