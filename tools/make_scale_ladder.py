"""Build a perf-only scaled corpus (default 3x sf0.1 -> "sf0.3") for
the scale-ladder datapoint (r10, r9 verdict task #4).

Scaling method — replicate-and-PERTURB, not replicate-verbatim:

* ``documents``: k replicas; replica r > 0 suffixes every word with
  ``_r`` and offsets doc_id by r * (max_id + 1). Verbatim replication
  would give every document k-1 exact twins — the dedup keys would
  then measure a pathological pair explosion (pairs ~ k^2), not a
  bigger corpus. The per-word suffix keeps each replica's INTERNAL
  near-dup structure exactly equal to sf0.1 while cross-replica
  shingle/token overlap drops to zero, so pair counts, cluster sizes,
  and LSH bucket loads scale linearly in k — what a genuinely larger
  crawl looks like. Vocabulary also scales (~k distinct tokens), which
  is the realistic direction for BPE/LM/bloom costs.
* ``events``: k replicas with user_id and event_id offset per replica,
  timestamps unchanged — distinct keys and stream/join state scale by
  k while the event-time horizon stays fixed, matching a service with
  k times the traffic over the same wall-clock window.
* every other table: copied verbatim (the heavy keys under study read
  documents/events only; dims stay dims).

This corpus is for TIMING ONLY — it lives outside the repo and the
oracle gate never runs on it.

Usage: python tools/make_scale_ladder.py [k] [src_sf_dir] [out_dir]
Defaults: 3 /root/testdata/sf0.1 /tmp/rq_scale/sf0.3
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem embeddings"
).split()


def build(k: int, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    doc_off = con.sql(
        f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'"
    ).fetchone()[0]
    # replica 0 is VERBATIM sf0.1 (same source names, same n_chars);
    # perturbed replicas keep source parseable by suffixing after the
    # srcN stem and recompute n_chars from the perturbed text
    reps = "\nUNION ALL\n".join(
        "SELECT doc_id AS doc_id, text, lang, source, n_chars "
        f"FROM '{src}/documents.parquet'"
        if r == 0
        else f"""SELECT doc_id + {r * doc_off} AS doc_id,
               array_to_string(list_transform(string_split(text, ' '),
               w -> w || '_{r}'), ' ') AS text,
               lang, source || '{r}0' AS source,
               length(array_to_string(list_transform(string_split(text,
               ' '), w -> w || '_{r}'), ' ')) AS n_chars
        FROM '{src}/documents.parquet'"""
        for r in range(k)
    )
    con.execute(
        f"COPY ({reps}) TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    ev = con.sql(
        f"SELECT max(user_id) + 1, max(event_id) + 1 "
        f"FROM '{src}/events.parquet'"
    ).fetchone()
    u_off, e_off = ev
    reps = "\nUNION ALL\n".join(
        f"""SELECT event_id + {r * e_off} AS event_id, ts,
               user_id + {r * u_off} AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet'"""
        for r in range(k)
    )
    con.execute(
        f"COPY ({reps}) TO '{out}/events.parquet' (FORMAT PARQUET)"
    )
    con.close()


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/rq_scale/sf0.3"
    build(k, src, out)
    print(f"wrote {out} (k={k} from {src})")
