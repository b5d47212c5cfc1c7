"""Build a perf-only scaled corpus (default 3x sf0.1 -> "sf0.3") for
the scale-ladder datapoints (r10, r9 verdict task #4; r11 density
mode, r10 verdict task #3).

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
  is the realistic direction for BPE/LM/bloom costs. The ``source``
  column is kept VERBATIM in every replica (ADVICE r10: the old
  ``source || 'r0'`` rewrite pushed all replica docs into the lowest
  mixture tier — rate 0.25 — biasing tier-sampled keys sublinear; a
  bigger crawl has BIGGER sources, not k times more sources, and
  unchanged names keep every replica in its original tier).
* **density mode** (``dup_rate`` > 0, r11): replica r > 0 leaves the
  text of docs with ``doc_id % round(1/dup_rate) == r`` UNPERTURBED —
  each perturbed replica contributes ~dup_rate unplanted twins of
  replica-0 docs, so the cross-replica near-dup rate (and with it the
  candidate and verify-join volume of the dedup keys) grows with k at
  a controlled rate instead of being pinned at zero. This is how real
  crawls scale: organically DENSER, more true pairs per doc — the
  blind spot the r10 ladder documented.
* ``events``: k replicas with user_id and event_id offset per replica,
  timestamps unchanged — distinct keys and stream/join state scale by
  k while the event-time horizon stays fixed, matching a service with
  k times the traffic over the same wall-clock window.
* every other table: copied verbatim (the heavy keys under study read
  documents/events only; dims stay dims).

This corpus is for TIMING ONLY — it lives outside the repo and the
oracle gate never runs on it.

Usage: python tools/make_scale_ladder.py [k] [src_sf_dir] [out_dir]
       [dup_rate]
Defaults: 3 /root/testdata/sf0.1 /tmp/rq_scale/sf0.3 0.0
Density rung used by SURVEY §6: dup_rate 0.01, out /tmp/rq_scale/sf0.3d
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem embeddings"
).split()


def build(k: int, src: str, out: str, dup_rate: float = 0.0) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    doc_off = con.sql(
        f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'"
    ).fetchone()[0]
    # replica 0 is VERBATIM sf0.1; perturbed replicas recompute n_chars
    # from the perturbed text and keep source/lang verbatim
    twin_mod = round(1 / dup_rate) if dup_rate > 0 else 0
    if twin_mod and twin_mod < k:
        # doc_id % twin_mod == r is unsatisfiable for r >= twin_mod, so
        # replicas would silently contribute NO twins and the realized
        # density would undershoot the request — reject rather than lie
        raise ValueError(
            f"dup_rate {dup_rate} needs twin_mod >= k ({twin_mod} < {k}): "
            "lower dup_rate or k"
        )
    parts = []
    for r in range(k):
        if r == 0:
            parts.append(
                "SELECT doc_id, text, lang, source, n_chars "
                f"FROM '{src}/documents.parquet'"
            )
            continue
        perturbed = (
            "array_to_string(list_transform(string_split(text, ' '), "
            f"w -> w || '_{r}'), ' ')"
        )
        text_expr = (
            f"CASE WHEN doc_id % {twin_mod} = {r} THEN text "
            f"ELSE {perturbed} END"
            if twin_mod
            else perturbed
        )
        parts.append(
            f"""SELECT doc_id + {r * doc_off} AS doc_id,
                   {text_expr} AS text,
                   lang, source,
                   length({text_expr}) AS n_chars
            FROM '{src}/documents.parquet'"""
        )
    con.execute(
        "COPY ({}) TO '{}/documents.parquet' (FORMAT PARQUET)".format(
            "\nUNION ALL\n".join(parts), out
        )
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
    dup = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    build(k, src, out, dup)
    print(f"wrote {out} (k={k} from {src}, dup_rate={dup})")
