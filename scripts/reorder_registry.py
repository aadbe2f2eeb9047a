#!/usr/bin/env python3
"""Reorder the _REGISTRY dict literal in __spark_entry__.py so the
driver's 50-slot correctness window holds the right entries.

The driver hash-checks the FIRST 50 registry entries each round
(newest-first standing rule, round-6 verdict #1).  This tool rewrites
the dict literal so that slots 1-50 are, in order:

  1. entries named in HEAD_ORDER (new this-round entries + entries
     whose engine code or oracle changed this round and need a
     re-check),
  2. every entry whose latest driver check is older than the rotation
     cut (max committed round - 4, matching the integrity test's
     5-round rotation period), oldest-first,
  3. next-oldest-checked entries as fillers up to slot 50.

Everything else keeps its current relative order below slot 50.
Idempotent: re-run after inserting a new entry at the insertion point
to re-normalise the window.
"""
from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ENTRY = REPO / "__spark_entry__.py"
WINDOW = 50

# New round-12 entries (newest first) followed by round-12 re-checks
# (code or oracle touched since their last driver check).
HEAD_ORDER = [
    # -- new round-12 entries, newest first --------------------------
    "streaming_ivf_maintenance",    # incremental IVF index via upsert store (r11 verdict #6)
    "png_decode_features",          # stdlib PNG codec round trip (r11 verdict #5)
    "cc_star_chain_components",     # CC-MR star contraction, chain oracle (r11 verdict #4)
    # -- re-checks: code or oracle touched in round 12 ----------------
    "retrieval_rerank_docs",        # oracle nq dedup (r11 ADVICE)
    "multimodal_decode_features",   # synth_images format-cycle param
    "dedup_clusters_docs",          # connected_components fallback param
    "corpus_curation_pipeline",     # connected_components fallback param
    "entity_resolution_parts",      # connected_components fallback param
    "dedup_ladder_docs",            # connected_components fallback param
    "semdedup_embeddings",          # connected_components fallback param
    "streaming_telco_fanout",       # replay-cache plan fingerprint (r11 ADVICE)
    "streaming_late_data_watermark",
    "streaming_kmeans_outliers",
    "streaming_incremental_dedup",
]


def latest_checks() -> dict[str, int]:
    latest: dict[str, int] = {}
    # round-10-safe: CORRECTNESS_r*.json with numeric parse (the old
    # r0* glob stopped matching at r10 — ADVICE r7 #3), same pattern
    # as tests/test_registry_integrity.py.
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)$", path.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        for name in json.loads(path.read_text()):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def parse_registry(src: str):
    """Return (prefix, entries, suffix) where entries is a list of
    (name, block_text) in current order."""
    m = re.search(r"^_REGISTRY: .*= \{\n", src, re.M)
    assert m, "registry literal not found"
    start = m.end()
    end = src.index("\n}", start)
    body = src[start:end]
    prefix, suffix = src[: start], src[end:]

    entries = []
    lines = body.split("\n")
    i = 0
    cur_name, cur_lines = None, []
    for line in lines:
        em = re.match(r'^    "([a-z0-9_]+)": ', line)
        if em:
            if cur_name:
                entries.append((cur_name, cur_lines))
            cur_name, cur_lines = em.group(1), [line]
        elif cur_name and line.startswith(("        ", "    ),")):
            cur_lines.append(line)
        # drop freestanding comment lines: regenerated below
    if cur_name:
        entries.append((cur_name, cur_lines))
    return prefix, entries, suffix


def main() -> int:
    src = ENTRY.read_text()
    prefix, entries, suffix = parse_registry(src)
    by_name = dict(entries)
    order = [n for n, _ in entries]
    assert len(by_name) == len(order), "duplicate registry keys"

    latest = latest_checks()
    missing = [n for n in HEAD_ORDER if n not in by_name]
    assert not missing, f"HEAD_ORDER names not in registry: {missing}"

    head = list(HEAD_ORDER)
    # never-checked entries not already named go right after the new ones
    for n in order:
        if n not in latest and n not in head:
            head.append(n)
    import math

    max_round = max(latest.values(), default=0)
    # registry-size-derived rotation period, in lockstep with
    # tests/test_registry_integrity.py (round-8 capacity fix): 50
    # slots/round re-check n entries every ceil(n/50) rounds + 1
    # round of slack for new entries; floor 5 keeps the round-6 bar
    period = max(5, math.ceil(len(order) / WINDOW) + 1)
    stale_cut = max_round - (period - 1)
    stale = sorted(
        (n for n in order
         if latest.get(n, 0) < stale_cut and n not in head),
        key=lambda n: latest.get(n, 0),
    )
    head += stale
    if len(head) > WINDOW:
        print(f"WARNING: head {len(head)} > window {WINDOW}; "
              f"overflow: {head[WINDOW:]}", file=sys.stderr)
    # fillers: next-oldest-checked entries, oldest first, stable order
    fillers = sorted(
        (n for n in order if n not in set(head)),
        key=lambda n: latest.get(n, 0),
    )
    head += fillers[: max(0, WINDOW - len(head))]

    rest = [n for n in order if n not in set(head)]
    final = head + rest
    assert sorted(final) == sorted(order)

    out = [prefix.rstrip("\n") + "\n"]
    out.append("    # -- checked slots 1-%d (driver window) -- see the\n"
               "    # comment above; regenerated by scripts/reorder_registry.py\n"
               "    # === NEW-ENTRY INSERTION POINT ===\n" % WINDOW)
    for pos, name in enumerate(final):
        if pos == len(HEAD_ORDER):
            out.append("    # -- stale rotation (oldest driver check "
                       "first) + fillers --\n")
        if pos == WINDOW:
            out.append("    # -- below slot %d: driver-green at latest "
                       "check; pytest oracle-parity\n    # sweep still "
                       "covers every entry each run --\n" % WINDOW)
        out.append("\n".join(by_name[name]) + "\n")
    out.append(suffix.lstrip("\n"))
    new_src = "".join(out)

    # self-check: the rewrite must preserve every entry byte-for-byte
    # (only order and section comments may change)
    _, new_entries, _ = parse_registry(new_src)
    new_by_name = dict(new_entries)
    assert set(new_by_name) == set(by_name), "entry set changed"
    changed = [n for n in by_name if new_by_name[n] != by_name[n]]
    assert not changed, f"entry bodies changed: {changed}"

    ENTRY.write_text(new_src)
    print(f"window[1-{WINDOW}]:")
    for i, n in enumerate(final[:WINDOW], 1):
        print(f"  {i:2d}. {n} (last r{latest.get(n, '--')})")
    print(f"total entries: {len(final)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
