#!/usr/bin/env python3
"""Merge N full bench runs into a per-name-MEDIAN snapshot.

Round-9 tooling for noisy machines: the round-9 boot showed burst
noise that elevates a RANDOM subset of queries 2-4x per run (three
full runs flagged three disjoint sets; every isolation probe
exonerated the operators — PROGRESS bench_probe_r9_3 /
bench_snapshot_r9).  A single-run snapshot taken on such a boot is a
poisoned baseline for the next round (the round-8 judge's explicit
complaint).  Per-name medians across runs collapse the bursts while
preserving every real, reproducible cost — the same philosophy as
the manifest's median-of-5 for high-variance names, applied at
snapshot time and recorded transparently in the metadata.

Round-12 luck guard (round-11 verdict #1): after merging, any name
whose new value IMPROVES more than bench.LUCKY_IMPROVEMENT_RATIO /
_FLOOR vs the previous committed snapshot is CLAMPED back to the
previous value unless explicitly accepted — an improvement with no
code change on its path is a fast-host-window artifact, and committing
it creates the baseline that convicts every honest later run (the
simhash_docs saga, five rounds of judge adjudication).  Accept a real
improvement with::

    --accept-improved name="evidence: commit/probe ref + reason"

Accepted names+reasons are recorded in the snapshot under
``improvement_evidence`` (the gates exempt them); clamped names are
recorded under ``luck_clamped`` with both values, so nothing is
silent.

Usage:
    python scripts/bench_median_snapshot.py run1.json run2.json run3.json \\
        [--accept-improved name=reason ...]
writes the merged snapshot to BENCH_LOCAL.json (commit it as
BENCH_LOCAL_r{N}.json per the round protocol).
"""
from __future__ import annotations

import argparse
import json
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument(
        "--accept-improved",
        action="append",
        default=[],
        metavar="NAME=REASON",
        help="accept a >1.3x improvement with recorded evidence",
    )
    args = ap.parse_args()
    paths = args.runs
    accept: dict[str, str] = {}
    for item in args.accept_improved:
        name, _, reason = item.partition("=")
        if not reason.strip():
            print(f"--accept-improved {name!r} needs a non-empty reason",
                  file=sys.stderr)
            return 2
        accept[name] = reason.strip()
    if len(paths) < 2:
        print("usage: bench_median_snapshot.py run1.json run2.json ...",
              file=sys.stderr)
        return 2
    runs = [json.load(open(p)) for p in paths]
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        if set(r["queries"]) != names:
            print("runs cover different query sets", file=sys.stderr)
            return 2
    merged = dict(runs[-1])  # confs/metadata from the newest run
    merged["queries"] = {
        n: round(statistics.median(r["queries"][n] for r in runs), 3)
        for n in sorted(names)
    }
    merged["cold"] = {
        n: round(statistics.median(r["cold"][n] for r in runs), 3)
        for n in sorted(names)
    }
    merged["value"] = round(sum(merged["queries"].values()), 3)
    merged["cold_total_sec"] = round(sum(merged["cold"].values()), 3)
    merged["merged_runs"] = len(runs)
    merged["merged_run_totals"] = [r["value"] for r in runs]
    merged["merged_run_ambients"] = [r.get("ambient_ratio") for r in runs]
    # recompute the ambient evidence from the merged controls
    from bench import (  # noqa: E402
        CONTROLS,
        _newest_snapshot_queries,
        ambient_ratio,
        lucky_improvements,
    )

    base_round, base_q = _newest_snapshot_queries()
    # luck guard (round-11 verdict #1): clamp unexplained >1.3x
    # improvements back to the previous committed value — see module
    # docstring; everything recorded, nothing silent
    unknown_accept = sorted(set(accept) - set(merged["queries"]))
    if unknown_accept:
        print(f"--accept-improved names not in the run: {unknown_accept}",
              file=sys.stderr)
        return 2
    lucky = lucky_improvements(merged["queries"], base_q, set(accept))
    clamped = {}
    for name, (prev_v, new_v) in sorted(lucky.items()):
        merged["queries"][name] = prev_v
        clamped[name] = {"measured": new_v, "kept": prev_v}
        print(f"luck-clamped {name}: measured {new_v}s kept {prev_v}s "
              f"(no improvement evidence; previous round r{base_round})")
    merged["value"] = round(sum(merged["queries"].values()), 3)
    if clamped:
        merged["luck_clamped"] = clamped
    if accept:
        merged["improvement_evidence"] = dict(sorted(accept.items()))
    merged["ambient_ratio"] = round(ambient_ratio(base_q, merged["queries"]), 3)
    merged["ambient_baseline_round"] = base_round
    merged["controls"] = {
        c: merged["queries"][c] for c in CONTROLS if c in merged["queries"]
    }
    out = REPO / "BENCH_LOCAL.json"
    with open(out, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print(f"merged {len(runs)} runs -> {out} (warm total {merged['value']})")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    sys.exit(main())
