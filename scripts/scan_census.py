#!/usr/bin/env python3
"""Static FileScan census over every registry entry's physical plan.

Writes SCAN_CENSUS_r{N}.json ({entry_name: filescan_count}) — the
plan-hygiene audit SCALE.md's round-7 section institutionalized: a
static count of `FileScan` occurrences in each query's executedPlan.
The count OVER-states real I/O when identical subtrees share a
shuffle (ReusedExchange) — treat outliers as leads for a runtime
check, not verdicts.  tests/test_plans.py compares the two newest
committed census files and fails CI on unexplained round-over-round
growth (round-7 verdict #8).

Usage:
    python scripts/scan_census.py --round 8 [--names a,b,c] [--sf sf0.001]

Streaming replay entries (those that run availableNow micro-batches
eagerly at build time) are counted like any other: whatever FileScan
nodes their RETURNED batch plan holds.
"""
from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def newest_committed_round() -> int:
    rounds = [
        int(m.group(1))
        for p in REPO.glob("SCAN_CENSUS_r*.json")
        if (m := re.search(r"_r(\d+)$", p.stem))
    ]
    return max(rounds, default=0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="census round number (default: newest + 1)")
    ap.add_argument("--names", default=None,
                    help="comma-separated subset (default: all entries; "
                         "subset runs UPDATE the target file in place)")
    ap.add_argument("--sf", default="sf0.001")
    args = ap.parse_args()

    rnd = args.round or newest_committed_round() + 1
    out_path = REPO / f"SCAN_CENSUS_r{rnd:02d}.json"

    sys.path.insert(0, str(REPO))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("scan-census")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = args.names.split(",") if args.names else list(qs)
    unknown = [n for n in names if n not in qs]
    assert not unknown, f"unknown entries: {unknown}"

    census: dict[str, int] = {}
    if args.names and out_path.exists():
        census = json.loads(out_path.read_text())
    sf_dir = f"/root/testdata/{args.sf}"
    for i, name in enumerate(names, 1):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            census[name] = plan.count("FileScan")
        except Exception as exc:  # noqa: BLE001 - census must finish
            print(f"ERR {name}: {exc}", file=sys.stderr)
            census[name] = -1
        print(f"[{i}/{len(names)}] {name}: {census[name]}", flush=True)

    out_path.write_text(json.dumps(census) + "\n")
    print(f"-> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
