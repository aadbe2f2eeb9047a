#!/usr/bin/env python3
"""Per-job profile of one or more registry queries (optimization r13).

Runs each named query in a fresh tuned session with the Spark UI
enabled, then scrapes the UI REST API for per-job wall times so the
expensive jobs inside a multi-job query (iterative loops, foreachBatch
replays, store upserts) are individually attributable.

    python scripts/perf_profile.py streaming_incremental_dedup

Prints per-query: total wall, then every Spark job (id, duration,
description/callsite) sorted by submission.  Purely a measurement
tool — never imported by the engine.
"""
from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: perf_profile.py <query> [<query> ...]", file=sys.stderr)
        return 2

    import __spark_entry__ as entry
    from botkop_telcotraffic_spark_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="perf_profile", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    qs = entry.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def jobs_after(job_floor: int) -> list[dict]:
        app = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications")
        )[0]["id"]
        jobs = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"
            )
        )
        out = []
        for j in jobs:
            if j["jobId"] <= job_floor:
                continue
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            out.append(
                {
                    "jobId": j["jobId"],
                    "name": (j.get("name") or "")[:110],
                    "desc": (j.get("description") or "")[:110],
                    "submission": sub,
                    "completion": comp,
                    "numTasks": j.get("numTasks"),
                    "stages": j.get("stageIds"),
                }
            )
        return sorted(out, key=lambda d: d["jobId"])

    def parse_ts(s: str) -> float:
        # "2026-08-17T12:34:56.789GMT"
        from datetime import datetime

        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    run("q1_pricing_summary")  # session warmup
    for name in names:
        run(name)  # codegen warmup — profile the WARM shape
        floor = max(
            (j["jobId"] for j in jobs_after(-1)), default=-1
        )
        wall = run(name)
        jl = jobs_after(floor)
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jl)} jobs ===")
        prev_end = None
        for j in jl:
            dur = parse_ts(j["completion"]) - parse_ts(j["submission"])
            gap = (
                parse_ts(j["submission"]) - prev_end
                if prev_end is not None
                else 0.0
            )
            prev_end = parse_ts(j["completion"])
            label = j["desc"] or j["name"]
            print(
                f"  job {j['jobId']:>4}  {dur:7.3f}s  gap {gap:6.3f}s "
                f" tasks {j['numTasks']:>3}  {label}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
