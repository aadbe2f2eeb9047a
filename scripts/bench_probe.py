#!/usr/bin/env python3
"""Idle-machine probe for bench regression-gate failures.

The gate's contract (tests/test_bench_contract.py): a flagged query is
a REAL regression only if an isolated re-run on an idle machine
reproduces it.  This script runs each named query alone (1 untimed
warmup + 5 timed runs) in a fresh tuned session and prints the
timings, so the evidence that exonerates (-> high_variance /
rebaselined with reason) or convicts (-> fix the operator) is one
command away.

    python scripts/bench_probe.py q7_volume_shipping streaming_pingpong_events
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: bench_probe.py <query> [<query> ...]", file=sys.stderr)
        return 2

    import __spark_entry__ as entry
    from botkop_telcotraffic_spark_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="bench_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("q1_pricing_summary")  # session warmup
    out = {}
    for name in names:
        run(name)  # per-query codegen warmup
        out[name] = [round(run(name), 3) for _ in range(5)]
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
