#!/usr/bin/env python3
"""Split a registry query's warm cost into DataFrame-BUILD vs
noop-EXEC (optimization r13 measurement tool, guide §1/§7.3).

    python scripts/build_exec_split.py name1 name2 ... [--reps 3]

Build = calling queries()[name](spark, sf_dir) (driver-side plan
construction; for operators that collect model state during build —
MMR, k-means — this includes those distributed jobs).  Exec = the
noop-sink write of the returned frame.  Warm shape: one untimed full
run first per name.  Purely a measurement tool — never imported by
the engine.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    if not args:
        print("usage: build_exec_split.py <query> [...] [--reps=3]")
        return 2

    import __spark_entry__ as entry
    from botkop_telcotraffic_spark_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="build_exec_split")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    def full(name):
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    full("q1_pricing_summary")  # session warmup
    print(f"{'name':40s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    for name in args:
        full(name)  # codegen warmup
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if best is None or (t2 - t0) < best[2]:
                best = (t1 - t0, t2 - t1, t2 - t0)
        print(f"{name:40s} {best[0]:7.2f} {best[1]:7.2f} {best[2]:7.2f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
