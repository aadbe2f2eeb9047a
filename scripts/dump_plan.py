#!/usr/bin/env python3
"""Dump `.explain("formatted")` for named registry queries to
plans/r14/<query>_<tag>.txt (optimization-round evidence files).

    python scripts/dump_plan.py before cc_star_chain_components ...
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    if len(sys.argv) < 3:
        print("usage: dump_plan.py <tag> <query> [<query> ...]", file=sys.stderr)
        return 2
    tag, names = sys.argv[1], sys.argv[2:]

    import __spark_entry__ as entry
    from botkop_telcotraffic_spark_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote plans/r14/{name}_{tag}.txt ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
