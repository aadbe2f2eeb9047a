#!/usr/bin/env python3
"""Hostile driver simulation: replay the per-round correctness gate
locally before the real driver does.

Runs the FIRST ``--window`` (default 50) registry entries — exactly
the slots the driver checks — at sf0.01 (driver scale), comparing the
Spark result with the DuckDB oracle through a PANDAS round-trip
(``.toPandas()`` / ``.df()`` + ``astype(str)`` + column-name sort +
row sort + sha256), which is closer to the driver's value-hash than
``fetchall`` and catches dtype traps (HUGEINT→float64, datetime64
units) the in-suite sweep can miss.

    python scripts/driver_sim.py                  # window, sf0.01
    python scripts/driver_sim.py --names a,b,c    # subset
    python scripts/driver_sim.py --sf sf0.001
"""
from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def pandas_hash(df) -> tuple[int, str, str]:
    cols = sorted(df.columns)
    df = df[cols].astype(str)
    df = df.sort_values(by=cols).reset_index(drop=True)
    payload = df.to_csv(index=False).encode()
    return len(df), ",".join(cols), hashlib.sha256(payload).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--names", default=None)
    ap.add_argument("--cpus", default="8")
    ap.add_argument(
        "--hostile", action="store_true",
        help="vanilla SparkSession, non-UTC timezone, no engine confs "
             "(the verify-skill recipe: catches hidden get_spark deps)",
    )
    args = ap.parse_args()
    sf_dir = f"/root/testdata/{args.sf}"

    import duckdb

    import __spark_entry__ as entry
    from botkop_telcotraffic_spark_spark.session import get_spark

    queries, oracles = entry.queries(), entry.oracle_sql()
    if args.names:
        names = args.names.split(",")
    else:
        names = list(queries)[: args.window]

    if args.hostile:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(f"local[{args.cpus}]")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.sql.shuffle.partitions", args.cpus)
            .config("spark.driver.memory", "16g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(
            app_name="driver_sim",
            master=f"local[{args.cpus}]",
            shuffle_partitions=int(args.cpus) * 2,
            extra_conf={"spark.driver.memory": "16g"},
        )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results, n_green = {}, 0
    for name in names:
        t0 = time.time()
        row: dict[str, object] = {}
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                sn, sc, sh = pandas_hash(sdf)
                on, oc, oh = pandas_hash(odf)
                row = {
                    "rows_match": sn == on,
                    "schema_match": sc == oc,
                    "hash_match": sh == oh,
                    "spark_rows": sn,
                    "oracle_rows": on,
                    "err": None,
                }
                ok = bool(row["hash_match"] and row["schema_match"])
            else:
                row = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": len(sdf),
                    "oracle_rows": None, "err": "no_oracle",
                }
                ok = True
        except Exception as exc:  # noqa: BLE001 — sim must survive any query
            row = {"hash_match": False, "err": f"{type(exc).__name__}: {exc}"}
            ok = False
        n_green += ok
        status = "ok " if ok else "FAIL"
        print(f"{status} {name:42s} {time.time() - t0:6.2f}s "
              f"{'' if ok else row.get('err') or 'hash/schema mismatch'}",
              flush=True)
        results[name] = row

    out = REPO / "DRIVER_SIM_LOCAL.json"
    out.write_text(json.dumps(results, indent=1, default=str))
    print(f"\n{n_green}/{len(names)} green at {args.sf} -> {out}")
    spark.stop()
    return 0 if n_green == len(names) else 1


if __name__ == "__main__":
    sys.exit(main())
