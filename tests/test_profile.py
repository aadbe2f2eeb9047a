"""operators/profile.py — dataset profiling + data-quality gates."""

from __future__ import annotations

from botkop_telcotraffic_spark_spark.operators.profile import (
    check_constraints,
    profile_columns,
)
from botkop_telcotraffic_spark_spark.plans.inspect import physical_plan


def test_profile_values_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", None), (3, None, 30.0), (4, "b", 20.0)],
        ["id", "s", "v"],
    )
    rows = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert set(rows) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in rows.values())

    assert rows["s"]["n_null"] == 1
    assert rows["s"]["null_frac"] == 0.25
    assert rows["s"]["min_num"] is None  # non-numeric: no numeric range
    assert rows["v"]["n_null"] == 1
    assert rows["v"]["min_num"] == 10.0
    assert rows["v"]["max_num"] == 30.0
    assert rows["v"]["mean_num"] == 20.0  # avg ignores the NULL
    assert rows["id"]["n_null"] == 0


def test_profile_exact_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None)], ["id", "s"]
    )
    rows = {
        r["col_name"]: r
        for r in profile_columns(df, exact_distinct=True).collect()
    }
    assert rows["s"]["n_distinct"] == 2  # NULL not counted
    assert rows["id"]["n_distinct"] == 4


def test_profile_is_single_scan(spark, sf_dir):
    """The whole profile must be ONE scan + one single-row exchange —
    a per-column loop of scans is exactly what this operator exists
    to avoid at 100 TB."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = physical_plan(profile_columns(o))
    assert plan.count("Scan parquet") == 1, plan


def test_constraints_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], ["id", "v"]
    )
    rows = {
        r["check_name"]: r
        for r in check_constraints(
            df, {"v_positive": "v > 0", "id_not_null": "id IS NOT NULL"}
        ).collect()
    }
    # NULL comparison is a violation, not an unknown-pass
    assert rows["v_positive"]["n_violations"] == 2
    assert rows["v_positive"]["passed"] is False
    assert rows["id_not_null"]["n_violations"] == 0
    assert rows["id_not_null"]["passed"] is True
    assert rows["v_positive"]["violation_frac"] == round(2 / 3, 6)


def test_constraints_single_pass(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = physical_plan(
        check_constraints(
            o, {"a": "o_totalprice > 0", "b": "o_orderkey IS NOT NULL"}
        )
    )
    assert plan.count("Scan parquet") == 1, plan
