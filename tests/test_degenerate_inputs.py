"""Degenerate-input robustness (round-8, msprt-crash class).

Under ANSI mode a division whose denominator is only *usually*
nonzero is a CRASH, not a wrong value — and at 100 TB degenerate
batches (one arm empty, every value identical, an empty partition
day) are routine, so a scalar-statistic operator must return zero
rows or a defined row, never raise.  The round-8 boundary sweep found
exactly this in msprt_test (V = 0 divide-by-zero); this module pins
the contract for the whole round-before-derive family.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from botkop_telcotraffic_spark_spark.operators.experiment import (
    anova_oneway,
    mann_whitney_auc,
    msprt_test,
    ucb1_readout,
    welch_t,
)
from botkop_telcotraffic_spark_spark.operators.survival import logrank_test


def _arm_df(spark, rows):
    return spark.createDataFrame(rows, "arm string, v double")


EMPTY: list = []
ONE_ROW = [("a", 1.0)]
CONSTANT = [("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 2.0)]
ONE_ARM = [("a", 1.0), ("a", 2.0), ("a", 3.0)]


@pytest.mark.parametrize(
    "rows", [EMPTY, ONE_ROW, CONSTANT, ONE_ARM],
    ids=["empty", "one_row", "constant", "one_arm"],
)
def test_welch_t_degenerate_never_raises(spark, rows):
    out = welch_t(_arm_df(spark, rows), "arm", "v", "a", "b").collect()
    # zero-variance / missing-arm inputs drop the row (se2 > 0 guard)
    assert out == [] or out[0]["n_a"] >= 2


@pytest.mark.parametrize(
    "rows", [EMPTY, ONE_ROW, CONSTANT, ONE_ARM],
    ids=["empty", "one_row", "constant", "one_arm"],
)
def test_msprt_degenerate_never_raises(spark, rows):
    out = msprt_test(_arm_df(spark, rows), "v", "arm", "a", "b").collect()
    # V = 0 (both arms constant) and missing-arm inputs yield no row
    assert out == [] or out[0]["log_lambda"] is not None


@pytest.mark.parametrize(
    "rows", [EMPTY, ONE_ROW, CONSTANT, ONE_ARM],
    ids=["empty", "one_row", "constant", "one_arm"],
)
def test_ucb1_degenerate_never_raises(spark, rows):
    out = ucb1_readout(_arm_df(spark, rows), "arm", "v").collect()
    assert len(out) == len({a for a, _ in rows})
    if out:
        assert sum(r["best"] for r in out) == 1


@pytest.mark.parametrize(
    "rows", [EMPTY, ONE_ROW, CONSTANT, ONE_ARM],
    ids=["empty", "one_row", "constant", "one_arm"],
)
def test_anova_degenerate_never_raises(spark, rows):
    out = anova_oneway(_arm_df(spark, rows), "arm", "v").collect()
    assert len(out) <= 1


@pytest.mark.parametrize(
    "rows",
    [
        [],
        [("g1", 1, 1.0)],                      # one row, one class
        [("g1", 1, 2.0), ("g1", 0, 2.0)],       # all-tied scores
        [("g1", 1, 1.0), ("g1", 1, 2.0)],       # positives only
    ],
    ids=["empty", "one_row", "all_tied", "one_class"],
)
def test_mann_whitney_degenerate_never_raises(spark, rows):
    df = spark.createDataFrame(rows, "g string, label int, score double")
    out = mann_whitney_auc(df, ["g"], "label", "score").collect()
    # groups lacking either class are dropped (AUC undefined);
    # all-tied scores give the defined AUC = 0.5
    assert len(out) <= 1
    if out:
        assert out[0]["auc"] == 0.5


def test_logrank_degenerate_never_raises(spark):
    # all-censored and single-subject inputs: no variance -> no row
    cens = spark.createDataFrame(
        [("a", 1.0, False), ("b", 2.0, False)],
        "g string, dur double, obs boolean",
    )
    assert logrank_test(cens, "dur", "obs", "g", "a", "b").count() == 0
    one = spark.createDataFrame(
        [("a", 1.0, True)], "g string, dur double, obs boolean"
    )
    assert logrank_test(one, "dur", "obs", "g", "a", "b").count() == 0
    empty = spark.createDataFrame([], "g string, dur double, obs boolean")
    assert logrank_test(empty, "dur", "obs", "g", "a", "b").count() == 0


# --- round-9 (round-8 verdict #6): exact-mode group-size guard ------------


def test_iqr_exact_oversized_group_fails_fast(spark):
    """iqr_bounds(mode='exact') on a group past max_exact_group raises
    a named error pointing at the approx fallback instead of silently
    materializing an unbounded sorted list downstream."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from botkop_telcotraffic_spark_spark.operators.iqr import iqr_bounds

    df = spark.range(0, 50).select(
        F.lit("k").alias("k"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException)) as exc:
        iqr_bounds(df, ["k"], "v", mode="exact", max_exact_group=10).collect()
    assert "max_exact_group=10" in str(exc.value)
    assert "mode='approx'" in str(exc.value)
    # at or under the limit, same data passes
    ok = iqr_bounds(df, ["k"], "v", mode="exact", max_exact_group=50).collect()
    assert len(ok) == 1 and ok[0]["n"] == 50
    # the approx fallback named by the error has no such ceiling
    ap = iqr_bounds(df, ["k"], "v", mode="approx", max_exact_group=10).collect()
    assert len(ap) == 1


def test_anomaly_ensemble_oversized_group_fails_fast(spark, monkeypatch):
    """The ensemble's shared sorted-list aggregate inherits the guard:
    with the module ceiling patched below the fixture's group sizes,
    the entry fails fast with the named error; untouched, it runs."""
    import __spark_entry__ as entry_mod
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from botkop_telcotraffic_spark_spark.operators import iqr as _iqr
    from tests.conftest import SF_DIR_001

    monkeypatch.setattr(_iqr, "MAX_EXACT_GROUP", 3)
    with pytest.raises((Py4JJavaError, SparkRuntimeException)) as exc:
        entry_mod.anomaly_ensemble_events(spark, SF_DIR_001).collect()
    assert "max_exact_group=3" in str(exc.value)
    assert "anomaly_ensemble" in str(exc.value)


# --- round-9 magnitude sweep, second pass: log/ratio sites ----------------


def test_weighted_sample_nonpositive_weights_dropped(spark):
    """A-ES priority needs w > 0: zero weight is the never-sampled
    limit, negative weight would flip the ranking (pr > 0, sampled
    FIRST).  Both are dropped before ranking; every emitted priority
    is finite."""
    import math

    from botkop_telcotraffic_spark_spark.operators.sampling import (
        weighted_hash_sample,
    )

    rows = [("a", 1.0), ("b", 0.0), ("c", -5.0), ("d", 2.0), ("e", None),
            ("f", 3.0)]
    df = spark.createDataFrame(rows, "k string, w double")
    out = weighted_hash_sample(df, "k", "w", k=10).collect()
    kept = {r["k"] for r in out}
    assert kept == {"a", "d", "f"}
    assert all(math.isfinite(r["sample_priority"]) for r in out)


def test_woe_one_class_corpus_yields_null_not_inf(spark):
    """WoE with a zero class TOTAL (all labels identical) is
    undefined: the engine answers NULL, never ±Inf (the 0.5 Laplace
    smoothing only guards empty cells, not an empty class)."""
    import math

    from botkop_telcotraffic_spark_spark.operators.encode import woe_iv

    df = spark.createDataFrame(
        [("x", 1), ("x", 1), ("y", 1)], "cat string, label int"
    )
    out = woe_iv(df, "cat", "label").collect()
    assert len(out) == 2
    for r in out:
        assert r["woe"] is None and r["iv_term"] is None
    # two-class corpora keep finite values
    df2 = spark.createDataFrame(
        [("x", 1), ("x", 0), ("y", 1), ("y", 0)], "cat string, label int"
    )
    for r in woe_iv(df2, "cat", "label").collect():
        assert math.isfinite(r["woe"])
