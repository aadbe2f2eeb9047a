"""Tests for the operational surface: state-store reader, in-plan
observation, SQL UDFs, and the simulator-driven end-to-end pipeline."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from botkop_telcotraffic_spark_spark.functions.sqlfn import register_sql_functions
from botkop_telcotraffic_spark_spark.operators.monitor import observe_quality
from botkop_telcotraffic_spark_spark.streaming import state_inspect
from botkop_telcotraffic_spark_spark.streaming.runner import (
    run_to_memory,
    stream_parquet_table,
)


def test_state_reader_sees_agg_state(spark, tmp_path):
    """After a checkpointed streaming agg, the state data source reads
    back exactly the per-key state the query accumulated."""
    ck = str(tmp_path / "ck")
    s = stream_parquet_table(spark, "/root/testdata/sf0.001", "events")
    agg = s.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    out = run_to_memory(agg, output_mode="complete", checkpoint=ck)
    expected = {r["user_id"]: r["n"] for r in out.collect()}

    meta = state_inspect.state_metadata(spark, ck).collect()
    assert len(meta) == 1 and meta[0]["operatorName"] == "stateStoreSave"

    rows = state_inspect.state_rows(spark, ck).collect()
    got = {r["key"][0]: r["value"][0] for r in rows}
    assert got == expected

    summary = state_inspect.state_summary(spark, ck).collect()
    assert sum(r["n_keys"] for r in summary) == len(expected)


def test_observe_quality_counters(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id long, value double"
    )
    observed, obs = observe_quality(
        df,
        F.col("value").isNotNull().alias("value_present"),
        (F.coalesce(F.col("value"), F.lit(0.0)) >= 0).alias("value_nonneg"),
    )
    observed.collect()
    m = obs.get
    assert m["rows"] == 3
    assert m["bad_value_present"] == 1
    assert m["bad_value_nonneg"] == 1


def test_sql_udfs_inline(spark):
    names = register_sql_functions(spark)
    assert set(names) >= {"quality_frac", "hamming64", "n_tokens", "euclid"}
    row = spark.sql(
        "SELECT quality_frac(40, 4) AS q, hamming64(7, 1) AS h, "
        "n_tokens('a b c') AS t, euclid(array(0.0, 0.0), array(3.0, 4.0)) AS e"
    ).collect()[0]
    assert row["q"] == 0.9 and row["h"] == 2 and row["t"] == 3 and row["e"] == 5.0
    # SQL UDFs are plan-inlined expressions: no BatchEvalPython
    plan = (
        spark.sql("SELECT hamming64(7, 1)")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_simulator_drives_full_pipeline(spark, tmp_path):
    """End-to-end: the registered Python-DataSource simulator feeds
    the reference DAG (upsert store + enrichment + stats fan-out)."""
    from botkop_telcotraffic_spark_spark.sources import simulator
    from botkop_telcotraffic_spark_spark.streaming.pipeline import TrafficPipeline
    from botkop_telcotraffic_spark_spark.streaming.upsert_join import (
        KeyedUpsertStore,
        run_upsert_stream,
    )

    simulator.register(spark)
    attach_stream = simulator.as_attach_events(
        spark.readStream.format("telco_traffic")
        .option("kind", "attach")
        .option("rows_per_batch", 300)
        .option("max_batches", 1)
        .option("bearers", 40)
        .load()
    )
    store = KeyedUpsertStore(
        spark,
        str(tmp_path / "store"),
        key_col="bearerId",
        order_col="ts",
    )
    run_upsert_stream(attach_stream, store, checkpoint=str(tmp_path / "ck_a"))

    outputs = {"stats": []}
    pipe = TrafficPipeline(
        metric_names=["rtt", "byteLoss", "throughput"],
        kmeans_dims=["rtt", "byteLoss"],
        stats_sink=lambda df, bid: outputs["stats"].extend(df.collect()),
    )
    cell_stream = simulator.as_celltower_events(
        spark.readStream.format("telco_traffic")
        .option("rows_per_batch", 500)
        .option("max_batches", 1)
        .option("bearers", 40)
        .load()
    )
    pipe.run(cell_stream, store, checkpoint=str(tmp_path / "ck_c"))

    # attach generator covers all 40 bearers in 300 rows (whp), so
    # every celltower event enriches; stats must cover all 3 metrics
    assert {r["metric"] for r in outputs["stats"]} == {
        "rtt",
        "byteLoss",
        "throughput",
    }
    assert all(r["n"] > 0 for r in outputs["stats"])
