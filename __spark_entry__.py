"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is a thin wrapper over an operator in
``botkop_telcotraffic_spark_spark/`` (the engine package); the paired
``oracle_sql()`` entry is the same computation in DuckDB SQL.  Column
names and float rounding are aligned on both sides so the driver's
order-insensitive value-hash matches.

Operator coverage map (SURVEY.md §2 → query keys) is maintained in
README.md.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from botkop_telcotraffic_spark_spark.operators import (
    dedup,
    enrich,
    geofence,
    iqr,
    kmeans,
    similarity,
    text,
    window_stats,
)
from botkop_telcotraffic_spark_spark.session import tune
from botkop_telcotraffic_spark_spark.sources import load_table

# ---------------------------------------------------------------------------
# helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


# Synthetic deterministic lat/lng derived from integer event ids so
# geo queries are exact on both engines (integer modular arithmetic,
# +0.5 is exact in binary).
def _event_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        ((F.col("event_id") % 180) - 90 + F.lit(0.5)).alias("lat"),
        (((F.col("event_id") * 7) % 360) - 180 + F.lit(0.5)).alias("lng"),
    )


_EVENT_POINTS_SQL = (
    "SELECT event_id, user_id, (event_id % 180) - 90 + 0.5 AS lat, "
    "((event_id * 7) % 360) - 180 + 0.5 AS lng FROM events"
)

# Rectangle geofences (name, lat_min, lat_max, lng_min, lng_max)
_RECT_FENCES = [
    ("equator-belt", -10.0, 10.0, -180.0, 180.0),
    ("north-box", 40.0, 70.0, -30.0, 60.0),
    ("south-strip", -60.0, -30.0, 0.0, 90.0),
]

# Polygon geofences: diamond and L-shape over the synthetic point
# domain (integer vertices, (lat, lng) structs).
_POLY_FENCES = [
    ("diamond", [(0, -40), (30, 0), (0, 40), (-30, 0)]),
    ("ell", [(-80, -170), (-20, -170), (-20, -140), (-50, -140), (-50, -80), (-80, -80)]),
]

# ---------------------------------------------------------------------------
# query builders


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filtered scan → grouped multi-aggregate.
    Exercises pushdown + partial aggregation (SURVEY.md §2.5)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join → group → top-k (deterministic
    tiebreak).  AQE picks broadcast for the customer side."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through region/nation dims (broadcast path)."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def top_events_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed top-k (TakeOrderedAndProject, no full sort)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select("event_id", "user_id", "event_type", "value")
        .orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(100)
    )


_TOPK_SQL = """
SELECT event_id, user_id, event_type, value
FROM events ORDER BY value DESC, event_id LIMIT 100
"""


def daily_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation per day (expand+two-phase agg in Spark)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


_DAILY_SQL = """
SELECT time_bucket(INTERVAL '1 day', ts) AS day,
       count(DISTINCT user_id) AS distinct_users,
       count(*) AS n_events
FROM events GROUP BY 1
"""


def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over status x priority."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window function: top-3 orders per customer."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


_WINRANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
"""


def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over customer key sets."""
    o = _t(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 150000).select("o_custkey").distinct()
    recent = (
        o.where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    both = big.intersect(recent).withColumn("segment", F.lit("both"))
    big_only = big.exceptAll(recent).withColumn("segment", F.lit("big_only"))
    recent_only = recent.exceptAll(big).withColumn("segment", F.lit("recent_only"))
    return both.unionAll(big_only).unionAll(recent_only)


_SETOPS_SQL = """
WITH big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000),
     recent AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '2000-01-01')
SELECT o_custkey, 'both' AS segment FROM (SELECT * FROM big INTERSECT SELECT * FROM recent)
UNION ALL
SELECT o_custkey, 'big_only' AS segment FROM (SELECT * FROM big EXCEPT SELECT * FROM recent)
UNION ALL
SELECT o_custkey, 'recent_only' AS segment FROM (SELECT * FROM recent EXCEPT SELECT * FROM big)
"""


def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS) against a filtered build side."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_nationkey"
    )


_SEMI_SQL = """
SELECT c_custkey, c_nationkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- telco-core re-expressions (A1/A2/A3, W2, A4/A5/J2, J1) ---------------


def stats_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 keyed StatCounter parity minus time dimension:
    count/mean/stddev_pop/max/min per key (stddev_pop per
    MetricStats.scala — population stdev)."""
    e = _t(spark, sf_dir, "events")
    out = window_stats.keyed_stats(e, ["event_type"], "value", round_digits=6)
    return out.select("event_type", "n", "mean", "stdev", "vmax", "vmin")


_STATS_TYPE_SQL = """
SELECT event_type, count(value) AS n,
       round(avg(value), 6) AS mean,
       round(stddev_pop(value), 6) AS stdev,
       max(value) AS vmax, min(value) AS vmin
FROM events GROUP BY event_type
"""


def stats_user_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 with 30s tumbling event-time windows per user (reference
    window size, application.conf:6)."""
    e = _t(spark, sf_dir, "events")
    return window_stats.windowed_stats(
        e, "ts", ["user_id"], "value", window="30 seconds", round_digits=6
    )


_STATS_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '30 seconds', ts) AS window_start,
       time_bucket(INTERVAL '30 seconds', ts) + INTERVAL '30 seconds' AS window_end,
       user_id, count(value) AS n,
       round(avg(value), 6) AS mean,
       round(stddev_pop(value), 6) AS stdev,
       max(value) AS vmax, min(value) AS vmin
FROM events GROUP BY 1, 2, 3
"""


def stats_user_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 faithful: 30s window / 2s slide sliding-window stats per
    user (application.conf:6-7) on event time (W7 upgrade)."""
    e = _t(spark, sf_dir, "events")
    return window_stats.windowed_stats(
        e, "ts", ["user_id"], "value", window="30 seconds", slide="2 seconds",
        round_digits=6,
    )


_STATS_SLIDING_SQL = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL '2 seconds', ts) - g.k * INTERVAL '2 seconds' AS window_start,
         user_id, value
  FROM events CROSS JOIN (SELECT unnest(generate_series(0, 14)) AS k) g
)
SELECT window_start,
       window_start + INTERVAL '30 seconds' AS window_end,
       user_id, count(value) AS n,
       round(avg(value), 6) AS mean,
       round(stddev_pop(value), 6) AS stdev,
       max(value) AS vmax, min(value) AS vmin
FROM expanded GROUP BY 1, 2, 3
"""


def iqr_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5/J2 parity: naive order-statistic IQR fences per
    event_type, join-back, outlier filter (ClusterAnalyser.scala:
    47-58,157-170 semantics, exact mode)."""
    e = _t(spark, sf_dir, "events")
    out = iqr.iqr_outliers(e, ["event_type"], "value", mode="exact")
    return out.select("event_id", "event_type", "value", "lo", "hi")


_IQR_SQL = """
WITH s AS (
  SELECT event_type, list_sort(list(value)) AS v, count(*) AS n
  FROM events GROUP BY event_type
), b AS (
  SELECT event_type,
         CASE WHEN n <= 4 THEN -1.7976931348623157e308
              ELSE v[CAST(n // 4 AS INT) + 1]
                   - 1.5 * (v[CAST((3 * n) // 4 AS INT) + 1] - v[CAST(n // 4 AS INT) + 1]) END AS lo,
         CASE WHEN n <= 4 THEN 1.7976931348623157e308
              ELSE v[CAST((3 * n) // 4 AS INT) + 1]
                   + 1.5 * (v[CAST((3 * n) // 4 AS INT) + 1] - v[CAST(n // 4 AS INT) + 1]) END AS hi
  FROM s
)
SELECT e.event_id, e.event_type, e.value, b.lo, b.hi
FROM events e JOIN b USING (event_type)
WHERE e.value < b.lo OR e.value > b.hi
"""


def latest_order_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 parity: latest-wins keyed dim (argmax by date, deterministic
    tiebreak) inner-joined to the fact stream; unmatched facts drop
    like the reference's Cassandra inner join."""
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    joined = enrich.enrich_latest(
        e, o, fact_key="user_id", dim_key="o_custkey",
        dim_order=["o_orderdate", "o_orderkey"],
    )
    return joined.select(
        "event_id", "user_id", "event_type", "value",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_totalprice").alias("latest_totalprice"),
    )


_ENRICH_SQL = """
WITH d AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders)
SELECT e.event_id, e.user_id, e.event_type, e.value,
       d.o_orderkey AS latest_orderkey,
       d.o_totalprice AS latest_totalprice
FROM events e JOIN d ON e.user_id = d.o_custkey AND d.rn = 1
"""


# ---------------------------------------------------------------------------
# registry


_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "q1_pricing_summary": (q1_pricing_summary, _Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, _Q3_SQL),
    "q5_region_revenue": (q5_region_revenue, _Q5_SQL),
    "top_events_by_value": (top_events_by_value, _TOPK_SQL),
    "daily_distinct_users": (daily_distinct_users, _DAILY_SQL),
    "rollup_order_stats": (rollup_order_stats, _ROLLUP_SQL),
    "window_rank_orders": (window_rank_orders, _WINRANK_SQL),
    "set_ops_customer_segments": (set_ops_customer_segments, _SETOPS_SQL),
    "customers_without_urgent_orders": (customers_without_urgent_orders, _ANTI_SQL),
    "customers_with_orders": (customers_with_orders, _SEMI_SQL),
    "stats_by_event_type": (stats_by_event_type, _STATS_TYPE_SQL),
    "stats_user_tumbling": (stats_user_tumbling, _STATS_TUMBLING_SQL),
    "stats_user_sliding": (stats_user_sliding, _STATS_SLIDING_SQL),
    "iqr_outliers_events": (iqr_outliers_events, _IQR_SQL),
    "latest_order_enrich": (latest_order_enrich, _ENRICH_SQL),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's hot-path aggregation (A1 sliding
    per-key windowed stats) on sf0.001."""
    return stats_user_sliding(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
