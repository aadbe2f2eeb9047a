"""SparkSession factory and runtime tuning.

Mirrors the role of the reference's ``AppConfig``/driver setup
(``/root/reference/src/main/scala/traffic/TrafficStreamProcessor.scala:16-23``,
``util/AppConfig.scala``) but targets modern Spark: AQE on, UTC
session timezone (event-time determinism), Arrow for any Python
boundary, Kryo.

Scale notes: nothing here is local-mode specific.  Shuffle-partition
count and file-split size are env-tunable so the same code runs on a
1000-executor cluster (set ``spark.sql.shuffle.partitions`` ~ 2-3x
total cores there; AQE coalesces small post-shuffle partitions at
runtime either way).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs a driver-provided session must also get so
# results are deterministic and timezone-stable (the correctness
# oracle compares against DuckDB running on naive UTC timestamps).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # The events fixture stores ts as parquet TIMESTAMP(NANOS); Spark
    # has no nanos timestamp type — read as long, convert in loader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive parquet timestamps (timestamp[us] without tz) must read as
    # TIMESTAMP, not TIMESTAMP_NTZ: with the UTC session timezone the
    # values are identical, but NTZ rejects unix_millis/div arithmetic
    # and CSV-writes without sub-millis precision.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # InferFiltersFromGenerate synthesizes `size(arr)>0` ahead of every
    # explode; PushDownPredicates then substitutes the generator input
    # through intermediate Projects, duplicating expensive array
    # expressions (the shingle/fingerprint folds become O(words^2) per
    # row — measured 50x+ slowdowns).  Our explodes never benefit from
    # the inferred filter (inputs are dense arrays), so drop the rule.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


# Large-state streaming profile: the default HDFS-backed state store
# keeps every key in executor heap — watermarked joins/dedup over
# high-cardinality keys (the 100 TB shape) need RocksDB's off-heap,
# disk-spilling store with incremental (changelog) checkpoints.
# Session-settable; picked up by queries started afterwards.
LARGE_STATE_CONFS: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def enable_large_state(spark: SparkSession) -> SparkSession:
    """Switch subsequently-started streaming queries to the RocksDB
    state store (bounded executor memory at any key cardinality)."""
    for k, v in LARGE_STATE_CONFS.items():
        spark.conf.set(k, v)
    return spark


# Sessions already tuned by this process: tune() is called by the
# `_t` table helper on EVERY query build (the driver contract — a
# hostile session must be fixed up before its first query), which at
# bench scale means thousands of calls per run; the 7 conf.set Py4J
# round-trips only need to happen once per session object (r13 —
# nothing in the engine or tests mutates RUNTIME_CONFS keys between
# queries; a host that does can call tune(spark, force=True)).
import weakref as _weakref

_TUNED_SESSIONS: "_weakref.WeakSet[SparkSession]" = _weakref.WeakSet()


def tune(spark: SparkSession, force: bool = False) -> SparkSession:
    """Apply runtime-settable confs to an existing session (e.g. the
    correctness driver's).  Safe to call repeatedly; after the first
    call per session it is a no-op unless ``force``."""
    if not force and spark in _TUNED_SESSIONS:
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the host; results may still match
    _TUNED_SESSIONS.add(spark)
    return spark


def get_spark(
    app_name: str = "botkop-telcotraffic-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Pin the default explicitly: Python workers are reused across
        # tasks, so per-task interpreter spawn cost (the measured
        # variance source of the mapInPandas decode family) is paid
        # once per executor core, not per task (r12 verdict #2).
        .config("spark.python.worker.reuse", "true")
        # Worker connect-back accept timeout (default 15s): on a
        # heavily loaded host, spawning a fresh interpreter under
        # full-width CPU contention can exceed it, failing the whole
        # query with "Python worker failed to connect back" instead
        # of just starting slow.  Pure timeout — no effect on an
        # idle-host run.
        .config("spark.python.authenticate.socketTimeout", "120s")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Whole-stage codegen across many distinct queries in one JVM
        # fills the default 240 MB code cache; once full, HotSpot
        # stops JIT-compiling new generated classes and hot operators
        # run interpreted (observed: 3-5x slowdowns late in a query
        # suite).  Give codegen room + let cold methods be flushed.
        # 2g: at 70+ registry queries x 3 runs the 1g cache still
        # thrashes (late-suite queries ran ~75% over their
        # fresh-session times); size is reserved virtual, not
        # committed, so the only cost is address space.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_JAVA_OPTS",
                "-XX:ReservedCodeCacheSize=2g -XX:+UseCodeCacheFlushing",
            ),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return tune(spark)
