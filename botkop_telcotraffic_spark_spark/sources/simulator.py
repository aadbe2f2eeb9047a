"""Native traffic-simulator data source (PySpark Python DataSource API).

The reference app consumes two Kafka topics produced by a companion
traffic simulator (`/root/reference/README:4`,
`application.conf:17-20`); the engine ships that capability as a
first-class registered source instead — `spark.read.format
("telco_traffic")` for bounded replay and `spark.readStream.format
("telco_traffic")` for micro-batch streams, no broker required.

Rows mirror the reference's model (`src/main/scala/traffic/model/
package.scala:10-34`): celltower events carry (mcc, mnc, cell, area,
location, metrics map with the K-Means dims rtt/byteLoss) and attach
events carry the subscriber profile keyed by bearer_id, so the
enrichment join (SURVEY.md §2.4 J1) and every downstream pipeline run
unchanged against simulated input.

Determinism: every row is a pure function of (seed, partition, row
index) via splitmix64 — same options, same data, on any cluster
layout; the streaming reader derives rows from (seed, batch, index)
so replays after checkpoint recovery are byte-identical.

Scale notes: batch generation fans out over ``partitions`` input
splits (executor-side, driver holds nothing); the simple stream
reader is driver-side by design (test/replay tool, not the 100 TB
ingest path — that's Kafka/files).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_MASK64 = (1 << 64) - 1

CELLTOWER_SCHEMA = (
    "bearer_id string, mcc int, mnc int, cell int, area int, "
    "lat double, lng double, metrics map<string,double>, ts_ms long"
)
ATTACH_SCHEMA = (
    "bearer_id string, subscriber_id int, imsi string, msisdn string, "
    "imei string, last_name string, first_name string, city string, "
    "country string, ts_ms long"
)

# Belgium-ish bounding box — the reference's example geofences are 5
# polygons over Belgium (`work/traffic-geofences.json`).
_LAT0, _LAT1 = 49.5, 51.5
_LNG0, _LNG1 = 2.5, 6.4


def _mix(*parts: int) -> int:
    """splitmix64 fold over the given integers — the row PRNG."""
    s = 0
    for p in parts:
        s = (s + p + 0x9E3779B97F4A7C15) & _MASK64
        s = ((s ^ (s >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
        s = ((s ^ (s >> 27)) * 0x94D049BB133111EB) & _MASK64
        s ^= s >> 31
    return s


def _u(h: int, salt: int) -> float:
    """Uniform [0,1) derived from row hash + salt."""
    return _mix(h, salt) / 2.0**64


def _celltower_row(seed: int, i: int, bearers: int, start_ts: int, step_ms: int):
    h = _mix(seed, i)
    bearer = h % bearers
    return (
        f"bearer-{bearer}",
        206,  # Belgium MCC, matching the reference's setting
        1 + h % 3,
        1000 + h % 500,
        10 + h % 50,
        round(_LAT0 + (_LAT1 - _LAT0) * _u(h, 1), 6),
        round(_LNG0 + (_LNG1 - _LNG0) * _u(h, 2), 6),
        {
            "rtt": round(_u(h, 3) * 100.0, 3),
            "byteLoss": round(_u(h, 4) * 10.0, 3),
            "throughput": round(_u(h, 5) * 1000.0, 3),
        },
        start_ts + i * step_ms,
    )


def _attach_row(seed: int, i: int, bearers: int, start_ts: int, step_ms: int):
    h = _mix(seed, i, 0xA77AC4)
    bearer = h % bearers
    sub = h % (bearers * 2)
    return (
        f"bearer-{bearer}",
        sub,
        f"20601{sub:010d}",
        f"+324{sub:08d}",
        f"35{sub:013d}",
        f"name-{sub % 997}",
        f"first-{sub % 499}",
        f"city-{sub % 57}",
        "BE",
        start_ts + i * step_ms,
    )


_ROW_FNS = {"celltower": _celltower_row, "attach": _attach_row}
_SCHEMAS = {"celltower": CELLTOWER_SCHEMA, "attach": ATTACH_SCHEMA}


class _Opts:
    def __init__(self, options: dict):
        self.kind = options.get("kind", "celltower")
        if self.kind not in _ROW_FNS:
            raise ValueError(f"kind must be one of {sorted(_ROW_FNS)}")
        self.rows = int(options.get("rows", 1000))
        self.partitions = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.bearers = int(options.get("bearers", 100))
        self.start_ts = int(options.get("start_ts", 1_700_000_000_000))
        self.step_ms = int(options.get("step_ms", 100))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_batches = int(options.get("max_batches", 1_000_000))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _TrafficBatchReader(DataSourceReader):
    def __init__(self, opts: _Opts):
        self.o = opts

    def partitions(self) -> Sequence[InputPartition]:
        o = self.o
        per = (o.rows + o.partitions - 1) // o.partitions
        return [
            _RangePartition(lo, min(lo + per, o.rows))
            for lo in range(0, o.rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        o = self.o
        fn = _ROW_FNS[o.kind]
        for i in range(partition.start, partition.end):
            yield fn(o.seed, i, o.bearers, o.start_ts, o.step_ms)


class _TrafficStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, opts: _Opts):
        self.o = opts

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        o = self.o
        b = start["batch"]
        if b >= o.max_batches:  # drained: lets availableNow terminate
            return iter(()), start
        fn = _ROW_FNS[o.kind]
        base = b * o.rows_per_batch
        # a concrete list: the simple stream reader prefetches on the
        # driver and ships rows by pickle (generators aren't picklable)
        rows = [
            fn(o.seed, base + j, o.bearers, o.start_ts, o.step_ms)
            for j in range(o.rows_per_batch)
        ]
        return iter(rows), {"batch": b + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay after recovery: same pure function of (seed, index)
        o = self.o
        fn = _ROW_FNS[o.kind]
        for b in range(start["batch"], end["batch"]):
            base = b * o.rows_per_batch
            for j in range(o.rows_per_batch):
                yield fn(o.seed, base + j, o.bearers, o.start_ts, o.step_ms)

    def commit(self, end: dict) -> None:
        pass


class TrafficDataSource(DataSource):
    """format("telco_traffic") — deterministic simulated telco events."""

    @classmethod
    def name(cls) -> str:
        return "telco_traffic"

    def schema(self) -> str:
        return _SCHEMAS[_Opts(self.options).kind]

    def reader(self, schema) -> DataSourceReader:
        return _TrafficBatchReader(_Opts(self.options))

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _TrafficStreamReader(_Opts(self.options))


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(TrafficDataSource)


# --- adapters: simulator rows -> reference event model ------------------
# (schemas.py CELLTOWER_EVENT / ATTACH_EVENT shapes, so the simulated
# streams drive the full TrafficPipeline unchanged)


def as_celltower_events(df):
    """Flat simulator celltower rows -> CELLTOWER_EVENT shape +
    event_time (works on batch and streaming DataFrames alike)."""
    from pyspark.sql import functions as F

    return df.select(
        F.struct(
            F.col("mcc"),
            F.col("mnc"),
            F.col("cell"),
            F.col("area"),
            F.struct(F.col("lat"), F.col("lng")).alias("location"),
        ).alias("celltower"),
        F.col("bearer_id").alias("bearerId"),
        F.col("metrics"),
        F.lit("celltower-topic").alias("topic"),
        F.col("ts_ms").alias("ts"),
        F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
    )


def as_attach_events(df):
    """Flat simulator attach rows -> ATTACH_EVENT shape + event_time."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("bearer_id").alias("bearerId"),
        F.struct(
            F.col("subscriber_id").cast("int").alias("id"),
            F.col("imsi"),
            F.col("msisdn"),
            F.col("imei"),
            F.col("last_name").alias("lastName"),
            F.col("first_name").alias("firstName"),
            F.lit(None).cast("string").alias("address"),
            F.col("city"),
            F.lit(None).cast("string").alias("zip"),
            F.col("country"),
        ).alias("subscriber"),
        F.lit("attach-topic").alias("topic"),
        F.col("ts_ms").alias("ts"),
        F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
    )
