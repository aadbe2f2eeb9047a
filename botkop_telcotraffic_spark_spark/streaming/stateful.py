"""Custom keyed stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 — the Structured Streaming path for per-key state the
built-in windowed aggregates can't express; the modern counterpart of
the reference's driver-held model state, ClusterAnalyser.scala:15-19).

The operator: per-key running z-score anomaly flagging.  For each
key's events in (ts, id) order, an event is anomalous when its value
deviates from the mean of all PRIOR events by more than ``z`` running
population standard deviations (warm-up: first ``min_prior`` events
are never flagged).  State per key is three numbers (n, sum, sumsq).

Determinism across engines: values are scaled to integers
(round(value * SCALE)) so the running sums are exact; the only float
ops are two divisions and one multiply, in a fixed order — the DuckDB
oracle reproduces the flags bit-exactly with prefix-window sums.

Scale notes: state is O(keys), a few dozen bytes each, in the state
store (RocksDB at scale) — no per-event state growth.  Within a
micro-batch the group is sorted by event time; cross-batch order is
the source's responsibility (replay sources deliver in order; with
out-of-order producers put a watermark + sort per trigger upstream).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SCALE = 1000  # value -> exact integer milli-units (small enough
# that per-key sums of squares stay far from int64 overflow at scale)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("n_prior", T.LongType()),
        T.StructField("anomaly", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.LongType()),
        T.StructField("ss", T.LongType()),
    ]
)


def _flag_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s, ss = state.get if state.exists else (0, 0, 0)
    import numpy as np

    pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    # round-half-up via floor(x+0.5): identical on both engines
    # (np round / engine round builtins disagree on half-way ties)
    iv = np.floor(pdf["value"].values * SCALE + 0.5).astype("int64")
    out_n, out_flag = [], []
    for x in iv:
        if n >= 5:
            # float(s) FIRST, then divide — mirrors the oracle's
            # CAST(sum AS DOUBLE)/n; python int/int division is
            # correctly-rounded and can differ in the last ulp
            mean = float(s) / n
            var = float(ss) / n - mean * mean
            dev = float(x) - mean
            flag = bool(dev * dev > 9.0 * var)
        else:
            flag = False
        out_n.append(n)
        out_flag.append(flag)
        n += 1
        s += int(x)
        ss += int(x) * int(x)
    state.update((n, s, ss))
    yield pd.DataFrame(
        {
            "event_id": pdf["event_id"].values,
            "user_id": pdf["user_id"].values,
            "n_prior": out_n,
            "anomaly": out_flag,
        }
    )


def running_zscore_anomalies(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Apply the per-key running z-score flagger to a streaming (or
    batch-replayed) events DataFrame with columns
    (event_id, user_id, ts, value)."""
    return events.groupBy(key_col).applyInPandasWithState(
        _flag_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
