"""In-plan data-quality observation (`Dataset.observe`).

Pipelines at 100 TB can't afford a second pass to count rejects —
`observe` attaches accumulator-backed aggregates to the plan itself,
so quality counters ride along with the job for free (no extra scan,
no action).  On batch the metrics surface through `Observation.get`;
on streaming the same call surfaces them in every
`StreamingQueryProgress.observedMetrics` tick.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def observe_quality(
    df: DataFrame,
    *checks: Column,
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach row count + the given boolean-check violation counters
    to the plan.  Each check is a boolean Column that should be TRUE
    for good rows; the metric counts violations.

        df, obs = observe_quality(events,
            F.col("value").isNotNull().alias("value_present"),
            (F.col("ts") > "2020-01-01").alias("ts_sane"))
        df.write...   # any action
        obs.get  # {'rows': N, 'bad_value_present': 0, 'bad_ts_sane': 3}
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in checks:
        label = df.select(c).columns[0]
        metrics.append(
            F.sum(F.when(~c, 1).otherwise(0)).alias(f"bad_{label}")
        )
    return df.observe(obs, *metrics), obs
