"""Streaming deduplication (SURVEY.md §2.12 dedup x §2.9 streaming).

Two bounded-state flavors over an event stream:

* ``dedup_exact_stream`` — drop exact repeats of a key within the
  watermark horizon via ``dropDuplicatesWithinWatermark``: state per
  key is evicted once the event-time watermark passes it, so state
  ~ rate x delay regardless of stream lifetime (the 100 TB-stream
  path).  Plain ``dropDuplicates`` on a stream would keep every key
  forever.
* ``dedup_content_stream`` — same, keyed on a content hash (md5 of a
  canonical concatenation), the streaming analog of the batch
  ``exact_dedup_groups`` (operators/dedup.py): records that re-arrive
  with identical payload within the horizon are suppressed even when
  their ids differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "30 seconds",
) -> DataFrame:
    """First arrival per key wins; repeats within ``delay`` of the
    watermark are dropped, later ones are admitted again (the horizon
    IS the dedup contract — document it, don't pretend it's global)."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)


def dedup_content_stream(
    stream: DataFrame,
    content_cols: list[str],
    ts_col: str = "ts",
    delay: str = "30 seconds",
    keep_hash: bool = False,
) -> DataFrame:
    """Suppress re-deliveries with identical content (id-independent):
    key = md5 over the canonical '\\x1f'-joined string forms.  With
    ``keep_hash`` the content hash survives as ``content_hash`` —
    the deterministic projection of the result (WHICH physical row
    represents a content group depends on arrival order; the hash set
    does not, so hash-level outputs are what oracles can check)."""
    hashed = stream.withColumn(
        "_content_hash",
        F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols])),
    )
    out = hashed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["_content_hash"]
    )
    if keep_hash:
        return out.withColumnRenamed("_content_hash", "content_hash")
    return out.drop("_content_hash")
