"""Data layout for scan pruning: Z-order (Morton) clustering.

At 100 TB the cheapest predicate is the one that never reads the
file: parquet footers carry per-column min/max, and both Spark's
file-skipping and row-group pruning use them.  Sorting by ONE column
gives perfect pruning on that column and none on any other; Z-order
interleaves the bits of two (or more) quantized columns so every
output file covers a small HYPER-RECTANGLE of the key space — point
and box predicates on EITHER column then touch only the files whose
rectangle intersects, typically O(sqrt(files)) for a 2-D box instead
of all of them.

Everything here is pure Catalyst column math (bit shifts + masks —
whole-stage codegen) plus a range repartition on the computed key;
no UDFs, no driver-side data movement beyond the 4-number min/max
bounds aggregate.

Same pattern as Delta Lake OPTIMIZE ZORDER BY / Iceberg sort orders,
expressed with stock Spark primitives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: x's bit i lands at position 2i, y's at 2i+1.  A pure
    expression tree (2·bits shifts/masks), fully codegen'd."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
        code = code.bitwiseOR(
            F.shiftleft(
                F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return code


def quantize(col: Column, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Map a numeric column into [0, 2^bits) rank space by linear
    scaling between the supplied bounds (constant-folded literals in
    practice)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo) / span
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.least(
        F.floor(clamped * F.lit(float(1 << bits))).cast("long"),
        F.lit((1 << bits) - 1),
    )


def zorder_key(
    df: DataFrame, col_x: str, col_y: str, bits: int = 16
) -> DataFrame:
    """Append ``_z``, the Morton key of the two columns quantized by
    their global min/max.  The bounds come from one tiny 4-number
    aggregate collected to the driver (scalar literals, not data)."""
    b = df.agg(
        F.min(F.col(col_x).cast("double")).alias("xlo"),
        F.max(F.col(col_x).cast("double")).alias("xhi"),
        F.min(F.col(col_y).cast("double")).alias("ylo"),
        F.max(F.col(col_y).cast("double")).alias("yhi"),
    ).collect()[0]
    qx = quantize(F.col(col_x), F.lit(b["xlo"]), F.lit(b["xhi"]), bits)
    qy = quantize(F.col(col_y), F.lit(b["ylo"]), F.lit(b["yhi"]), bits)
    return df.withColumn("_z", morton_code(qx, qy, bits))


def zorder_write(
    df: DataFrame,
    col_x: str,
    col_y: str,
    path: str,
    files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the Z-curve: range
    partition on the Morton key into ``files`` output files, sort
    within each, drop the key.  Readers need nothing special — the
    clustering lives in the parquet min/max stats."""
    (
        zorder_key(df, col_x, col_y, bits)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compaction_plan(
    spark, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Inspect a parquet dataset's file layout via the hidden
    ``_metadata`` columns (footer-only — ReadSchema is empty, no data
    pages are decoded) and decide how many output files a compaction
    should produce: ``ceil(total_bytes / target_bytes)``.

    The small-file problem is THE operational failure mode of
    long-running ingestion at 100 TB: a streaming sink or a
    fine-partitioned batch write leaves millions of KB-sized files,
    and every downstream scan pays per-file open/footer/seek costs
    that dwarf the data read.  Returns
    ``{n_input_files, total_bytes, n_output_files}``.
    """
    import math

    files = (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("p"),
            F.col("_metadata.file_size").alias("sz"),
        )
        .distinct()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("sz").alias("b"))
        .collect()[0]
    )
    total = int(files["b"] or 0)
    return {
        "n_input_files": int(files["n"]),
        "total_bytes": total,
        "n_output_files": max(1, math.ceil(total / target_bytes)),
    }


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite a parquet dataset into ~``target_bytes`` files (Delta
    OPTIMIZE / Iceberg rewrite_data_files, in stock Spark): size the
    output from the real input byte count (compaction_plan), then one
    job — round-robin ``repartition(n)`` for pure compaction, or
    ``repartitionByRange(n, sort_cols)`` + in-file sort when a
    clustering order should be (re)established while we're paying for
    the rewrite anyway.  Returns the plan dict it executed.

    Each output file is written by one task, so the write itself is
    embarrassingly parallel; the only wide dependency is the single
    exchange, and AQE cannot under-split it because n is computed
    from target size, not from shuffle-partition defaults.
    """
    plan = compaction_plan(spark, in_path, target_bytes)
    df = spark.read.parquet(in_path)
    n = plan["n_output_files"]
    if sort_cols:
        df = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(out_path)
    return plan
