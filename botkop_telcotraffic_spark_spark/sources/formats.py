"""File-format ingress/egress beyond parquet (CSV / JSON lines).

Parquet is the warehouse format (sources/tables.py); these wrappers
cover interchange with external producers — with the defaults that
make round-trips LOSSLESS, which neither format gives you out of the
box:

  * timestamps: Spark's CSV default writes millisecond precision —
    micros silently truncate.  Both directions here pin a
    microsecond format.
  * CSV needs an explicit schema on read (inference is both a
    correctness and a performance hazard — it scans the data twice).
  * JSON lines likewise read with an explicit schema; malformed rows
    follow the engine's decode-and-drop convention (PERMISSIVE +
    drop, matching streaming/json_stream.py).

Scale notes: both formats scan-parallelize by file split like
parquet, but carry no column pruning or predicate pushdown — convert
to parquet at the ingest boundary; don't run analytics on them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", TS_FORMAT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", TS_FORMAT)
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC egress — columnar like parquet (typed, lossless, split-
    table), for interchange with Hive/Trino warehouses."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("timestampFormat", TS_FORMAT).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    out = (
        spark.read.schema(schema)
        .option("timestampFormat", TS_FORMAT)
        .option("mode", "PERMISSIVE")
        .json(path)
    )
    return out


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned parquet layout (one directory level per
    partition column).  Queries filtering on a partition column read
    ONLY matching directories — partition pruning happens at plan
    time, before any IO (see tests/test_plans.py for the proof).

    Choose low-cardinality columns (date, type, region): at 100 TB a
    high-cardinality partition column produces millions of tiny files
    and kills the listing phase.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Ingest opaque media files (images/audio/video) as binary rows:
    (path, modificationTime, length, content) via Spark's binaryFile
    source — the ingest edge of the multimodal pipeline
    (operators/multimodal.py consumes the resulting binary column).

    Scale notes: one row per file; parallelism = file count (the
    source never splits a file), so the 100 TB path packs small
    media into parquet/tar shards at the ingest boundary and keeps
    this reader for raw landings.  Filter on ``length`` BEFORE
    ``content`` is touched — the column is lazily read, and a
    length predicate prunes oversized blobs without fetching bytes.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def binary_files_as_media(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """binaryFile rows reshaped to the engine's media schema
    (media_id = hash64 of path; meta.uri = source path; dimensions
    unset until a codec fills them), ready for
    multimodal.decode_features / resize_images."""
    from pyspark.sql import functions as F

    raw = read_binary_files(spark, path, glob)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_ms"),
            F.col("path").alias("uri"),
        ).alias("meta"),
    )


def backfill_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Idempotent partition backfill: rewrite ONLY the partitions
    present in ``df``, leaving every other partition's files
    untouched — the correction/late-data pattern (re-run one bad day
    of a 3-year table without touching the other ~1 000 days).

    Mechanics: ``partitionOverwriteMode=dynamic`` scopes
    ``mode("overwrite")`` to the partitions the incoming frame
    actually contains (static mode would TRUNCATE the whole table —
    the failure people discover in production).  The conf is set
    per-write and restored, so a shared session keeps its default.

    At 100 TB this is also the unit of reproducibility: a backfill
    job keyed by partition value is idempotent — re-running it
    converges to the same layout, no read-modify-write races within
    one writer.  (Concurrent writers to the SAME partition still
    need a table format with commit coordination — Delta/Iceberg —
    documented limit of raw parquet layouts.)
    """
    spark = df.sparkSession
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written under
    EVOLVING schemas (columns added over time) as one unified frame:
    ``mergeSchema`` unions the footers' schemas and files missing a
    column yield NULLs for it — the additive-evolution contract a
    long-lived ingest directory accumulates.

    Why not default-on: schema merging reads EVERY file footer at
    planning time (at 100 TB that is a listing+footer storm), so the
    engine's normal readers assume a stable schema and this entry
    point is the explicit opt-in for evolved directories.  Only
    ADDITIVE evolution is safe — a column that changed TYPE across
    files fails the merge loudly (better than silent coercion);
    resolve those with an explicit per-era read + cast + union.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_jsonl_corpus(
    spark,
    path: str,
    schema: str,
    quarantine: bool = True,
):
    """Read a JSONL corpus (the interchange format of public LLM
    datasets) with an explicit schema and a corrupt-record policy.

    Returns ``(good, bad)``: ``good`` has the schema's columns from
    rows that parsed clean; ``bad`` (when ``quarantine``, else None)
    holds the raw line of every record that failed to parse or
    type-check — plus its partially-parsed fields (a type-drift row
    shows every field except the drifted one) — the quarantine
    stream a curation pipeline routes to triage instead of silently
    dropping (DROPMALFORMED) or poisoning typed columns with NULLs
    (plain PERMISSIVE).

    Explicit schema matters twice at 100 TB: inference costs a full
    extra pass over every byte, and JSON type drift (an int column
    arriving as a string in one shard) surfaces as quarantined rows
    instead of a mid-job cast failure.

    Spark-first shape: ONE line-oriented text scan + a ``from_json``
    EXPRESSION with ``columnNameOfCorruptRecord`` (the json SOURCE
    refuses corrupt-column-only queries; the expression form has no
    such restriction and is the same decode convention as
    streaming/json_stream.py).  Both outputs are scan-side
    projections of that one scan.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    parsed = spark.read.text(path).select(
        F.col("value").alias("raw"),
        F.from_json(
            F.col("value"),
            schema + ", _c string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_c"},
        ).alias("p"),
    )
    # DDL-aware name extraction: a naive split(',') breaks on types
    # that contain commas (struct<a:int,b:int>, decimal(10,2))
    field_names = StructType.fromDDL(schema).fieldNames()
    good = parsed.where(
        F.col("p").isNotNull() & F.col("p._c").isNull()
    ).select(*[F.col(f"p.{n}").alias(n) for n in field_names])
    if not quarantine:
        return good, None
    bad = parsed.where(
        F.col("p").isNull() | F.col("p._c").isNotNull()
    ).select(
        "raw", *[F.col(f"p.{n}").alias(n) for n in field_names]
    )
    return good, bad
