"""Multimodal column conventions + processing plumbing (SURVEY.md
§2.12).

Convention: a modality column is ``content: binary`` plus a typed
``meta`` struct (mime, width/height/duration, source uri).  All
Spark-side plumbing — schema, partition sizing, Arrow batch shape —
is real; the actual codecs (image decode, audio resample, video
frame-sample) are pluggable callables because codec libraries are not
available in this container.  The default codec raises
NotImplementedError; tests inject a deterministic fake.

Scale notes: binary payloads dominate row size — ``mapInPandas``
streams Arrow record batches so peak memory is one batch, not one
partition; keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
aligned with payload size (10 MB images -> batches of ~100).  Decode
is embarrassingly parallel: no shuffle anywhere in these operators.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("uri", T.StringType()),
    ]
)


def media_schema(extra_fields: list[T.StructField] | None = None) -> T.StructType:
    return T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
        + (extra_fields or [])
    )


def _default_codec(content: bytes) -> dict:
    raise NotImplementedError(
        "no codec libraries in this environment — inject a codec "
        "callable (bytes -> {'width': int, 'height': int, "
        "'features': list[float]})"
    )


FEATURE_DIM = 8


def decode_features(
    df: DataFrame,
    codec: Callable[[bytes], dict] = _default_codec,
    content_col: str = "content",
    id_col: str = "media_id",
    feature_dim: int = FEATURE_DIM,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched; the
    only sanctioned Python hot path).  Output: (id, width, height,
    features: array<double>)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            decoded = [codec(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "features": [d["features"] for d in decoded],
                }
            )

    return df.select(id_col, content_col).mapInPandas(process, out_schema)


def byte_stats(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Pure-JVM byte-level stats on binary columns (no decode):
    payload size + declared mime passthrough if present."""
    cols = [F.col(id_col), F.length(F.col(content_col)).alias("n_bytes")]
    if "meta" in df.columns:
        cols.append(F.col("meta.mime").alias("mime"))
    return df.select(*cols)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int,
    codec: Callable[[bytes, int], list[bytes]] | None = None,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    Spark-side shape: mapInPandas generator emitting multiple rows per
    input (frame_idx, frame binary).  Codec pluggable as above.
    """
    if codec is None:
        _default_codec(b"")  # raises with guidance
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                for i, frame in enumerate(codec(content, every_ms)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(frame)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, content_col).mapInPandas(process, out_schema)

def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    codec: Callable[[bytes, int, int], bytes] | None = None,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Image resize: (id, content) -> (id, content) at the target
    dimensions, meta.width/height rewritten when a meta struct rides
    along.  Same Arrow-batched mapInPandas plumbing as
    decode_features; codec is ``(bytes, w, h) -> bytes`` (no image
    libraries in this container — inject one, tests use a
    deterministic fake)."""
    if codec is None:
        _default_codec(b"")  # raises with guidance
    has_meta = "meta" in df.columns
    fields = [
        T.StructField(id_col, T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
    if has_meta:
        fields.append(T.StructField("meta", MEDIA_META))
    out_schema = T.StructType(fields)

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                id_col: pdf[id_col].values,
                "content": [codec(b, width, height) for b in pdf[content_col]],
            }
            if has_meta:
                out["meta"] = [
                    {**(m or {}), "width": width, "height": height}
                    for m in pdf["meta"]
                ]
            yield pd.DataFrame(out)

    cols = [id_col, content_col] + (["meta"] if has_meta else [])
    return df.select(*cols).mapInPandas(process, out_schema)
