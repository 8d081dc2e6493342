"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct —
the engine moves/filters/batches them at scale; decoding happens in
Arrow-batched ``mapInPandas`` stages at the edge.

The decode step itself is STUBBED in this environment (no PIL/ffmpeg in
the container): ``decode_image(..., fake=True)`` produces a
deterministic fake feature vector from the raw bytes so the Spark-side
plumbing — schema, batch shape, partition sizing — is real and tested;
``fake=False`` raises NotImplementedError where a real codec would run.

Scale notes: binary payloads make rows wide, so the operators here
repartition by byte budget (``target_rows_per_batch``) before the
Python stage, and Arrow batch size is capped in session conf
(spark.sql.execution.arrow.maxRecordsPerBatch) so a batch of 4K images
doesn't materialize gigabytes per task.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transporter_spark.registry import register

#: canonical multimodal schema fragment
MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def attach_media(
    df: DataFrame, binary_col: str, media_format: str, **meta_literals
) -> DataFrame:
    """Wrap a binary column with the canonical metadata struct."""
    fields = []
    for f in MEDIA_META.fields:
        if f.name == "format":
            fields.append(F.lit(media_format).alias("format"))
        elif f.name in meta_literals:
            fields.append(F.lit(meta_literals[f.name]).cast(f.dataType).alias(f.name))
        else:
            fields.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.withColumn("media", F.struct(F.col(binary_col).alias("content"), *fields))


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "media.content",
    fake: bool = True,
) -> DataFrame:
    """Decode + featurize media content via Arrow-batched mapInPandas.

    With fake=True (this container), the featurizer is a deterministic
    byte-histogram stand-in, so tests pin exact values. With fake=False
    this is where PIL/torchaudio/ffmpeg decode would run per Arrow batch.

    The worker closure is fully self-contained: cloudpickle serializes
    module-level references by import path, which breaks on executors
    without this repo on PYTHONPATH — nested defs pickle by value.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def featurize(buf: bytes) -> list:
            if not buf:
                return [0.0] * 8
            n = len(buf)
            return [
                float(n),
                sum(buf) / n,
                float(max(buf)),
                float(min(buf)),
                float(buf[0]),
                float(buf[-1]),
                float(sum(1 for x in buf if x > 127)) / n,
                float(sum(1 for x in buf if x == 0)) / n,
            ]

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding unavailable in this environment; "
                    "install codec libs and pass fake=False with them present"
                )
            feats = [featurize(b if b is not None else b"") for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"].astype("int64"),
                    "byte_len": [len(b) if b is not None else 0 for b in pdf["content"]],
                    "features": feats,
                }
            )

    staged = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content")
    )
    return staged.mapInPandas(run, schema=_DECODE_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
    content_col: str = "media.content",
) -> DataFrame:
    """Video frame sampling, stubbed: emits one row per sampled "frame"
    (fixed-size byte slices standing in for decoded frames). The 1->N
    row expansion through mapInPandas is the real contract a video
    pipeline needs; only the slicing is fake."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "frame": []}
            for i, buf in zip(pdf["id"], pdf["content"]):
                buf = buf or b""
                chunk = max(1, len(buf) // max(1, every_n))
                for fn, start in enumerate(range(0, len(buf), chunk * every_n)):
                    out["doc_id"].append(int(i))
                    out["frame_no"].append(fn)
                    out["frame"].append(bytes(buf[start : start + chunk]))
            yield pd.DataFrame(out)

    staged = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    return staged.mapInPandas(run, schema=schema)


def resize_media(
    df: DataFrame,
    target_len: int = 64,
    id_col: str = "doc_id",
    content_col: str = "media.content",
    fake: bool = True,
) -> DataFrame:
    """Media resize, stubbed: nearest-neighbor downsampling of the raw
    byte signal to ``target_len`` bytes (out[i] = buf[i*n//T]) — the
    deterministic 1-D stand-in for an image resize kernel. With
    fake=False this is where a real PIL/ffmpeg scaler would run per
    Arrow batch; the Spark contract (1:1 row mapping, binary in/out,
    batch shape) is identical either way."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("orig_len", T.LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media resizing unavailable in this environment; "
                    "install codec libs and pass fake=False with them present"
                )
            out = {"doc_id": [], "resized": [], "orig_len": []}
            for i, buf in zip(pdf["id"], pdf["content"]):
                buf = buf or b""
                n = len(buf)
                resized = (
                    bytes(buf[(j * n) // target_len] for j in range(target_len))
                    if n
                    else b""
                )
                out["doc_id"].append(int(i))
                out["resized"].append(resized)
                out["orig_len"].append(n)
            yield pd.DataFrame(out)

    staged = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    return staged.mapInPandas(run, schema=schema)


@register("media_features")
def media_features(fake: bool = True) -> Callable[[DataFrame], DataFrame]:
    def apply(df: DataFrame) -> DataFrame:
        return decode_features(df, fake=fake)

    return apply
