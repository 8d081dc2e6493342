"""Streaming sources in the envelope shape.

The reference's tail readers (oplog/logical-decoding/binlog/changefeed,
SURVEY.md §2.1) each produce a channel of (op, ts, ns, doc). Spark-side,
any replayable stream presents the same four columns; here we provide
the file-based source (its contract — schema'd, resumable via
checkpoint — is the same one a Kafka/Debezium feed satisfies).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transporter_spark.envelope import to_envelope
from transporter_spark.sources.files import _nanos_ts_columns


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """readStream over one parquet table. Schema comes from a batch
    peek (streams need explicit schemas); nanosecond timestamps get the
    same long->micros conversion as the batch path."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_ts_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # file-stream sources need a directory; point at the parent and
    # glob-filter to this table's file
    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def stream_envelope(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_col: Optional[str] = None,
    op_col: Optional[str] = None,
) -> DataFrame:
    """Streaming envelope: op/ts/ns/data over a streaming scan —
    the tail-mode equivalent of envelope.to_envelope."""
    return to_envelope(
        stream_table(spark, sf_dir, name), ns=name, ts_col=ts_col, op_col=op_col
    )
