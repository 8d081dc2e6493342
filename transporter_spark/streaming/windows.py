"""Event-time windowing on streams + the availableNow test/batch bridge.

Capability the reference explicitly lacks (its ts is ingest time,
message/message.go:62-66; no windows, no state — SURVEY §2.5 last row).
"""

from __future__ import annotations

import tempfile
import uuid
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple = (),
) -> DataFrame:
    """Tumbling-window counts+sums with a watermark. The watermark
    bounds state: late rows beyond it are dropped, which is the
    streaming trade the reference never had to make (it had no state)."""
    agg_cols = [F.count("*").alias("n")]
    if "value" in stream.columns:
        agg_cols.append(
            F.sum(F.col("value").cast("string").cast("decimal(38,6)")).alias("sum_value")
        )
    # watermarks require TIMESTAMP (LTZ); parquet sources may yield NTZ.
    # The engine pins the session timezone to UTC, so the cast is
    # instant-preserving.
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("win"), *group_cols)
        .agg(*agg_cols)
        .select(F.col("win.start").alias("win_start"), *group_cols, *[
            F.col(c) for c in (["n", "sum_value"] if len(agg_cols) == 2 else ["n"])
        ])
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: Optional[str] = None,
    output_mode: str = "append",
    state_partitions: Optional[int] = None,
) -> DataFrame:
    """Run a streaming plan to exhaustion (Trigger.AvailableNow) into a
    memory sink and return the result as a batch DataFrame.

    This is the copy-phase semantics of the reference (read everything
    currently there, then stop — adaptor readers' copy mode) and the
    harness that lets streaming plans join the DuckDB oracle gate.

    state_partitions sizes the stateful operators' shuffle (pinned into
    the checkpoint at first run): streaming gets no AQE coalescing, so
    a vanilla session's 200 partitions mean 200 state-store tasks per
    stage regardless of data volume. Default: the cluster's core count
    (one state task per core) — at real scale pass an explicit number
    sized to state volume instead. Safe to set/restore around the run
    because availableNow + awaitTermination is synchronous."""
    spark = stream_df.sparkSession
    name = "avail_" + uuid.uuid4().hex[:12]
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ts_ckpt_")
    parts = state_partitions or spark.sparkContext.defaultParallelism
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    return spark.table(name)


def run_foreach_batch_available_now(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: Optional[str] = None,
) -> None:
    """Drain a stream through a foreachBatch sink (CDC apply path)."""
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ts_ckpt_")
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
