"""CDC apply: turn an insert/update/delete envelope stream into a
maintained table — the engine's replacement for the reference's
row-at-a-time sink writers (adaptor/*/writer.go) and their one-at-a-time
ordering guarantee.

Semantics ported from the reference:
- update is a FULL-DOCUMENT REPLACE, not a delta (the mongo tailer
  re-fetches the whole doc, adaptor/mongodb/reader.go:296-313) — so
  apply is a pure upsert.
- unknown ops pass through silently-but-acked (mongodb/writer.go:33-40)
  — here: filtered with a metric, never a failure.
- at-least-once replay must be idempotent — last-writer-wins by
  (ts, seq) makes reapplying any suffix of the log a no-op.

The batch primitive `apply_cdc_batch` is pure DataFrame->DataFrame;
`cdc_upsert_sink` wires it into foreachBatch for streams. The sink here
maintains a parquet directory (read-modify-overwrite per epoch) — the
demo-grade store; on a real deployment the same `apply_cdc_batch`
output feeds MERGE INTO on Delta/Iceberg where the table format gives
transactional upsert without rewriting unmatched data.
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_KNOWN_OPS = ("insert", "update", "delete")


def latest_per_key(
    changes: DataFrame, keys: List[str], order_cols: Optional[List[str]] = None
) -> DataFrame:
    """Collapse a CDC change set to the newest change per key
    (last-writer-wins via row_number — SURVEY §2.6)."""
    order_cols = order_cols or ["ts"]
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc_batch(
    current: Optional[DataFrame],
    changes: DataFrame,
    keys: List[str],
    order_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Apply an envelope change-batch to the current table state.

    changes: envelope frame (op/ts/ns/data). Returns the new state
    (payload columns only). Idempotent: re-applying any subset of
    already-applied changes yields the same state.

    order_cols name payload tiebreaker columns; the envelope timestamp
    is always the primary order and is internally aliased `_ts` so a
    payload field named `ts` cannot collide with it.
    """
    flat = changes.select(
        F.lower("op").alias("_op"), F.col("ts").alias("_ts"), F.col("data.*")
    )
    flat = flat.filter(F.col("_op").isin(*_KNOWN_OPS))  # unknown ops: drop, don't fail
    order = ["_ts"] + [c for c in (order_cols or []) if c not in ("ts", "_ts")]
    newest = latest_per_key(flat, keys, order)
    upserts = newest.filter(F.col("_op") != "delete").drop("_op", "_ts")
    if current is None:
        return upserts
    # anti-join on ALL touched keys handles deletes and replaced rows in
    # one pass; upserts then re-add the non-delete newest images.
    survivors = current.join(newest.select(*keys), keys, "left_anti")
    return survivors.unionByName(upserts)


def cdc_upsert_sink(
    spark: SparkSession,
    table_path: str,
    keys: List[str],
    order_cols: Optional[List[str]] = None,
):
    """foreachBatch function maintaining a parquet table from an
    envelope stream. Epoch = the reference's bulk-flush boundary
    (message/ops/ops.go:64-74 Flush command); exactly-once per epoch
    because the write is a full atomic swap keyed by the checkpoint.
    """

    def apply(batch: DataFrame, epoch_id: int) -> None:
        exists = os.path.exists(table_path)
        current = spark.read.parquet(table_path) if exists else None
        new_state = apply_cdc_batch(current, batch, keys, order_cols)
        # materialize before overwrite (reading and overwriting the same
        # path in one plan would race)
        tmp = table_path.rstrip("/") + f"._epoch{epoch_id}"
        new_state.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(table_path)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    return apply
