"""CDC apply: turn an insert/update/delete envelope stream into a
maintained table — the engine's replacement for the reference's
row-at-a-time sink writers (adaptor/*/writer.go) and their one-at-a-time
ordering guarantee.

Semantics ported from the reference:
- update is a FULL-DOCUMENT REPLACE, not a delta (the mongo tailer
  re-fetches the whole doc, adaptor/mongodb/reader.go:296-313) — so
  apply is a pure upsert.
- unknown ops pass through silently-but-acked (mongodb/writer.go:33-40)
  — here: filtered with no failure.
- at-least-once replay must be idempotent — last-writer-wins makes
  reapplying any subset of the log a no-op.

Semantics the reference CAN'T provide that this engine must: epochs
may arrive out of event-time order (file order, shuffled partitions,
replays). The reference sidesteps this with strictly ordered
one-at-a-time delivery; a distributed engine cannot. So the maintained
state carries its CDC metadata:

    payload... , _ts timestamp, _op ('live' | 'delete')

- `_ts` (+ payload tiebreakers) lets every merge be a true
  last-WRITER-wins comparison against the standing row, so an older
  change arriving later never clobbers newer state.
- delete TOMBSTONES are retained, so an older update arriving after
  the delete cannot resurrect the row. (Tombstone GC = drop tombstones
  older than the source's max replay horizon — the same contract as
  Kafka compaction / Delta vacuum.)

`apply_cdc_batch` is a pure DataFrame function; `cdc_upsert_sink`
wires it into foreachBatch maintaining a parquet directory (the
demo-grade store — on Delta/Iceberg the same merge becomes MERGE INTO
with the identical _ts guard); `read_cdc_table` reads the live rows.
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_KNOWN_OPS = ("insert", "update", "delete")
_META = ("_op", "_ts", "_prio")


def latest_per_key(
    changes: DataFrame, keys: List[str], order_cols: Optional[List[str]] = None
) -> DataFrame:
    """Collapse to the newest row per key (row_number LWW — SURVEY
    §2.6). order_cols are ranked descending, in order."""
    order_cols = order_cols or ["_ts"]
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc_nulls_last() for c in order_cols]
    )
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
    """Merge an envelope change-batch into the current CDC state.

    changes: envelope frame (op/ts/ns/data). current: prior state
    (payload + optionally _ts/_op from a previous apply). Returns the
    new state INCLUDING tombstones — filter with ``live_rows`` for the
    user-facing table. Idempotent and order-insensitive across
    batches: the newest (_ts, order_cols, change-beats-state) row wins
    regardless of arrival epoch.
    """
    order_cols = [c for c in (order_cols or []) if c not in ("ts", "_ts")]
    flat = changes.select(
        F.lower("op").alias("_op"), F.col("ts").alias("_ts"), F.col("data.*")
    ).filter(F.col("_op").isin(*_KNOWN_OPS))
    flat = flat.withColumn(
        "_op", F.when(F.col("_op") == "delete", "delete").otherwise("live")
    )
    order = ["_ts"] + order_cols + ["_prio"]
    newest = latest_per_key(
        flat.withColumn("_prio", F.lit(1)), keys, order
    )
    if current is None:
        merged = newest
    else:
        cur = current
        if "_ts" not in cur.columns:
            cur = cur.withColumn("_ts", F.lit(None).cast("timestamp"))
        if "_op" not in cur.columns:
            cur = cur.withColumn("_op", F.lit("live"))
        # equal (_ts + tiebreakers): the incoming change wins over the
        # standing row (_prio), keeping replays idempotent
        cur = cur.withColumn("_prio", F.lit(0))
        merged = latest_per_key(cur.unionByName(newest), keys, order)
    return merged.drop("_prio")


def live_rows(state: DataFrame) -> DataFrame:
    """User-facing view of CDC state: no tombstones, no metadata."""
    return state.filter(F.col("_op") != "delete").drop("_op", "_ts")


def compact_tombstones(state: DataFrame, horizon) -> DataFrame:
    """Tombstone GC — the Kafka-compaction / Delta-vacuum contract:
    drop delete markers whose _ts is at or before ``horizon`` (a
    timestamp literal or Column). Correctness bound: ``horizon`` must
    not exceed the source's max replay lag — a tombstone may only be
    dropped once no change OLDER than it can still arrive, otherwise a
    late stale update would resurrect the deleted row. Live rows are
    never touched; state size returns to ~#live keys."""
    from pyspark.sql import Column

    h = horizon if isinstance(horizon, Column) else F.lit(horizon).cast("timestamp")
    return state.filter(
        (F.col("_op") != "delete") | F.col("_ts").isNull() | (F.col("_ts") > h)
    )


def cdc_upsert_sink(
    spark: SparkSession,
    table_path: str,
    keys: List[str],
    order_cols: Optional[List[str]] = None,
):
    """foreachBatch function maintaining a parquet CDC table from an
    envelope stream. Epoch = the reference's bulk-flush boundary
    (message/ops/ops.go:64-74 Flush command); the write is a full
    atomic swap per epoch. Production sinks swap this for MERGE INTO
    on a transactional table format — apply_cdc_batch's output is the
    exact merge source either way.
    """

    def apply(batch: DataFrame, epoch_id: int) -> None:
        base = table_path.rstrip("/")
        exists = os.path.exists(table_path)
        current = spark.read.parquet(table_path) if exists else None
        new_state = apply_cdc_batch(current, batch, keys, order_cols)
        # Crash-safe swap: write the full new state to a versioned dir,
        # then one atomic os.replace of a symlink makes it current. A
        # crash at any point leaves either the old or the new state
        # readable at table_path — never a half-deleted table (the
        # previous overwrite-in-place lost everything if it died between
        # Spark's delete and rewrite).
        new_dir = base + f"._epoch{epoch_id}"
        if exists and os.path.realpath(table_path) == os.path.realpath(new_dir):
            # epoch replay: don't overwrite the dir we're reading from
            new_dir += ".retry"
        new_state.write.mode("overwrite").parquet(new_dir)
        swap_current(table_path, new_dir)

    return apply


def swap_current(table_path: str, new_dir: str) -> None:
    """Make ``new_dir`` current at ``table_path`` via one atomic symlink
    replace; legacy real-directory layouts fall back to rename-aside
    (two renames — a crash between them leaves the old state under
    ._bak, recoverable, and every later commit is symlink-atomic).

    Version retention (one-epoch delay): the JUST-REPLACED version dir
    is kept on disk — a lazy DataFrame or concurrent reader that
    resolved the symlink before the swap can still complete its action
    against the old files. Older sibling versions (``<base>._*`` dirs
    from commits before the previous one) are deleted instead; naming
    discipline: version dirs live next to ``base`` with a ``base._``
    prefix, nothing else may use that prefix."""
    import shutil

    base = table_path.rstrip("/")
    exists = os.path.exists(base)
    if os.path.islink(base) or not exists:
        old_target = os.path.realpath(base) if exists else None
        link_tmp = base + "._swap"
        if os.path.lexists(link_tmp):
            os.unlink(link_tmp)
        os.symlink(new_dir, link_tmp)
        os.replace(link_tmp, base)  # atomic on POSIX
        keep = {os.path.realpath(base)}
        if old_target:
            keep.add(old_target)
        parent = os.path.dirname(base) or "."
        prefix = os.path.basename(base) + "._"
        for entry in os.listdir(parent):
            p = os.path.join(parent, entry)
            if (
                entry.startswith(prefix)
                and os.path.isdir(p)
                and not os.path.islink(p)
                and os.path.realpath(p) not in keep
            ):
                shutil.rmtree(p, ignore_errors=True)
    else:
        bak = base + "._bak"
        shutil.rmtree(bak, ignore_errors=True)
        os.rename(base, bak)
        os.rename(new_dir, base)
        shutil.rmtree(bak, ignore_errors=True)


def read_cdc_table(spark: SparkSession, table_path: str) -> DataFrame:
    return live_rows(spark.read.parquet(table_path))
