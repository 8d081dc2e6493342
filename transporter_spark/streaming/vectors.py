"""Continuous ANN/IVF index maintenance: keep the cell-partitioned
vector index (operators/similarity.ivf_index) current from an
embedding stream — the vector twin of the continuous-dedup sink.

Why this is the 100 TB shape: re-clustering the corpus per arriving
batch is a non-starter; with a FIXED centroid set, cell assignment is
pure and per-vector, so each micro-batch assigns only its own vectors
and APPENDS them as a new segment under the shared manifest store
(streaming/state.SegmentStore) — per-epoch IO ∝ |batch|, no existing
assignment ever changes (exactly the append contract
ann_ivf_search's docstring promises). Centroid refresh (periodic
KMeans over a sample) is a full re-index by design and stays a batch
job — every production IVF system (FAISS, Milvus, pgvector ivfflat)
draws the same line.

State (two list tables, committed atomically together):

- ``cells`` — (vec_id, vec, cell): the searchable index,
  ``ann_ivf_search``'s input;
- ``ids``   — (id): 8 B/vector membership index answering the
  cross-epoch re-delivery test without touching vectors.

Replay/restart semantics are the SegmentStore contract: replayed
epochs are no-ops, a backwards epoch counter raises, compaction folds
segments with one-commit reader retention.
"""

from __future__ import annotations

import tempfile
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transporter_spark.streaming.state import SegmentStore

_TABLES = ("cells", "ids")


def ann_index_batch(
    batch: DataFrame,
    epoch_id: int,
    state_dir: str,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: Optional[int] = None,
) -> bool:
    """One epoch of index maintenance; returns False when the epoch was
    already applied (replay) or the batch is empty. Cost per batch:
    one broadcast-centroid assignment over |batch| vectors + the
    segment append — the standing index is never read except for the
    8 B/vector id guard, and never rewritten."""
    from transporter_spark.operators.similarity import ivf_index
    from transporter_spark.streaming.ingest import redelivery_guard

    store = SegmentStore(state_dir)
    if store.epoch_already_applied(epoch_id):
        return False
    if batch.isEmpty():
        return False
    spark = batch.sparkSession
    if store.manifest() is not None:
        batch = redelivery_guard(batch, store.read(spark, "ids"), id_col)
        if batch.isEmpty():
            return False
    assigned = ivf_index(batch, centroids, id_col, vec_col, round_dp)
    segs = {}
    for table, df in (
        ("cells", assigned),
        ("ids", assigned.select(F.col(id_col).alias("id"))),
    ):
        name = f"{table}-e{epoch_id}"
        df.write.mode("overwrite").parquet(store.seg_path(name))
        segs[table] = store.table_segments(table) + [name]
    store.commit(epoch_id, tables=segs)
    return True


def compact_ann_index(spark: SparkSession, state_dir: str) -> bool:
    """Fold the index's epoch segments (same discipline as
    ingest.compact_ingest_state). Returns False when already compact."""
    store = SegmentStore(state_dir)
    manifest = store.manifest()
    if manifest is None:
        return False
    segs = {}
    for table in _TABLES:
        name = store.compact_table(spark, table)
        if name is not None:
            segs[table] = [name]
    if not segs:
        return False
    store.commit(int(manifest["epoch"]), tables=segs)
    return True


def ann_ingest_sink(
    stream_df: DataFrame,
    state_dir: str,
    centroids: DataFrame,
    checkpoint_dir: Optional[str] = None,
    compact_every: Optional[int] = None,
    **kw,
) -> None:
    """Drain an embedding stream into the maintained IVF index
    (availableNow); search it any time with
    ``ann_ivf_search(read_ann_index(...), queries, centroids)``.
    ``compact_every``: fold the log at N segments, in-slot
    (single-writer), as in the dedup and CDC sinks."""
    from transporter_spark.streaming.windows import run_foreach_batch_available_now

    def apply(batch: DataFrame, epoch_id: int) -> None:
        applied = ann_index_batch(batch, epoch_id, state_dir, centroids, **kw)
        if (
            applied
            and compact_every
            and len(SegmentStore(state_dir).table_segments("cells")) >= compact_every
        ):
            compact_ann_index(batch.sparkSession, state_dir)

    run_foreach_batch_available_now(stream_df, apply, checkpoint_dir)


def read_ann_index(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained (vec_id, vec, cell) index — ann_ivf_search's
    input."""
    df = SegmentStore(state_dir).read(spark, "cells")
    if df is None:
        raise FileNotFoundError(
            f"no committed ANN index at {state_dir!r}: the sink has not "
            "applied any non-empty epoch yet"
        )
    return df


def drain_embeddings_index(
    spark: SparkSession,
    sf_dir: str,
    centroids: DataFrame,
    state_dir: Optional[str] = None,
    **kw,
) -> DataFrame:
    """Convenience: stream the embeddings table through the index sink
    and return the maintained index (used by the graded query)."""
    from transporter_spark.streaming.sources import stream_table

    state = state_dir or tempfile.mkdtemp(prefix="ts_ann_") + "/state"
    emb = stream_table(spark, sf_dir, "embeddings")
    ann_ingest_sink(emb, state, centroids, **kw)
    return read_ann_index(spark, state)
