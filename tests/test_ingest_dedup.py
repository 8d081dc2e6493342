"""Continuous ingest dedup: single-drain equivalence with batch
clustering, cross-epoch first-wins rejection, replay idempotency, and
atomic state commit."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from transporter_spark.operators.dedup import dedup_clusters
from transporter_spark.sources.files import read_table
from transporter_spark.streaming.ingest import (
    drain_documents_dedup,
    ingest_dedup_batch,
    read_ingest_corpus,
    read_ingest_index,
)


def test_single_drain_equals_batch_canonical(spark, sf_dir, tmp_path):
    """A one-epoch drain must keep exactly the canonical docs batch
    dedup_clusters keeps — the oracle equivalence the graded query
    leans on."""
    state = str(tmp_path / "state")
    kept = drain_documents_dedup(spark, sf_dir, state, threshold=0.2)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}

    docs = read_table(spark, sf_dir, "documents")
    canon = dedup_clusters(docs, threshold=0.2, use_lsh=True)
    canon_ids = {r.doc_id for r in canon.filter("is_canonical").collect()}
    assert kept_ids == canon_ids


def test_cross_epoch_first_wins_and_index_grows(spark, sf_dir, tmp_path):
    """Epoch 2 docs near-dupping an epoch-1 KEPT doc are rejected even
    though their ids are smaller-or-larger — first epoch wins; the
    index gains bands only for accepted docs."""
    state = str(tmp_path / "state")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    e1 = docs.limit(40)
    # epoch 2: fresh ids, clones of epoch-1 text plus synthetic docs
    # guaranteed novel (corpus-internal near-dups would muddy the count)
    clones = e1.limit(20).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    originals = spark.createDataFrame(
        [
            (600000 + i, f"synthetic novel document {i} " + " ".join(
                f"tok{i}x{j}" for j in range(30)
            ))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    e2 = clones.unionByName(originals)

    assert ingest_dedup_batch(e1, 0, state, threshold=0.5)
    n1 = read_ingest_corpus(spark, state).count()
    idx1 = read_ingest_index(spark, state).count()
    assert ingest_dedup_batch(e2, 1, state, threshold=0.5)
    corpus = read_ingest_corpus(spark, state)
    # every exact clone was rejected; every genuinely-new doc accepted
    assert corpus.filter(F.col("doc_id") >= 500000).filter(
        F.col("doc_id") < 600000
    ).count() == 0
    assert corpus.filter(F.col("doc_id") >= 600000).count() == originals.count()
    idx2 = read_ingest_index(spark, state)
    assert idx2.count() == idx1 + 16 * originals.count()
    assert n1 + originals.count() == corpus.count()


def test_cross_epoch_redelivery_of_same_id_not_duplicated(spark, sf_dir, tmp_path):
    """At-least-once sources can re-deliver earlier data in a LATER
    epoch (the epoch marker only stops same-epoch replay). A
    re-delivered doc shares its id with an accepted row and the LSH
    self-pair filter would hide it — the sink must drop it by id, not
    re-accept it."""
    state = str(tmp_path / "state")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    e1 = docs.limit(30)
    assert ingest_dedup_batch(e1, 0, state, threshold=0.5)
    n1 = read_ingest_corpus(spark, state).count()
    idx1 = read_ingest_index(spark, state).count()
    # epoch 1's rows re-delivered wholesale inside epoch 2, plus one new doc
    novel = spark.createDataFrame(
        [(990000, "entirely new content " + " ".join(f"w{j}" for j in range(25)))],
        "doc_id long, text string",
    )
    assert ingest_dedup_batch(e1.unionByName(novel), 1, state, threshold=0.5)
    corpus = read_ingest_corpus(spark, state)
    assert corpus.count() == n1 + 1
    assert corpus.groupBy("doc_id").count().filter("count > 1").count() == 0
    assert read_ingest_index(spark, state).count() == idx1 + 16


def test_multi_epoch_corpus_is_near_dup_free(spark, sf_dir, tmp_path):
    """The sink's core promise, as an invariant over a 3-epoch drain:
    re-running the SAME LSH over the final accepted corpus finds ZERO
    verified pairs. (Cross-epoch: a doc sharing a band with an accepted
    doc is rejected at ingest; within-epoch: only component canonicals
    survive — so any surviving pair would be a sink bug, not recall
    loss, since detection uses the identical hash family.)"""
    from transporter_spark.operators.dedup import minhash_lsh_pairs

    state = str(tmp_path / "state")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    thirds = [
        docs.filter(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    for epoch, part in enumerate(thirds):
        ingest_dedup_batch(part, epoch, state, threshold=0.2)
    corpus = read_ingest_corpus(spark, state)
    assert 0 < corpus.count() < n  # something accepted, something rejected
    assert minhash_lsh_pairs(corpus, threshold=0.2).count() == 0


def test_epoch_replay_is_noop(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: re-delivering an applied epoch
    must change nothing (returns False, corpus byte-identical)."""
    state = str(tmp_path / "state")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    assert ingest_dedup_batch(docs.limit(30), 0, state, threshold=0.5)
    before = sorted(
        map(tuple, read_ingest_corpus(spark, state).collect())
    )
    assert not ingest_dedup_batch(docs.limit(30), 0, state, threshold=0.5)
    after = sorted(map(tuple, read_ingest_corpus(spark, state).collect()))
    assert before == after


def test_state_commit_is_versioned_symlink(spark, sf_dir, tmp_path):
    """The corpus/index pair becomes current via one symlink swap —
    docs, index, and the epoch marker always belong to the same
    version (no torn two-directory commits)."""
    state = str(tmp_path / "state")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingest_dedup_batch(docs.limit(10), 0, state, threshold=0.5)
    assert os.path.islink(state)
    target = os.path.realpath(state)
    assert os.path.isdir(os.path.join(target, "docs"))
    assert os.path.isdir(os.path.join(target, "index"))
    with open(os.path.join(state, "_last_epoch")) as fh:
        assert fh.read().strip() == "0"
    ingest_dedup_batch(docs.limit(20), 1, state, threshold=0.5)
    assert os.path.realpath(state) != target  # old version replaced
    with open(os.path.join(state, "_last_epoch")) as fh:
        assert fh.read().strip() == "1"
