"""Continuous BPE vocabulary sink (streaming/vocab.py): maintained
counts == batch word counts, append-only commits, replay/re-delivery
guards, compaction, and merge-learning equality from the maintained
state."""

import os

from pyspark.sql import functions as F

from transporter_spark.sources.files import read_table


def _seg_files(state):
    out = {}
    root = os.path.join(state, "segments")
    for dp, _d, fs in os.walk(root):
        for f in fs:
            p = os.path.join(dp, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_vocab_sink_multi_epoch_equals_batch_counts(spark, sf_dir, tmp_path):
    """3-epoch drain == single-pass bpe_word_counts over everything
    (doc-disjoint epochs, exact SUM merge-on-read); commits are
    append-only; a replayed epoch and a re-delivered doc (SUM is not
    idempotent — the id guard is load-bearing) are both no-ops."""
    from transporter_spark.operators.text import bpe_word_counts
    from transporter_spark.streaming.vocab import (
        read_vocab_counts,
        vocab_batch,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    state = str(tmp_path / "vocab")
    for epoch in range(3):
        before = _seg_files(state) if epoch else {}
        assert vocab_batch(
            docs.filter(F.col("doc_id") % 3 == epoch), epoch, state
        )
        after = _seg_files(state)
        assert {k: after[k] for k in before} == before  # append-only
    # replay no-op
    assert not vocab_batch(docs.filter(F.col("doc_id") % 3 == 0), 2, state)
    # re-delivery: double-counting would corrupt the SUM state — the id
    # guard must drop the whole re-shipped batch
    assert not vocab_batch(docs.filter(F.col("doc_id") % 3 == 0), 3, state)
    got = {
        r.w: r.cnt for r in read_vocab_counts(spark, state).collect()
    }
    want = {r.w: r.cnt for r in bpe_word_counts(docs).collect()}
    assert got == want


def test_vocab_sink_compaction_preserves_counts_and_merges(
    spark, sf_dir, tmp_path
):
    """Fold compaction pre-SUMs the partial log content-preservingly,
    and merges learned from the maintained state equal the batch
    trainer's exactly."""
    from transporter_spark.operators.text import (
        bpe_learn,
        bpe_learn_from_counts,
    )
    from transporter_spark.streaming.state import SegmentStore
    from transporter_spark.streaming.vocab import (
        compact_vocab_state,
        read_vocab_counts,
        vocab_batch,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    state = str(tmp_path / "vocab")
    for epoch in range(2):
        vocab_batch(docs.filter(F.col("doc_id") % 2 == epoch), epoch, state)
    pre = {r.w: r.cnt for r in read_vocab_counts(spark, state).collect()}
    assert compact_vocab_state(spark, state)
    assert not compact_vocab_state(spark, state)
    store = SegmentStore(state)
    assert all(
        len(store.table_segments(t)) == 1 for t in ("wc", "doc_ids")
    )
    post = {r.w: r.cnt for r in read_vocab_counts(spark, state).collect()}
    assert post == pre

    got = bpe_learn_from_counts(read_vocab_counts(spark, state), 4)
    want = bpe_learn(docs, num_merges=4)
    assert got == want
