"""Continuous HLL sink (streaming/sketches.py): maintained state ==
batch sketch across epoch boundaries, replay no-op, the idempotent
re-delivery property the sum-based sinks cannot have, append-only
commits, and compaction."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from transporter_spark.operators.sketches import (
    hll_estimate,
    hll_register_table,
)
from transporter_spark.sources.files import read_table
from transporter_spark.streaming.sketches import (
    compact_hll_state,
    hll_merge_batch,
    read_hll_state,
)
from transporter_spark.streaming.state import SegmentStore


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_multi_epoch_drain_equals_batch_sketch(spark, sf_dir, tmp_path):
    """3-epoch merge == single-pass register table over everything,
    row-for-row (max-merge associativity); replayed epoch is a no-op;
    state is register-bounded, never per-item."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id",
                                                    "event_type")
    state = str(tmp_path / "hll")
    for epoch in range(3):
        assert hll_merge_batch(
            ev.filter(F.col("event_id") % 3 == epoch), epoch, state,
            "user_id", ["event_type"],
        )
    before = _rows(read_hll_state(spark, state))
    assert not hll_merge_batch(  # replay guard
        ev.filter(F.col("event_id") % 3 == 2), 2, state,
        "user_id", ["event_type"],
    )
    assert _rows(read_hll_state(spark, state)) == before
    assert before == _rows(hll_register_table(ev, "user_id", ["event_type"]))
    assert len(before) <= 5 * 512


def test_redelivery_under_new_epoch_is_harmless(spark, sf_dir, tmp_path):
    """The property that distinguishes this sink from rollup/kmeans:
    re-delivering ALREADY-APPLIED rows under a NEW epoch (at-least-once
    source after a source-side crash) leaves the state bit-identical —
    max(rho, rho) == rho. Sum-based sinks double-count here."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id",
                                                    "event_type")
    state = str(tmp_path / "hll")
    assert hll_merge_batch(ev, 0, state, "user_id", ["event_type"])
    before = _rows(read_hll_state(spark, state))
    # same rows again, NEW epoch id -> applied, but a no-op on content
    assert hll_merge_batch(
        ev.filter(F.col("event_id") % 2 == 0), 1, state,
        "user_id", ["event_type"],
    )
    assert _rows(read_hll_state(spark, state)) == before


def test_commit_is_append_only_and_compaction_folds(spark, sf_dir, tmp_path):
    """Epochs hitting DISJOINT groups append segments (pre-existing
    files byte-untouched — the keyed manifest leaves untouched groups'
    segments alone); compaction then folds the split log to one segment
    without changing what the reader sees. (When a batch touches every
    group — the common case — each merge already collapses the table
    and compaction is a no-op by design, as in the kmeans sink.)"""
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id",
                                                    "event_type")
    state = str(tmp_path / "hll")
    root = os.path.join(state, "segments")

    def files():
        out = {}
        for dp, _d, fs in os.walk(root):
            for f in fs:
                p = os.path.join(dp, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
        return out

    assert hll_merge_batch(
        ev.filter(F.col("event_type").isin("click", "error")), 0, state,
        "user_id", ["event_type"],
    )
    snap = files()
    assert hll_merge_batch(
        ev.filter(~F.col("event_type").isin("click", "error")), 1, state,
        "user_id", ["event_type"],
    )
    after = files()
    assert all(after.get(k) == v for k, v in snap.items()), (
        "pre-existing segment files were rewritten"
    )
    before_rows = _rows(read_hll_state(spark, state))
    assert compact_hll_state(spark, state)
    store = SegmentStore(state)
    assert len(set(store.keyed_mapping("registers").values())) == 1
    assert _rows(read_hll_state(spark, state)) == before_rows
    assert not compact_hll_state(spark, state)  # already compact


def test_estimate_over_maintained_state_matches_batch(spark, sf_dir, tmp_path):
    """End shape: estimates from the maintained registers equal the
    batch-path estimates exactly (shared hll_estimate)."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id",
                                                    "event_type")
    state = str(tmp_path / "hll")
    for epoch in range(2):
        hll_merge_batch(
            ev.filter(F.col("event_id") % 2 == epoch), epoch, state,
            "user_id", ["event_type"],
        )
    got = hll_estimate(read_hll_state(spark, state), by=["event_type"])
    want = hll_estimate(
        hll_register_table(ev, "user_id", ["event_type"]), by=["event_type"]
    )
    assert _rows(got) == _rows(want)


def test_dd_sink_multi_epoch_equals_batch_and_replay_safe(spark, sf_dir,
                                                          tmp_path):
    """3-epoch SUM-delta-merge of the bin histogram == single-pass
    dd_bins over everything, bin-for-bin; replayed epoch is a no-op;
    quantiles from maintained state == batch-path quantiles exactly."""
    from transporter_spark.operators.sketches import (
        dd_bins,
        dd_quantiles,
    )
    from transporter_spark.streaming.sketches import (
        dd_merge_batch,
        read_dd_state,
    )

    ev = read_table(spark, sf_dir, "events").select("event_id", "value",
                                                    "event_type")
    state = str(tmp_path / "dd")
    for epoch in range(3):
        assert dd_merge_batch(
            ev.filter(F.col("event_id") % 3 == epoch), epoch, state,
            "value", ["event_type"],
        )
    before = _rows(read_dd_state(spark, state))
    assert not dd_merge_batch(  # replay guard
        ev.filter(F.col("event_id") % 3 == 2), 2, state,
        "value", ["event_type"],
    )
    assert _rows(read_dd_state(spark, state)) == before
    assert before == _rows(dd_bins(ev, "value", ["event_type"]))
    got = dd_quantiles(read_dd_state(spark, state), by=["event_type"])
    want = dd_quantiles(dd_bins(ev, "value", ["event_type"]),
                        by=["event_type"])
    assert _rows(got) == _rows(want)


def test_mixed_sketch_parameters_raise_loudly(spark, sf_dir, tmp_path):
    """Sketch parameters live in the seg-key format string: an epoch
    merged at different p (or scale/sub bits) hits the SegmentStore's
    format-mismatch ValueError instead of silently mixing incompatible
    register/bin domains."""
    import pytest

    from transporter_spark.streaming.sketches import dd_merge_batch

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id",
                                                    "value", "event_type")
    state = str(tmp_path / "hll")
    assert hll_merge_batch(ev, 0, state, "user_id", ["event_type"], p=9)
    with pytest.raises(ValueError, match="seg_key format"):
        hll_merge_batch(ev, 1, state, "user_id", ["event_type"], p=7)
    dstate = str(tmp_path / "dd")
    assert dd_merge_batch(ev, 0, dstate, "value", ["event_type"])
    with pytest.raises(ValueError, match="seg_key format"):
        dd_merge_batch(ev, 1, dstate, "value", ["event_type"],
                       scale_bits=12, sub_bits=3)


def test_compact_dd_state_folds_disjoint_epochs(spark, sf_dir, tmp_path):
    """The quantile state's compaction twin: disjoint-group epochs
    split the log; compact_dd_state folds it without changing what the
    reader sees."""
    from transporter_spark.streaming.sketches import (
        compact_dd_state,
        dd_merge_batch,
        read_dd_state,
    )

    ev = read_table(spark, sf_dir, "events").select("event_id", "value",
                                                    "event_type")
    state = str(tmp_path / "dd")
    assert dd_merge_batch(
        ev.filter(F.col("event_type").isin("click", "error")), 0, state,
        "value", ["event_type"],
    )
    assert dd_merge_batch(
        ev.filter(~F.col("event_type").isin("click", "error")), 1, state,
        "value", ["event_type"],
    )
    before = _rows(read_dd_state(spark, state))
    assert compact_dd_state(spark, state)
    assert _rows(read_dd_state(spark, state)) == before
    assert not compact_dd_state(spark, state)


# --- Bloom membership sink ---


def test_bloom_sink_multi_epoch_equals_batch_and_redelivery_safe(
    spark, sf_dir, tmp_path
):
    """3-epoch OR-merge == single-pass word table (OR associativity);
    replayed epoch is a no-op; and — the HLL-class property the SUM
    sinks cannot have — re-delivering already-applied rows under a NEW
    epoch leaves the state bit-identical (x | x == x)."""
    from transporter_spark.operators.sketches import bloom_words
    from transporter_spark.streaming.sketches import (
        bloom_merge_batch,
        read_bloom_state,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    state = str(tmp_path / "bloom")
    for epoch in range(3):
        assert bloom_merge_batch(
            docs.filter(F.col("doc_id") % 3 == epoch), epoch, state, "text"
        )
    got = _rows(read_bloom_state(spark, state))
    assert got == _rows(bloom_words(docs, "text"))
    assert not bloom_merge_batch(  # replay guard
        docs.filter(F.col("doc_id") % 3 == 2), 2, state, "text"
    )
    # at-least-once re-delivery under a NEW epoch: state unchanged
    assert bloom_merge_batch(docs, 3, state, "text")
    assert _rows(read_bloom_state(spark, state)) == got


def test_bloom_sink_mixed_parameters_raise_loudly(spark, sf_dir, tmp_path):
    """Bloom geometry lives in the seg-key format string: merging an
    epoch at different m/k hits the loud format-mismatch error instead
    of silently OR-ing incompatible bit domains."""
    import pytest

    from transporter_spark.streaming.sketches import bloom_merge_batch

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    state = str(tmp_path / "bloom")
    assert bloom_merge_batch(docs, 0, state, "text")
    with pytest.raises(ValueError, match="seg_key format"):
        bloom_merge_batch(docs, 1, state, "text", m_bits=1 << 12, k=2)


def test_seg_key_is_injective_over_group_tuples(spark):
    """The ADVICE r5 finding: the old concat_ws seg key skipped NULLs
    (NULL collided with '') and couldn't distinguish separator bytes
    inside values. The netstring encoding keeps every distinct group
    tuple on its own segment key."""
    from transporter_spark.streaming.sketches import _seg_key

    rows = [
        (None, None), (None, ""), ("", None), ("", ""),
        ("a\x1fb", "c"), ("a", "b\x1fc"), ("a\x1f", "bc"),
        ("v1:x", "y"), ("v1:", "xy"),
    ]
    df = spark.createDataFrame(rows, "c1 string, c2 string")
    keys = [
        r.k for r in df.select(_seg_key(["c1", "c2"]).alias("k")).collect()
    ]
    assert len(set(keys)) == len(rows), keys
    # empty `by` -> one constant global group key
    assert df.select(_seg_key([]).alias("k")).distinct().count() == 1


# --- span-df index sink ---


def test_span_index_multi_epoch_equals_batch_and_replay_safe(
    spark, sf_dir, tmp_path
):
    """3-epoch drain == single-pass span_df_index row-for-row (df SUM
    across doc-disjoint epochs is exact — documents are atomic rows);
    replayed epoch is a no-op; a W-mismatched epoch raises instead of
    mixing hash domains."""
    import pytest

    from transporter_spark.operators.text import span_df_index
    from transporter_spark.streaming.spans import (
        read_span_index,
        span_index_merge_batch,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    state = str(tmp_path / "spandf")
    for epoch in range(3):
        assert span_index_merge_batch(
            docs.filter(F.col("doc_id") % 3 == epoch), epoch, state
        )
    got = _rows(read_span_index(spark, state))
    assert got == _rows(span_df_index(docs))
    assert not span_index_merge_batch(  # replay guard
        docs.filter(F.col("doc_id") % 3 == 2), 2, state
    )
    assert _rows(read_span_index(spark, state)) == got
    with pytest.raises(ValueError, match="window_tokens"):
        span_index_merge_batch(docs, 3, state, window_tokens=5)


def test_span_index_commit_append_only_and_compaction_folds(
    spark, sf_dir, tmp_path
):
    """The ingest-sink commit discipline: an epoch writes ONLY its own
    partial segment (pre-existing files byte-identical, IO ∝ batch —
    never a keyed remap that rewrites O(state) because uniform hashes
    touch every bucket); compaction folds the log to ONE pre-summed
    segment preserving the merge-on-read SUM."""
    import os

    from transporter_spark.streaming.spans import (
        compact_span_index,
        read_span_index,
        span_index_merge_batch,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    state = str(tmp_path / "spandf")
    assert span_index_merge_batch(docs.filter(F.col("doc_id") % 2 == 0), 0, state)

    def snapshot():
        seen = {}
        segroot = os.path.join(state, "segments")
        for root, _dirs, files in os.walk(segroot):
            for f in files:
                p = os.path.join(root, f)
                st = os.stat(p)
                seen[os.path.relpath(p, segroot)] = (st.st_size, st.st_mtime_ns)
        return seen

    before = snapshot()
    assert span_index_merge_batch(docs.filter(F.col("doc_id") % 2 != 0), 1, state)
    after = snapshot()
    assert set(before).issubset(set(after))
    for rel, sig in before.items():
        assert after[rel] == sig, f"pre-existing file rewritten: {rel}"

    merged = _rows(read_span_index(spark, state))
    assert compact_span_index(spark, state)
    assert _rows(read_span_index(spark, state)) == merged
    assert not compact_span_index(spark, state)  # already compact


def test_span_prune_loop_first_wins_and_atomic_commit(spark, tmp_path):
    """The full continuous loop: an epoch-1 passage is KEPT in epoch 1
    (unique so far) but excised from every later copy; batch-internal
    duplicates excise within their own epoch; replay is a no-op; a
    min_df- or W-mismatched epoch raises; and the pruned corpus and
    index advance in the SAME commit (epochs equal)."""
    import pytest

    from transporter_spark.streaming.spans import (
        read_pruned_corpus,
        read_span_index,
        span_prune_merge_batch,
    )

    passage = " ".join(f"p{i}" for i in range(10))
    state = str(tmp_path / "spanloop")
    e1 = spark.createDataFrame(
        [(1, "a1 " + passage + " a2"), (2, "plain unique words here")],
        "doc_id long, text string",
    )
    assert span_prune_merge_batch(e1, 0, state)
    kept1 = {r.doc_id: r.kept_text
             for r in read_pruned_corpus(spark, state).collect()}
    assert kept1[1] == "a1 " + passage + " a2"   # first text wins: intact

    dup = " ".join(f"d{i}" for i in range(10))
    e2 = spark.createDataFrame(
        [
            (10, "x1 " + passage + " x2"),       # copies the e1 passage
            (11, dup + " y1"),                   # batch-internal dup pair
            (12, "z1 " + dup),
        ],
        "doc_id long, text string",
    )
    assert span_prune_merge_batch(e2, 1, state)
    kept = {r.doc_id: r.kept_text
            for r in read_pruned_corpus(spark, state).collect()}
    assert kept[1] == "a1 " + passage + " a2"    # epoch-1 doc untouched
    assert kept[10] == "x1 x2"                   # later copy excised
    assert kept[11] == "y1" and kept[12] == "z1"

    assert not span_prune_merge_batch(e2, 1, state)  # replay no-op
    with pytest.raises(ValueError, match="span_min_df"):
        span_prune_merge_batch(e1, 2, state, min_df=3)
    with pytest.raises(ValueError, match="span_w"):
        span_prune_merge_batch(e1, 2, state, window_tokens=5)
    # the index advanced with the prune output (one atomic commit):
    # it now reflects BOTH epochs' windows
    idx = read_span_index(spark, state)
    assert idx.where(F.col("n_docs") >= 2).count() >= 1


def test_span_sinks_refuse_each_others_state(spark, tmp_path):
    """Family cross-wiring raises instead of silently corrupting: an
    index-only epoch into a prune-loop state would append df partials
    with no matching pruned rows (breaking one-pruned-row-per-doc);
    a prune epoch into an index-only state would read a corpus that
    was never pruned. Both directions are loud (ADVICE r6)."""
    import pytest

    from transporter_spark.streaming.spans import (
        span_index_merge_batch,
        span_prune_merge_batch,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j k"), (2, "l m n o p q r s t u v")],
        "doc_id long, text string",
    )
    idx_state = str(tmp_path / "idxstate")
    assert span_index_merge_batch(docs, 0, idx_state)
    with pytest.raises(ValueError, match="span-index"):
        span_prune_merge_batch(docs, 1, idx_state)

    prune_state = str(tmp_path / "prunestate")
    assert span_prune_merge_batch(docs, 0, prune_state)
    with pytest.raises(ValueError, match="span-prune"):
        span_index_merge_batch(docs, 1, prune_state)


def test_span_prune_compaction_folds_both_tables(spark, tmp_path):
    """compact_span_index on a prune-loop state folds BOTH segment
    logs — the pre-summed index AND the unioned pruned corpus — to one
    segment each, preserving merge-on-read contents exactly."""
    from transporter_spark.streaming.spans import (
        compact_span_index,
        read_pruned_corpus,
        read_span_index,
        span_prune_merge_batch,
    )
    from transporter_spark.streaming.state import SegmentStore

    state = str(tmp_path / "spanloop")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    assert span_prune_merge_batch(
        mk([(1, " ".join(f"a{i}" for i in range(12)))]), 0, state
    )
    assert span_prune_merge_batch(
        mk([(2, " ".join(f"a{i}" for i in range(12)))]), 1, state
    )
    idx_before = _rows(read_span_index(spark, state))
    pruned_before = _rows(read_pruned_corpus(spark, state))
    assert compact_span_index(spark, state)
    st = SegmentStore(state)
    assert len(st.table_segments("spandf")) == 1
    assert len(st.table_segments("pruned")) == 1
    assert _rows(read_span_index(spark, state)) == idx_before
    assert _rows(read_pruned_corpus(spark, state)) == pruned_before
    assert not compact_span_index(spark, state)  # already compact


def test_chunk_bounds_match_duckdb_quantile_cont(spark, sf_dir):
    """The r12 multi-epoch span-prune oracle replays the drain
    harness's chunk assignment with DuckDB quantile_cont; the harness
    splits on Spark `percentile`. Both are type-7 linear
    interpolation — pin the bound values EQUAL on the graded fixture
    so the cross-engine chunk assignment can never silently drift."""
    import duckdb
    import os

    from pyspark.sql import functions as F
    from transporter_spark.sources.files import read_table

    docs = read_table(spark, sf_dir, "documents")
    spark_b = docs.select(
        F.expr("percentile(doc_id, array(0.25, 0.5, 0.75))").alias("b")
    ).collect()[0].b
    con = duckdb.connect()
    duck_b = con.execute(
        "SELECT quantile_cont(doc_id, [0.25, 0.5, 0.75]) FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    ).fetchone()[0]
    assert list(spark_b) == list(duck_b)


def test_span_prune_multi_epoch_drain_is_discriminating_and_closed_form(
    spark, tmp_path
):
    """The r12 graded contract: a multi-epoch drain equals the
    cumulative-df closed form (excise doc-in-epoch-e on windows whose
    df over epochs <= e reaches min_df) AND differs from the batch
    prune where a repeat only completes in a later epoch — proving
    the graded oracle actually discriminates epoch structure."""
    from transporter_spark.operators.text import prune_repeated_spans
    from transporter_spark.streaming.spans import (
        read_pruned_corpus,
        span_prune_merge_batch,
    )

    passage = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    e0 = [(1, passage + " tail one"), (2, "solo a b c d e f g h i j")]
    e1 = [(3, passage + " tail two"), (4, passage + " tail three")]
    state = str(tmp_path / "state")
    for e, rows in enumerate([e0, e1]):
        span_prune_merge_batch(
            spark.createDataFrame(rows, "doc_id long, text string"),
            e,
            state,
            window_tokens=10,
            min_df=2,
        )
    got = {
        r.doc_id: r.kept_text
        for r in read_pruned_corpus(spark, state).collect()
    }
    # doc 1 arrived before the passage repeated: kept whole (df at
    # epoch 0 is 1 < min_df). docs 3/4 arrive when cumulative df
    # reaches 2 and 3: the passage AND the following "tail" token
    # (covered by the offset-1 window "x2..x10 tail", also repeated)
    # are excised.
    assert got[1] == passage + " tail one"
    assert got[3] == "two" and got[4] == "three"
    # the BATCH prune over the union excises doc 1 too — the
    # multi-epoch result is genuinely different rows
    batch = {
        r.doc_id: r.kept_text
        for r in prune_repeated_spans(
            spark.createDataFrame(
                e0 + e1, "doc_id long, text string"
            ),
            window_tokens=10,
            min_df=2,
        ).collect()
    }
    assert batch[1] == "one" != got[1]


def test_chunked_table_stream_chunks_cover_ordered_disjoint(
    spark, sf_dir, tmp_path
):
    """The shared multi-epoch drain harness contract (six graded
    queries ride it since r12): the chunk files disjointly cover the
    table, are doc_id-range-ordered file-to-file, and carry strictly
    increasing mtimes so the file source delivers one epoch per chunk
    in order."""
    import os

    from transporter_spark.sources.files import read_table
    from transporter_spark.streaming.sources import chunked_table_stream

    chunk_dir = str(tmp_path / "chunks")
    chunked_table_stream(
        spark, sf_dir, "documents", num_chunks=4, out_dir=chunk_dir
    )
    files = sorted(
        f for f in os.listdir(chunk_dir) if f.endswith(".parquet")
    )
    assert len(files) == 4
    ranges, total, mtimes = [], 0, []
    for f in files:
        p = os.path.join(chunk_dir, f)
        df = spark.read.parquet(p)
        lo, hi, n = df.selectExpr(
            "min(doc_id)", "max(doc_id)", "count(*)"
        ).collect()[0]
        assert n > 0, f
        ranges.append((lo, hi))
        total += n
        mtimes.append(os.stat(p).st_mtime)
    docs = read_table(spark, sf_dir, "documents")
    assert total == docs.count()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo, ranges
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 4
