"""SegmentStore unit contract: atomic manifest commits, one-commit GC
delay, crash-orphan collection (the machinery under the append-only
ingest sink and the hour-scoped rollup — streaming/state.py)."""

from __future__ import annotations

import os

from transporter_spark.streaming.state import SegmentStore


def _write(spark, store, name, rows):
    spark.createDataFrame(rows, "id long, v string").write.mode(
        "overwrite"
    ).parquet(store.seg_path(name))


def test_list_table_append_and_read(spark, tmp_path):
    store = SegmentStore(str(tmp_path / "st"))
    _write(spark, store, "t-e0", [(1, "a")])
    store.commit(0, tables={"t": ["t-e0"]})
    _write(spark, store, "t-e1", [(2, "b")])
    store.commit(1, tables={"t": ["t-e0", "t-e1"]})
    assert store.last_epoch() == 1
    assert sorted(r.id for r in store.read(spark, "t").collect()) == [1, 2]
    assert store.read(spark, "missing") is None


def test_dropped_segment_survives_one_commit_then_purged(spark, tmp_path):
    """A segment replaced by a commit stays on disk (a reader holding
    the previous manifest's paths can finish) and is deleted by the
    NEXT commit — the same retention ADVICE r3 asked of swap_current."""
    store = SegmentStore(str(tmp_path / "st"))
    _write(spark, store, "t-e0", [(1, "a")])
    store.commit(0, tables={"t": ["t-e0"]})
    reader = spark.read.parquet(*store.table_paths("t"))  # resolves t-e0
    _write(spark, store, "t-c1", [(1, "a")])
    store.commit(1, tables={"t": ["t-c1"]})  # t-e0 dropped -> gc list
    assert store.manifest()["gc"] == ["t-e0"]
    assert os.path.isdir(store.seg_path("t-e0"))
    assert reader.count() == 1  # old-manifest reader still completes
    _write(spark, store, "t-e2", [(2, "b")])
    store.commit(2, tables={"t": ["t-c1", "t-e2"]})  # purges t-e0
    assert not os.path.exists(store.seg_path("t-e0"))


def test_crash_orphan_is_garbage_collected(spark, tmp_path):
    """A segment written by a crashed attempt (never referenced by any
    manifest) is swept into gc by the next successful commit and purged
    by the one after."""
    store = SegmentStore(str(tmp_path / "st"))
    _write(spark, store, "t-e0", [(1, "a")])
    store.commit(0, tables={"t": ["t-e0"]})
    _write(spark, store, "t-e1", [(9, "crash")])  # crash before commit
    _write(spark, store, "t-e1b", [(2, "b")])     # retry under a new name
    store.commit(1, tables={"t": ["t-e0", "t-e1b"]})
    assert store.manifest()["gc"] == ["t-e1"]
    _write(spark, store, "t-e2", [(3, "c")])
    store.commit(2, tables={"t": ["t-e0", "t-e1b", "t-e2"]})
    assert not os.path.exists(store.seg_path("t-e1"))
    assert sorted(r.id for r in store.read(spark, "t").collect()) == [1, 2, 3]


def test_commit_preserves_unnamed_tables_and_keyed(spark, tmp_path):
    """Complete-dict semantics per table: a commit naming only table A
    leaves table B's segments and every keyed mapping untouched."""
    store = SegmentStore(str(tmp_path / "st"))
    _write(spark, store, "a-e0", [(1, "a")])
    _write(spark, store, "b-e0", [(2, "b")])
    store.commit(0, tables={"a": ["a-e0"], "b": ["b-e0"]}, keyed={"k": {"x": "b-e0"}})
    _write(spark, store, "a-e1", [(3, "c")])
    store.commit(1, tables={"a": ["a-e0", "a-e1"]})
    m = store.manifest()
    assert m["tables"]["b"] == ["b-e0"]
    assert m["keyed"]["k"] == {"x": "b-e0"}
    assert m["gc"] == []


def test_epoch_regression_raises_instead_of_dropping(spark, tmp_path):
    """epoch_already_applied: same-epoch replay skips, but a BACKWARDS
    epoch counter (fresh checkpoint against existing state) raises —
    silently skipping would discard genuinely new batches until the
    counter caught up."""
    import pytest

    store = SegmentStore(str(tmp_path / "st"))
    assert store.epoch_already_applied(0) is False  # no state yet
    _write(spark, store, "t-e5", [(1, "a")])
    store.commit(5, tables={"t": ["t-e5"]})
    assert store.epoch_already_applied(5) is True   # replay of last
    assert store.epoch_already_applied(6) is False  # next epoch
    with pytest.raises(ValueError, match="epoch counter went backwards"):
        store.epoch_already_applied(0)


def test_fresh_name_skips_existing_dirs(spark, tmp_path):
    store = SegmentStore(str(tmp_path / "st"))
    _write(spark, store, "t-compact0", [(1, "a")])
    assert store.fresh_name("t-compact0") == "t-compact0.1"
