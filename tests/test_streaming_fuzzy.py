"""Continuous SymSpell fuzzy-index sink (streaming/fuzzy.py):
maintained == batch variant table, append-only commits,
replay/re-delivery guards, blocking-distance meta validation,
compaction, and the incremental probe against the maintained state."""

import os

import pytest
from pyspark.sql import functions as F

from transporter_spark.sources.files import read_table


def _names(spark, sf_dir):
    return read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("s")
    )


def _seg_files(state):
    out = {}
    root = os.path.join(state, "segments")
    for dp, _d, fs in os.walk(root):
        for f in fs:
            p = os.path.join(dp, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_fuzzy_sink_multi_epoch_equals_batch_variants(spark, sf_dir, tmp_path):
    """3-epoch drain == batch symspell_variants over everything
    (expansion is pure per-string); commits are append-only; a
    replayed epoch and a re-delivered id are both no-ops."""
    from transporter_spark.operators.dedup import symspell_variants
    from transporter_spark.streaming.fuzzy import (
        fuzzy_index_batch,
        read_fuzzy_index,
    )

    names = _names(spark, sf_dir).filter(F.col("id") <= 300)
    state = str(tmp_path / "fuzzy")
    for epoch in range(3):
        before = _seg_files(state) if epoch else {}
        assert fuzzy_index_batch(
            names.filter(F.col("id") % 3 == epoch), epoch, state
        )
        after = _seg_files(state)
        assert {k: after[k] for k in before} == before  # append-only
    assert not fuzzy_index_batch(
        names.filter(F.col("id") % 3 == 0), 2, state
    )  # replay no-op
    n = read_fuzzy_index(spark, state).count()
    assert not fuzzy_index_batch(
        names.filter(F.col("id") % 3 == 0), 3, state
    )  # re-delivery dropped by the id guard
    got = read_fuzzy_index(spark, state)
    assert got.count() == n
    expect = symspell_variants(names, "s", "id")
    assert sorted((r.id, r.s, r.var) for r in got.collect()) == sorted(
        (r.id, r.s, r.var) for r in expect.collect()
    )


def test_fuzzy_sink_distance_mismatch_raises(spark, sf_dir, tmp_path):
    from transporter_spark.streaming.fuzzy import fuzzy_index_batch

    names = _names(spark, sf_dir).filter(F.col("id") <= 20)
    state = str(tmp_path / "fuzzy")
    assert fuzzy_index_batch(names, 0, state, max_distance=1)
    with pytest.raises(ValueError, match="max_distance=1"):
        fuzzy_index_batch(
            names.select((F.col("id") + 1000).alias("id"), "s"),
            1,
            state,
            max_distance=2,
        )


def test_fuzzy_sink_compaction_and_incremental_probe(spark, sf_dir, tmp_path):
    """compact_fuzzy_index folds the log content-preservingly, and the
    incremental probe against the maintained index equals the full
    symspell_pairs restricted to pairs touching a batch row."""
    from transporter_spark.operators.dedup import (
        incremental_symspell_pairs,
        symspell_pairs,
    )
    from transporter_spark.streaming.fuzzy import (
        compact_fuzzy_index,
        fuzzy_index_batch,
        read_fuzzy_index,
    )
    from transporter_spark.streaming.state import SegmentStore

    names = _names(spark, sf_dir).filter(F.col("id") <= 400)
    state = str(tmp_path / "fuzzy")
    for epoch in range(2):
        fuzzy_index_batch(
            names.filter(F.col("id") % 2 == epoch), epoch, state,
            max_distance=2,
        )
    assert compact_fuzzy_index(spark, state)
    assert not compact_fuzzy_index(spark, state)
    store = SegmentStore(state)
    assert all(
        len(store.table_segments(t)) == 1 for t in ("vars", "sym_ids")
    )

    batch = names.filter(F.col("id") % 7 == 0).select(
        (F.col("id") + 1000000).alias("id"),
        F.expr("concat(substr(s, 1, 9), 'X', substr(s, 11))").alias("s"),
    )
    got = incremental_symspell_pairs(
        batch, read_fuzzy_index(spark, state), max_distance=2
    )
    full = symspell_pairs(
        names.unionByName(batch), "s", "id", max_distance=2
    ).filter((F.col("id_a") >= 1000000) | (F.col("id_b") >= 1000000))
    canon = lambda df: sorted(  # noqa: E731
        (r.id_a, r.id_b, r.dist) for r in df.collect()
    )
    assert canon(got) == canon(full)
    assert got.count() > 0  # the edited names really pair up

    # plan pin: the probe never re-expands corpus strings — no
    # higher-order variant transform on the index side (it reads the
    # persisted vars parquet), and no cartesian anywhere
    sc = got.sparkSession.sparkContext
    plan = sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert state in plan  # the persisted index is what's probed


def test_fuzzy_index_read_guard_blocks_deeper_probe(spark, sf_dir, tmp_path):
    """Probing at a LARGER radius than the index was built with would
    silently lose recall — the read-side guard raises instead; equal
    or shallower probes pass."""
    from transporter_spark.streaming.fuzzy import (
        fuzzy_index_batch,
        read_fuzzy_index,
    )

    names = _names(spark, sf_dir).filter(F.col("id") <= 20)
    state = str(tmp_path / "fuzzy")
    assert fuzzy_index_batch(names, 0, state, max_distance=1)
    read_fuzzy_index(spark, state, max_distance=1)  # equal: fine
    with pytest.raises(ValueError, match="probing at 2"):
        read_fuzzy_index(spark, state, max_distance=2)
