"""Continuous pHash index sink (streaming/media.py): maintained ==
batch build, append-only commits, replay/re-delivery guards, geometry
meta validation, compaction, and the incremental probe against the
maintained state."""

import os

import pytest
from pyspark.sql import functions as F

from transporter_spark.sources.files import read_table


def _media(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.encode(F.col("text"), "UTF-8").alias("content"))
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


def test_phash_sink_multi_epoch_equals_batch_index(spark, sf_dir, tmp_path):
    """3-epoch drain == batch phash_index over everything (the dHash
    is pure per-image, so epoch boundaries cannot leak); commits are
    append-only (pre-existing files byte-identical); a replayed epoch
    and a re-delivered image are both no-ops."""
    from transporter_spark.operators.multimodal import phash_index
    from transporter_spark.streaming.media import (
        phash_index_batch,
        read_phash_index,
    )

    media = _media(spark, sf_dir)
    state = str(tmp_path / "phash")
    for epoch in range(3):
        before = _seg_files(state) if epoch else {}
        assert phash_index_batch(
            media.filter(F.col("doc_id") % 3 == epoch), epoch, state
        )
        after = _seg_files(state)
        assert {k: after[k] for k in before} == before  # append-only
    # replay: same epoch id -> no-op
    assert not phash_index_batch(
        media.filter(F.col("doc_id") % 3 == 0), 2, state
    )
    # re-delivery: a later epoch re-shipping epoch-0 images -> all
    # dropped by the id guard, nothing appended
    n = read_phash_index(spark, state).count()
    assert not phash_index_batch(
        media.filter(F.col("doc_id") % 3 == 0), 3, state
    )
    got = read_phash_index(spark, state)
    assert got.count() == n
    expect = phash_index(media)
    assert sorted(
        (r.id, r.phash, r.band, r.chunk) for r in got.collect()
    ) == sorted((r.id, r.phash, r.band, r.chunk) for r in expect.collect())


def test_phash_sink_geometry_mismatch_raises(spark, sf_dir, tmp_path):
    """An epoch fingerprinted at a different (bits, bands) than the
    committed state raises instead of silently mixing incompatible
    chunk spaces."""
    from transporter_spark.streaming.media import phash_index_batch

    media = _media(spark, sf_dir).limit(20)
    state = str(tmp_path / "phash")
    assert phash_index_batch(media, 0, state, bits=32, bands=4)
    with pytest.raises(ValueError, match="phash_bands=4"):
        phash_index_batch(
            media.select(
                (F.col("doc_id") + 1000).alias("doc_id"), "content"
            ),
            1,
            state,
            bits=32,
            bands=8,
        )


def test_phash_sink_compaction_and_incremental_probe(spark, sf_dir, tmp_path):
    """compact_phash_index folds the log content-preservingly, and the
    incremental probe against the maintained index equals the full
    image_phash_pairs restricted to pairs touching a batch doc."""
    from transporter_spark.operators.multimodal import (
        image_phash_pairs,
        incremental_phash_pairs,
    )
    from transporter_spark.streaming.media import (
        compact_phash_index,
        phash_index_batch,
        read_phash_index,
    )
    from transporter_spark.streaming.state import SegmentStore

    media = _media(spark, sf_dir)
    state = str(tmp_path / "phash")
    for epoch in range(2):
        phash_index_batch(
            media.filter(F.col("doc_id") % 2 == epoch), epoch, state
        )
    assert compact_phash_index(spark, state)
    assert not compact_phash_index(spark, state)
    store = SegmentStore(state)
    assert all(
        len(store.table_segments(t)) == 1 for t in ("fps", "ph_ids")
    )

    batch = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.encode(
                F.expr("concat(upper(substr(text, 1, 8)), substr(text, 9))"),
                "utf-8",
            ).alias("content"),
        )
    )
    got = incremental_phash_pairs(batch, read_phash_index(spark, state))
    full = image_phash_pairs(
        media.unionByName(batch)
    ).filter((F.col("id_a") >= 1000000) | (F.col("id_b") >= 1000000))
    canon = lambda df: sorted(  # noqa: E731
        (r.id_a, r.id_b, r.hamming) for r in df.collect()
    )
    assert canon(got) == canon(full)
    assert got.count() > 0  # the edited copies really pair up

    # plan pin: the probe never reads a content/binary column (the
    # batch fingerprint is materialized before the join; the corpus
    # exists only as the maintained 16 B-scale banded rows) and the
    # candidate join is the (band, chunk) equi-join, never all-pairs
    sc = got.sparkSession.sparkContext
    plan = sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert not [
        l
        for l in plan.splitlines()
        if "ReadSchema" in l and "content" in l
    ], plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_video_sink_multi_epoch_equals_batch_and_probe_votes(
    spark, sf_dir, tmp_path
):
    """The video frame-index sink: a 3-epoch drain equals the batch
    banded build bit-for-bit (the per-frame hash is pure per-video);
    commits are append-only; replay and re-delivery are no-ops; the
    meta-validated probe equals the batch `video_phash_dedup`'s OWN
    vote over corpus ∪ batch restricted to batch-touching pairs; and
    a probe cannot run at a different geometry than the index."""
    from transporter_spark.operators.dedup import band_fingerprint
    from transporter_spark.operators.multimodal import (
        _frame_votes_to_edges,
        _phash_pairs_from_fp,
        video_frame_phash,
    )
    from transporter_spark.streaming.media import (
        compact_video_index,
        probe_video_index,
        read_video_index,
        video_index_batch,
    )
    from transporter_spark.streaming.state import SegmentStore

    media = _media(spark, sf_dir)
    state = str(tmp_path / "video")
    for epoch in range(3):
        before = _seg_files(state) if epoch else {}
        assert video_index_batch(
            media.filter(F.col("doc_id") % 3 == epoch), epoch, state
        )
        after = _seg_files(state)
        assert {k: after[k] for k in before} == before  # append-only
    assert not video_index_batch(  # replay
        media.filter(F.col("doc_id") % 3 == 0), 2, state
    )
    n = read_video_index(spark, state).count()
    assert not video_index_batch(  # re-delivery
        media.filter(F.col("doc_id") % 3 == 0), 3, state
    )
    got = read_video_index(spark, state)
    assert got.count() == n
    fp_all = video_frame_phash(media, "content", "doc_id")
    expect = band_fingerprint(
        fp_all.select(F.col("fid").alias("id"), "phash"), "phash", 32, 4
    )
    assert sorted(
        (r.id, r.phash, r.band, r.chunk) for r in got.collect()
    ) == sorted((r.id, r.phash, r.band, r.chunk) for r in expect.collect())

    assert compact_video_index(spark, state)
    assert not compact_video_index(spark, state)
    store = SegmentStore(state)
    assert all(
        len(store.table_segments(t)) == 1 for t in ("vfps", "v_ids")
    )

    # probe == the shared vote over corpus ∪ batch, batch-touching only
    batch = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 6 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.encode(
                F.expr(
                    "concat(substr(text, 1, cast((2 * length(text)) div 5 as int)), "
                    "repeat('Z', cast((3 * length(text)) div 5 as int) "
                    "- cast((2 * length(text)) div 5 as int)), "
                    "substr(text, cast((3 * length(text)) div 5 as int) + 1))"
                ),
                "utf-8",
            ).alias("content"),
        )
    )
    got_edges = probe_video_index(spark, state, batch)
    fp_union = video_frame_phash(
        media.unionByName(batch), "content", "doc_id"
    )
    pairs = _phash_pairs_from_fp(
        fp_union.select(F.col("fid").alias("id"), "phash"), 32, 1, 4
    ).filter((F.col("id_a") >= 64000000) | (F.col("id_b") >= 64000000))
    nf = fp_union.groupBy("vid").agg(
        F.count("*").cast("long").alias("nfr")
    )
    want_edges = _frame_votes_to_edges(pairs, nf, 3, 4, True, 64)
    canon = lambda df: sorted(  # noqa: E731
        (r.id_a, r.id_b) for r in df.collect()
    )
    assert canon(got_edges) == canon(want_edges)
    assert got_edges.count() > 0

    # geometry discipline: a mismatched epoch raises; the probe reads
    # its constants from meta so it CANNOT mismatch silently
    with pytest.raises(ValueError, match="video_n_frames=8"):
        video_index_batch(
            media.select(
                (F.col("doc_id") + 5000000).alias("doc_id"), "content"
            ).limit(5),
            99,
            state,
            n_frames=4,
        )


# ---------------------------------------------------------------------------
# audio window-fingerprint family
# ---------------------------------------------------------------------------


def test_audio_fp_invariant_to_constant_byte_shift(spark):
    """The delta-coding property the family exists for: +1 on every
    byte changes no comparison, so fingerprints are bit-identical."""
    from transporter_spark.operators.multimodal import audio_window_fp

    base = bytes(range(40, 120))
    shifted = bytes(b + 1 for b in base)
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(shifted))],
        "doc_id long, content binary",
    )
    fp = audio_window_fp(df).collect()
    a = sorted((r.wno, r.fp) for r in fp if r.vid == 1)
    b = sorted((r.wno, r.fp) for r in fp if r.vid == 2)
    assert a == b and len(a) == 7


def test_audio_dedup_merges_shift_and_scramble_classes(spark):
    from transporter_spark.operators.dedup import release_cached
    from transporter_spark.operators.multimodal import (
        audio_fingerprint_dedup,
    )

    base = bytes((i * 7 + 13) % 256 for i in range(96))
    shifted = bytes((b + 1) % 256 for b in base)
    scrambled = base[:38] + bytes([0] * 20) + base[58:]
    unrelated = bytes((i * 31 + 5) % 251 for i in range(96))
    df = spark.createDataFrame(
        [
            (1, bytearray(base)),
            (2, bytearray(shifted)),
            (3, bytearray(scrambled)),
            (4, bytearray(unrelated)),
        ],
        "doc_id long, content binary",
    )
    out = audio_fingerprint_dedup(df)
    rows = {r.id: r for r in out.collect()}
    release_cached(out)
    assert rows[1].component == rows[2].component == rows[3].component
    assert rows[4].component != rows[1].component
    # one canonical per cluster, byte_len populated
    assert sum(rows[i].is_canonical for i in (1, 2, 3)) == 1
    assert rows[4].is_canonical


def test_audio_sink_maintained_equals_batch_and_probe(spark, sf_dir, tmp_path):
    """Multi-epoch drained index == batch band_fingerprint build, and
    the meta-validated probe returns the same voted edges as the
    batch-side incremental call."""
    import pyspark.sql.functions as F

    from transporter_spark.operators.dedup import band_fingerprint
    from transporter_spark.operators.multimodal import (
        audio_window_fp,
        incremental_audio_pairs,
    )
    from transporter_spark.sources.files import read_table
    from transporter_spark.streaming.media import (
        audio_index_batch,
        probe_audio_index,
        read_audio_index,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    state = str(tmp_path / "astate")
    audio_index_batch(docs.filter("doc_id % 2 = 0"), 0, state)
    audio_index_batch(docs.filter("doc_id % 2 = 1"), 1, state)
    got = {
        tuple(r)
        for r in read_audio_index(spark, state)
        .select("id", "phash", "band", "chunk")
        .collect()
    }
    fp = audio_window_fp(docs)
    want = {
        tuple(r)
        for r in band_fingerprint(
            fp.select(F.col("wid").alias("id"), F.col("fp").alias("phash")),
            "phash",
            32,
            2,
        )
        .select("id", "phash", "band", "chunk")
        .collect()
    }
    assert got == want

    batch = docs.filter("doc_id % 7 = 0").select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "content"
    )
    via_probe = {
        tuple(r)
        for r in probe_audio_index(spark, state, batch).collect()
    }
    via_batch = {
        tuple(r)
        for r in incremental_audio_pairs(
            batch, read_audio_index(spark, state)
        ).collect()
    }
    assert via_probe == via_batch and via_probe


def test_audio_probe_geometry_mismatch_raises(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from transporter_spark.streaming.media import (
        audio_index_batch,
        probe_audio_index,
        video_index_batch,
    )

    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(64))))], "doc_id long, content binary"
    )
    vstate = str(tmp_path / "vstate")
    video_index_batch(df, 0, vstate)
    with pytest.raises(ValueError, match="not an audio window index"):
        probe_audio_index(spark, vstate, df)
    astate = str(tmp_path / "astate")
    audio_index_batch(df, 0, astate, n_windows=8)
    with pytest.raises(ValueError, match="mismatch|refusing"):
        audio_index_batch(df.select((F.col("doc_id") + 1).alias("doc_id"),
                                    "content"), 1, astate, n_windows=4)


def test_audio_dedup_short_blob_reports_true_byte_len(spark):
    """r11 review: a blob shorter than n_windows bytes has no adjacent
    non-empty window pair and so no fingerprint rows — byte_len must
    still be the true octet length (the oracle reads octet_length),
    and the row stays a singleton."""
    from transporter_spark.operators.dedup import release_cached
    from transporter_spark.operators.multimodal import (
        audio_fingerprint_dedup,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(bytes(range(64))))],
        "doc_id long, content binary",
    )
    out = audio_fingerprint_dedup(df)
    rows = {r.id: r for r in out.collect()}
    release_cached(out)
    assert rows[1].byte_len == 3 and rows[1].is_canonical
    assert rows[2].byte_len == 64


# ---------------------------------------------------------------------------
# r12 guards (ADVICE r11)
# ---------------------------------------------------------------------------


def test_nfr_from_banded_overlapping_entity_raises(spark):
    """An entity with banded rows in BOTH the probe batch and the
    persisted index doubles its vote denominator; the doubled count is
    still a multiple of bands, so only the source-tag tripwire can see
    it — it must raise, not silently suppress edges."""
    from transporter_spark.operators.multimodal import _nfr_from_banded

    new = spark.createDataFrame([(0,), (0,)], "id long")
    idx = spark.createDataFrame([(64,), (64,)], "id long")
    got = {
        r.vid: r.nfr
        for r in _nfr_from_banded(new, idx, 64, 2, "t").collect()
    }
    assert got == {0: 1, 1: 1}

    overlap = spark.createDataFrame([(0,), (0,)], "id long")
    with pytest.raises(Exception, match="BOTH the probe batch"):
        _nfr_from_banded(new, overlap, 64, 2, "t").collect()


def test_audio_corpus_non_ascii_raises(spark):
    """The byte-shift copy class is engine-exact only on ASCII (Spark
    char wraps mod 256, DuckDB chr is full-code-point): a code point
    > 126 in a shifted doc must fail loud, not hash-diverge."""
    from transporter_spark.queries import _audio_corpus

    ok = spark.createDataFrame([(7, "abc")], "doc_id long, text string")
    rows = {r.doc_id: r.text for r in _audio_corpus(ok).collect()}
    assert rows[1000007] == "bcd"

    bad = spark.createDataFrame([(14, "café")], "doc_id long, text string")
    with pytest.raises(Exception, match="code point"):
        _audio_corpus(bad).collect()
