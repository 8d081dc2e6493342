#!/usr/bin/env python3
"""Same-session isolated A/B for r16 optimization candidates.

Unlike scripts/ab_r15.py (which alternates .count() on two PREBUILT
DataFrames), experiments here REBUILD the query per timed run — the
bench's own unit of measurement — because the r16 candidates change
eager materialization (checkpoint/cache) structure, which a prebuilt
DataFrame would freeze out of the timing. Each experiment returns
(build_a, build_b) callables; a timed run = build + .count(). The two
variants' first builds are collected and compared row-for-row before
any timing.

Usage: python scripts/ab_r16.py <experiment> [pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transporter_spark.session import get_spark  # noqa: E402


def _minhash_shared_shingles(spark, sf_dir):
    """A: the r15 wiring — band_index streams its own tokenization
    (localCheckpointed signature pass re-tokenizes the corpus per run)
    and the verify step re-shingles candidate docs separately.
    B: the r16 wiring — one cached distinct shingle frame feeds both
    the signature aggregation and the verify joins."""
    from transporter_spark.operators.dedup import (
        _materialize,
        _verify_candidates,
        band_index,
        minhash_lsh_pairs,
    )
    from transporter_spark.sources.files import read_table

    def docs():
        return read_table(spark, sf_dir, "documents")

    def build_a():
        d = docs()
        banded = _materialize(
            band_index(d, "text", "doc_id", 3, 64, 16, 42, False, False)
        )
        a, b = banded.alias("a"), banded.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bsig") == F.col("b.bsig"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        cand = _materialize(cand)
        return _verify_candidates(cand, d, "text", "doc_id", 3, 0.1)

    def build_b():
        return minhash_lsh_pairs(
            docs(), "text", "doc_id", n=3, num_hashes=64, bands=16,
            threshold=0.1,
        )

    return build_a, build_b


def _cc_loop_variant(fuse: bool, pin_width1: bool):
    """A copy of dedup._cc_loop with (a) fusion optionally disabled at
    width 1 and (b) the intra-job mid repartition pin optionally
    skipped at width 1 — the VERDICT r15 item-1 candidates."""
    from transporter_spark.operators.dedup import _materialize

    def _cc_loop_v(sym, labels, max_iter, reliable_checkpoint):
        def _cut(df):
            if reliable_checkpoint:
                return _materialize(df, True)
            return df.localCheckpoint(eager=False)

        spark = labels.sparkSession
        width = int(spark.conf.get("spark.sql.shuffle.partitions"))

        def _one_round(cur):
            neighbor_min = (
                sym.join(cur, sym.id_b == cur.id)
                .groupBy("id_a")
                .agg(F.min("component").alias("nmin"))
            )
            return cur.join(
                neighbor_min, cur.id == neighbor_min.id_a, "left"
            ).select(
                cur.id,
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nmin"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("nmin"), F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )

        do_fuse = fuse or width > 1
        changed = 0
        rounds = 0
        while rounds < max_iter:
            stepped = _one_round(labels)
            rounds += 1
            if do_fuse and rounds < max_iter:
                mid = stepped.drop("_changed")
                if pin_width1 or width > 1:
                    mid = mid.repartition(width, F.col("id"))
                stepped = _one_round(mid)
                rounds += 1
            stepped = _cut(stepped)
            changed = stepped.filter(F.col("_changed")).count()
            labels = stepped.drop("_changed")
            if changed == 0:
                break
        if changed != 0:
            raise RuntimeError("did not converge")
        return labels

    return _cc_loop_v


def _cc_pin_experiment(variant_b):
    def make(spark, sf_dir):
        import transporter_spark.operators.dedup as dd
        from transporter_spark.sources.files import read_table

        shipped = dd._cc_loop

        def run_clusters():
            docs = read_table(spark, sf_dir, "documents")
            return dd.dedup_clusters(docs, threshold=0.1, use_lsh=True)

        def build_a():
            dd._cc_loop = shipped
            return run_clusters()

        def build_b():
            dd._cc_loop = variant_b
            return run_clusters()

        return build_a, build_b

    return make


def _cc_driver_path(query_name):
    """A: distributed CC loop forced (driver-path threshold 0).
    B: the r16 driver-local small-graph path (shipped threshold)."""
    def make(spark, sf_dir):
        import transporter_spark.operators.dedup as dd
        from transporter_spark.queries import QUERIES

        shipped = dd._CC_DRIVER_MAX_EDGE_ROWS

        def build_a():
            dd._CC_DRIVER_MAX_EDGE_ROWS = 0
            return QUERIES[query_name].fn(spark, sf_dir)

        def build_b():
            dd._CC_DRIVER_MAX_EDGE_ROWS = shipped
            return QUERIES[query_name].fn(spark, sf_dir)

        return build_a, build_b

    return make


def _ivfpq_small_frame_checkpoint(spark, sf_dir):
    """A: the r15 query — centroids/codebooks re-planned and re-run in
    every branch that references them (index encode + search LUTs +
    residuals; Spark plans no CSE across branches). B: both tiny
    frames (8 centroid rows, m x ksub = 512 codebook rows)
    localCheckpointed eagerly at build time, truncating the repeated
    subtrees to LogicalRDD leaves."""
    from transporter_spark.operators.dedup import _cached_eager
    from transporter_spark.operators.similarity import (
        ivfpq_refine_search,
        ivfpq_residual_index,
        l2_normalize_rows,
        pq_codebooks,
        pq_residual_frame,
    )
    from transporter_spark.sources.files import read_table

    def build(checkpoint_small):
        emb = read_table(spark, sf_dir, "embeddings")
        vn = _cached_eager(l2_normalize_rows(emb))
        centroids = vn.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
        if checkpoint_small:
            centroids = _cached_eager(centroids)
        seeds = pq_residual_frame(
            vn.filter(F.col("vec_id") < 64), centroids, round_dp=8
        )
        cbs = pq_codebooks(seeds, m=8, vec_col="rvec")
        if checkpoint_small:
            cbs = _cached_eager(cbs)
        indexed = ivfpq_residual_index(vn, centroids, cbs, m=8, round_dp=8)
        queries = vn.filter(F.col("vec_id") < 10)
        return ivfpq_refine_search(
            indexed, vn, queries, centroids, cbs,
            k=5, shortlist=100, nprobe=4, m=8, round_dp=8,
        ).orderBy("query_id", "rank")

    return (lambda: build(False)), (lambda: build(True))


def _incremental_shared_shingles(spark, sf_dir):
    """A: the r15 wiring — the batch's band table streams its own
    tokenization (re-run per rebuild) and verify re-shingles candidate
    docs (batch AND corpus) separately. B: the r16 wiring — one cached
    batch shingle frame feeds both the signature aggregation and the
    verify joins; corpus candidates keep the semi-join build. The
    session-cached corpus index is shared by both variants (the graded
    query's own discipline)."""
    from transporter_spark.operators.dedup import (
        _materialize,
        _verify_candidates,
        band_index,
        incremental_lsh_pairs,
    )
    from transporter_spark.sources.files import read_table

    docs = read_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    index = band_index(corpus).cache()
    index.count()

    def build_a():
        new_bands = _materialize(band_index(new))
        a, b = new_bands.alias("a"), index.alias("b")
        vs_corpus = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bsig") == F.col("b.bsig")),
            )
            .select(
                F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
        )
        na, nb = new_bands.alias("a"), new_bands.alias("b")
        vs_new = na.join(
            nb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        cand = _materialize(vs_corpus.unionByName(vs_new).distinct())
        new_sel = new.select("doc_id", "text")
        corpus_sel = corpus.select("doc_id", "text").join(
            new.select("doc_id"), ["doc_id"], "left_anti"
        )
        return _verify_candidates(
            cand, new_sel.unionByName(corpus_sel), "text", "doc_id", 3, 0.1
        )

    def build_b():
        return incremental_lsh_pairs(new, corpus, index=index, threshold=0.1)

    return build_a, build_b


def _cc_relabel(query_name):
    """Both variants take the r16 driver CC path; A relabels via the
    literal create_map projection, B via the broadcast mapping join."""
    def make(spark, sf_dir):
        import transporter_spark.operators.dedup as dd
        from transporter_spark.queries import QUERIES

        def build_a():
            dd._CC_LITERAL_MAP_MAX = 4096
            return QUERIES[query_name].fn(spark, sf_dir)

        def build_b():
            dd._CC_LITERAL_MAP_MAX = 0
            return QUERIES[query_name].fn(spark, sf_dir)

        return build_a, build_b

    return make


EXPERIMENTS = {
    "minhash_shared_shingles": _minhash_shared_shingles,
    # fused loop, mid pin skipped at width 1
    "cc_nopin": _cc_pin_experiment(_cc_loop_variant(True, False)),
    # plain (unfused) loop at width 1, fused+pin otherwise
    "cc_unfuse_w1": _cc_pin_experiment(_cc_loop_variant(False, True)),
    "cc_driver_semdedup": _cc_driver_path("semdedup_prune"),
    "cc_driver_clusters": _cc_driver_path("dedup_clusters"),
    "cc_driver_video": _cc_driver_path("video_phash_dedup_hd"),
    "cc_driver_image": _cc_driver_path("image_phash_dedup"),
    "cc_relabel_semdedup": _cc_relabel("semdedup_prune"),
    "cc_relabel_clusters": _cc_relabel("dedup_clusters"),
    "cc_relabel_video": _cc_relabel("video_phash_dedup_hd"),
    "cc_relabel_image": _cc_relabel("image_phash_dedup"),
    "ivfpq_small_ckpt": _ivfpq_small_frame_checkpoint,
    "incremental_shared_shingles": _incremental_shared_shingles,
}


def main() -> None:
    name = sys.argv[1]
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("transporter-spark-ab16")

    build_a, build_b = EXPERIMENTS[name](spark, sf_dir)

    rows_a = sorted(repr(tuple(r)) for r in build_a().collect())
    rows_b = sorted(repr(tuple(r)) for r in build_b().collect())
    print(f"results identical: {rows_a == rows_b} "
          f"(A rows={len(rows_a)}, B rows={len(rows_b)})", file=sys.stderr)
    if rows_a != rows_b:
        for x, y in zip(rows_a, rows_b):
            if x != y:
                print("A:", x, "\nB:", y, file=sys.stderr)
                break
        sys.exit(1)

    # one more warm build+count each, then alternate timed rebuilds
    build_a().count(); build_b().count()
    ta, tb = [], []
    for i in range(pairs):
        t0 = time.time(); build_a().count(); ta.append(time.time() - t0)
        t0 = time.time(); build_b().count(); tb.append(time.time() - t0)
        print(f"pair {i}: A={ta[-1]:.2f}s B={tb[-1]:.2f}s", file=sys.stderr)
    print(f"A(min)={min(ta):.2f}s  all={[round(t, 2) for t in ta]}")
    print(f"B(min)={min(tb):.2f}s  all={[round(t, 2) for t in tb]}")


if __name__ == "__main__":
    main()
