#!/usr/bin/env python3
"""Same-session isolated A/B for r15 optimization candidates.

Builds two DataFrame variants of one query inside ONE session, verifies
their collected results are identical (sorted canonical repr), then
alternates timed .count() runs A,B,A,B,... and reports per-variant mins.
Alternation inside one session controls for host phase drift — the
lesson of the r15 dims retraction.

Usage: python scripts/ab_r15.py <experiment> [pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transporter_spark.session import get_spark  # noqa: E402


def _ivfpq_pair(spark, sf_dir):
    from pyspark.sql import functions as F

    from transporter_spark.operators.dedup import _cached_eager
    from transporter_spark.operators.similarity import (
        ivfpq_refine_search,
        ivfpq_residual_index,
        l2_normalize_rows,
        pq_codebooks,
        pq_residual_frame,
    )
    from transporter_spark.sources.files import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    vn = _cached_eager(l2_normalize_rows(emb))
    centroids = vn.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    seeds = pq_residual_frame(
        vn.filter(F.col("vec_id") < 64), centroids, round_dp=8
    )
    cbs = pq_codebooks(seeds, m=8, vec_col="rvec")

    def build(encode_dims):
        indexed = ivfpq_residual_index(
            vn, centroids, cbs, m=8, round_dp=8, encode_dims=encode_dims
        )
        queries = vn.filter(F.col("vec_id") < 10)
        return ivfpq_refine_search(
            indexed, vn, queries, centroids, cbs,
            k=5, shortlist=100, nprobe=4, m=8, round_dp=8,
        ).orderBy("query_id", "rank")

    return build(None), build(64)


def _ivfpq_argmin_hof_pair(spark, sf_dir):
    """A: shipped encode (explode to n*m*ksub rows -> groupBy
    min(struct)). B: per-slice HOF argmin — the codebook's ksub
    entries ride ONE broadcast array per j, and the argmin is
    array_min(transform(entries, e -> struct(d2, code))).code — the
    same (d2 ASC, code ASC) selection with no candidate fan-out, no
    sort, no aggregation exchange."""
    from pyspark.sql import functions as F

    from transporter_spark.operators.dedup import _cached_eager
    from transporter_spark.operators.similarity import (
        _pq_slices,
        dot_expr,
        ivfpq_refine_search,
        ivfpq_residual_index,
        l2_normalize_rows,
        pq_codebooks,
        pq_residual_frame,
    )
    from transporter_spark.sources.files import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    vn = _cached_eager(l2_normalize_rows(emb))
    centroids = vn.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    seeds = pq_residual_frame(
        vn.filter(F.col("vec_id") < 64), centroids, round_dp=8
    )
    cbs = pq_codebooks(seeds, m=8, vec_col="rvec")

    def search(indexed):
        queries = vn.filter(F.col("vec_id") < 10)
        return ivfpq_refine_search(
            indexed, vn, queries, centroids, cbs,
            k=5, shortlist=100, nprobe=4, m=8, round_dp=8,
        ).orderBy("query_id", "rank")

    indexed_a = ivfpq_residual_index(vn, centroids, cbs, m=8, round_dp=8)

    np_ = spark.sparkContext.defaultParallelism
    cbarr = cbs.withColumn("_bb", dot_expr("cvec", "cvec")).groupBy("j").agg(
        F.array_sort(
            F.collect_list(F.struct("code", "cvec", "_bb"))
        ).alias("entries")
    )
    res = pq_residual_frame(vn, centroids, round_dp=8).repartition(np_)
    sliced = res.select(
        "vec_id",
        "cell",
        F.posexplode(F.expr(_pq_slices("rvec", 8))).alias("j", "svec"),
    ).withColumn("_aa", dot_expr("svec", "svec"))
    d2 = (
        "cast(cast(cast(round((_aa - 2 * aggregate(zip_with(svec, e.cvec, "
        "(x, y) -> x * y), 0D, (s, v) -> s + v)) + e._bb, 6) as string) "
        "as decimal(38,12)) * 1000000 as bigint)"
    )
    indexed_b = sliced.join(F.broadcast(cbarr), "j").select(
        "vec_id",
        "cell",
        "j",
        F.expr(
            f"array_min(transform(entries, e -> named_struct("
            f"'d2', {d2}, 'code', e.code))).code"
        ).alias("code"),
    )
    return search(indexed_a), search(indexed_b)


EXPERIMENTS = {
    "ivfpq_encode_unroll": _ivfpq_pair,
    "ivfpq_argmin_hof": _ivfpq_argmin_hof_pair,
}


def main() -> None:
    name = sys.argv[1]
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("transporter-spark-ab")

    df_a, df_b = EXPERIMENTS[name](spark, sf_dir)

    rows_a = sorted(repr(tuple(r)) for r in df_a.collect())
    rows_b = sorted(repr(tuple(r)) for r in df_b.collect())
    print(f"results identical: {rows_a == rows_b} "
          f"(A rows={len(rows_a)}, B rows={len(rows_b)})", file=sys.stderr)
    if rows_a != rows_b:
        for x, y in zip(rows_a, rows_b):
            if x != y:
                print("A:", x, "\nB:", y, file=sys.stderr)
                break
        sys.exit(1)

    # warm both once more, then alternate timed runs
    df_a.count(); df_b.count()
    ta, tb = [], []
    for i in range(pairs):
        t0 = time.time(); df_a.count(); ta.append(time.time() - t0)
        t0 = time.time(); df_b.count(); tb.append(time.time() - t0)
        print(f"pair {i}: A={ta[-1]:.2f}s B={tb[-1]:.2f}s", file=sys.stderr)
    print(f"A(min)={min(ta):.2f}s  all={[round(t,2) for t in ta]}")
    print(f"B(min)={min(tb):.2f}s  all={[round(t,2) for t in tb]}")


if __name__ == "__main__":
    main()
