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


EXPERIMENTS = {
    "minhash_shared_shingles": _minhash_shared_shingles,
    # fused loop, mid pin skipped at width 1
    "cc_nopin": _cc_pin_experiment(_cc_loop_variant(True, False)),
    # plain (unfused) loop at width 1, fused+pin otherwise
    "cc_unfuse_w1": _cc_pin_experiment(_cc_loop_variant(False, True)),
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
