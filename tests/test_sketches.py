"""HyperLogLog sketch (operators/sketches.py): estimate quality, the
merge property that makes shard/stream rollup exact, and the plan shape
that makes it the 100 TB COUNT DISTINCT path."""

from __future__ import annotations

import pyspark.sql.functions as F

from transporter_spark.operators.sketches import (
    DEFAULT_P,
    hll_estimate,
    hll_merge,
    hll_register_table,
)
from transporter_spark.sources.files import read_table
from tests.test_plans import explain_str


def test_estimate_within_error_bound_both_branches(spark, sf_dir):
    """~1.04/sqrt(m) standard error => 512 registers ~4.6%; assert 3
    sigma (14%) on both estimator branches: user_id (~150/group, linear
    counting) and event_id (~2000/group, raw harmonic-mean branch)."""
    ev = read_table(spark, sf_dir, "events")
    for item in ("user_id", "event_id"):
        est = {
            r["event_type"]: r["estimate"]
            for r in hll_estimate(
                hll_register_table(ev, item, by=["event_type"]),
                by=["event_type"],
            ).collect()
        }
        true = {
            r["event_type"]: r["d"]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct(item).alias("d"))
            .collect()
        }
        assert set(est) == set(true)
        for k, t in true.items():
            assert abs(est[k] - t) / t < 0.14, (item, k, est[k], t)


def test_merge_is_exact_at_register_level(spark, sf_dir):
    """merge(sketch(A), sketch(B)) == sketch(A u B) row-for-row — the
    algebra shard-parallel and streaming maintenance rely on."""
    ev = read_table(spark, sf_dir, "events")
    whole = hll_register_table(ev, "user_id", by=["event_type"])
    merged = hll_merge(
        hll_register_table(
            ev.where(F.col("event_id") % 2 == 0), "user_id", by=["event_type"]
        ),
        hll_register_table(
            ev.where(F.col("event_id") % 2 == 1), "user_id", by=["event_type"]
        ),
        by=["event_type"],
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_merge_idempotent_and_null_items_skipped(spark, sf_dir):
    """Re-merging the same sketch is a no-op (re-delivery safe), and
    NULL items never contribute a register (COUNT DISTINCT skips NULL)."""
    ev = read_table(spark, sf_dir, "events")
    sk = hll_register_table(ev, "user_id", by=["event_type"])
    assert sorted(map(tuple, sk.collect())) == sorted(
        map(tuple, hll_merge(sk, sk, by=["event_type"]).collect())
    )
    nulled = ev.withColumn(
        "user_id", F.when(F.col("event_id") % 2 == 0, F.col("user_id"))
    )
    only_odd = hll_register_table(
        ev.where(F.col("event_id") % 2 == 1), "user_id", by=["event_type"]
    )
    assert sorted(map(tuple, hll_register_table(
        nulled, "user_id", by=["event_type"]
    ).collect())) == sorted(map(tuple, only_odd.collect()))


def test_register_build_plan_is_one_combined_shuffle(spark, sf_dir):
    """The sketch build must be ONE groupBy with map-side MAX combine
    (partial HashAggregate before the exchange): the shuffle carries at
    most 2^p register rows per group per mapper — never item values.
    The estimate adds one more tiny exchange over the register table.
    No join, no window, no collect anywhere."""
    import re

    def nodes(plan, name):  # formatted mode prints tree + detail; count ids
        return len(re.findall(rf"\(\d+\) {name}\b", plan))

    ev = read_table(spark, sf_dir, "events")
    reg = hll_register_table(ev, "user_id", by=["event_type"])
    plan = explain_str(reg)
    assert nodes(plan, "Exchange") == 1, plan
    assert "partial_max" in plan, "no map-side MAX combine before the shuffle"
    assert plan.index("partial_max") < plan.index("ENSURE_REQUIREMENTS"), plan
    est_plan = explain_str(hll_estimate(reg, by=["event_type"]))
    assert nodes(est_plan, "Exchange") <= 2, est_plan
    for bad in ("Join", "CartesianProduct", "Window"):
        assert bad not in est_plan, bad
    # scan prunes to the grouped + hashed columns only
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "user_id" in read_schema and "event_type" in read_schema
    assert "props" not in read_schema and "value" not in read_schema


def test_sparse_register_count_bounded(spark, sf_dir):
    """Output rows per group <= min(2^p, distinct items) regardless of
    input size — the 'sketch' property itself."""
    ev = read_table(spark, sf_dir, "events")
    counts = (
        hll_register_table(ev, "user_id", by=["event_type"], p=DEFAULT_P)
        .groupBy("event_type")
        .count()
        .collect()
    )
    assert counts and all(r["count"] <= (1 << DEFAULT_P) for r in counts)
