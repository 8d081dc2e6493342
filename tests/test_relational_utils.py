"""Skew utilities."""

import pyspark.sql.functions as F

from transporter_spark.operators.relational import broadcast_dim_join, salted_sum
from transporter_spark.sources.files import read_table


def test_salted_sum_matches_plain_groupby(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    salted = {
        (r.l_returnflag): (round(r.sum_l_quantity, 6), r.n)
        for r in salted_sum(li, ["l_returnflag"], "l_quantity").collect()
    }
    plain = {
        r.l_returnflag: (round(r.s, 6), r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    assert salted == plain


def test_broadcast_dim_join_plan(spark, sf_dir):
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    out = broadcast_dim_join(
        cust,
        [
            (nation, cust.c_nationkey == nation.n_nationkey),
            (region, nation.n_regionkey == region.r_regionkey),
        ],
    )
    assert out.count() == cust.count()


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """The scale path for `percentiles`: approx_percentile (t-digest,
    map-side mergeable — no whole-group shuffle) must stay within 5%
    of the exact interpolated percentile."""
    import pyspark.sql.functions as F

    orders = read_table(spark, sf_dir, "orders")
    rows = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.9)").alias("exact"),
        F.expr("approx_percentile(o_totalprice, 0.9, 1000)").alias("approx"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.05, r
