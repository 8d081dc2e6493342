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


# --- Count-Min sketch ---


def test_cms_overestimates_never_under(spark, sf_dir):
    """The CMS guarantee: est >= true count for EVERY item (collisions
    only inflate), and est is within eps*N (e/w ~ 0.27% of 10k events)
    for all but a delta fraction — at this w, exact for most items."""
    from transporter_spark.operators.sketches import (
        DEFAULT_W,
        cms_estimate,
        cms_table,
    )

    ev = read_table(spark, sf_dir, "events")
    est = {
        r["user_id"]: r["est"]
        for r in cms_estimate(cms_table(ev, "user_id"), ev, "user_id").collect()
    }
    true = {
        r["user_id"]: r["c"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    n = sum(true.values())
    assert set(est) == set(true)
    assert all(est[k] >= t for k, t in true.items())
    import math

    eps_bound = math.e / DEFAULT_W * n
    within = sum(1 for k, t in true.items() if est[k] - t <= eps_bound)
    assert within / len(true) > 0.9


def test_cms_merge_is_exact_and_mass_preserving(spark, sf_dir):
    """merge(cms(A), cms(B)) == cms(A ++ B) cell-for-cell, and every
    row of the merged sketch sums to the total occurrence count."""
    from transporter_spark.operators.sketches import (
        DEFAULT_D,
        cms_merge,
        cms_table,
    )

    ev = read_table(spark, sf_dir, "events")
    whole = cms_table(ev, "user_id")
    merged = cms_merge(
        cms_table(ev.where(F.col("event_id") % 2 == 0), "user_id"),
        cms_table(ev.where(F.col("event_id") % 2 == 1), "user_id"),
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    n = ev.where(F.col("user_id").isNotNull()).count()
    rows = merged.groupBy("row_idx").agg(F.sum("cnt").alias("s")).collect()
    assert len(rows) == DEFAULT_D and all(r["s"] == n for r in rows)


def test_cms_plan_build_combines_and_estimate_broadcasts(spark, sf_dir):
    """Build: one exchange, partial_count before it (shuffle capped at
    d x w rows per mapper). Estimate: the sketch side is broadcast —
    no shuffle keyed on the sketch, no CartesianProduct."""
    import re

    from transporter_spark.operators.sketches import cms_estimate, cms_table

    def nodes(plan, name):
        return len(re.findall(rf"\(\d+\) {name}\b", plan))

    ev = read_table(spark, sf_dir, "events")
    sketch = cms_table(ev, "user_id")
    plan = explain_str(sketch)
    assert nodes(plan, "Exchange") == 1, plan
    assert "partial_count" in plan
    assert plan.index("partial_count") < plan.index("ENSURE_REQUIREMENTS")
    est_plan = explain_str(cms_estimate(sketch, ev, "user_id"))
    assert "BroadcastHashJoin" in est_plan, est_plan
    assert "CartesianProduct" not in est_plan


# --- log-binned quantile sketch ---


def test_dd_quantile_within_relative_error(spark, sf_dir):
    """est must be within the bin-width guarantee (<= 2^-sub_bits
    relative, ~3.2%) of the TRUE order statistic it targets —
    the ceil(q*n)-th smallest value per group."""
    import math

    from transporter_spark.operators.sketches import (
        DD_FRACS,
        dd_bins,
        dd_quantiles,
    )

    ev = read_table(spark, sf_dir, "events")
    est = {
        (r["event_type"], r["q"]): r["est"]
        for r in dd_quantiles(
            dd_bins(ev, "value", by=["event_type"]), by=["event_type"]
        ).collect()
    }
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    eps = 2 ** -5 + 0.002
    for g, xs in vals.items():
        xs.sort()
        for frac, label in DD_FRACS:
            t = -((-frac * len(xs)) // 100)  # ceil
            true = xs[t - 1]
            got = est[(g, label)]
            assert abs(got - true) / true <= eps, (g, label, got, true)


def test_dd_merge_exact_and_underflow_bin(spark):
    """merge(dd(A), dd(B)) == dd(A ++ B) bin-for-bin; zeros land in the
    (0, 0) underflow bin; negatives and NULLs are excluded."""
    from transporter_spark.operators.sketches import dd_bins, dd_merge

    rows = [(i, v) for i, v in enumerate(
        [0.0, 0.0, 0.25, 1.5, 3.0, 700.125, None, -2.0]
    )]
    df = spark.createDataFrame(rows, "id long, value double")
    whole = dd_bins(df, "value", by=[])
    merged = dd_merge(
        dd_bins(df.where(F.col("id") % 2 == 0), "value", by=[]),
        dd_bins(df.where(F.col("id") % 2 == 1), "value", by=[]),
        by=[],
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    got = {(r["bin_e"], r["bin_sub"]): r["cnt"] for r in whole.collect()}
    assert got.get((0, 0)) == 2          # the two zeros
    assert sum(got.values()) == 6        # NULL and negative excluded


def test_dd_build_plan_one_combined_shuffle(spark, sf_dir):
    """Bin build: ONE exchange with partial_count before it (the bin
    table, never values, crosses the wire); quantile walk adds window
    work on the tiny bin table plus the broadcast frac frame only —
    no shuffle keyed on corpus rows, no cartesian."""
    import re

    from transporter_spark.operators.sketches import dd_bins, dd_quantiles

    def nodes(plan, name):
        return len(re.findall(rf"\(\d+\) {name}\b", plan))

    ev = read_table(spark, sf_dir, "events")
    bins = dd_bins(ev, "value", by=["event_type"])
    plan = explain_str(bins)
    assert nodes(plan, "Exchange") == 1, plan
    assert "partial_count" in plan
    assert plan.index("partial_count") < plan.index("ENSURE_REQUIREMENTS")
    qplan = explain_str(dd_quantiles(bins, by=["event_type"]))
    assert "CartesianProduct" not in qplan
    assert "BroadcastNestedLoopJoin" in qplan  # the 5-row frac frame


def test_sketch_registry_factories_match_direct_calls(spark, sf_dir):
    """The pipeline-config faces (distinct_sketch / quantile_sketch /
    heavy_hitters) produce exactly what the direct operator calls do."""
    from transporter_spark.operators.sketches import (
        cms_estimate,
        cms_table,
        dd_bins,
        dd_quantiles,
        hll_register_table,
    )
    from transporter_spark.registry import build_operator

    ev = read_table(spark, sf_dir, "events")
    via = build_operator("distinct_sketch", item_col="user_id",
                         by=["event_type"])(ev)
    direct = hll_estimate(
        hll_register_table(ev, "user_id", ["event_type"]), ["event_type"]
    )
    assert sorted(map(tuple, via.collect())) == sorted(
        map(tuple, direct.collect())
    )
    via_q = build_operator("quantile_sketch", value_col="value",
                           by=["event_type"])(ev)
    direct_q = dd_quantiles(dd_bins(ev, "value", ["event_type"]),
                            ["event_type"])
    assert sorted(map(tuple, via_q.collect())) == sorted(
        map(tuple, direct_q.collect())
    )
    via_h = build_operator("heavy_hitters", item_col="user_id", k=5)(ev)
    direct_h = (
        cms_estimate(cms_table(ev, "user_id"), ev, "user_id")
        .orderBy(F.desc("est"), "user_id").limit(5)
    )
    assert [tuple(r) for r in via_h.collect()] == [
        tuple(r) for r in direct_h.collect()
    ]
    from transporter_spark.operators.sketches import bloom_words

    docs = read_table(spark, sf_dir, "documents")
    via_b = build_operator("membership_sketch", item_col="text")(docs)
    assert sorted(map(tuple, via_b.collect())) == sorted(
        map(tuple, bloom_words(docs, "text").collect())
    )


def test_dd_quantile_gate_tracks_exact_cut_and_plan(spark, sf_dir):
    """The sketch-thresholded gate keeps ~90% per language (within the
    bin-width tolerance of the exact percent_rank cut), and its plan
    has NO per-group sort or window over corpus rows — the property
    that separates it from length_quantile_gate at 100 TB. The corpus
    side joins the broadcast threshold frame."""
    from transporter_spark.queries import QUERIES

    df = QUERIES["dd_quantile_gate"].fn(spark, sf_dir)
    rows = df.collect()
    by_lang = {}
    for r in rows:
        k, tot = by_lang.get(r["lang"], (0, 0))
        by_lang[r["lang"]] = (k + (1 if r["keep"] else 0), tot + 1)
    for lang, (k, tot) in by_lang.items():
        assert 0.84 <= k / tot <= 0.96, (lang, k, tot)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    # the only Window/Sort allowed is inside the tiny bin-table branch;
    # the final orderBy is presentation. No window over corpus rows:
    assert "percent_rank" not in plan


def test_dd_domain_exclusions_match_oracle(spark):
    """NaN, negative, and over-ceiling (>= 2^(62-scale_bits)) values
    are excluded IDENTICALLY by the Spark build and the DuckDB oracle —
    the class of row that would otherwise crash the oracle (int64
    conversion) while Spark silently saturate-binned it."""
    import duckdb

    from transporter_spark.operators.sketches import dd_bins, dd_oracle_ctes

    rows = [
        (0, 1.0), (1, float("nan")), (2, -3.0), (3, 1e13), (4, 5e12),
        (5, 0.5), (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, value double")
    got = sorted(
        (r["bin_e"], r["bin_sub"], r["cnt"])
        for r in dd_bins(df, "value", by=[]).collect()
    )
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(
        rows, columns=["id", "value"]
    ))
    sql = ("WITH " + dd_oracle_ctes("value", "1", "t")
           + "\nSELECT bin_e, bin_sub, cnt FROM ddb ORDER BY 1, 2")
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want and len(got) == 2  # only 1.0 and 0.5 survive


def test_sketch_oracle_parity_at_non_default_params(spark, sf_dir):
    """The parametrized oracle builders must track the Spark side at
    EVERY parameter choice, not just the graded defaults — pin p=7 HLL,
    d=2/w=256 CMS, and scale_bits=12/sub_bits=3 quantile bins against
    in-process DuckDB on the same rows."""
    import duckdb

    from transporter_spark.operators.sketches import (
        cms_oracle_ctes,
        cms_table,
        dd_bins,
        dd_oracle_ctes,
        hll_oracle_ctes,
        hll_register_table,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    pdf = ev.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)

    reg = sorted(
        map(tuple, hll_register_table(ev, "user_id", ["event_type"], p=7)
            .collect())
    )
    want = sorted(map(tuple, con.execute(
        "WITH " + hll_oracle_ctes("user_id", "event_type", "events", p=7)
        + "\nSELECT grp, bucket, rho FROM reg"
    ).fetchall()))
    assert reg == want

    cms = sorted(map(tuple, cms_table(ev, "user_id", d=2, w=256).collect()))
    want = sorted(map(tuple, con.execute(
        "WITH " + cms_oracle_ctes("user_id", "events", d=2, w=256)
        + "\nSELECT row_idx, cell, cnt FROM cms"
    ).fetchall()))
    assert cms == want

    bins = sorted(map(tuple, dd_bins(
        ev, "value", ["event_type"], scale_bits=12, sub_bits=3
    ).collect()))
    want = sorted(map(tuple, con.execute(
        "WITH " + dd_oracle_ctes("value", "event_type", "events",
                                 scale_bits=12, sub_bits=3)
        + "\nSELECT grp, bin_e, bin_sub, cnt FROM ddb"
    ).fetchall()))
    assert bins == want


# --- Bloom membership sketch ---


def test_bloom_no_false_negatives_and_null_probe(spark, sf_dir):
    """The Bloom guarantee: every member (and every exact copy of one)
    probes true — no false negatives, ever. NULL items are skipped on
    build and non-members on probe."""
    from transporter_spark.operators.sketches import (
        bloom_contains,
        bloom_words,
    )

    docs = read_table(spark, sf_dir, "documents")
    members = docs.filter(F.col("source") == "src0")
    words = bloom_words(members, "text")
    verdicts = {
        r.doc_id: r.member
        for r in bloom_contains(words, docs, "text", ["doc_id"]).collect()
    }
    for r in members.select("doc_id").collect():
        assert verdicts[r.doc_id], f"false negative for member {r.doc_id}"
    # a NULL-text probe row is a non-member, not an error / missing row
    probe = docs.limit(3).withColumn("text", F.lit(None).cast("string"))
    out = bloom_contains(words, probe, "text", ["doc_id"]).collect()
    assert len(out) == 3 and all(r.member is False for r in out)
    # NULL members are skipped: word table unchanged
    with_null = members.unionByName(
        members.limit(1).withColumn("text", F.lit(None).cast("string"))
    )
    a = sorted(map(tuple, words.collect()))
    b = sorted(map(tuple, bloom_words(with_null, "text").collect()))
    assert a == b


def test_bloom_merge_exact_and_idempotent(spark, sf_dir):
    """merge(bloom(A), bloom(B)) == bloom(A ∪ B) word-for-word, and
    merging a sketch with itself is a no-op (bit-OR idempotence) — the
    algebra the continuous sink's re-delivery guarantee rests on."""
    from transporter_spark.operators.sketches import bloom_merge, bloom_words

    docs = read_table(spark, sf_dir, "documents")
    whole = sorted(map(tuple, bloom_words(docs, "text").collect()))
    a = bloom_words(docs.filter(F.col("doc_id") % 2 == 0), "text")
    b = bloom_words(docs.filter(F.col("doc_id") % 2 != 0), "text")
    assert sorted(map(tuple, bloom_merge(a, b).collect())) == whole
    aa = bloom_words(docs, "text")
    assert sorted(map(tuple, bloom_merge(aa, aa).collect())) == whole


def test_bloom_plan_build_combines_and_probe_broadcasts(spark, sf_dir):
    """Build = ONE map-side-combined groupBy (shuffle capped at m/32
    word rows per mapper); probe = broadcast join of the word table +
    one id regroup — corpus size never appears after the scans. Word
    count is bounded by m/32 regardless of member count."""
    import re

    from transporter_spark.operators.sketches import (
        DEFAULT_M_BITS,
        bloom_contains,
        bloom_words,
    )

    def nodes(plan, name):
        return len(re.findall(rf"\(\d+\) {name}\b", plan))

    docs = read_table(spark, sf_dir, "documents")
    words = bloom_words(docs, "text")
    plan = explain_str(words)
    assert nodes(plan, "Exchange") == 1, plan
    assert "partial_bit_or" in plan, "no map-side OR combine"
    assert plan.index("partial_bit_or") < plan.index("ENSURE_REQUIREMENTS")
    assert words.count() <= DEFAULT_M_BITS // 32
    probe = bloom_contains(words, docs, "text", ["doc_id"])
    pplan = explain_str(probe)
    assert "BroadcastHashJoin" in pplan, pplan
    assert "CartesianProduct" not in pplan and "SortMergeJoin" not in pplan


def test_bloom_contains_grouped_words_and_mismatch_error(spark, sf_dir):
    """The review-found contract hole: a GROUPED word table must be
    probed with the same `by` — each probe row tests against ITS
    group's sketch (members of src0 are members of the src0 bloom but
    not of src1's); passing a grouped table without `by` raises
    instead of silently breaking no-false-negatives."""
    import pytest

    from transporter_spark.operators.sketches import (
        bloom_contains,
        bloom_words,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    grouped = bloom_words(docs, "text", by=["source"])
    out = {
        r.doc_id: r.member
        for r in bloom_contains(
            grouped, docs, "text", ["doc_id", "source"], by=["source"]
        ).collect()
    }
    # every doc is a member of its OWN source's bloom
    assert all(out.values()) and len(out) == docs.count()
    # a doc's text probed against ANOTHER group's sketch is (almost
    # surely) a non-member — the per-group separation the id_cols
    # aggregate must preserve
    cross = docs.withColumn("source", F.lit("srcNOPE"))
    non = bloom_contains(
        grouped, cross, "text", ["doc_id", "source"], by=["source"]
    )
    assert non.where(F.col("member")).count() == 0
    with pytest.raises(ValueError, match="grouping columns"):
        bloom_contains(grouped, docs, "text", ["doc_id"])
    with pytest.raises(ValueError, match="must be included in id_cols"):
        bloom_contains(grouped, docs, "text", ["doc_id"], by=["source"])


def test_bloom_grouped_probe_join_strategy_regimes(spark, sf_dir):
    """Grouped word tables are m/32 rows PER GROUP — a high-cardinality
    `by` makes unconditional broadcast tens of GiB. Pinned regimes:
    `auto` keeps the GLOBAL path broadcast (geometry-capped 8 KiB) but
    plans the GROUPED probe WITHOUT a plan-time broadcast hint (AQE's
    runtime size estimate is the group-count estimate and may still
    promote small sketches); verdicts are identical across strategies
    (the high-cardinality probe passes on the non-broadcast plan)."""
    from transporter_spark.operators.sketches import (
        bloom_contains,
        bloom_words,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # high-cardinality grouping: one group per doc_id
    grouped = bloom_words(docs, "text", by=["doc_id"])
    probe = bloom_contains(
        grouped, docs, "text", ["doc_id"], by=["doc_id"]
    )
    # no plan-time broadcast hint on the grouped path (the optimized
    # logical plan carries the hint when F.broadcast was applied)
    logical = probe._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in logical, logical
    assert probe.where(~F.col("member")).count() == 0  # own-group member

    # explicit shuffle and (forced) broadcast agree verdict-for-verdict
    forced = bloom_contains(
        grouped, docs, "text", ["doc_id"], by=["doc_id"],
        join_strategy="broadcast",
    )
    assert sorted(map(tuple, probe.collect())) == sorted(
        map(tuple, forced.collect())
    )

    # the global path still broadcasts at plan time under auto
    words = bloom_words(docs, "text")
    glob = bloom_contains(words, docs, "text", ["doc_id"])
    glogical = glob._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" in glogical, glogical

    import pytest

    with pytest.raises(ValueError, match="join_strategy"):
        bloom_contains(words, docs, "text", ["doc_id"], join_strategy="x")
