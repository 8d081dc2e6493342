"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full graded inventory from
``transporter_spark.queries`` (one entry per SURVEY.md §2 operator /
capability, each with a DuckDB oracle unless non-SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from transporter_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


# Deliberate grading order: the driver grades exactly the first 50
# entries, so the front of this list carries (a) the 33 queries with no
# green CORRECTNESS row across rounds 1-2 — 30 never graded under the
# 50-slot cap plus the 3 round-2 hash-fails whose boundary casts are
# fixed this round — then (b) 17 re-confirmations of high-value greens.
# Everything after slot 50 was proven green in round 1 or 2 and is
# unchanged since.
# Rotation rule (adopted round 4, VERDICT r3 item 3): any query whose
# implementation or oracle changed since its last green CORRECTNESS row
# takes a slot in 1-50; remaining slots go to the STALEST greens (graded
# in r1/r2 but not since). Everything green in r3 on unchanged code
# keeps its certification and rotates out.
_PRIORITY = [
    # --- changed since last green: must re-grade on current code ---
    # round 4: append-only manifest commit + fps re-delivery guard +
    # single-epoch assert (streaming/ingest.py rewrite)
    "stream_ingest_dedup",
    # round 4: incremental_lsh_pairs verification now drops corpus rows
    # whose id re-appears in the batch (ADVICE r3)
    "incremental_dedup",
    # changed r3 (fingerprint-before-shuffle, commit cc2eed7) — green row
    # predates the change
    "dedup_exact",
    # commit path changed r3 (3506791) + round-4 LSM append-only rebuild
    "stream_cdc_apply",
    # NEW round 4: continuous IVF index maintenance (vector twin of the
    # ingest-dedup sink) — new queries must take a slot
    "stream_ann_index",
    # NEW round 4: chunk-granular cross-doc repeated-text removal (the
    # scalable exact-substring-dedup / boilerplate-pruning step)
    "repeated_chunk_prune",
    # NEW round 4: SimHash incremental form (batch vs persisted banded
    # fingerprint index — completes the incremental-dedup family)
    "incremental_simhash",
    # --- stalest greens: last graded r1/r2, unchanged code ---
    "pick",
    "omit",
    "rename",
    "skip_gt",
    "skip_numeric_string",
    "skip_eq",
    "skip_regex",
    "opfilter",
    "remap",
    "envelope",
    "ns_filter",
    "py_transform",
    "q3_shipping_priority",
    "join_region_rollup",
    "window_topn",
    "sort_limit",
    "set_ops",
    "distinct_agg",
    "scalar_funcs",
    "cdc_lww_dedup",
    "windowed_agg",
    "session_window",
    "q14_promo_revenue",
    "q18_large_orders",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "word_count",
    "salted_agg",
    "conditional_agg",
    "grouping_sets",
    "full_outer_join",
    "date_funcs",
    "stats_agg",
    "ngram_jaccard_pairs",
    "minhash_lsh_portable",
    "dedup_clusters_portable",
    "simhash_pairs",
    "embedding_dup_pairs",
    "ann_cosine_topk",
    "text_stats",
    "multimodal_meta",
]

# Next rotation batch (round 5+): the remaining r1/r2 greens not yet
# re-graded since — rotate into slots as space frees up: media_features,
# q19_disjunctive,
# cube_agg, percentiles, exists_subquery, anti_join_not_in, scalar_subquery,
# q2_min_cost_supplier, q21_waiting_suppliers, window_analytics,
# stream_static_join, json_functions, grouped_pandas_udaf, python_udtf,
# having_clause, pivot_table, extended_json_normalize, dedup_normalized,
# range_join_recent_count, sliding_window_agg, collect_agg,
# stratified_sample, repetition_stats, array_funcs, frame_sample.


def _ordered():
    seen = set(_PRIORITY)
    for name in _PRIORITY:
        if name in QUERIES:
            yield name, QUERIES[name]
    for name, query in QUERIES.items():
        if name not in seen:
            yield name, query


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: query.fn for name, query in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {name: query.oracle for name, query in _ordered() if query.oracle}
