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
# entries. Rotation rule (adopted round 4, VERDICT r3 item 3): new
# queries and any query whose implementation or oracle changed since
# its last green CORRECTNESS row take slots first; remaining slots go
# to the STALEST greens. Round 7: 12 new + 23 changed + 15 spilled-r3
# (the cohort VERDICT r6 item 1 mandates) = 50 exactly — no stale
# slots left this round; the r4 remainder (incl. dedup_exact, whose
# cleared perf flag is adjudicated through BENCH_FLOORS.md, and the
# ann_cosine_topk bench control — both green r4 rows on unchanged
# code) heads the r8 queue below. "Changed" granularity is per
# FUNCTION executed, not per file: stream_kmeans_update drains through
# the untouched run_foreach_batch_available_now and its merge-batch
# fn, so it stays on its r5 green (stream_ann_index/stream_cdc_apply
# would qualify for the same demotion but are r4-stale anyway).
# "Changed" is read strictly: besides the 5 directly-edited queries
# (bm25_select formula+oracle; decontaminate restructured around the
# bloom path; incremental_dedup_exact gained the bloom split;
# bloom_member/stream_bloom gained join_strategy), round 7 replaced
# every drain/loop's conf set/restore with the shared
# session.scoped_shuffle_partitions manager and added the span-state
# family check — behavior-identical by design, but every stream_*
# query and the connected-components family executes through it, so
# all of them re-grade. Everything outside the 50 is green on
# unchanged code: the r4 remainder (listed past the window, next-up
# for r8) and the r5/r6 cohorts (yielded by the registry fallback).
_PRIORITY = [
    # --- NEW round 7: must take a slot ---
    "decontaminate_bloom",      # Bloom probe-then-verify decontamination
    "incremental_dedup_exact_bloom",  # fp-sketch prefilter, oracle'd split
    "bm25_select_log2",         # Okapi-faithful integer log2 idf
    "semdedup_prune",           # embedding-cluster near-dedup (SemDeDup)
    "stream_semdedup",          # continuous semantic dedup loop
    "repeated_span_prune_w50",  # span family at the Lee-et-al W=50 point
    "bloom_member_grouped",     # per-group blocklists, non-broadcast probe
    "pq_encode_codes",          # product-quantization encode (Jégou et al.)
    "pq_ann_topk",              # ADC search over codes (scan 1% the bytes)
    "ivfpq_ann_topk",           # the composed IVF-PQ production layout
    "ivfpq_residual_topk",      # residual encoding (faithful IndexIVFPQ)
    "stream_ivfpq_index",       # continuous residual-code index sink
    # --- changed round 7: direct edits ---
    "bm25_select",              # avgdl-factored scoring, degrade ladder
    "decontaminate",            # shared-gram restructure (exact path)
    "incremental_dedup_exact",  # bloom_words split added
    "bloom_member",             # bloom_contains join_strategy param
    "stream_bloom",             # same probe path
    # --- changed round 7: scoped-conf manager + span family check ---
    "stream_ingest_dedup",
    "stream_curation",
    "stream_curation_full",
    "stream_hll_distinct",
    "stream_dd_quantiles",
    "stream_span_index",
    "stream_span_prune",
    "stream_dedup",
    "stream_stateful_count",
    "stream_stream_join",
    "stream_windowed_agg",
    "stream_static_join",
    "stream_ann_index",
    "stream_cdc_apply",
    "dedup_clusters",
    "dedup_clusters_exact",
    "dedup_clusters_portable",
    "dedup_keep_longest",
    # --- the 15 r3 greens VERDICT r6 mandates (spilled from r6) ---
    "map_funcs",
    "regexp_funcs",
    "except_all",
    "unpivot_long",
    "running_total",
    "range_frame_window",
    "pretty_passthrough",
    "value_histogram",
    "deterministic_shuffle",
    "domain_cap",
    "bpe_token_stats",
    "profile_columns",
    "rarity_score",
    "chunk_documents",
    "pack_sequences",
    # --- past the graded window from here down: the r4 remainder,
    # --- next-up for round 8 (r5/r6 cohorts follow via the registry)
    "stream_kmeans_update",
    "dedup_exact",
    "ann_cosine_topk",
    "cdc_lww_dedup",
    "conditional_agg",
    "date_funcs",
    "distinct_agg",
    "embedding_dup_pairs",
    "envelope",
    "full_outer_join",
    "grouping_sets",
    "incremental_simhash",
    "join_region_rollup",
    "minhash_lsh_portable",
    "multimodal_meta",
    "ngram_jaccard_pairs",
    "ns_filter",
    "omit",
    "opfilter",
    "pick",
    "py_transform",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "remap",
    "rename",
    "repeated_chunk_prune",
    "salted_agg",
    "scalar_funcs",
    "session_window",
    "set_ops",
    "simhash_pairs",
    "skip_eq",
    "skip_gt",
    "skip_numeric_string",
    "skip_regex",
    "sort_limit",
    "stats_agg",
    "text_stats",
    "window_topn",
    "windowed_agg",
    "word_count",
]


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
