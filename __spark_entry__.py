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
# to the STALEST greens. Round 6: 11 new + 4 changed (the keyed-sink
# seg-key encoding fix touched stream_hll_distinct/stream_dd_quantiles;
# the ingest pre_filter-callable + partition-scoping change touched
# stream_ingest_dedup/stream_curation) + 35 stalest greens = 50. The
# stale cohort VERDICT r5 named has 50 members (3 r2 + 47 r3); the 35
# slots take the r2 trio first, then 32 of the r3 greens — the
# FIFTEEN spilled to round 7 (listed past the window below) are the
# simplest unchanged scalar/window/set ops plus five one-projection /
# row-local text ops: map_funcs, regexp_funcs, except_all,
# unpivot_long, running_total, range_frame_window, pretty_passthrough,
# value_histogram, deterministic_shuffle, domain_cap, bpe_token_stats,
# profile_columns, rarity_score, chunk_documents, pack_sequences.
# Everything outside the 50 is green on unchanged code (r3-r5 rows).
_PRIORITY = [
    # --- NEW round 6: must take a slot ---
    "repeated_span_prune",      # unaligned exact-substring dedup (Lee et al.)
    "span_df_histogram",        # the span family's standing df index
    "incremental_span_prune",   # batch prune vs the standing index (exact)
    "stream_span_index",        # continuous index sink (append + SUM-merge)
    "stream_span_prune",        # the full continuous loop (first text wins)
    "dedup_keep_longest",       # argmax-by-quality canonical selection
    "bloom_member",             # Bloom membership sketch, engine-exact
    "stream_bloom",             # continuous blocklist (idempotent OR-merge)
    "classifier_quality_gate",  # hashed linear (fasttext-shaped) gate
    "bm25_select",              # integer-exact Okapi BM25 top-k retrieval
    "stream_curation_full",     # gopher+LM+dd gate stack in the ingest sink
    # --- changed round 6 ---
    "stream_hll_distinct",      # seg-key netstring encoding (v2 format)
    "stream_dd_quantiles",      # seg-key netstring encoding (v2 format)
    "stream_ingest_dedup",      # pre_filter callable + partition scoping
    "stream_curation",          # same ingest path
    # --- stalest greens: last graded r2, unchanged code ---
    "array_funcs",
    "frame_sample",
    "repetition_stats",
    # --- stalest greens: last graded r3, unchanged code ---
    "ann_ivf_topk",
    "decontaminate",
    "dedup_clusters",
    "dedup_clusters_exact",
    "gapfill_hourly",
    "incremental_dedup_exact",
    "js_transform",
    "length_quantile_gate",
    "media_resize",
    "minhash_lsh_pairs",
    "pii_redact",
    "q11_important_stock",
    "q12_priority_lines",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_quantity",
    "q1_pricing_summary",
    "q20_promotion_suppliers",
    "q22_idle_customers",
    "q4_order_priority",
    "q5_local_supplier",
    "q9_product_profit",
    "rollup_lattice_daily",
    "scd2_history",
    "sessionize_events",
    "stream_dedup",
    "stream_stateful_count",
    "stream_stream_join",
    "stream_windowed_agg",
    "training_pipeline",
    "variant_json",
    # --- past the graded window from here down (spilled to r7) ---
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
