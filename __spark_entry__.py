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
# to the STALEST greens. Round 5: 25 new + 3 changed (incremental_dedup,
# stream_ingest_dedup, asof_join — its backward path was touched by the
# direction refactor) + 22 stalest greens = 50. The list below carries
# 59 names so intent is explicit: the LAST NINE (repetition_stats,
# array_funcs, frame_sample — the three least-stale of the r1/r2
# backfill — then incremental_dedup_exact, dedup_clusters,
# ann_ivf_topk, stream_dedup, stream_stream_join, rollup_lattice_daily,
# all r3 greens) sit past the graded window — they, like
# q1_pricing_summary,
# q5_local_supplier, minhash_lsh_pairs, stream_windowed_agg,
# training_pipeline, stream_stateful_count, js_transform, are rotated
# OUT this round, all unchanged since their r3 green rows.
# Everything outside the 50 is green on unchanged code (r3/r4 rows).
_PRIORITY = [
    # --- NEW round 5: must take a slot ---
    "gopher_quality_gate",     # rule-based quality gate (Gopher A1.1)
    "domain_mix_weights",      # domain-mix rebalancing weights
    "domain_mix_sample",       # portable-hash downsample to target mix
    "semantic_decontaminate",  # embedding-space eval-leakage gate
    "curation_pipeline",       # gate -> dedup -> mix-sample composed
    "stream_curation",         # the same gate inside the ingest sink
    "asof_join_forward",       # merge_asof direction='forward'
    "asof_join_nearest",       # merge_asof direction='nearest'
    "fuzzy_name_pairs",        # SymSpell edit-distance join
    "temperature_mix_weights", # share^alpha mix smoothing
    "balanced_shards",         # token-balanced snake sharding
    "dsir_select",             # hashed-ngram importance resampling
    "kmeans_update",           # Lloyd centroid-update partials
    "dataset_split",           # insertion-stable train/val/test split
    "containment_pairs",       # asymmetric n-gram overlap (quotes)
    "stream_kmeans_update",    # continuous centroid-partial sink
    "lm_perplexity_gate",      # CCNet bigram-LM head/middle/tail gate
    "hll_distinct",            # HyperLogLog register sketch, engine-exact
    "hll_merge_shards",        # shard sketches merged == whole (oracle-proved)
    "stream_hll_distinct",     # continuous register max-merge sink
    "cms_topk_users",          # Count-Min heavy hitters, engine-exact
    "ddsketch_quantiles",      # log-binned mergeable quantile sketch
    "dd_quantile_gate",        # sketch-thresholded per-lang length gate
    "sketch_profile",          # one-pass HLL+quantile table profile
    "stream_dd_quantiles",     # continuous quantile sink (bin SUM-merge)
    # --- changed round 5 ---
    "incremental_dedup",       # fast hash family + session-cached index
    "stream_ingest_dedup",     # ingest_dedup_batch gained pre_filter:
                               # re-grade its no-filter path on current code
    "asof_join",               # backward path touched by the direction
                               # refactor — changed-since-green keeps a slot
    # --- stalest greens: last graded r1/r2, unchanged code ---
    "media_features",
    "q19_disjunctive",
    "cube_agg",
    "percentiles",
    "exists_subquery",
    "anti_join_not_in",
    "scalar_subquery",
    "q2_min_cost_supplier",
    "q21_waiting_suppliers",
    "window_analytics",
    "stream_static_join",
    "json_functions",
    "grouped_pandas_udaf",
    "python_udtf",
    "having_clause",
    "pivot_table",
    "extended_json_normalize",
    "dedup_normalized",
    "range_join_recent_count",
    "sliding_window_agg",
    "collect_agg",
    "stratified_sample",
    # --- past the graded window from here down (see header) ---
    "repetition_stats",
    "array_funcs",
    "frame_sample",
    "incremental_dedup_exact",
    "dedup_clusters",
    "ann_ivf_topk",
    "stream_dedup",
    "stream_stream_join",
    "rollup_lattice_daily",
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
