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
# to the STALEST greens. Round 10 (VERDICT r9 item 2): 9 new + 20
# changed + the 16 mandated r4 spills + 5 stalest-r5 = 50
# (stream_video_index, pack_with_boundaries, simhash_pairs_capped,
# and the pretraining_pipeline composition — whose shared
# _curated_docs front also re-grades training_pipeline — were added
# late in the round and displaced q2_min_cost_supplier,
# scalar_subquery, having_clause, anti_join_not_in, and
# exists_subquery; all five rejoin the r5 remainder at the head of
# the r11 queue).
# "Changed" is read strictly, per FUNCTION executed:
# - the r10 guard/param additions to the banded-candidate core
#   (banded_hamming_pairs / incremental_banded_hamming_pairs gained
#   max_bucket; _cap_buckets generalized over its key columns;
#   band_index gained the ragged-banding raise; simhash_index /
#   simhash_pairs validate geometry up front) re-grade EVERY query
#   executing those fns: simhash_pairs, incremental_simhash,
#   image_phash_dedup, multimodal_pipeline, stream_phash_index,
#   minhash_lsh_pairs, minhash_lsh_portable, dedup_recall_audit
#   (also the _straddling_corpus factor-out), incremental_dedup,
#   dedup_clusters, dedup_clusters_portable, and the ingest-drain
#   family that builds band indexes per epoch (stream_ingest_dedup,
#   stream_curation, stream_curation_full, stream_decontaminate —
#   the last also via decontaminate's new bare-table geometry raise,
#   which re-grades decontaminate and decontaminate_bloom too);
# - bpe_apply_merges re-grades via the _bpe_merge_cascade factor-out;
# - domain_upsample via upsample_to_mix's reserved-'copy' guard.
# NOT re-graded on oracle grounds: the _minhash_portable_ctes
# (num_hashes, bands) parameterization and _dedup_recall_audit_oracle
# factor emit byte-identical strings at the old operating points
# (pinned, tests/test_oracle_builders.py); ngram_jaccard_pairs'
# jaccard_pairs body is untouched. incremental_dedup_exact[_bloom]
# stay unchanged (fingerprint path, no banding). fuzzy/symspell,
# span, sketch, vector-sink families untouched this round.
# The stale half: the 16 r4 spills documented last round take their
# mandated slots; the r5 cohort (43 queries) heads the remaining
# queue in registry order — 10 fit (media_features .. 
# q2_min_cost_supplier); the REST of the r5 cohort
# (q21_waiting_suppliers, pivot_table, extended_json_normalize,
# dedup_normalized, asof_join x3, range_join_recent_count,
# window_analytics, percentiles, collect_agg, stratified_sample,
# q19_disjunctive, sliding_window_agg, gopher_quality_gate,
# domain_mix_weights, domain_mix_sample, semantic_decontaminate,
# curation_pipeline, temperature_mix_weights, balanced_shards,
# dsir_select, kmeans_update, dataset_split, containment_pairs,
# lm_perplexity_gate, the hll/cms/dd sketch rows, sketch_profile)
# spills to r11 and heads its queue; r6/r8/r9 cohorts follow via the
# registry fallback, all green on unchanged code.
_PRIORITY = [
    # --- NEW round 10: must take a slot ---
    "ivfpq_refine_topk",        # tuned two-stage ANN operating point
    "ann_recall_tuned",         # recall@5 = 0.90 vs brute force
    "dedup_recall_tuned",       # LSH r=2 point, recall 0.994
    "tokenize_pack_pipeline",   # ids -> fixed-length training rows
    "pack_with_boundaries",     # + attention-mask segment offsets
    "pretraining_pipeline",     # curate -> learn -> ids -> pack
    "video_phash_dedup",        # frame-vote video near-dedup
    "stream_video_index",       # continuous frame index + incr. probe
    "simhash_pairs_capped",     # the hot-bucket guard, graded e2e
    # --- changed since their last green row (see header) ---
    "decontaminate",
    "decontaminate_bloom",
    "stream_decontaminate",
    "simhash_pairs",
    "incremental_simhash",
    "image_phash_dedup",
    "multimodal_pipeline",
    "stream_phash_index",
    "minhash_lsh_pairs",
    "minhash_lsh_portable",
    "dedup_recall_audit",
    "incremental_dedup",
    "stream_ingest_dedup",
    "stream_curation",
    "stream_curation_full",
    "dedup_clusters",
    "dedup_clusters_portable",
    "bpe_apply_merges",
    "domain_upsample",
    "training_pipeline",        # now runs through _curated_docs
    # --- the 16 r4 spills mandated by VERDICT r9 item 2 ---
    "rename",
    "repeated_chunk_prune",
    "salted_agg",
    "scalar_funcs",
    "session_window",
    "set_ops",
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
    # --- 5 stalest r5-cohort greens (registry queue order; five
    # --- slots went to the late additions, see header) ---
    "media_features",
    "json_functions",
    "cube_agg",
    "grouped_pandas_udaf",
    "python_udtf",
    # --- past the graded window: the r5 remainder heads the r11
    # --- queue (list in the header); r6/r8/r9 cohorts follow via
    # --- the registry fallback
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
