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
# to the STALEST greens. Round 11 (VERDICT r10 item 2): 8 new + 5
# changed + the ENTIRE r5 remainder (37 queries last graded in r5 —
# computed as CORRECTNESS_r05 names absent from every r06-r10 file;
# includes the five r10-displaced: q2_min_cost_supplier,
# scalar_subquery, having_clause, anti_join_not_in, exists_subquery)
# = exactly 50; the late additions stream_unigram_vocab,
# unigram_tokenize_pack, and stream_pack_bins (9th-11th new) then
# displaced stratified_sample, collect_agg, and sliding_window_agg,
# which head the r12 queue.
# "Changed" is read strictly, per FUNCTION executed:
# - l2_normalize_rows gained the zero-norm per-row raise (ADVICE r10)
#   -> re-grades ivfpq_refine_topk and ann_recall_tuned (which
#   executes ivfpq_refine_topk's fn for its approx side);
# - incremental_video_pairs gained the banded-row-count % bands
#   tripwire (ADVICE r10) -> re-grades stream_video_index;
# - _curated_docs now delegates to operators/text.curate_docs (the
#   pretraining sink must share the one curation definition) ->
#   re-grades training_pipeline and pretraining_pipeline;
# - mongo_bulk_ops gained the extended_json flag (default-off branch)
#   — no graded query executes it (connector wire contracts are
#   pytest-pinned), payloads pinned in tests/test_connectors.py.
# NOT re-graded: video_phash_dedup's headline flag moved to the new
# video_phash_dedup_hd (registry metadata, not executed code); all
# oracle builders added this round are NEW (unigram/ffd/audio/hd/
# extended_json_render); no shared builder's emitted string changed
# (pinned, tests/test_oracle_builders.py).
# The r6/r8 cohorts are next-stalest after this window and head the
# r12 queue via the registry fallback.
_PRIORITY = [
    # --- NEW round 11: must take a slot ---
    "stream_pretraining",       # multi-epoch curate->encode->pack drain == batch
    "unigram_learn_vocab",      # Viterbi-EM unigram tokenizer trainer
    "unigram_encode_ids",       # unigram encode to token ids
    "stream_unigram_vocab",     # unigram trained on the maintained count state
    "unigram_tokenize_pack",    # unigram ids -> fixed 512-id training rows
    "stream_pack_bins",         # continuous FFD packing, open-bin state
    "pack_bins_ffd",            # boundary-respecting first-fit-decreasing packing
    "audio_fp_dedup",           # temporal-delta window-vote audio dedup
    "stream_audio_index",       # continuous audio index + incremental probe
    "video_phash_dedup_hd",     # realistic-entropy video corpus (new bench headline)
    "extended_json_render",     # mejson write-side render-out (string-exact)
    # --- changed since their last green row (see header) ---
    "ivfpq_refine_topk",
    "ann_recall_tuned",
    "stream_video_index",
    "training_pipeline",
    "pretraining_pipeline",
    # --- the full r5 remainder: stalest greens, r5-window order ---
    "gopher_quality_gate",
    "domain_mix_weights",
    "domain_mix_sample",
    "semantic_decontaminate",
    "curation_pipeline",
    "asof_join_forward",
    "asof_join_nearest",
    "temperature_mix_weights",
    "balanced_shards",
    "dsir_select",
    "kmeans_update",
    "dataset_split",
    "containment_pairs",
    "lm_perplexity_gate",
    "hll_distinct",
    "hll_merge_shards",
    "cms_topk_users",
    "ddsketch_quantiles",
    "dd_quantile_gate",
    "sketch_profile",
    "asof_join",
    "q19_disjunctive",
    "percentiles",
    "exists_subquery",
    "anti_join_not_in",
    "scalar_subquery",
    "q2_min_cost_supplier",
    "q21_waiting_suppliers",
    "window_analytics",
    "having_clause",
    "pivot_table",
    "extended_json_normalize",
    "dedup_normalized",
    "range_join_recent_count",
    # --- past the graded window: stratified_sample, collect_agg, and
    # --- sliding_window_agg (displaced r11) head the r12 queue; the
    # --- r6/r8/r9/r10 cohorts follow via the registry fallback.
    # r12 note: the OLDER drains' single-epoch asserts
    # (streaming/ingest.py drain_documents_dedup, streaming/spans.py)
    # still key on `last_epoch != 0`, which misreads a skipped-empty
    # leading batch as multi-epoch; the packing drain moved to an
    # n_applied meta counter in r11. Migrating the old drains
    # re-grades stream_ingest_dedup / stream_curation{,_full} /
    # stream_decontaminate / stream_span_prune — schedule those slots
    # together (benign today: the documents fixture is one non-empty
    # file).
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
