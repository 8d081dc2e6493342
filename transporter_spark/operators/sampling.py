"""Sampling / ordering operators for training-data pipelines:
per-group caps (domain capping) and deterministic distributed shuffle.

Both use portable md5-derived pseudo-randomness so results are
reproducible across engines, cluster sizes, and re-runs — the property
a training-data pipeline needs for dataset versioning (same policy as
queries.stratified_sample). The reference has no sampling at all
(SURVEY §2.6); these extend the §2.6 surface for the 100 TB
training-data use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_per_group(
    df: DataFrame,
    group: str,
    key: str,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``group`` (domain capping — the
    standard guard against a single crawl domain dominating a
    pretraining mix).

    Selection is deterministic: rows ranked by md5(key) within the
    group, first ``cap`` kept. One shuffle on group; rank + filter
    happen inside the sorted partition, so the output is identical
    regardless of input partitioning or cluster size.

    Skew note: a pathological group (one domain = half the corpus)
    bounds a partition. For that regime, pre-aggregate counts and
    sample by the md5 threshold trick instead (rank-free): keep rows
    with md5key below the group's cap/n quantile — same determinism,
    no per-group sort. The rank form is exact (hard cap), which is
    what dataset cards usually specify.
    """
    shufkey = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy(group).orderBy(shufkey.asc(), F.col(key).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .withColumnRenamed("_rk", "keep_rank")
    )


def deterministic_shuffle(
    df: DataFrame,
    key: str,
) -> DataFrame:
    """Reproducible global shuffle for training-example ordering,
    WITHOUT a global sort or a single-partition window.

    Each row gets (shard, pos): shard = first hex digit of md5(key)
    (16 shards), pos = rank of md5(key) within the shard. The
    training-time read order is pos-major, shard-minor — i.e.
    round-robin interleaving of the 16 shard streams — which is a
    fixed permutation of the corpus fully determined by the key set.

    Scale shape: ONE shuffle on shard; ranking is per-shard (parallel
    across 16 partitions; widen by taking 2 hex digits = 256 shards
    for bigger clusters). A naive ROW_NUMBER() OVER (ORDER BY random)
    funnels the whole corpus through one partition — this doesn't.
    """
    shufkey = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy("shard").orderBy("_shufkey", key)
    return (
        df.withColumn("_shufkey", shufkey)
        .withColumn("shard", F.substring("_shufkey", 1, 1))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_shufkey")
    )


def mix_weights(
    df: DataFrame,
    target: "dict[str, float]",
    by: str = "source",
    size_col: "str | None" = None,
) -> DataFrame:
    """Per-group mix statistics + the resampling weight that moves the
    corpus toward a target domain mix — the knob a pretraining pipeline
    turns when the crawl is 80% web but the recipe says 50%.

    Output, one row per ``by`` group: ``docs``, ``tokens`` (row count
    when ``size_col`` is None), ``token_share`` (actual fraction),
    ``target_share`` (0.0 for groups absent from ``target``), and
    ``weight`` = target_share / token_share — multiply each group's
    sampling rate by it; ``keep_rate`` = min(1, weight) is the direct
    downsampling probability (`sample_to_mix` applies it).

    Scale shape: one map-side-combined groupBy over the corpus to a
    #groups-row frame; the share window runs on that tiny aggregate,
    never on corpus rows.
    """
    size = F.lit(1).cast("long") if size_col is None else F.col(size_col).cast("long")
    agg = df.groupBy(by).agg(
        F.count("*").alias("docs"), F.sum(size).alias("tokens")
    )
    total = F.sum("tokens").over(Window.partitionBy()).cast("double")
    # explicit zero guards, not try_divide: ANSI mode (Spark 4 default)
    # makes x/0 an error, and a NULL weight through F.least would turn
    # keep_rate into 1.0 (least skips NULLs) — a token-less group must
    # end up dropped (keep_rate 0), never kept wholesale.
    share = F.when(total > 0, F.col("tokens").cast("double") / total)
    tgt = F.lit(0.0)
    for name, frac in sorted(target.items()):
        tgt = F.when(F.col(by) == name, F.lit(float(frac))).otherwise(tgt)
    weight = F.when(
        F.col("token_share") > 0, F.col("target_share") / F.col("token_share")
    )
    return (
        agg.withColumn("token_share", share)
        .withColumn("target_share", tgt)
        .withColumn("weight", weight)
        .withColumn(
            "keep_rate",
            F.when(
                F.col("weight").isNotNull(), F.least(F.lit(1.0), F.col("weight"))
            ).otherwise(F.lit(0.0)),
        )
    )


def sample_to_mix(
    df: DataFrame,
    weights: DataFrame,
    by: str = "source",
    key: str = "doc_id",
    resolution: int = 10_000,
) -> DataFrame:
    """Downsample toward the target mix: keep each row with its group's
    ``keep_rate``, decided by a PORTABLE content hash of ``key`` (md5
    prefix mod ``resolution``) — never rand(): membership is
    reproducible across engines, cluster sizes, and re-runs, so the
    sampled dataset is versionable and any row's inclusion auditable
    (same policy as `cap_per_group` / queries.stratified_sample).

    The weights frame is #groups rows — Spark broadcasts the join; the
    corpus side stays a pushdown-friendly scan + filter, no shuffle.
    """
    from transporter_spark.operators.dedup import stable_hash32

    rate_bps = (F.col("keep_rate") * resolution).cast("long")
    keys = weights.select(by, rate_bps.alias("_rate_bps"))
    return (
        df.join(F.broadcast(keys), [by])
        .filter(F.pmod(stable_hash32(F.col(key)), F.lit(resolution)) < F.col("_rate_bps"))
        .drop("_rate_bps")
    )
