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
