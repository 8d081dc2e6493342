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


def upsample_to_mix(
    df: DataFrame,
    weights: DataFrame,
    by: str = "source",
    key: str = "doc_id",
    max_epochs: int = 4,
    resolution: int = 10_000,
) -> DataFrame:
    """REPEAT rows toward the target mix — the upsampling half of a
    data recipe (`sample_to_mix` only cuts): a group with resampling
    ``weight`` w emits floor(w) copies of every row plus one more with
    probability frac(w) quantized to floor(frac(w)*resolution)/
    resolution — expected copies == w exactly AT RESOLUTION
    GRANULARITY (up to ~1/resolution downward bias, the same
    quantization `sample_to_mix` applies), and the emitted token mix
    hits the target without quota bookkeeping. The
    fractional copy is decided by the SAME portable md5 threshold as
    the downsampler — never rand(): the replicated dataset is
    reproducible across engines/cluster sizes and any row's copy count
    auditable. Groups with w < 1 degenerate to exactly
    `sample_to_mix`'s keep decision (floor 0 + Bernoulli(w)), so one
    operator serves both directions of the recipe.

    ``max_epochs`` caps w — the standard guard against repeating a
    tiny high-weight domain into memorization territory (data recipes
    cap epochs per source); the cap is applied BEFORE the
    floor/fraction split so expectation stays exact at the cap.

    Output: the input columns plus ``copy`` (1..n per row) — the name
    is reserved: an input already carrying a ``copy`` column raises
    (the output would otherwise be ambiguous/duplicated). Scale
    shape: the weights side is #groups rows (broadcast join); the
    corpus side is one scan + a row-local sequence explode — no
    shuffle, output size ∝ sum of weights."""
    from transporter_spark.operators.dedup import stable_hash32

    if "copy" in df.columns:
        raise ValueError(
            "upsample_to_mix reserves the output column name 'copy'; "
            "rename the input's 'copy' column first"
        )

    wcap = F.least(
        F.lit(float(max_epochs)),
        F.coalesce(F.col("weight"), F.lit(0.0)),
    )
    keys = weights.select(
        by,
        F.floor(wcap).cast("long").alias("_base"),
        # FLOOR, not bare CAST: Spark's cast truncates but DuckDB's
        # rounds — floor() agrees on non-negatives (the sample_to_mix
        # oracle rule, applied on the Spark side too)
        F.floor((wcap - F.floor(wcap).cast("double")) * resolution)
        .cast("long")
        .alias("_frac_bps"),
    )
    n = F.col("_base") + F.when(
        F.pmod(stable_hash32(F.col(key)), F.lit(resolution))
        < F.col("_frac_bps"),
        F.lit(1).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    out_cols = df.columns
    return (
        df.join(F.broadcast(keys), [by])
        .withColumn("_n", n)
        .withColumn(
            "copy",
            F.explode(
                F.when(
                    F.col("_n") >= 1,
                    F.expr("sequence(1L, _n)"),
                ).otherwise(F.expr("cast(array() as array<bigint>)"))
            ),
        )
        .select(*out_cols, F.col("copy").cast("long").alias("copy"))
    )


def temperature_weights(
    df: DataFrame,
    alpha: float = 0.3,
    by: str = "source",
    size_col: "str | None" = None,
) -> DataFrame:
    """Temperature-scaled mix weights: target share of group i is
    share_i^alpha / sum_j share_j^alpha — the standard smoothing for
    multilingual / multi-domain pretraining mixes (alpha=1 keeps the
    natural mix, alpha=0 is uniform, alpha~0.3 boosts the tail without
    flattening the head; the exponent-sampling scheme popularized by
    multilingual NMT and mT5). Unlike `mix_weights` there is no
    hand-written target dict: the target is derived from the corpus
    itself, so the same alpha works as the corpus drifts.

    Output per group: docs, tokens, token_share, temp_share, weight
    (= temp_share / token_share) and keep_rate — same contract as
    `mix_weights`, so `sample_to_mix` applies unchanged.

    All derived doubles are rounded to 8dp: pow/division may differ by
    1 ulp across engines, and the window sums run in engine-chosen
    order; at 8dp both render identically. Scale shape: identical to
    `mix_weights` — one map-side-combined groupBy to a #groups-row
    frame; windows touch only that tiny aggregate.
    """
    size = F.lit(1).cast("long") if size_col is None else F.col(size_col).cast("long")
    agg = df.groupBy(by).agg(
        F.count("*").alias("docs"), F.sum(size).alias("tokens")
    )
    everything = Window.partitionBy()
    total = F.sum("tokens").over(everything).cast("double")
    share = F.when(total > 0, F.col("tokens").cast("double") / total)
    powed = F.when(
        F.col("token_share").isNotNull(), F.pow(F.col("token_share"), F.lit(alpha))
    )
    temp = F.col("_pow") / F.sum("_pow").over(everything)
    weight = F.when(
        F.col("token_share") > 0, F.col("temp_share") / F.col("token_share")
    )
    return (
        agg.withColumn("token_share", share)
        .withColumn("_pow", powed)
        .withColumn("temp_share", F.round(temp, 8))
        .withColumn("weight", F.round(weight, 8))
        .withColumn("token_share", F.round("token_share", 8))
        .withColumn(
            "keep_rate",
            F.when(
                F.col("weight").isNotNull(), F.least(F.lit(1.0), F.col("weight"))
            ).otherwise(F.lit(0.0)),
        )
        .drop("_pow")
    )


def global_rank(
    df: DataFrame,
    order_col: str,
    tie_col: str,
    ascending: bool = False,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact global 1-based rank over (order_col, tie_col) WITHOUT a
    single-partition window — the scalable zipWithIndex:

    1. `repartitionByRange` on the total order (range exchange),
    2. per-partition row counts -> cumulative offsets (a #partitions-
       row collect — bounded by cluster size, never by data),
    3. rank = partition offset + intra-partition row_number.

    The rank is fully determined by the total order, NOT by where the
    sampled range boundaries land, so the result is identical across
    cluster sizes and re-runs. A plain `row_number() OVER (ORDER BY
    ...)` funnels 100 TB through ONE task; this shape sorts each range
    partition independently — the same plan Spark uses for a global
    `orderBy`, plus one tiny counting job.

    Cache contract: the ranged frame is persisted (memory-and-disk)
    because the collected offsets describe THAT materialization's
    partition layout. If the cache is dropped and the exchange
    recomputed under a different layout, the numbering pass detects
    the count mismatch and FAILS the job — never silently mis-ranks.
    In long-lived sessions call `dedup.release_cached(result)` after
    the consuming action.
    """
    from pyspark import StorageLevel

    from transporter_spark.operators.dedup import _attach_cached

    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc(),
        F.col(tie_col).asc(),
    ]
    ranged = df.repartitionByRange(*order).sortWithinPartitions(*order)
    ranged.persist(StorageLevel.MEMORY_AND_DISK)
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    # Arrow-batched local numbering: each partition knows its global
    # base, batches arrive in the sorted partition order, a running
    # counter spans batches. A `row_number() OVER (PARTITION BY pid)`
    # window would be equivalent but re-exchanges the whole corpus on
    # pid (Catalyst can't see that range partitioning already clusters
    # it); mapInPandas keeps the second pass exchange-free.
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(ranged.schema.fields) + [StructField(rank_col, LongType())]
    )

    def _number(iterator):
        import numpy as np
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        expected = counts.get(pid, 0)
        seen = 0
        for pdf in iterator:
            n = len(pdf)
            pdf[rank_col] = np.arange(
                base + seen + 1, base + seen + n + 1, dtype="int64"
            )
            seen += n
            yield pdf
        if seen != expected:
            raise RuntimeError(
                f"global_rank: partition {pid} materialized {seen} rows "
                f"but the offsets were built from {expected} — the "
                "cached range layout was recomputed differently "
                "(cache evicted / executor lost). Re-run the rank."
            )

    return _attach_cached(ranged.mapInPandas(_number, out_schema), ranged)


def balanced_shards(
    df: DataFrame,
    size_col: str,
    key: str,
    n_shards: int,
) -> DataFrame:
    """Assign rows to ``n_shards`` output shards with near-equal total
    ``size_col`` per shard — the writer-side step that keeps training
    shards token-balanced so no data-loader rank starves (plain
    hash-sharding balances row COUNTS; long-document skew then leaves
    shards 2-3x apart in tokens).

    Boustrophedon (snake) assignment over the size-descending global
    rank: block k of ``n_shards`` consecutive ranks is dealt left-to-
    right, block k+1 right-to-left, so each shard gets one doc per
    block and alternating ends of the size ordering — the classic
    greedy-equivalent balancing for sorted items, deterministic and
    coordination-free once the rank exists (`global_rank` provides it
    without a single-partition sort).
    """
    ranked = global_rank(df, size_col, key, ascending=False)
    # integer `div`, not `/`: double division + truncation drifts past
    # 2^53 ranks, and the DuckDB-oracle semantics are integer `//`
    block = F.expr(f"(rank - 1) div {int(n_shards)}")
    pos = F.pmod(F.col("rank") - 1, F.lit(n_shards))
    shard = F.when(
        block % 2 == 0, pos
    ).otherwise(F.lit(n_shards - 1) - pos)
    from transporter_spark.operators.dedup import _attach_cached

    # re-attach global_rank's cache handle: withColumn returns a fresh
    # DataFrame object, and release_cached reads a Python attribute
    return _attach_cached(
        ranked.withColumn("shard", shard.cast("long")),
        *getattr(ranked, "_ts_cached", ()),
    )


def split_dataset(
    df: DataFrame,
    key: str,
    splits: "dict[str, float]",
    resolution: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test (or any named) split: each row's
    split is decided by its PORTABLE content hash (md5 prefix mod
    ``resolution``) against cumulative split boundaries — never
    rand(), so membership is stable across engines, cluster sizes,
    re-runs, and INSERTIONS: adding new rows never moves an existing
    row between splits (the property a versioned eval set needs —
    rand()-based splits silently leak eval rows into train on every
    regeneration).

    ``splits`` maps name -> fraction; fractions are converted to
    integer boundaries in ``resolution``-ths (floor, remainder goes to
    the LAST split in insertion order, so boundaries always cover the
    full hash range). Scale shape: a pure projection — no shuffle, no
    coordination; pushdown-friendly when filtered to one split.
    """
    from transporter_spark.operators.dedup import stable_hash32

    from decimal import Decimal

    names = list(splits)
    bounds, acc = [], 0
    for name in names[:-1]:
        # floor on the DECIMAL value, not the binary float: 0.57 is
        # 0.56999... in binary, so int(0.57 * 10000) silently lands at
        # 5699 — one bucket below the documented rational floor
        acc += int(Decimal(str(splits[name])) * resolution)
        bounds.append(acc)
    h = F.pmod(stable_hash32(F.col(key)), F.lit(resolution))
    expr = F.lit(names[-1])
    for name, bound in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(h < bound, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)
