"""Temporal operators Spark lacks natively: as-of join, range join,
and multi-resolution (hypertable-style) rollups.

Each is a composition of existing DataFrame ops chosen for its shuffle
shape — no inequality nested-loop joins anywhere:

- as-of join: union the two sides tagged, ONE shuffle on (key), sort
  within partition, last-non-null carry-forward. Equivalent to the
  merge-asof algorithm; cost = one shuffle of |L|+|R|.
- range join: bucketize the timeline, equi-join on (key, bucket) with
  each left row probing the handful of buckets its window spans, then
  filter exactly. Candidate factor = window/bucket + 1, vs the
  cartesian blowup of a naive t BETWEEN a AND b join.
- rollup lattice: aggregate fine (hourly) once, derive coarser (daily)
  resolutions by REaggregating the fine partials — decimal sums make
  reaggregation exact, so daily-from-hourly == daily-from-raw.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[Sequence[str]] = None,
    tolerance: Optional[str] = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the matching right row per key — the
    trade-enrichment / dimension-versioning join, with pandas
    merge_asof's full direction surface:

    - ``backward`` (default): newest right with ``right.ts <= left.ts``
    - ``forward``: oldest right with ``right.ts >= left.ts``
    - ``nearest``: whichever of the two is closer in time (ties go
      backward, pandas semantics)

    Algorithm (merge-asof, shuffle-once): tag and union both sides,
    window over (key) ordered by (ts, side) with side=right first on
    ties... actually side ordering: a right row AT the same ts is
    eligible (<= / >=), so rights sort BEFORE lefts at equal ts. Carry
    the last non-null right payload forward (backward) or backward
    over a descending sort (forward); keep left rows. ``nearest`` runs
    BOTH windows over the one union — same single shuffle, two sorts —
    then picks per row.

    tolerance: optional max staleness (e.g. '1 hour') — matches
    pandas merge_asof's tolerance and keeps the result NULL when the
    matched right row is too far away (applied per side before the
    nearest choice).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    on = list(on)
    right_cols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in on and c != right_ts
    ]
    lt = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
        ).alias("_rpayload"),
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    lt = lt.withColumn("_rpayload", F.lit(None).cast(rt.schema["_rpayload"].dataType))
    unioned = lt.select(rt.columns).unionByName(rt)
    frame = (Window.unboundedPreceding, Window.currentRow)
    w_back = (
        Window.partitionBy(*on).orderBy("_t", "_side").rowsBetween(*frame)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").desc(), "_side")
        .rowsBetween(*frame)
    )

    def _gate(col, fresh):
        return F.when(fresh, col) if tolerance is not None else col

    tol = F.expr(f"INTERVAL {tolerance}") if tolerance is not None else None
    if direction == "backward":
        carried = unioned.withColumn(
            "_r", F.last("_rpayload", ignorenulls=True).over(w_back)
        )
        if tolerance is not None:
            carried = carried.withColumn(
                "_r", _gate(F.col("_r"), F.col("_r._rts") >= F.col("_t") - tol)
            )
    elif direction == "forward":
        carried = unioned.withColumn(
            "_r", F.last("_rpayload", ignorenulls=True).over(w_fwd)
        )
        if tolerance is not None:
            carried = carried.withColumn(
                "_r", _gate(F.col("_r"), F.col("_r._rts") <= F.col("_t") + tol)
            )
    else:  # nearest: both candidates from the one shuffled union
        carried = unioned.withColumn(
            "_rb", F.last("_rpayload", ignorenulls=True).over(w_back)
        ).withColumn("_rf", F.last("_rpayload", ignorenulls=True).over(w_fwd))
        if tolerance is not None:
            carried = carried.withColumn(
                "_rb", _gate(F.col("_rb"), F.col("_rb._rts") >= F.col("_t") - tol)
            ).withColumn(
                "_rf", _gate(F.col("_rf"), F.col("_rf._rts") <= F.col("_t") + tol)
            )
        back_dist = F.col("_t") - F.col("_rb._rts")
        fwd_dist = F.col("_rf._rts") - F.col("_t")
        carried = carried.withColumn(
            "_r",
            F.when(F.col("_rb").isNull(), F.col("_rf"))
            .when(F.col("_rf").isNull(), F.col("_rb"))
            .when(fwd_dist < back_dist, F.col("_rf"))  # tie -> backward
            .otherwise(F.col("_rb")),
        )
    out = carried.filter(F.col("_side") == 1)
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.col(f"_r.{c}").alias(c) for c in right_cols],
    )


def range_join_count(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    window: str = "1 hour",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """For each row: how many OTHER rows of the same key fall in
    (ts - window, ts)? The bucketized range self-join.

    Scale shape: each row lands in one bucket; the probe side joins to
    its own bucket and the previous ceil(window/bucket) buckets — an
    equi-join on (key, bucket). Never a full inequality join.
    """
    b = F.floor(F.unix_timestamp(F.col(ts)) / bucket_seconds)
    probe = df.select(
        F.col(key).alias("k"), F.col(ts).alias("t"), b.alias("bk")
    )
    n_back = 2  # window <= bucket_seconds -> current + previous bucket
    build = probe.select(
        "k",
        F.col("t").alias("t2"),
        F.explode(
            F.array(*[F.col("bk") + i for i in range(0, n_back)])
        ).alias("bk"),
    )
    joined = probe.join(build, ["k", "bk"]).filter(
        (F.col("t2") < F.col("t"))
        & (F.col("t2") > F.col("t") - F.expr(f"INTERVAL {window}"))
    )
    counts = joined.groupBy("k", "t").agg(F.count("*").alias("n_recent"))
    return (
        df.join(
            counts,
            (F.col(key) == F.col("k")) & (F.col(ts) == F.col("t")),
            "left",
        )
        .drop("k", "t")
        .withColumn("n_recent", F.coalesce("n_recent", F.lit(0)))
    )


def rollup_lattice(
    df: DataFrame,
    ts: str = "ts",
    keys: Sequence[str] = (),
    value: str = "value",
) -> dict:
    """Hypertable-style continuous-aggregate lattice: hourly partials,
    daily derived FROM the hourly partials (never re-reading raw).

    Returns {'hourly': DataFrame, 'daily': DataFrame}. Decimal sums
    make reaggregation exact — daily-from-hourly is bit-identical to
    daily-from-raw, which is the invariant that makes incremental
    refresh sound (only touched hours recompute; days re-derive)."""
    keys = list(keys)
    dsum = F.sum(F.col(value).cast("string").cast("decimal(38,6)"))
    hourly = (
        df.groupBy(F.date_trunc("hour", F.col(ts)).alias("hour"), *keys)
        .agg(dsum.alias("sum_value"), F.count("*").alias("n"))
    )
    daily = (
        hourly.groupBy(F.date_trunc("day", F.col("hour")).alias("day"), *keys)
        .agg(F.sum("sum_value").alias("sum_value"), F.sum("n").alias("n"))
    )
    return {"hourly": hourly, "daily": daily}


def sessionize(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Batch sessionization: split each key's event stream into
    sessions wherever the inter-event gap exceeds ``gap``; emit a
    per-key session sequence number.

    The batch twin of streaming ``session_window`` (streaming/
    windows.py): new_session = (ts - lag(ts) > gap), session_seq =
    running sum of the flags. Both windows share ONE shuffle on key —
    Catalyst evaluates lag and the cumulative sum in a single
    sort-within-partition pass. Gap comparison is on exact timestamp
    arithmetic (no epoch float math), so engines can't disagree on
    boundaries.

    Scale: per-key ordering only (no global sort); skewed keys bound
    the partition, same envelope as any per-entity window.
    """
    w = Window.partitionBy(key).orderBy(ts)
    run = (
        Window.partitionBy(key)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_sess = F.when(
        F.lag(ts).over(w).isNull()
        | (F.col(ts) - F.lag(ts).over(w) > gap_expr),
        1,
    ).otherwise(0)
    return df.withColumn("_new", new_sess).withColumn(
        "session_seq", F.sum("_new").over(run).cast("long")
    ).drop("_new")
