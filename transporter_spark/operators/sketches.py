"""Mergeable cardinality sketches (HyperLogLog registers).

COUNT DISTINCT at 100 TB is a shuffle of every distinct value; a
HyperLogLog sketch replaces it with a fixed m-register table per group
that (a) is built in ONE map-side-combined groupBy — the partial
aggregate IS the sketch, so combine cost is m integers per group no
matter the corpus size — and (b) merges by per-register MAX, which is
associative/commutative/idempotent: shard sketches, day sketches, and
stream epochs all union exactly (Flajolet et al. 2007; the same
register layout every production engine uses).

Engine-exact by construction: the item hash is the portable md5 prefix
(60 bits — first 15 hex chars, identical in Spark's `conv` and
DuckDB's hex cast), the register value rho is integer string-length
arithmetic on `bin(rest)` (both engines print unpadded binary), and
the estimator's harmonic sum is kept as an exact BIGINT (terms are
powers of two scaled by 2^(w+1)). The only floats are the final
single-division raw estimate and the linear-counting `ln` — both
rounded to 6dp at the boundary. The standard small-range correction is
applied; the 64-bit large-range correction is unnecessary at a 60-bit
hash below ~2^57 distinct items.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transporter_spark.operators.dedup import stable_hash

#: default precision: 2^9 = 512 registers — ~4.6% standard error,
#: 512 ints per group. Raise p for tighter bounds; everything below
#: derives from it.
DEFAULT_P = 9


def _hll_constants(p: int):
    """(m, w, c): register count, hash-tail width, and the estimator's
    numerator constant alpha_m * m^2 * 2^(w+1). The ONE definition both
    the Spark estimator and the oracle SQL derive from — duplicating it
    would let the two sides drift apart silently."""
    m = 1 << p
    w = 60 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    return m, w, alpha * m * m * float(1 << (w + 1))


def _hash60(col: Column) -> Column:
    """Portable 60-bit item hash: `stable_hash` (the audited md5-prefix
    Spark/DuckDB twin, operators/dedup.py) at 15 nibbles."""
    return stable_hash(col, nibbles=15)


def hll_register_table(
    df: DataFrame,
    item_col: str,
    by: Sequence[str],
    p: int = DEFAULT_P,
) -> DataFrame:
    """(by..., bucket, rho) sparse register table: for each group, the
    max leading-zero rank per bucket over the hashed items — the
    mergeable sketch itself. NULL items are skipped (COUNT DISTINCT
    semantics). One groupBy with map-side MAX combine; output is at
    most 2^p rows per group regardless of input size."""
    m = 1 << p
    w = 60 - p
    h = _hash60(F.col(item_col)).alias("_h")
    base = df.where(F.col(item_col).isNotNull()).select(*by, h)
    bucket = F.expr(f"_h % {m}").cast("long").alias("bucket")
    rest = F.expr(f"_h div {m}")
    rho = (
        F.lit(w + 1)
        - F.when(rest == 0, F.lit(0)).otherwise(F.length(F.bin(rest)))
    ).cast("long")
    return (
        base.select(*by, bucket, rho.alias("_rho"))
        .groupBy(*by, "bucket")
        .agg(F.max("_rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, by: Sequence[str]) -> DataFrame:
    """Merge two register tables: union + per-register MAX. Exact —
    merge(sketch(A), sketch(B)) == sketch(A ∪ B) row-for-row, which is
    what makes shard-parallel and streaming maintenance trivial."""
    return (
        a.unionByName(b)
        .groupBy(*by, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, by: Sequence[str], p: int = DEFAULT_P
) -> DataFrame:
    """Cardinality estimate per group from a sparse register table.

    Emits the engine-exact integer evidence alongside the estimate:
    n_buckets (occupied registers), v0 (empty registers), sum_scaled
    (the harmonic denominator as an exact BIGINT: sum of 2^(w+1-rho),
    empty registers contributing 2^(w+1)), hll_raw (alpha_m * m^2 *
    2^(w+1) / sum_scaled — ONE double division of exact operands, so
    bit-identical on every IEEE engine), and estimate with the
    standard small-range linear-counting correction (m * ln(m / v0)
    when raw <= 2.5m and v0 > 0), rounded to 6dp. Runs on the
    m-rows-per-group register table — never on corpus data."""
    m, w, c = _hll_constants(p)
    g = registers.groupBy(*by).agg(
        F.count("*").alias("n_buckets"),
        F.sum(
            # shift is in [0, w] because rho >= 1; pyspark's shiftleft
            # wrapper only accepts a literal count, so spell it in SQL
            F.expr(f"shiftleft(1L, cast({w + 1} - rho AS int))")
        ).alias("_sum_present"),
    )
    v0 = (F.lit(m) - F.col("n_buckets")).cast("long")
    sum_scaled = (
        F.col("_sum_present") + v0 * F.lit(1 << (w + 1)).cast("long")
    ).cast("long")
    out = g.select(
        *by,
        F.col("n_buckets").cast("long").alias("n_buckets"),
        v0.alias("v0"),
        sum_scaled.alias("sum_scaled"),
    ).withColumn("hll_raw", F.lit(c) / F.col("sum_scaled"))
    est = F.when(
        (F.col("hll_raw") <= 2.5 * m) & (F.col("v0") > 0),
        F.round(m * F.log(F.lit(float(m)) / F.col("v0")), 6),
    ).otherwise(F.round(F.col("hll_raw"), 6))
    return out.withColumn("estimate", est.cast("double"))


def hll_oracle_ctes(
    item_sql: str,
    by_sql: str,
    table: str,
    p: int = DEFAULT_P,
) -> str:
    """DuckDB CTE block replaying the register build + estimate for
    oracle parity (shared verbatim by the graded queries so the two
    sides can never drift). Produces CTEs `reg` (the register table)
    and `hest` (the estimate)."""
    m, w, _ = _hll_constants(p)
    return f"""
h AS (
  SELECT {by_sql} AS grp,
         CAST(('0x' || substr(md5(CAST({item_sql} AS VARCHAR)), 1, 15))::UBIGINT
              AS BIGINT) AS h60
  FROM {table} WHERE {item_sql} IS NOT NULL
),
reg AS (
  SELECT grp, h60 % {m} AS bucket,
         MAX({w + 1} - CASE WHEN h60 // {m} = 0 THEN 0
                            ELSE length(bin(h60 // {m})) END) AS rho
  FROM h GROUP BY 1, 2
),
hest AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CAST({m} - COUNT(*) AS BIGINT) AS v0,
         CAST(SUM((1::BIGINT << ({w + 1} - rho)))
              + ({m} - COUNT(*)) * (1::BIGINT << {w + 1}) AS BIGINT)
           AS sum_scaled
  FROM reg GROUP BY 1
)"""


def hll_estimate_sql(p: int = DEFAULT_P) -> str:
    """SELECT-list fragments completing `hll_oracle_ctes`'s `hest` into
    the estimate columns (same constants, same single division)."""
    m, _w, c = _hll_constants(p)
    return (
        f"CAST({c!r} AS DOUBLE) / sum_scaled AS hll_raw, "
        f"CASE WHEN CAST({c!r} AS DOUBLE) / sum_scaled <= {2.5 * m!r} "
        f"AND v0 > 0 THEN round({m} * ln(CAST({m} AS DOUBLE) / v0), 6) "
        f"ELSE round(CAST({c!r} AS DOUBLE) / sum_scaled, 6) END AS estimate"
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): fixed d x w counter
# table; cell-wise SUM merge; point estimate = min over the d salted
# rows. All-integer, so engine-exact by construction — the oracle
# replays the build bit-for-bit.
# ---------------------------------------------------------------------------

#: defaults: 3 rows x 1024 columns -> eps = e/w ~ 0.27% of total count,
#: delta = e^-d ~ 5%. 3072 BIGINTs per sketch regardless of corpus size.
DEFAULT_D = 3
DEFAULT_W = 1024


def _cms_cell(col: Column, row_idx: int, w: int) -> Column:
    """Row-salted portable cell hash: md5 over 'i:item'. DuckDB twin:
    CAST(('0x' || substr(md5(i || ':' || x), 1, 15))::UBIGINT AS
    BIGINT) % w."""
    salted = F.concat_ws(":", F.lit(row_idx).cast("string"), col.cast("string"))
    return (stable_hash(salted, nibbles=15) % w).alias("cell")


def cms_table(
    df: DataFrame,
    item_col: str,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """(row_idx, cell, cnt) counter table over the item occurrences —
    the sketch itself. ONE map-side-combined groupBy: each mapper emits
    at most d x w partial cells however large its split, so the shuffle
    is sketch-sized, never corpus-sized. NULL items are skipped."""
    base = df.where(F.col(item_col).isNotNull())
    cells = F.array(
        *[_cms_cell(F.col(item_col), i, w) for i in range(d)]
    )
    return (
        base.select(F.posexplode(cells).alias("row_idx", "cell"))
        .groupBy("row_idx", "cell")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches: union + cell-wise SUM. Exact —
    merge(cms(A), cms(B)) == cms(A ++ B) (multiset concatenation), the
    algebra that makes shard/epoch rollup of frequency tables free."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """Point-frequency estimates for ``items`` (one row per distinct
    item): est = MIN over the d row counters, the classic one-sided
    estimator (est >= true count always; pinned by test). The sketch is
    <= d x w rows -> broadcast; per-item work is d lookups regardless
    of corpus size. Items never seen by the sketch estimate 0 via the
    left join."""
    cand = items.select(F.col(item_col)).where(
        F.col(item_col).isNotNull()
    ).distinct()
    cells = F.array(*[_cms_cell(F.col(item_col), i, w) for i in range(d)])
    probes = cand.select(
        item_col, F.posexplode(cells).alias("row_idx", "cell")
    )
    joined = probes.join(
        F.broadcast(sketch), on=["row_idx", "cell"], how="left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    return (
        joined.groupBy(item_col)
        .agg(F.min("cnt").cast("long").alias("est"))
    )


def cms_oracle_ctes(
    item_sql: str, table: str, d: int = DEFAULT_D, w: int = DEFAULT_W
) -> str:
    """DuckDB CTE block replaying build + estimate (CTEs `cms` — the
    counter table — and `cms_est`: one estimate row per distinct item)."""
    return f"""
occ AS (
  SELECT {item_sql} AS item FROM {table} WHERE {item_sql} IS NOT NULL
),
cms AS (
  SELECT i AS row_idx,
         CAST(('0x' || substr(md5(i || ':' || CAST(item AS VARCHAR)), 1, 15))
              ::UBIGINT AS BIGINT) % {w} AS cell,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM occ CROSS JOIN (SELECT unnest(generate_series(0, {d - 1})) AS i)
  GROUP BY 1, 2
),
cms_est AS (
  SELECT item, CAST(MIN(cnt) AS BIGINT) AS est
  FROM (SELECT DISTINCT item FROM occ) items
  CROSS JOIN (SELECT unnest(generate_series(0, {d - 1})) AS i)
  JOIN cms ON cms.row_idx = i
   AND cms.cell = CAST(('0x' || substr(md5(i || ':' || CAST(item AS VARCHAR)),
                        1, 15))::UBIGINT AS BIGINT) % {w}
  GROUP BY 1
)"""
