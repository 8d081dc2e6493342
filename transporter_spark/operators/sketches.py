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

from typing import Callable, NamedTuple, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from transporter_spark.operators.dedup import stable_hash
from transporter_spark.registry import register

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


# ---------------------------------------------------------------------------
# Log-binned quantile sketch (DDSketch-shaped: Masson et al. 2019, but
# with all-INTEGER binning — bit-length + top sub_bits of the scaled
# mantissa instead of floor(log_gamma(x)), so bin assignment is
# engine-exact: no float log whose last ulp could flip a boundary).
# Bins merge by count SUM; quantiles read off the cumulative bin walk.
# Relative error <= 2^-sub_bits within a bin (~3% at the default 5).
# ---------------------------------------------------------------------------

#: fixed-point scale: values are floored at 2^-20 granularity (exact
#: power-of-two scaling of the double mantissa — no rounding).
DEFAULT_SCALE_BITS = 20
#: sub-bin resolution: top 5 mantissa bits -> <=3.2% relative error.
DEFAULT_SUB_BITS = 5


def dd_bins(
    df: DataFrame,
    value_col: str,
    by: Sequence[str],
    scale_bits: int = DEFAULT_SCALE_BITS,
    sub_bits: int = DEFAULT_SUB_BITS,
) -> DataFrame:
    """(by..., bin_e, bin_sub, cnt) log-bin histogram — the sketch.
    ONE map-side-combined groupBy; at most ~64 * 2^sub_bits bins per
    group regardless of input size. Domain = [0, 2^(62-scale_bits))
    (~4.4e12 at defaults — keeps every shift and the midpoint
    arithmetic inside int64 on BOTH engines): NULL, NaN, negative, and
    over-ceiling values are excluded IDENTICALLY here and in the
    oracle, so the two sides can never diverge on them (like DDSketch's
    positive store; split sign streams / rescale for other domains).
    v = floor(value * 2^scale_bits); bin_e = bitlength(v) (0 for v = 0
    — the underflow bin: values below 2^-scale_bits quantize there, so
    the relative-error guarantee is max(2^-sub_bits relative,
    ~2^-scale_bits absolute)), bin_sub = the sub_bits bits after the
    leading one."""
    two_s = 1 << scale_bits
    lim = float(1 << (62 - scale_bits))
    base = df.where(
        F.col(value_col).isNotNull()
        & ~F.expr(f"isnan(cast({value_col} as double))")
        & (F.col(value_col) >= 0)
        & (F.col(value_col) < lim)
    ).select(
        *by,
        F.expr(
            f"cast(floor({value_col} * {two_s}) as bigint)"
        ).alias("_v"),
    )
    e = F.when(F.col("_v") == 0, F.lit(0)).otherwise(
        F.length(F.bin(F.col("_v")))
    ).cast("int")
    binned = base.select(*by, "_v", e.alias("_e")).select(
        *by,
        F.col("_e").cast("long").alias("bin_e"),
        F.when(F.col("_v") == 0, F.lit(0)).otherwise(
            F.expr(
                f"shiftright(_v, cast(greatest(_e - 1 - {sub_bits}, 0) as int))"
                f" - shiftleft(1L, cast(_e - 1 - greatest(_e - 1 - {sub_bits}, 0) as int))"
            )
        ).cast("long").alias("bin_sub"),
    )
    return binned.groupBy(*by, "bin_e", "bin_sub").agg(
        F.count("*").alias("cnt")
    )


def dd_merge(a: DataFrame, b: DataFrame, by: Sequence[str]) -> DataFrame:
    """Merge two bin histograms: union + count SUM. Exact —
    merge(dd(A), dd(B)) == dd(A ++ B) bin-for-bin."""
    return (
        a.unionByName(b)
        .groupBy(*by, "bin_e", "bin_sub")
        .agg(F.sum("cnt").alias("cnt"))
    )


#: (percent, label) quantile probes shared by the operator and oracle.
DD_FRACS = ((25, "p25"), (50, "p50"), (75, "p75"), (90, "p90"), (99, "p99"))


def dd_quantiles(
    bins: DataFrame,
    by: Sequence[str],
    scale_bits: int = DEFAULT_SCALE_BITS,
    sub_bits: int = DEFAULT_SUB_BITS,
) -> DataFrame:
    """Quantile estimates per group from the bin table: walk bins in
    (bin_e, bin_sub) order; quantile q lands in the bin holding the
    ceil(q*n)-th value (cum >= t AND cum - cnt < t picks exactly one
    bin). Estimate = the bin's midpoint — an exact integer divided by
    2^(scale_bits+1), a power of two, so the double is bit-identical on
    every engine with NO rounding step. Runs entirely on the bin table
    (<= ~2k rows per group); the corpus is never re-read."""
    spark = bins.sparkSession
    fr = spark.createDataFrame(list(DD_FRACS), "frac long, q string")
    w = (
        Window.partitionBy(*by).orderBy("bin_e", "bin_sub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bins.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*by))
    )
    t = F.expr("(frac * n + 99) div 100")
    picked = (
        cum.crossJoin(F.broadcast(fr))
        .withColumn("t", t)
        .where((F.col("cum") >= F.col("t")) & (F.col("cum") - F.col("cnt") < F.col("t")))
    )
    shift = f"cast(greatest(bin_e - 1 - {sub_bits}, 0) as int)"
    lo = (
        f"CASE WHEN bin_e = 0 THEN 0 ELSE "
        f"shiftleft(1L, cast(bin_e - 1 as int)) + shiftleft(bin_sub, {shift}) END"
    )
    width = f"CASE WHEN bin_e = 0 THEN 0 ELSE shiftleft(1L, {shift}) END"
    est = F.expr(f"2 * ({lo}) + ({width})") / F.lit(
        float(1 << (scale_bits + 1))
    )
    return picked.select(
        *by, "q", est.alias("est"), "bin_e", "bin_sub",
    )


def dd_oracle_ctes(
    value_sql: str,
    by_sql: str,
    table: str,
    scale_bits: int = DEFAULT_SCALE_BITS,
    sub_bits: int = DEFAULT_SUB_BITS,
) -> str:
    """DuckDB CTE block replaying binning + quantile walk (CTEs `ddb` —
    the bin table — and `ddq`: one row per group x quantile, columns
    grp, q, est, bin_e, bin_sub)."""
    two_s = 1 << scale_bits
    fracs = ", ".join(f"({f}, '{l}')" for f, l in DD_FRACS)
    return f"""
ddv AS (
  SELECT {by_sql} AS grp,
         CAST(floor({value_sql} * {two_s}) AS BIGINT) AS v
  FROM {table}
  WHERE {value_sql} IS NOT NULL
    AND NOT isnan(CAST({value_sql} AS DOUBLE))
    AND {value_sql} >= 0
    AND {value_sql} < {float(1 << (62 - scale_bits))!r}
),
dde AS (
  SELECT grp, v,
         CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS e
  FROM ddv
),
ddb AS (
  SELECT grp, CAST(e AS BIGINT) AS bin_e,
         CAST(CASE WHEN v = 0 THEN 0 ELSE
           (v >> greatest(e - 1 - {sub_bits}, 0))
           - (1::BIGINT << (e - 1 - greatest(e - 1 - {sub_bits}, 0))) END
         AS BIGINT) AS bin_sub,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM dde GROUP BY 1, 2, 3
),
ddc AS (
  SELECT grp, bin_e, bin_sub, cnt,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY bin_e, bin_sub) AS cum,
         SUM(cnt) OVER (PARTITION BY grp) AS n
  FROM ddb
),
ddq AS (
  SELECT grp, q, bin_e, bin_sub,
         (2 * (CASE WHEN bin_e = 0 THEN 0 ELSE
                 (1::BIGINT << CAST(bin_e - 1 AS INT))
                 + (bin_sub << greatest(CAST(bin_e AS INT) - 1 - {sub_bits}, 0)) END)
            + (CASE WHEN bin_e = 0 THEN 0 ELSE
                 1::BIGINT << greatest(CAST(bin_e AS INT) - 1 - {sub_bits}, 0) END))
           / CAST({float(1 << (scale_bits + 1))!r} AS DOUBLE) AS est
  FROM ddc CROSS JOIN (SELECT * FROM (VALUES {fracs}) f(frac, q))
  WHERE cum >= (frac * n + 99) // 100
    AND cum - cnt < (frac * n + 99) // 100
)"""


# ---------------------------------------------------------------------------
# Bloom-filter membership sketch (Bloom 1970): k salted bit positions
# per item OR-ed into a fixed m-bit array. The membership member of the
# sketch family — the scale path for decontamination blocklists and
# incremental exact dedup: ~m/n bits per key instead of the key itself,
# and the word-level bit-OR merge is associative, commutative AND
# idempotent (like the HLL register MAX, unlike the SUM sinks), so
# shard/epoch/re-delivered sketches all union exactly. One-sided error:
# no false negatives ever; false-positive rate ~ (1 - e^(-kn/m))^k.
#
# Engine-exact by construction: positions come from the audited
# md5-prefix hash (`stable_hash`, the Spark/DuckDB twin) salted per
# probe exactly like the Count-Min rows ('i:item'), and the bit array
# is stored as 32-bit words in BIGINTs (bit index < 32 keeps every
# shifted value positive and well under int64 on BOTH engines — no
# sign-bit or overflow edge anywhere). The oracle replays the build
# and the probe bit-for-bit.
# ---------------------------------------------------------------------------

#: default geometry: 2^15 bits (1024 words) x 4 probes -> ~1.2e-5
#: false-positive rate at 500 members; 8 KiB per sketch regardless of
#: member count. Size m at ~10 bits per expected member for ~1% FPR.
DEFAULT_M_BITS = 1 << 15
DEFAULT_K = 4

_BLOOM_WORD = 32  # bits per stored word; see module comment above


class BloomSketch(NamedTuple):
    """A word table WITH its build geometry (ADVICE r7): probing a
    table with a different k/m_bits than it was built with silently
    produces FALSE NEGATIVES (true members missed) — the one failure
    mode the sketch's no-false-negatives contract can't absorb. Pass
    this wrapper (from `bloom_sketch` / `read_bloom_sketch`) instead
    of a bare DataFrame and every probe validates the geometry; the
    streaming sink already persists it in the state meta's seg-key
    format (`bloom_m={m}.k={k}`) with a loud mismatch check."""

    words: DataFrame
    k: int
    m_bits: int


def bloom_sketch(
    df: DataFrame,
    item_col: str,
    by: Sequence[str] = (),
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
) -> BloomSketch:
    """`bloom_words` with the geometry carried alongside."""
    return BloomSketch(bloom_words(df, item_col, by, k, m_bits), k, m_bits)


def _bloom_resolve(
    words: Union[DataFrame, BloomSketch],
    k: Optional[int],
    m_bits: Optional[int],
) -> "tuple[DataFrame, int, int]":
    """(word table, k, m_bits) for a probe: a BloomSketch supplies its
    own geometry and RAISES if the caller also passed a conflicting
    explicit value; a bare DataFrame falls back to the caller's args
    (defaulted) — its geometry is then the caller's claim, range-
    guarded per-row by `_bloom_guard_words`."""
    if isinstance(words, BloomSketch):
        if k is not None and k != words.k:
            raise ValueError(
                f"bloom probe k={k} conflicts with the sketch's build "
                f"geometry k={words.k} — a mismatched probe silently "
                "loses the no-false-negatives guarantee"
            )
        if m_bits is not None and m_bits != words.m_bits:
            raise ValueError(
                f"bloom probe m_bits={m_bits} conflicts with the "
                f"sketch's build geometry m_bits={words.m_bits}"
            )
        return words.words, words.k, words.m_bits
    return (
        words,
        DEFAULT_K if k is None else k,
        DEFAULT_M_BITS if m_bits is None else m_bits,
    )


def _bloom_guard_words(words: DataFrame, m_bits: int) -> DataFrame:
    """Per-row fail-loud range guard on a bare word table: a word_idx
    outside [0, m_bits/32) PROVES the table was built at a larger
    m_bits than the probe assumes — raise_error instead of silently
    missing members. One-sided by nature (a table built SMALLER stays
    in range — carry the geometry with `BloomSketch` to close that
    direction); sketch-sized and lazy, zero extra jobs."""
    n_words = m_bits // _BLOOM_WORD
    # a FILTER predicate, not a projected rewrite of word_idx: a
    # raise_error CASE on the join key would stop it being a plain
    # attribute and Catalyst falls back to a cartesian join
    return words.where(
        F.expr(
            f"if(word_idx >= 0 and word_idx < {n_words}, true, "
            f"raise_error(concat('bloom word_idx ', "
            f"cast(word_idx as string), "
            f"' outside the probed geometry m_bits={m_bits} ({n_words} "
            "words) — the table was built with a different m_bits')))"
        )
    )


def _bloom_position(col: Column, i: int, m_bits: int) -> Column:
    """THE salted bit position for probe ``i`` of an item — md5-prefix
    hash of 'i:item' mod m (the CMS `_cms_cell` salt recipe). The ONE
    definition both the build (`_bloom_positions`) and the inline
    probe (`bloom_probe_mark`) consume — a drifted spelling between
    them would turn probe misses into FALSE NEGATIVES with no error
    anywhere. DuckDB twin: CAST(('0x' || substr(md5(i || ':' || x),
    1, 15))::UBIGINT AS BIGINT) % m_bits."""
    return (
        stable_hash(
            F.concat_ws(":", F.lit(i).cast("string"), col.cast("string")),
            nibbles=15,
        )
        % m_bits
    )


def _bloom_positions(col: Column, k: int, m_bits: int) -> Column:
    """Array of the k salted bit positions for an item."""
    return F.array(*[_bloom_position(col, i, m_bits) for i in range(k)])


def bloom_words(
    df: DataFrame,
    item_col: str,
    by: Sequence[str] = (),
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """(by..., word_idx, word) sparse word table — the sketch itself:
    word = bit-OR of 1 << (pos % 32) over every member position landing
    in that word. ONE map-side-combined groupBy: each mapper emits at
    most m_bits/32 partial words per group however large its split, so
    the shuffle is sketch-sized, never corpus-sized. NULL items are
    skipped (set-membership semantics). Output rows only for non-zero
    words (sparse; the probe treats absent words as 0)."""
    by = list(by)
    base = df.where(F.col(item_col).isNotNull())
    pos = base.select(
        *by,
        F.explode(_bloom_positions(F.col(item_col), k, m_bits)).alias("_pos"),
    )
    return (
        pos.select(
            *by,
            F.expr(f"_pos div {_BLOOM_WORD}").cast("long").alias("word_idx"),
            F.expr(
                f"shiftleft(1L, cast(_pos % {_BLOOM_WORD} as int))"
            ).alias("_bit"),
        )
        .groupBy(*by, "word_idx")
        .agg(F.bit_or("_bit").cast("long").alias("word"))
    )


def bloom_merge(a: DataFrame, b: DataFrame, by: Sequence[str] = ()) -> DataFrame:
    """Merge two word tables: union + word-level bit-OR. Exact AND
    idempotent — merge(bloom(A), bloom(B)) == bloom(A ∪ B), and
    re-merging the same sketch is a no-op (x | x == x), the property
    that makes the continuous sink safe under at-least-once
    re-delivery with no upstream dedup."""
    return (
        a.unionByName(b)
        .groupBy(*list(by), "word_idx")
        .agg(F.bit_or("word").cast("long").alias("word"))
    )


def bloom_contains(
    words: Union[DataFrame, BloomSketch],
    probes: DataFrame,
    item_col: str,
    id_cols: Sequence[str],
    k: Optional[int] = None,
    m_bits: Optional[int] = None,
    by: Sequence[str] = (),
    join_strategy: str = "auto",
) -> DataFrame:
    """Membership verdict per probe row: member = ALL k probe bits set
    (no false negatives; false positives at the documented rate).
    Per-probe work is k word lookups regardless of member count. NULL
    items are non-members (empty-set semantics). Returns
    (id_cols..., member boolean).

    For a GROUPED word table (built with ``by``), pass the SAME ``by``
    here and include those columns in ``id_cols`` — each probe row is
    then tested against ITS group's sketch. Both checks below are
    load-bearing: joining a grouped table on word_idx alone would test
    every probe against every group's word, and aggregating the k hit
    rows without the group columns in the output key would min-merge
    hits across groups — either silently breaks the no-false-negatives
    guarantee.

    ``join_strategy`` picks how probe rows meet the word table:

    - ``"broadcast"``: plan-time `F.broadcast(words)` hint. Always
      right for a GLOBAL sketch — its geometry CAPS the table at
      m_bits/32 rows (8 KiB at the default m) no matter how many
      members were folded in.
    - ``"shuffle"``: plain equi-join, no hint. A grouped word table is
      m_bits/32 rows PER GROUP — 10^6 groups at the default geometry
      is ~10^9 rows / tens of GiB, far past any broadcast budget.
    - ``"auto"`` (default): broadcast when ``by`` is empty (the
      geometry-capped case), plain join when grouped — where AQE's
      runtime size estimate of the word-table shuffle IS the
      group-count estimate, and it promotes small grouped sketches
      back to a broadcast join at runtime with real statistics
      instead of a plan-time guess."""
    if join_strategy not in ("auto", "broadcast", "shuffle"):
        raise ValueError(
            f"join_strategy must be auto|broadcast|shuffle, got "
            f"{join_strategy!r}"
        )
    words, k, m_bits = _bloom_resolve(words, k, m_bits)
    id_cols = list(id_cols)
    by = list(by)
    expect = set(by) | {"word_idx", "word"}
    if set(words.columns) != expect:
        raise ValueError(
            f"word table columns {sorted(words.columns)} do not match the "
            f"probe's expectation {sorted(expect)}: a sketch built with "
            "grouping columns must be probed with the same by=[...]"
        )
    if not set(by) <= set(id_cols):
        raise ValueError(
            f"grouping columns {by} must be included in id_cols "
            f"({id_cols}): the per-probe aggregate groups by id_cols, so "
            "a by column left out would min-merge hits across groups"
        )
    words = _bloom_guard_words(words, m_bits)
    pos = probes.where(F.col(item_col).isNotNull()).select(
        *id_cols,
        F.explode(_bloom_positions(F.col(item_col), k, m_bits)).alias("_pos"),
    )
    if join_strategy == "broadcast" or (join_strategy == "auto" and not by):
        words = F.broadcast(words)
    probed = pos.withColumn(
        "word_idx", F.expr(f"_pos div {_BLOOM_WORD}").cast("long")
    ).join(words, by + ["word_idx"], "left")
    # right-shift by a COLUMN count needs F.expr; integer div by the
    # probe bit's power of two is the same thing and reads cleanly
    hit = F.expr(
        f"(coalesce(word, 0L) div shiftleft(1L, cast(_pos % {_BLOOM_WORD} as int))) % 2"
    )
    per_probe = probed.select(*id_cols, hit.alias("_hit"))
    out = per_probe.groupBy(*id_cols).agg(
        (F.min("_hit") == 1).alias("member")
    )
    # probes with NULL item explode to zero rows -> restore as False
    return (
        probes.select(*id_cols)
        .join(out, id_cols, "left")
        .select(
            *id_cols, F.coalesce("member", F.lit(False)).alias("member")
        )
    )


def bloom_probe_mark(
    df: DataFrame,
    item_col: str,
    words: Union[DataFrame, BloomSketch],
    out_col: str = "member",
    k: Optional[int] = None,
    m_bits: Optional[int] = None,
) -> DataFrame:
    """Inline membership mark against a GLOBAL word table: adds
    ``out_col`` (boolean — all k salted bits set) to every row of
    ``df`` with ZERO exchanges on the probe side. Where
    `bloom_contains` explodes k position rows and re-groups per probe
    (one shuffle of k x probe rows), this runs k BroadcastHashJoins of
    the <= m_bits/32-row word table — the row never leaves its
    partition, which is what makes the sketch usable as a PRE-FILTER
    in front of an exact join: downstream exchanges carry only probe
    survivors (the decontaminate / incremental-exact-dedup scale path;
    no false negatives, so recall is untouched — false positives are
    re-checked by the exact join behind it). NULL items mark False
    (empty-set semantics, same as `bloom_contains`).

    ``words`` is defensively OR-merged per word_idx before probing:
    a duplicate-word_idx table (per-epoch sketches appended without
    `bloom_merge`) would otherwise fan every matching probe row out
    through each left join — silent row multiplication. The merge is
    a no-op on a clean table (x | x == x) and sketch-sized either
    way.

    Geometry (ADVICE r7): pass a `BloomSketch` and its build k/m_bits
    are used and validated against any explicit args; a bare word
    table is probed at the caller's claimed geometry with a per-row
    word_idx range guard (catches built-larger mismatches loudly;
    built-smaller needs the carried geometry)."""
    words, k, m_bits = _bloom_resolve(words, k, m_bits)
    if set(words.columns) != {"word_idx", "word"}:
        raise ValueError(
            f"bloom_probe_mark probes a GLOBAL sketch (columns "
            f"word_idx, word); got {sorted(words.columns)} — for a "
            "grouped sketch use bloom_contains with by=[...]"
        )
    words = _bloom_guard_words(words, m_bits).groupBy("word_idx").agg(
        F.bit_or("word").cast("long").alias("word")
    )
    out = df
    hits = []
    for i in range(k):
        pos = _bloom_position(F.col(item_col), i, m_bits)
        w = words.select(
            F.col("word_idx").alias(f"_bpm_widx{i}"),
            F.col("word").alias(f"_bpm_w{i}"),
        )
        out = out.withColumn(
            f"_bpm_pos{i}", pos
        ).join(
            F.broadcast(w),
            F.expr(f"_bpm_pos{i} div {_BLOOM_WORD}")
            == F.col(f"_bpm_widx{i}"),
            "left",
        )
        hits.append(
            F.expr(
                f"(coalesce(_bpm_w{i}, 0L) div "
                f"shiftleft(1L, cast(_bpm_pos{i} % {_BLOOM_WORD} as int)))"
                " % 2"
            )
            == 1
        )
    member = hits[0]
    for h in hits[1:]:
        member = member & h
    verdict = F.when(F.col(item_col).isNull(), F.lit(False)).otherwise(member)
    drop = [c for c in out.columns if c.startswith("_bpm_")]
    return out.withColumn(out_col, verdict).drop(*drop)


def bloom_oracle_ctes(
    member_sql: str,
    member_table: str,
    probe_sql: str,
    probe_id_sql: str,
    probe_table: str,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
) -> str:
    """DuckDB CTE block replaying build + probe (CTEs `bwords` — the
    word table — and `bmem`: one (pid, member) row per probe row).
    Same salted positions, same 32-bit words, same all-bits-set test."""
    return f"""
bpos AS (
  SELECT CAST(('0x' || substr(md5(i || ':' || CAST({member_sql} AS VARCHAR)),
               1, 15))::UBIGINT AS BIGINT) % {m_bits} AS pos
  FROM {member_table}
  CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS i)
  WHERE {member_sql} IS NOT NULL
),
bwords AS (
  SELECT pos // {_BLOOM_WORD} AS word_idx,
         CAST(bit_or(1::BIGINT << CAST(pos % {_BLOOM_WORD} AS INT)) AS BIGINT)
           AS word
  FROM bpos GROUP BY 1
),
bprobe AS (
  SELECT {probe_id_sql} AS pid,
         CAST(('0x' || substr(md5(i || ':' || CAST({probe_sql} AS VARCHAR)),
               1, 15))::UBIGINT AS BIGINT) % {m_bits} AS pos
  FROM {probe_table}
  CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS i)
  WHERE {probe_sql} IS NOT NULL
),
bmem AS (
  SELECT p.pid,
         MIN((COALESCE(w.word, 0) // (1::BIGINT << CAST(p.pos % {_BLOOM_WORD} AS INT))) % 2)
           = 1 AS member
  FROM bprobe p LEFT JOIN bwords w ON p.pos // {_BLOOM_WORD} = w.word_idx
  GROUP BY 1
)"""


# ---------------------------------------------------------------------------
# registry faces (pipeline-config operators, like the reference's
# function registry — function/all/all.go)
# ---------------------------------------------------------------------------

@register("distinct_sketch")
def distinct_sketch_op(
    item_col: str,
    by: Sequence[str] = (),
    p: int = DEFAULT_P,
) -> Callable[[DataFrame], DataFrame]:
    """Registry/pipeline face of the HLL family: per-group distinct
    estimate (build + estimate in one step)."""

    def apply(df: DataFrame) -> DataFrame:
        return hll_estimate(
            hll_register_table(df, item_col, list(by), p), list(by), p
        )

    return apply


@register("quantile_sketch")
def quantile_sketch_op(
    value_col: str,
    by: Sequence[str] = (),
    scale_bits: int = DEFAULT_SCALE_BITS,
    sub_bits: int = DEFAULT_SUB_BITS,
) -> Callable[[DataFrame], DataFrame]:
    """Registry/pipeline face of the log-binned quantile sketch:
    per-group p25..p99 estimates."""

    def apply(df: DataFrame) -> DataFrame:
        return dd_quantiles(
            dd_bins(df, value_col, list(by), scale_bits, sub_bits),
            list(by), scale_bits, sub_bits,
        )

    return apply


@register("heavy_hitters")
def heavy_hitters_op(
    item_col: str,
    k: int = 20,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> Callable[[DataFrame], DataFrame]:
    """Registry/pipeline face of the Count-Min sketch: top-k items by
    estimated frequency."""

    def apply(df: DataFrame) -> DataFrame:
        est = cms_estimate(cms_table(df, item_col, d, w), df, item_col, d, w)
        return est.orderBy(F.desc("est"), item_col).limit(k)

    return apply


@register("membership_sketch")
def membership_sketch_op(
    item_col: str,
    by: Sequence[str] = (),
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
) -> Callable[[DataFrame], DataFrame]:
    """Registry/pipeline face of the Bloom family: build the per-group
    word table (feed it to `bloom_contains` — with the SAME ``by`` when
    grouped — to probe, or persist it as a blocklist)."""

    def apply(df: DataFrame) -> DataFrame:
        return bloom_words(df, item_col, list(by), k, m_bits)

    return apply
