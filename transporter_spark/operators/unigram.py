"""Unigram-LM (SentencePiece-style) tokenizer: distributed Viterbi-EM
training and encoding (VERDICT r10 item 3 — the other tokenizer family
real pipelines train besides BPE; Kudo 2018, arXiv:1804.10959).

Semantics (engine-exact by construction, every arithmetic step
integer or IEEE-identical across engines):

- SEED vocabulary: every substring of the corpus' distinct words up to
  ``max_piece_len`` chars, counted position-weighted (each occurrence
  slot counts, weighted by word frequency); multi-char pieces below
  ``min_count`` are pruned, single characters are ALWAYS retained
  (coverage guarantee).
- SCORES: quantized log-likelihoods — score(p) = round(ln(cnt/total) *
  scale) as BIGINT. Quantizing makes the Viterbi objective an exact
  integer sum, so both engines (and the pure-Python differential)
  compare identical numbers; the only cross-engine float op is one
  ln() per piece per iteration, whose post-rounding value would need
  to sit within ~1e-10 of a .5 boundary for a last-ulp libm
  difference to flip it (the lm_perplexity_gate acceptance, made
  ~1e6x safer by the coarse scale).
- E-STEP (hard EM): per distinct WORD — never per corpus token — the
  max-score segmentation, ties broken by (fewer pieces, then
  lexicographically smallest 0x1f-joined piece path; path compare is
  UTF-8-byte order in Spark and DuckDB and code-point order in
  Python, which agree everywhere by UTF-8 order preservation). The
  tuple DP is exact: score and piece count are additive, and on full
  ties the competing prefix paths have equal length (same covered
  chars, same piece count), so prefix-lexicographic choice is
  globally lexicographic.
- M-STEP: piece usage counts from the best segmentations, weighted by
  word frequency; prune multi-char pieces below ``min_count``; single
  chars retained at max(used, 1); re-score.
- VOCAB ids: rank by (cnt DESC, md5(piece)) — the BPE family's
  engine-portable tie-break.

Scale shape: the ONE corpus scan is the word-count table (shared with
BPE training); everything after — seeding, every E/M iteration, and
encode — runs on vocab-sized frames. The Viterbi itself is an
Arrow-batched mapInPandas over the DISTINCT-WORD table with the piece
scores shipped as a plain dict in the closure (piece tables are
metadata-sized: ~50 MB at a 1M-piece production vocab — the broadcast
discipline of bpe_encode_ids' vocab join; swap to an unrolled join DP
if vocabularies ever outgrow executor memory). Corpus text is touched
exactly twice end-to-end: word count + the final doc→word explode in
encode.

Reference scope note: the transporter reference has no tokenizer —
this family exists for the training-data-pipeline surface the build
mandates (SURVEY.md §6), mirroring `operators.text`'s BPE family.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEP = "\x1f"

#: graded operating point (kept tiny so the staged-SQL oracle's
#: unrolled DP stays tractable; production knobs are the parameters)
GRADED_MAX_PIECE_LEN = 4
GRADED_NUM_ITERS = 2
GRADED_MIN_COUNT = 2
GRADED_SCALE = 1000
GRADED_MAX_WORD_LEN = 12


def unigram_check_words(
    wc: DataFrame, max_word_len: Optional[int] = None
) -> DataFrame:
    """The unigram family's fail-loud domain gate over any (w, cnt)
    word table. A word containing the 0x1f path separator would
    silently corrupt segmentations, so that ALWAYS raises per-row.
    ``max_word_len`` is an OPTIONAL length bound (default None = no
    bound): the engine's Viterbi DP (`_make_viterbi_runner`) is
    length-agnostic — the only consumer that needs a bound is the
    GRADED oracle, whose unrolled SQL DP has ``w_max`` stages, so the
    graded queries pass ``max_word_len=GRADED_MAX_WORD_LEN`` to keep a
    fixture drift loud while real corpora (URLs, compounds) train
    unbounded (VERDICT r11 item 3). Split out so the CONTINUOUS
    trainer can guard the maintained word-count state the same way
    the batch path guards its fresh scan."""
    # diagnostic mentions the length bound only when one exists: in
    # unbounded mode the separator is the only violation class, and
    # "max word length None" would misdescribe it (ADVICE r12)
    len_sql = (
        "true" if max_word_len is None else f"length(w) <= {max_word_len}"
    )
    len_msg = (
        ""
        if max_word_len is None
        else f" or exceeds max word length {max_word_len}"
    )
    return wc.select(
        F.expr(
            f"if(w not like '%{SEP}%' and {len_sql}, w, "
            f"raise_error(concat("
            f"'unigram: word \"', w, '\" contains the 0x1f path "
            f"separator{len_msg} — unsupported domain')))"
        ).alias("w"),
        "cnt",
    )


def unigram_word_counts(
    df: DataFrame,
    text_col: str = "text",
    max_word_len: Optional[int] = None,
) -> DataFrame:
    """(w, cnt): the shared one-corpus-scan word table (BPE's
    `bpe_word_counts`) behind the domain gate."""
    from transporter_spark.operators.text import bpe_word_counts

    return unigram_check_words(
        bpe_word_counts(df, text_col), max_word_len
    )


def unigram_seed_counts(
    wc: DataFrame, max_piece_len: int = GRADED_MAX_PIECE_LEN
) -> DataFrame:
    """(piece, cnt): position-weighted substring counts up to
    max_piece_len over the word table — a row-local HOF expansion on
    the vocab-sized frame (the `_bpe_pair_counts` discipline), one
    piece-keyed aggregate."""
    subs = F.expr(
        "flatten(transform(sequence(1, length(w)), st -> "
        f"transform(sequence(1, least({max_piece_len}, "
        "length(w) - st + 1)), l -> substring(w, st, l))))"
    )
    return (
        wc.select("cnt", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def unigram_chars(wc: DataFrame) -> DataFrame:
    """(piece): the corpus' single characters — always retained."""
    return (
        wc.select(F.explode(F.split("w", "")).alias("piece")).distinct()
    )


def unigram_retain(
    counts: DataFrame, chars: DataFrame, min_count: int = GRADED_MIN_COUNT
) -> DataFrame:
    """The ONE pruning rule (seed and every M-step): single chars
    always survive at max(cnt, 1); multi-char pieces need cnt >=
    min_count."""
    singles = chars.join(counts, "piece", "left").select(
        "piece",
        F.greatest(
            F.coalesce("cnt", F.lit(0).cast("long")), F.lit(1).cast("long")
        ).alias("cnt"),
    )
    multi = counts.where(
        (F.length("piece") > 1) & (F.col("cnt") >= min_count)
    ).select("piece", "cnt")
    return singles.unionByName(multi)


def unigram_scores(
    counts: DataFrame, scale: int = GRADED_SCALE
) -> DataFrame:
    """(piece, cnt, score): quantized log-likelihoods. The total is a
    single driver scalar (vocab-sized frame — the BPE argmax
    discipline); `cnt * 1.0 / total` then one ln/round matches the
    oracle expression op-for-op."""
    total = counts.agg(F.sum("cnt")).collect()[0][0]
    return counts.select(
        "piece",
        "cnt",
        F.round(F.log(F.col("cnt") * 1.0 / F.lit(total)) * scale, 0)
        .cast("long")
        .alias("score"),
    )


def _make_viterbi_runner(
    score_map: Dict[str, int], max_piece_len: int, sep: str
):
    """Arrow-batch Viterbi closure. Nested def + only-stdlib body: the
    worker-closure invariant (pickled by value, no transporter_spark
    imports on executors)."""

    def run(batches):
        for pdf in batches:
            paths = []
            for w in pdf["w"]:
                n = len(w)
                dp = [None] * (n + 1)
                dp[0] = (0, 0, "")
                for j in range(1, n + 1):
                    best = None
                    for i in range(max(0, j - max_piece_len), j):
                        prev = dp[i]
                        if prev is None:
                            continue
                        sc = score_map.get(w[i:j])
                        if sc is None:
                            continue
                        path = (
                            prev[2] + sep + w[i:j] if prev[1] else w[i:j]
                        )
                        cand = (prev[0] - sc, prev[1] + 1, path)
                        if best is None or cand < best:
                            best = cand
                    dp[j] = best
                if dp[n] is None:
                    raise ValueError(
                        f"unigram viterbi: word {w!r} cannot be "
                        "segmented — a character is missing from the "
                        "piece table (encode against the wrong vocab?)"
                    )
                paths.append(dp[n][2])
            out = pdf[["w"]].copy()
            out["path"] = paths
            yield out

    return run


def unigram_viterbi(
    words: DataFrame,
    pieces: DataFrame,
    max_piece_len: int = GRADED_MAX_PIECE_LEN,
) -> DataFrame:
    """(w, path): best segmentation per distinct word (module-doc
    objective/tie-break), 0x1f-joined."""
    score_map = {
        r.piece: r.score for r in pieces.select("piece", "score").collect()
    }
    return words.select("w").mapInPandas(
        _make_viterbi_runner(score_map, max_piece_len, SEP),
        schema="w string, path string",
    )


def unigram_em(
    wc: DataFrame,
    max_piece_len: int = GRADED_MAX_PIECE_LEN,
    num_iters: int = GRADED_NUM_ITERS,
    min_count: int = GRADED_MIN_COUNT,
    scale: int = GRADED_SCALE,
) -> DataFrame:
    """Viterbi-EM from a word-count table: seed -> (E: segment, M:
    recount/prune/re-score) x num_iters. Returns the final (piece,
    cnt, score) table. Each iteration materializes the vocab-sized
    piece table (the connected-components lineage discipline)."""
    from transporter_spark.operators.dedup import _materialize

    if num_iters < 1:
        raise ValueError(f"num_iters must be >= 1, got {num_iters}")
    chars = _materialize(unigram_chars(wc))
    pieces = _materialize(
        unigram_scores(
            unigram_retain(
                unigram_seed_counts(wc, max_piece_len), chars, min_count
            ),
            scale,
        )
    )
    for _ in range(num_iters):
        bests = unigram_viterbi(wc, pieces, max_piece_len)
        used = (
            bests.join(wc, "w")
            .select("cnt", F.explode(F.split("path", SEP)).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        pieces = _materialize(
            unigram_scores(unigram_retain(used, chars, min_count), scale)
        )
    return pieces


def unigram_vocab(pieces: DataFrame) -> DataFrame:
    """(piece, cnt, score, token_id): deterministic ids by (cnt DESC,
    md5(piece)) — single-partition rank over the metadata-sized piece
    table (the bpe_vocab discipline)."""
    return pieces.select(
        "piece",
        "cnt",
        "score",
        (
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.md5("piece"))
            )
            - 1
        )
        .cast("long")
        .alias("token_id"),
    )


def unigram_learn_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = GRADED_MAX_PIECE_LEN,
    num_iters: int = GRADED_NUM_ITERS,
    min_count: int = GRADED_MIN_COUNT,
    scale: int = GRADED_SCALE,
    max_word_len: Optional[int] = None,
) -> DataFrame:
    """Corpus -> final unigram vocabulary (piece, cnt, score,
    token_id). ``max_word_len=None`` (default) trains unbounded —
    the graded queries pass GRADED_MAX_WORD_LEN (oracle DP bound,
    see `unigram_check_words`)."""
    return unigram_vocab(
        unigram_em(
            unigram_word_counts(df, text_col, max_word_len),
            max_piece_len,
            num_iters,
            min_count,
            scale,
        )
    )


def unigram_encode_ids(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = GRADED_MAX_PIECE_LEN,
    word_counts: Optional[DataFrame] = None,
    max_word_len: Optional[int] = None,
) -> DataFrame:
    """Tokenize to (id_col, tok_idx, token_id) with a learned unigram
    vocabulary (`unigram_learn_vocab` output — needs piece/score/
    token_id). Viterbi runs ONCE per distinct word (never per corpus
    occurrence); the corpus-sized path is a word->segmentation
    broadcast-shaped join + one per-document position window over
    id-sized rows — the bpe_encode_ids shape with the merge cascade
    swapped for the segmentation lookup. A word that cannot segment
    (char missing from the vocab) raises in the Viterbi closure.

    ``word_counts``: pass the trainer's (materialized) word table to
    skip the word-count corpus scan — the BPE "ONE word-count pass
    feeds both" discipline; the graded compositions do (r11 review:
    without it, encode paid a second text scan on top of the
    explode)."""
    words = (
        word_counts
        if word_counts is not None
        else unigram_word_counts(df, text_col, max_word_len)
    ).select("w")
    seg = unigram_viterbi(words, vocab, max_piece_len).select(
        "w", F.split("path", SEP).alias("_pieces")
    )
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(f"regexp_extract_all({text_col}, '\\\\S+', 0)")
        ).alias("wpos", "w"),
    )
    sympos = toks.join(F.broadcast(seg), "w").select(
        id_col,
        "wpos",
        F.posexplode("_pieces").alias("ppos", "piece"),
    )
    mapped = sympos.join(
        F.broadcast(vocab.select("piece", "token_id")), "piece"
    )
    w = Window.partitionBy(id_col).orderBy("wpos", "ppos")
    return mapped.select(
        id_col,
        (F.row_number().over(w) - 1).cast("long").alias("tok_idx"),
        "token_id",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle builders (staged replay of the full trainer — the BPE
# oracle discipline: unrolled, engine-portable, shares every constant
# with the operator through this module)
# ---------------------------------------------------------------------------


def _dp_sql_block(
    tag: str,
    cand_cte: str,
    words_cte: str,
    w_max: int,
    max_piece_len: int,
) -> str:
    """CTE chain ``ugdp{tag}_0..{w_max}`` + ``ugbest{tag}`` (w, path):
    the unrolled per-word Viterbi DP. Each position j takes the
    argmax over edges from the previous max_piece_len positions —
    (score DESC, np ASC, path ASC), exactly the engine tuple order."""
    path_expr = (
        "CASE WHEN d.np = 0 THEN c.piece "
        "ELSE d.path || chr(31) || c.piece END"
    )
    # every stage MATERIALIZED: each dp_j is referenced by the next
    # max_piece_len stages and the final union — DuckDB inlines plain
    # CTEs per reference, which makes an unmaterialized DP chain
    # exponential in w_max (the r6 stream_curation_full lesson)
    parts = [
        f"ugdp{tag}_0 AS MATERIALIZED (\n"
        f"  SELECT w, 0 AS j, CAST(0 AS BIGINT) AS score, 0 AS np,"
        f" '' AS path FROM {words_cte})"
    ]
    for j in range(1, w_max + 1):
        prev = " UNION ALL ".join(
            f"SELECT * FROM ugdp{tag}_{i}"
            for i in range(max(0, j - max_piece_len), j)
        )
        parts.append(
            f"""ugdp{tag}_{j} AS MATERIALIZED (
  SELECT w, {j} AS j, score, np, path FROM (
    SELECT d.w, d.score + c.score AS score, d.np + 1 AS np,
           {path_expr} AS path,
           row_number() OVER (PARTITION BY d.w
             ORDER BY d.score + c.score DESC, d.np + 1 ASC,
                      {path_expr} ASC) AS rn
    FROM ({prev}) d
    JOIN {cand_cte} c ON c.w = d.w AND c.i = d.j AND c.j = {j}
  ) WHERE rn = 1)"""
        )
    alldp = " UNION ALL ".join(
        f"SELECT * FROM ugdp{tag}_{j}" for j in range(1, w_max + 1)
    )
    parts.append(
        f"""ugbest{tag} AS MATERIALIZED (
  SELECT d.w, d.path FROM ({alldp}) d
  JOIN {words_cte} u ON u.w = d.w AND length(u.w) = d.j)"""
    )
    return ",\n".join(parts)


def _score_sql(cnt_cte: str, scale: int) -> str:
    return (
        f"SELECT piece, cnt, CAST(round(ln(cnt * 1.0 / "
        f"(SUM(cnt) OVER ())) * {scale}) AS BIGINT) AS score "
        f"FROM {cnt_cte}"
    )


def unigram_oracle_ctes(
    max_piece_len: int = GRADED_MAX_PIECE_LEN,
    num_iters: int = GRADED_NUM_ITERS,
    min_count: int = GRADED_MIN_COUNT,
    scale: int = GRADED_SCALE,
    w_max: int = GRADED_MAX_WORD_LEN,
    source: str = "documents",
    text_sql: str = "text",
) -> str:
    """CTE chain (no leading WITH) replaying seed -> num_iters x (E,
    M) -> ids; ends in ``ugvocab`` (piece, cnt, score, token_id) with
    ``ugp{num_iters}`` (the final scored piece table) and ``ugwc``
    available for composition."""
    ctes = [
        f"""ugwc AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT unnest(regexp_extract_all({text_sql}, '\\S+')) AS w
    FROM {source}) GROUP BY w)""",
        """ugchars AS (
  SELECT DISTINCT unnest(string_split(w, '')) AS piece FROM ugwc)""",
        f"""ugedges AS MATERIALIZED (
  SELECT w, st.i - 1 AS i, st.i + l.j - 1 AS j,
         substr(w, st.i, l.j) AS piece
  FROM ugwc,
       unnest(generate_series(1, length(w))) AS st(i),
       unnest(generate_series(1, {max_piece_len})) AS l(j)
  WHERE st.i + l.j - 1 <= length(w))""",
        """ugseed AS (
  SELECT e.piece, SUM(c.cnt)::BIGINT AS cnt
  FROM ugedges e JOIN ugwc c USING (w) GROUP BY e.piece)""",
        f"""ugcnt0 AS (
  SELECT piece, cnt FROM ugseed
  WHERE length(piece) = 1 OR cnt >= {min_count})""",
        f"ugp0 AS MATERIALIZED ({_score_sql('ugcnt0', scale)})",
    ]
    for t in range(1, num_iters + 1):
        ctes.append(
            f"""ugcand{t} AS MATERIALIZED (
  SELECT e.w, e.i, e.j, e.piece, p.score
  FROM ugedges e JOIN ugp{t - 1} p USING (piece))"""
        )
        ctes.append(
            _dp_sql_block(str(t), f"ugcand{t}", "ugwc", w_max, max_piece_len)
        )
        ctes.append(
            f"""ugused{t} AS (
  SELECT piece, SUM(cnt)::BIGINT AS cnt FROM (
    SELECT unnest(string_split(b.path, chr(31))) AS piece, c.cnt
    FROM ugbest{t} b JOIN ugwc c USING (w)) GROUP BY piece)"""
        )
        ctes.append(
            f"""ugcnt{t} AS (
  SELECT c.piece,
         greatest(COALESCE(u.cnt, 0), CAST(1 AS BIGINT)) AS cnt
  FROM ugchars c LEFT JOIN ugused{t} u USING (piece)
  UNION ALL
  SELECT piece, cnt FROM ugused{t}
  WHERE length(piece) > 1 AND cnt >= {min_count})"""
        )
        ctes.append(f"ugp{t} AS MATERIALIZED ({_score_sql(f'ugcnt{t}', scale)})")
    ctes.append(
        f"""ugvocab AS MATERIALIZED (
  SELECT piece, cnt, score,
         (row_number() OVER (ORDER BY cnt DESC, md5(piece)) - 1)::BIGINT
           AS token_id
  FROM ugp{num_iters})"""
    )
    return ",\n".join(ctes)


def unigram_vocab_oracle(**kw) -> str:
    """Full SELECT for the `unigram_learn_vocab` graded query."""
    return (
        "\nWITH "
        + unigram_oracle_ctes(**kw)
        + "\nSELECT piece, cnt, score, token_id FROM ugvocab"
        + "\nORDER BY token_id\n"
    )


def unigram_encode_ctes(
    max_piece_len: int = GRADED_MAX_PIECE_LEN,
    num_iters: int = GRADED_NUM_ITERS,
    w_max: int = GRADED_MAX_WORD_LEN,
    source: str = "documents",
    text_sql: str = "text",
    **kw,
) -> str:
    """Training + encode CTE chain (no leading WITH), ending in
    ``ugids`` (doc_id, tok_idx, token_id): one more unrolled DP over
    the FINAL piece table, then the per-document id assembly (word
    position x piece position window). Shared by the encode oracle
    and the tokenize->pack composition."""
    ctes = unigram_oracle_ctes(
        max_piece_len=max_piece_len,
        num_iters=num_iters,
        w_max=w_max,
        source=source,
        text_sql=text_sql,
        **kw,
    )
    enc_cand = f"""ugcandE AS MATERIALIZED (
  SELECT e.w, e.i, e.j, e.piece, p.score
  FROM ugedges e JOIN ugp{num_iters} p USING (piece))"""
    enc_dp = _dp_sql_block("E", "ugcandE", "ugwc", w_max, max_piece_len)
    return f"""{ctes},
{enc_cand},
{enc_dp},
ugwrows AS (
  SELECT doc_id, u.j AS wpos, ws[u.j] AS w
  FROM (SELECT doc_id, regexp_extract_all({text_sql}, '\\S+') AS ws
        FROM {source}),
       unnest(generate_series(1, len(ws))) AS u(j)),
ugtok AS (
  SELECT doc_id, wpos, u.j AS ppos, pieces[u.j] AS piece
  FROM (SELECT r.doc_id, r.wpos, string_split(b.path, chr(31)) AS pieces
        FROM ugwrows r JOIN ugbestE b USING (w)),
       unnest(generate_series(1, len(pieces))) AS u(j)),
ugids AS (
  SELECT t.doc_id,
         (row_number() OVER (PARTITION BY t.doc_id
                             ORDER BY t.wpos, t.ppos) - 1)::BIGINT
           AS tok_idx,
         v.token_id
  FROM ugtok t JOIN ugvocab v USING (piece))"""


def unigram_encode_oracle(**kw) -> str:
    """Full SELECT for the `unigram_encode_ids` graded query (emitted
    string byte-identical to its pre-refactor literal — pinned in
    tests/test_oracle_builders.py)."""
    return (
        "\nWITH "
        + unigram_encode_ctes(**kw)
        + """
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       array_to_string(list(token_id ORDER BY tok_idx), '-') AS token_ids
FROM ugids GROUP BY doc_id ORDER BY doc_id
"""
    )


def unigram_pack_oracle(
    seq_len: int = 512, source: str = "documents", **kw
) -> str:
    """Full SELECT for the `unigram_tokenize_pack` graded query: the
    encode chain's ``ugids`` fed through the same per-shard cumsum +
    fixed-length chunking as `_tokenize_pack_oracle`'s tail."""
    return (
        "\nWITH "
        + unigram_encode_ctes(source=source, **kw)
        + f""",
upcnt AS (SELECT doc_id, count(*)::BIGINT AS ntok FROM ugids GROUP BY doc_id),
upoff AS (
  SELECT d.doc_id, d.source,
         CAST(SUM(c.ntok) OVER (PARTITION BY d.source ORDER BY d.doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) - c.ntok
           AS base
  FROM {source} d JOIN upcnt c USING (doc_id)),
upg AS (
  SELECT o.source, t.token_id, o.base + t.tok_idx AS gpos
  FROM ugids t JOIN upoff o USING (doc_id))
SELECT source, CAST(gpos // {seq_len} AS BIGINT) AS seq_id,
       count(*)::BIGINT AS n_tokens,
       array_to_string(list(token_id ORDER BY gpos), '-') AS token_ids
FROM upg GROUP BY 1, 2 ORDER BY source, seq_id
"""
    )
