"""Unigram-LM tokenizer (operators/unigram.py): pure-Python
differential for the full Viterbi-EM trainer and encoder, tie-break
semantics, domain guards, retention rule."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pyspark.sql.functions as F
import pytest

from transporter_spark.operators.unigram import (
    GRADED_MAX_PIECE_LEN,
    GRADED_MIN_COUNT,
    GRADED_NUM_ITERS,
    GRADED_SCALE,
    SEP,
    unigram_encode_ids,
    unigram_learn_vocab,
    unigram_viterbi,
    unigram_word_counts,
)
from transporter_spark.sources.files import read_table


# -- pure-Python reference (kept deliberately independent of the
# -- operator code: dict/Counter arithmetic only) ----------------------
def _py_train(texts, L, T, min_count, scale):
    wc = Counter(w for t in texts for w in t.split())
    chars = {c for w in wc for c in w}

    def rnd(x):
        f = math.floor(x + 0.5)
        return int(f) if x >= 0 else -int(math.floor(-x + 0.5))

    def scores(cnts):
        total = sum(cnts.values())
        return {p: rnd(math.log(c * 1.0 / total) * scale) for p, c in cnts.items()}

    def viterbi(w, sc):
        dp = [None] * (len(w) + 1)
        dp[0] = (0, 0, "")
        for j in range(1, len(w) + 1):
            best = None
            for i in range(max(0, j - L), j):
                if dp[i] is None:
                    continue
                s = sc.get(w[i:j])
                if s is None:
                    continue
                path = dp[i][2] + SEP + w[i:j] if dp[i][1] else w[i:j]
                cand = (dp[i][0] - s, dp[i][1] + 1, path)
                if best is None or cand < best:
                    best = cand
            dp[j] = best
        assert dp[len(w)] is not None, w
        return dp[len(w)][2]

    seed = Counter()
    for w, c in wc.items():
        for st in range(len(w)):
            for l in range(1, min(L, len(w) - st) + 1):
                seed[w[st : st + l]] += c
    cnts = {p: c for p, c in seed.items() if len(p) == 1 or c >= min_count}
    sc = scores(cnts)
    for _ in range(T):
        used = Counter()
        for w, c in wc.items():
            for p in viterbi(w, sc).split(SEP):
                used[p] += c
        cnts = {c_: max(used.get(c_, 0), 1) for c_ in chars}
        cnts.update(
            {p: c for p, c in used.items() if len(p) > 1 and c >= min_count}
        )
        sc = scores(cnts)
    order = sorted(
        cnts, key=lambda p: (-cnts[p], hashlib.md5(p.encode()).hexdigest())
    )
    vocab = [(p, cnts[p], sc[p], i) for i, p in enumerate(order)]
    tid = {p: i for p, _, _, i in vocab}
    enc = {w: [tid[p] for p in viterbi(w, sc).split(SEP)] for w in wc}
    return vocab, enc


_CORPUS = [
    "abab abab cdcd",
    "abcd abcd dcba xyzw",
    "aa aa aa bb",
    "abababab ab",
]


def test_trainer_matches_pure_python_on_synthetic(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], ["doc_id", "text"]
    )
    got = [
        tuple(r)
        for r in unigram_learn_vocab(df).orderBy("token_id").collect()
    ]
    want, _ = _py_train(
        _CORPUS,
        GRADED_MAX_PIECE_LEN,
        GRADED_NUM_ITERS,
        GRADED_MIN_COUNT,
        GRADED_SCALE,
    )
    assert got == want


def test_encode_matches_pure_python_per_word(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], ["doc_id", "text"]
    )
    vocab = unigram_learn_vocab(df)
    ids = unigram_encode_ids(df, vocab)
    got = {}
    for r in (
        ids.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("tok_idx", "token_id"))
            ).alias("s")
        )
        .collect()
    ):
        got[r.doc_id] = [x.token_id for x in r.s]
    _, enc = _py_train(
        _CORPUS,
        GRADED_MAX_PIECE_LEN,
        GRADED_NUM_ITERS,
        GRADED_MIN_COUNT,
        GRADED_SCALE,
    )
    want = {
        i: [t for w in doc.split() for t in enc[w]]
        for i, doc in enumerate(_CORPUS)
    }
    assert got == want


def test_trainer_matches_pure_python_on_documents(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    got = [
        tuple(r)
        for r in unigram_learn_vocab(docs).orderBy("token_id").collect()
    ]
    texts = [r.text for r in docs.select("text").collect()]
    want, _ = _py_train(
        texts,
        GRADED_MAX_PIECE_LEN,
        GRADED_NUM_ITERS,
        GRADED_MIN_COUNT,
        GRADED_SCALE,
    )
    assert got == want


def test_viterbi_tiebreak_fewer_pieces_then_lex_path(spark):
    """Equal total score -> fewer pieces wins; still equal -> the
    lexicographically smallest 0x1f-joined path."""
    words = spark.createDataFrame([("abc",)], ["w"])
    # 'abc' = -30 one piece, or 'a'+'bc' = -10-20 = -30 two pieces:
    # one piece must win despite the tie
    pieces = spark.createDataFrame(
        [("abc", -30), ("a", -10), ("bc", -20)], ["piece", "score"]
    )
    assert unigram_viterbi(words, pieces).collect()[0].path == "abc"
    # 'ab'+'c' and 'a'+'bc' both -20, both 2 pieces ->
    # 'a\x1fbc' < 'ab\x1fc' (0x1f sorts below any printable)
    pieces = spark.createDataFrame(
        [("a", -10), ("bc", -10), ("ab", -10), ("c", -10)],
        ["piece", "score"],
    )
    assert unigram_viterbi(words, pieces).collect()[0].path == "a" + SEP + "bc"


def test_word_domain_guards_raise(spark):
    """The SEP guard is unconditional; the length gate fires only when
    a bound is passed (the graded queries pass GRADED_MAX_WORD_LEN to
    keep the oracle's unrolled-DP domain loud — VERDICT r11 item 3)."""
    long_word = spark.createDataFrame(
        [(1, "a" * 13)], ["doc_id", "text"]
    )
    with pytest.raises(Exception, match="unsupported domain"):
        unigram_word_counts(long_word, max_word_len=12).collect()
    # default: unbounded — the 13-char word is a legal domain
    assert unigram_word_counts(long_word).collect()[0].w == "a" * 13
    sep_word = spark.createDataFrame(
        [(1, f"ab{SEP}cd")], ["doc_id", "text"]
    )
    # unbounded mode: the separator is the ONLY violation class, so
    # the diagnostic must not mention a (nonexistent) length bound —
    # in particular never interpolate None into it (ADVICE r12)
    with pytest.raises(Exception, match="unsupported domain") as ei:
        unigram_word_counts(sep_word).collect()
    assert "max word length" not in str(ei.value)
    assert "None" not in str(ei.value)


def test_trainer_unbounded_words_match_pure_python(spark):
    """Real-text corpora carry words far past the graded oracle's
    12-char DP bound (URLs, German compounds): the ENGINE path is
    length-agnostic, so training and encode must work unbounded and
    still match the pure-Python differential (VERDICT r11 item 3)."""
    texts = [
        "https://example.com/a/very/long/path?q=1 short words",
        "donaudampfschifffahrtsgesellschaft donau dampf schiff",
        "internationalization internationalization i18n",
        "short words short donau",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    vocab = unigram_learn_vocab(df)
    got = [
        (r.piece, r.cnt, r.score, r.token_id)
        for r in vocab.orderBy("token_id").collect()
    ]
    want, enc = _py_train(
        texts,
        GRADED_MAX_PIECE_LEN,
        GRADED_NUM_ITERS,
        GRADED_MIN_COUNT,
        GRADED_SCALE,
    )
    assert got == want
    ids = unigram_encode_ids(df, vocab)
    by_doc = {}
    for r in ids.orderBy("doc_id", "tok_idx").collect():
        by_doc.setdefault(r.doc_id, []).append(r.token_id)
    for i, t in enumerate(texts):
        flat = [tid for w in t.split() for tid in enc[w]]
        assert by_doc[i] == flat, f"doc {i}"


def test_encode_unknown_char_raises(spark):
    train = spark.createDataFrame([(1, "ab ab")], ["doc_id", "text"])
    vocab = unigram_learn_vocab(train)
    probe = spark.createDataFrame([(2, "az")], ["doc_id", "text"])
    with pytest.raises(Exception, match="cannot be segmented"):
        unigram_encode_ids(probe, vocab).collect()


def test_retention_keeps_chars_prunes_rare_multi(spark):
    """'xy' appears once (< min_count=2) -> pruned from the seed; every
    char survives."""
    df = spark.createDataFrame([(1, "xy aa aa")], ["doc_id", "text"])
    vocab = unigram_learn_vocab(df)
    pieces = {r.piece for r in vocab.collect()}
    assert "xy" not in pieces
    assert {"x", "y", "a"} <= pieces
