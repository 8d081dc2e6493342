"""Oracle-builder refactor pins (the r6 rule: any static-oracle ->
parameterized-builder refactor must prove byte-identity at the old
operating point, so green CORRECTNESS rows are not silently
invalidated)."""

from transporter_spark.queries import (
    QUERIES,
    _SHINGLES_SQL,
    _minhash_portable_ctes,
    _shingles_sql,
)

# the round-2 literal, verbatim — _shingles_sql() must keep emitting it
_R2_SHINGLES = r"""
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE list_transform(generate_series(1, len(t) - 2),
                                  i -> array_to_string(t[i:i+2], ' ')) END)) AS s
       FROM toks)
"""


def test_shingles_builder_default_is_byte_identical_to_r2_literal():
    assert _shingles_sql() == _R2_SHINGLES == _SHINGLES_SQL


def test_shingles_builder_standalone_flag_only_strips_with():
    assert "\nWITH " + _shingles_sql("corpus", standalone=False).replace(
        "FROM corpus", "FROM documents"
    ) == _shingles_sql()


def test_portable_ctes_explicit_params_equal_default():
    """The parameterization wiring: passing the defaults explicitly
    must reproduce the graded minhash oracle byte-for-byte."""
    assert (
        _minhash_portable_ctes("0.1", _shingles_sql())
        == _minhash_portable_ctes()
    )
    assert (
        QUERIES["minhash_lsh_portable"].oracle
        == _minhash_portable_ctes()
        + "\nSELECT id_a, id_b, jaccard FROM mh_pairs"
    )


def test_portable_ctes_banding_params_default_identical():
    """The r10 num_hashes/bands parameterization: explicit defaults
    reproduce the graded text byte-for-byte; the tuned 64/32 geometry
    emits 32 band selects of 2 signature slots each and raises on a
    non-dividing band count."""
    import pytest

    assert (
        _minhash_portable_ctes(num_hashes=64, bands=16)
        == _minhash_portable_ctes()
    )
    tuned = _minhash_portable_ctes(bands=32)
    assert tuned.count("AS band") == 32
    assert "mh_62 || ',' || mh_63" in tuned
    assert "mh_0 || ',' || mh_1 AS bsig" in tuned
    with pytest.raises(ValueError, match="must divide"):
        _minhash_portable_ctes(bands=24)


def test_portable_ctes_threshold_splices_both_sites():
    """The verify threshold appears once in mh_pairs (projection +
    WHERE share the expression) — a parameterized threshold must
    land there and nowhere else."""
    base = _minhash_portable_ctes()
    moved = _minhash_portable_ctes("0.35")
    assert base.count(">= 0.1") == 1
    assert moved.count(">= 0.35") == 1
    assert ">= 0.1)" not in moved


def test_tokenize_pack_builder_source_default_identical():
    """The r10 source/with_boundaries parameterization: explicit
    defaults reproduce the graded strings byte-for-byte, and the
    pretraining composition only SPLICES in front of the shared
    builders' text (curated CTEs + the rename CTE), leaving the
    tokenize chain itself verbatim."""
    from transporter_spark.queries import (
        _BPE_GRADED_MERGES,
        _PACK_SEQ_LEN,
        _curated_ctes,
        _tokenize_pack_oracle,
    )

    assert _tokenize_pack_oracle(
        _BPE_GRADED_MERGES, _PACK_SEQ_LEN, source="documents"
    ) == _tokenize_pack_oracle(_BPE_GRADED_MERGES, _PACK_SEQ_LEN)
    assert QUERIES["tokenize_pack_pipeline"].oracle == _tokenize_pack_oracle(
        _BPE_GRADED_MERGES, _PACK_SEQ_LEN
    )
    composed = QUERIES["pretraining_pipeline"].oracle
    tail = _tokenize_pack_oracle(
        _BPE_GRADED_MERGES, _PACK_SEQ_LEN,
        with_boundaries=True, source="curated",
    ).split("\nWITH wc AS MATERIALIZED (", 1)
    assert composed.startswith(tail[0] + "\nWITH " + _curated_ctes())
    assert composed.endswith("wc AS MATERIALIZED (" + tail[1])
    # and training_pipeline's oracle is the same curated block + its
    # original rollup tail (byte-identity vs the pre-factor literal
    # was asserted at refactor time; structure pinned here)
    assert QUERIES["training_pipeline"].oracle.startswith(
        "\nWITH " + _curated_ctes()
    )


def test_simhash_builder_cap_default_identical():
    """The r10 source/max_bucket parameterization of the SimHash
    oracle builder: explicit defaults reproduce the graded text
    byte-for-byte; the capped variant adds exactly the bok/bcap CTEs
    and rebinds the candidate join; the capped graded query only
    WITH-splices its corpus in front."""
    from transporter_spark.queries import _simhash_oracle

    assert _simhash_oracle(source="documents", max_bucket=None) == _simhash_oracle()
    assert QUERIES["simhash_pairs"].oracle == _simhash_oracle()
    capped = _simhash_oracle(source="shcorpus", max_bucket=150)
    assert "HAVING count(*) <= 150" in capped
    assert "FROM bcap a JOIN bcap b" in capped
    assert QUERIES["simhash_pairs_capped"].oracle.endswith(
        capped.split("\nWITH tok AS (", 1)[1]
    )


def test_recall_audit_oracle_materializes_shared_cte():
    """The audit oracle references `sh` more times than the graded LSH
    query; the composition layer must MATERIALIZE it (and the corpus)
    without touching the shared builder's standalone text."""
    oracle = QUERIES["dedup_recall_audit"].oracle
    assert "sh AS MATERIALIZED (" in oracle
    assert "corpus AS MATERIALIZED (" in oracle
    assert "sh AS MATERIALIZED" not in QUERIES["minhash_lsh_portable"].oracle


def test_bpe_apply_oracle_degrades_like_early_stop(spark):
    """A corpus that exhausts mergeable pairs before the graded 8
    merges: bpe_learn stops early and the apply ORACLE's staged
    replaces must become identities (search == chr(31) sentinel ==
    replacement), not NULL-cascade every form to 0 tokens."""
    import duckdb

    from transporter_spark.operators.text import bpe_apply_merges, bpe_learn

    rows = [(1, "ab ab"), (2, "ab"), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe_learn(df, num_merges=8)
    assert len(merges) < 8  # the early-stop regime this test pins
    got = {
        r.doc_id: r.n_bpe_merged_tokens
        for r in bpe_apply_merges(df, merges).collect()
    }
    assert got == {1: 2, 2: 1, 3: 0}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(doc_id, text)"
    )
    want = {
        int(i): int(n)
        for i, n in con.execute(
            QUERIES["bpe_apply_merges"].oracle
        ).fetchall()
    }
    assert want == got


def test_domain_upsample_oracle_drops_zero_token_source(spark):
    """A token-less source has weight NULL: the Spark operator
    coalesces it to 0 and emits nothing, and the oracle must match —
    DuckDB's LEAST SKIPS NULLs, so without the COALESCE guard the
    NULL weight would cap to 3.0 and upsample the dead domain 3x."""
    import duckdb

    from transporter_spark.operators.sampling import (
        mix_weights,
        upsample_to_mix,
    )
    from transporter_spark.operators.text import token_count
    from pyspark.sql import functions as F

    # src0 has real tokens; src10 exists but is all-whitespace
    rows = [(i, "alpha beta gamma", "src0") for i in range(6)] + [
        (100 + i, "   ", "src10") for i in range(3)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"]).withColumn(
        "n_tok", token_count("text")
    )
    from transporter_spark.queries import _MIX_TARGET

    w = mix_weights(df, _MIX_TARGET, by="source", size_col="n_tok")
    got = sorted(
        (r.doc_id, r.copy)
        for r in upsample_to_mix(
            df.select("doc_id", "source"), w, by="source",
            key="doc_id", max_epochs=3,
        ).collect()
    )
    assert all(d < 100 for d, _ in got)  # src10 emits NOTHING

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}', '{s}')" for i, t, s in rows)
        + ") v(doc_id, text, source)"
    )
    want = sorted(
        (int(i), int(c))
        for i, _s, c in con.execute(
            QUERIES["domain_upsample"].oracle
        ).fetchall()
    )
    assert want == got


def test_unigram_encode_oracle_refactor_identity():
    """unigram_encode_oracle was refactored into the shared
    unigram_encode_ctes (so the pack composition can reuse the chain);
    the emitted default string must stay byte-identical to the
    pre-refactor literal (the r9 exemption rule). Structural pin: the
    pack oracle embeds the SAME chain plus the cumsum/chunk tail."""
    from transporter_spark.operators.unigram import (
        unigram_encode_ctes,
        unigram_encode_oracle,
        unigram_pack_oracle,
    )

    enc = unigram_encode_oracle()
    assert enc == (
        "\nWITH "
        + unigram_encode_ctes()
        + "\nSELECT doc_id, count(*)::BIGINT AS n_tokens,\n"
        "       array_to_string(list(token_id ORDER BY tok_idx), '-') "
        "AS token_ids\nFROM ugids GROUP BY doc_id ORDER BY doc_id\n"
    )
    pack = unigram_pack_oracle(seq_len=512)
    assert pack.startswith("\nWITH " + unigram_encode_ctes())
    assert "gpos // 512" in pack and "upcnt AS (" in pack


def test_ingest_2epoch_builder_rewires_membership_not_bound():
    """The r13 corpus param on _ingest_dedup_2epoch_oracle rewires
    dedup PARTICIPATION (shingles/pairs/closure membership) to the
    gated subset while the chunk BOUND stays on raw documents — the
    drain harness splits the raw table, the gate runs inside each
    epoch. The default must emit the same text the parameterization
    was extracted from (the r9 exemption rule: corpus='documents' is
    the identity)."""
    from transporter_spark.queries.llm_pipeline import (
        _ingest_dedup_2epoch_oracle,
    )

    default = _ingest_dedup_2epoch_oracle()
    gated = _ingest_dedup_2epoch_oracle(corpus="gated_docs")
    assert default == _ingest_dedup_2epoch_oracle(corpus="documents")
    # bound AND chunk tags on the raw table in BOTH variants
    for o in (default, gated):
        assert "quantile_cont(doc_id, 0.5) AS b FROM documents" in o
        assert "FROM documents, chunkb" in o
    # corpus-membership × chunk (dcorp) and the shingle chain on the
    # gated subset; closure seeds come from dcorp, never raw dchunk
    assert "FROM gated_docs c" in gated
    assert "FROM documents c" in default
    shingle_part = gated.split("FROM documents, chunkb),", 1)[1].split(
        "dcorp AS"
    )[0]
    assert "FROM gated_docs" in shingle_part
    assert "FROM documents" not in shingle_part
    assert "FROM dcorp WHERE chunk = 0" in default
    # pre_ctes land between dchunk and the shingle chain
    wrapped = _ingest_dedup_2epoch_oracle(
        corpus="g9", pre_ctes="g9 AS (SELECT doc_id, text FROM documents)"
    )
    body = wrapped.split("dchunk AS")[1]
    assert body.index("g9 AS (SELECT") < body.index("sh AS")
    # the registered curation composition carries the STRUCTURAL
    # invariants (not just builder == builder, which is tautological):
    # gate CTEs land between dchunk and the shingle chain, dedup
    # membership is rewired to the gated subset, and the bound stays
    # raw — a splice regression in any of these fails here
    from transporter_spark.queries import QUERIES

    cur = QUERIES["stream_curation_2epoch"].oracle
    assert "gated_docs AS MATERIALIZED" in cur
    assert "FROM gated_docs c" in cur  # dcorp membership on the gate
    assert "quantile_cont(doc_id, 0.5) AS b FROM documents" in cur
    tail = cur.split("FROM documents, chunkb),", 1)[1]
    assert tail.index("gated_docs AS MATERIALIZED") < tail.index("sh AS")
    assert "FROM dcorp WHERE chunk = 0" in cur


def test_curation_full_2epoch_gate_copies_are_identical():
    """q_stream_curation_full_2epoch deliberately duplicates
    q_stream_curation_full's full_gate closure VERBATIM (extracting a
    shared helper would change the r12-green query's executed code
    and burn a rotation slot — fold together when it next rotates).
    The 2-epoch grade only reflects the single-epoch gate semantics
    while the copies stay identical; pin them structurally (AST dump
    with positions stripped) so a fix applied to one copy cannot
    silently diverge the other."""
    import ast
    import inspect

    from transporter_spark.queries import sketches

    def gate_ast(fn):
        tree = ast.parse(inspect.getsource(fn))
        gates = [
            n
            for n in ast.walk(tree)
            if isinstance(n, ast.FunctionDef) and n.name == "full_gate"
        ]
        assert len(gates) == 1
        return ast.dump(gates[0], include_attributes=False)

    assert gate_ast(sketches.q_stream_curation_full) == gate_ast(
        sketches.q_stream_curation_full_2epoch
    )


def test_ingest_2epoch_chain_kept_set_diverges_from_batch(duck):
    """VERDICT r13 item 5: the seeded A~B, B~C, A≁C triple makes the
    2-epoch kept SET discriminate the cross-epoch kept-only index path
    from the batch closure — B is dropped in epoch 0 and never
    persisted, so C (id 10^10, chunk 1) keeps under streaming while
    the batch closure drops it through the A-B-C component. Pins the
    exact symmetric difference at sf0.01: {10^10}, one direction."""
    from transporter_spark.queries.llm_pipeline import _chain_corpus_cte
    from transporter_spark.queries import QUERIES

    two = {
        r[0]
        for r in duck.execute(
            QUERIES["stream_ingest_dedup_2epoch_chain"].oracle
        ).fetchall()
    }
    base = QUERIES["stream_ingest_dedup"].oracle.lstrip()
    assert base.startswith("WITH RECURSIVE")
    rest = (
        base[len("WITH RECURSIVE"):]
        .lstrip()
        .replace("FROM documents", "FROM chaincorp")
    )
    batch_sql = "WITH RECURSIVE " + _chain_corpus_cte() + ",\n" + rest
    batch = {r[0] for r in duck.execute(batch_sql).fetchall()}
    assert two - batch == {10_000_000_000}
    assert batch - two == set()


def test_ingest_2epoch_chain_builder_params_identity():
    """chunk_source/head_ctes (r14) default to the identity: the
    emitted default string is byte-identical to the r13 graded oracle
    (covered transitively by the default == corpus='documents' pin
    above), and the chain variant rewires BOTH the bound and the
    membership to the augmented corpus while the head CTE lands
    before chunkb."""
    from transporter_spark.queries.llm_pipeline import (
        _chain_corpus_cte,
        _ingest_dedup_2epoch_oracle,
    )

    default = _ingest_dedup_2epoch_oracle()
    assert default == _ingest_dedup_2epoch_oracle(
        chunk_source="documents", head_ctes=""
    )
    chain = _ingest_dedup_2epoch_oracle(
        corpus="chaincorp",
        chunk_source="chaincorp",
        head_ctes=_chain_corpus_cte(),
    )
    assert "quantile_cont(doc_id, 0.5) AS b FROM chaincorp" in chain
    assert "FROM chaincorp, chunkb" in chain
    assert chain.index("chaincorp AS MATERIALIZED") < chain.index(
        "chunkb AS"
    )
    # chain texts are single-quote-free (inlined as SQL literals)
    from transporter_spark.queries.llm_pipeline import _chain_docs

    assert all("'" not in t for _, t in _chain_docs())


def test_kmeans_refresh_2epoch_diverges_from_fixed_centroids(duck):
    """The refresh grade must discriminate the feedback path: at
    sf0.01 ZERO rows of the seeded-fold oracle match the
    fixed-centroid batch oracle (the refresh moves chunk-1 vectors
    across cells), so an engine that ignored the epoch-0 evidence
    when assigning epoch 1 cannot hash-match."""
    from transporter_spark.queries import QUERIES

    ref = set(
        map(
            tuple,
            duck.execute(
                QUERIES["stream_kmeans_refresh_2epoch"].oracle
            ).fetchall(),
        )
    )
    fix = set(
        map(tuple, duck.execute(QUERIES["kmeans_update"].oracle).fetchall())
    )
    assert len(ref) == len(fix) == 256
    assert not (ref & fix)
