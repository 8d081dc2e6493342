"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct —
the engine moves/filters/batches them at scale; decoding happens in
Arrow-batched ``mapInPandas`` stages at the edge.

The decode step itself is STUBBED in this environment (no PIL/ffmpeg in
the container): ``decode_image(..., fake=True)`` produces a
deterministic fake feature vector from the raw bytes so the Spark-side
plumbing — schema, batch shape, partition sizing — is real and tested;
``fake=False`` raises NotImplementedError where a real codec would run.

Scale notes: binary payloads make rows wide, so the operators here
repartition by byte budget (``target_rows_per_batch``) before the
Python stage, and Arrow batch size is capped in session conf
(spark.sql.execution.arrow.maxRecordsPerBatch) so a batch of 4K images
doesn't materialize gigabytes per task.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transporter_spark.registry import register

#: canonical multimodal schema fragment
MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def attach_media(
    df: DataFrame, binary_col: str, media_format: str, **meta_literals
) -> DataFrame:
    """Wrap a binary column with the canonical metadata struct."""
    fields = []
    for f in MEDIA_META.fields:
        if f.name == "format":
            fields.append(F.lit(media_format).alias("format"))
        elif f.name in meta_literals:
            fields.append(F.lit(meta_literals[f.name]).cast(f.dataType).alias(f.name))
        else:
            fields.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.withColumn("media", F.struct(F.col(binary_col).alias("content"), *fields))


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "media.content",
    fake: bool = True,
) -> DataFrame:
    """Decode + featurize media content via Arrow-batched mapInPandas.

    With fake=True (this container), the featurizer is a deterministic
    byte-histogram stand-in, so tests pin exact values. With fake=False
    this is where PIL/torchaudio/ffmpeg decode would run per Arrow batch.

    The worker closure is fully self-contained: cloudpickle serializes
    module-level references by import path, which breaks on executors
    without this repo on PYTHONPATH — nested defs pickle by value.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def featurize(buf: bytes) -> list:
            if not buf:
                return [0.0] * 8
            n = len(buf)
            return [
                float(n),
                sum(buf) / n,
                float(max(buf)),
                float(min(buf)),
                float(buf[0]),
                float(buf[-1]),
                float(sum(1 for x in buf if x > 127)) / n,
                float(sum(1 for x in buf if x == 0)) / n,
            ]

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding unavailable in this environment; "
                    "install codec libs and pass fake=False with them present"
                )
            feats = [featurize(b if b is not None else b"") for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"].astype("int64"),
                    "byte_len": [len(b) if b is not None else 0 for b in pdf["content"]],
                    "features": feats,
                }
            )

    staged = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content")
    )
    return staged.mapInPandas(run, schema=_DECODE_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
    content_col: str = "media.content",
) -> DataFrame:
    """Video frame sampling, stubbed: emits one row per sampled "frame"
    (fixed-size byte slices standing in for decoded frames). The 1->N
    row expansion through mapInPandas is the real contract a video
    pipeline needs; only the slicing is fake."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "frame": []}
            for i, buf in zip(pdf["id"], pdf["content"]):
                buf = buf or b""
                chunk = max(1, len(buf) // max(1, every_n))
                for fn, start in enumerate(range(0, len(buf), chunk * every_n)):
                    out["doc_id"].append(int(i))
                    out["frame_no"].append(fn)
                    out["frame"].append(bytes(buf[start : start + chunk]))
            yield pd.DataFrame(out)

    staged = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    return staged.mapInPandas(run, schema=schema)


def resize_media(
    df: DataFrame,
    target_len: int = 64,
    id_col: str = "doc_id",
    content_col: str = "media.content",
    fake: bool = True,
) -> DataFrame:
    """Media resize, stubbed: nearest-neighbor downsampling of the raw
    byte signal to ``target_len`` bytes (out[i] = buf[i*n//T]) — the
    deterministic 1-D stand-in for an image resize kernel. With
    fake=False this is where a real PIL/ffmpeg scaler would run per
    Arrow batch; the Spark contract (1:1 row mapping, binary in/out,
    batch shape) is identical either way."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("orig_len", T.LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media resizing unavailable in this environment; "
                    "install codec libs and pass fake=False with them present"
                )
            out = {"doc_id": [], "resized": [], "orig_len": []}
            for i, buf in zip(pdf["id"], pdf["content"]):
                buf = buf or b""
                n = len(buf)
                resized = (
                    bytes(buf[(j * n) // target_len] for j in range(target_len))
                    if n
                    else b""
                )
                out["doc_id"].append(int(i))
                out["resized"].append(resized)
                out["orig_len"].append(n)
            yield pd.DataFrame(out)

    staged = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    return staged.mapInPandas(run, schema=schema)


@register("media_features")
def media_features(fake: bool = True) -> Callable[[DataFrame], DataFrame]:
    def apply(df: DataFrame) -> DataFrame:
        return decode_features(df, fake=fake)

    return apply


# ---------------------------------------------------------------------------
# perceptual-hash (dHash) image near-dedup
# ---------------------------------------------------------------------------
#
# The standard first pass over any multimodal corpus: re-encoded /
# slightly-edited copies of an image survive exact (byte-hash) dedup,
# but their difference-hash — resample the signal to bits+1 samples,
# bit j = sample[j] > sample[j+1] (Krawetz's public dHash) — lands
# within a small Hamming radius. The "decode + downscale" step here is
# the SAME deterministic fake the rest of this module uses (the
# `resize_media` nearest-neighbor rule over the raw byte signal,
# sample[j] = byte[(j*n) div (bits+1)]), computed in pure JVM-side SQL
# expressions — zero Python, one projection, SQL-replayable by the
# DuckDB oracle. With real codecs the sampling row below is the only
# thing that changes (grayscale pixels instead of raw bytes); the
# banding, candidate join, verification, and clustering are identical.
#
# dHash is robust to LOCAL edits (a changed region moves only the
# samples inside it) but not to content shifts/crops — by design: the
# nearest-neighbor resample is position-anchored, like the real
# algorithm's grid. Candidate generation reuses the SimHash pigeonhole
# banding (operators/dedup.band_fingerprint): bands > max_hamming
# guarantees every within-radius pair shares an exact chunk, so the
# candidate join is a (band, chunk) equi-join — never all-pairs.


def image_phash(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    bits: int = 32,
    with_len: bool = False,
) -> DataFrame:
    """(id, phash) — dHash fingerprint of a binary media column.

    bits+1 nearest-neighbor samples of the byte signal (the
    `resize_media` rule), bit j set iff sample j > sample j+1; the
    fingerprint stays non-negative in a BIGINT (bits <= 62 enforced —
    the sketch family's sign-bit discipline). NULL/empty content
    hashes to 0. All arithmetic is integer and engine-exact: byte
    values come from hex()+conv() (both engines agree), positions from
    non-negative integer division (Spark `div` == DuckDB `//` on
    non-negatives).

    ``with_len=True`` appends byte_len (octet_length of the content,
    0 for NULL) — it rides the projection this pass already stages,
    so consumers that need a size proxy (`image_phash_dedup`'s
    canonical argmax) never scan the blobs a second time.

    100 TB shape: one projection over the media scan — no shuffle, no
    Python, no decode round-trip; the fingerprint table is ~16 bytes a
    row versus the megabyte-scale blobs it stands for."""
    if not 1 <= bits <= 62:
        raise ValueError(f"bits must be in [1, 62], got {bits}")
    n_samples = bits + 1
    content = F.coalesce(F.col(content_col), F.lit(b""))
    staged = df.select(
        F.col(id_col).alias("id"),
        F.hex(content).alias("_hx"),
        F.octet_length(content).cast("long").alias("_n"),
    )

    def sample(j: int):
        pos = f"cast(({j} * _n) div {n_samples} as int) * 2 + 1"
        return F.when(F.col("_n") == 0, F.lit(0).cast("long")).otherwise(
            F.conv(F.expr(f"substr(_hx, {pos}, 2)"), 16, 10).cast("long")
        )

    smp = staged.select(
        "id",
        F.array(*[sample(j) for j in range(n_samples)]).alias("_s"),
        F.col("_n").alias("byte_len"),
    )
    acc = F.lit(0).cast("long")
    for j in range(bits):
        acc = acc + F.when(
            F.col("_s")[j] > F.col("_s")[j + 1], F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    cols = ["id", acc.alias("phash")] + (
        [F.col("byte_len")] if with_len else []
    )
    return smp.select(*cols)


def phash_index(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
) -> DataFrame:
    """(id, phash, band, chunk) — the banded pHash table, the
    persistable index state of image near-dedup (write bucketed by
    (band, chunk) at scale and ingest batches probe it without
    re-hashing the corpus, exactly like `simhash_index`). The
    bits/bands divisibility guard lives in the shared
    `band_fingerprint` (one banding, one guard)."""
    from transporter_spark.operators.dedup import band_fingerprint

    return band_fingerprint(
        image_phash(df, content_col, id_col, bits), "phash", bits, bands
    )


def _phash_pairs_from_fp(
    ph: DataFrame, bits: int, max_hamming: int, bands: int
) -> DataFrame:
    """Banded Hamming-near pairs from an (id, phash[, ...]) table —
    the shared candidate+verify core of `image_phash_pairs` and
    `image_phash_dedup`, delegating to the ONE banding + candidate
    definition in operators/dedup (band_fingerprint +
    banded_hamming_pairs — same join, same guards as the SimHash text
    path)."""
    from transporter_spark.operators.dedup import (
        band_fingerprint,
        banded_hamming_pairs,
    )

    banded = band_fingerprint(ph.select("id", "phash"), "phash", bits, bands)
    return banded_hamming_pairs(banded, "phash", max_hamming, bands)


def image_phash_pairs(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate image pairs: (id_a < id_b, hamming) for every
    pair within `max_hamming` bits. Pigeonhole banding (bands >
    max_hamming, complete recall) feeds a (band, chunk) equi-join;
    verification is bit_count(xor) over the two fingerprints the
    banded table already carries — content bytes are never touched
    after the one fingerprint projection, which is materialized
    (localCheckpoint, the `simhash_index` discipline) so the
    expression-heavy 33-sample tree isn't re-planned and re-executed
    on both branches of the self-join."""
    from transporter_spark.operators.dedup import (
        _materialize,
        check_banding,
    )

    check_banding(bits, bands, max_hamming)  # before the eager job
    fp = _materialize(image_phash(df, content_col, id_col, bits))
    return _phash_pairs_from_fp(fp, bits, max_hamming, bands)


def incremental_phash_pairs(
    new_images: DataFrame,
    index: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    bands: int = 4,
    new_banded: Optional[DataFrame] = None,
) -> DataFrame:
    """Hamming-near image pairs for an INGEST BATCH against a
    persisted `phash_index` — the image twin of
    `incremental_simhash_pairs`, sharing the ONE batch-vs-index
    candidate core (dedup.incremental_banded_hamming_pairs): only the
    batch's blobs are fingerprinted, candidates come from the
    (band, chunk) equi-join against the index, verification is
    bit_count(xor) over fingerprints both tables already carry —
    corpus CONTENT is never read at any stage. Pigeonhole recall is
    exact (bands > max_hamming), so the result equals the full-corpus
    `image_phash_pairs` restricted to pairs touching a batch doc.

    Returns (id_a < id_b, hamming). Disjoint ids assumed — run the id
    re-delivery guard first, as the continuous sink
    (streaming/media.py) does. Append `new_banded` to the index after
    commit."""
    from transporter_spark.operators.dedup import (
        _materialize,
        check_banding,
        incremental_banded_hamming_pairs,
    )

    check_banding(bits, bands, max_hamming)
    if new_banded is None:
        new_banded = _materialize(
            phash_index(new_images, content_col, id_col, bits, bands)
        )
    return incremental_banded_hamming_pairs(
        new_banded, index, "phash", max_hamming, bands
    )


def image_phash_dedup(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    bands: int = 4,
    max_iter: int = 20,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Full perceptual image dedup decision: dHash -> banded Hamming
    pairs -> connected components -> keep each cluster's LARGEST copy
    (byte length as the resolution proxy — the `dedup_canonical_best`
    argmax-by-quality policy; ties to the smallest id so the choice
    is total). Returns (id, phash, byte_len, component, is_canonical)
    for every row; singleton clusters keep their only member.

    Pair-level radii alone under-merge (A~B, B~C within radius but
    A!~C must still be ONE group); the component step closes that,
    same as the text `dedup_clusters`. Scale shape: fingerprints are
    16 B/doc, candidates come from the banded equi-join (never
    all-pairs — plan-pinned), CC rounds ∝ cluster diameter, and the
    canonical argmax is one (id, component, byte_len) shuffle plus a
    rank window over star-shaped (small) partitions."""
    from transporter_spark.operators.dedup import (
        check_banding,
        connected_components,
    )

    check_banding(bits, bands, max_hamming)  # before the persist job
    # ONE fingerprint pass (byte_len rides the same staged projection)
    # feeds the banded pairs, the CC vertex set, AND the output's
    # size-proxy column — persisted because Spark plans no CSE across
    # join branches (the r7 broadcast-reuse lesson); the content blobs
    # are scanned exactly once
    ph = image_phash(df, content_col, id_col, bits, with_len=True).persist()
    pairs = _phash_pairs_from_fp(ph, bits, max_hamming, bands)
    comp = connected_components(
        pairs.select("id_a", "id_b"),
        ph.select("id"),
        max_iter=max_iter,
        reliable_checkpoint=reliable_checkpoint,
    )
    joined = comp.join(ph, "id")
    w = Window.partitionBy("component").orderBy(
        F.desc("byte_len"), F.asc("id")
    )
    out = joined.select(
        "id",
        "phash",
        "byte_len",
        "component",
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )
    from transporter_spark.operators.dedup import _attach_cached

    return _attach_cached(out, ph)


def phash_oracle_ctes(
    source_table: str,
    content_sql: str,
    id_sql: str,
    bits: int = 32,
) -> str:
    """DuckDB CTE block replaying `image_phash` (ends in CTE `ph`:
    one (doc_id, phash) row per source row). Shares the geometry
    constants with the operator through this one builder — the
    sketch-family discipline: never duplicate estimator constants."""
    s = bits + 1
    return f"""
phb AS MATERIALIZED (
  SELECT {id_sql} AS doc_id,
         hex(COALESCE({content_sql}, ''::BLOB)) AS hx,
         octet_length(COALESCE({content_sql}, ''::BLOB))::BIGINT AS n
  FROM {source_table}),
phsmp AS (
  SELECT doc_id, j,
         CASE WHEN n = 0 THEN 0
              ELSE CAST(('0x' || substr(hx, CAST((j*n)//{s} AS BIGINT)*2 + 1, 2))::UBIGINT AS BIGINT)
         END AS s1,
         CASE WHEN n = 0 THEN 0
              ELSE CAST(('0x' || substr(hx, CAST(((j+1)*n)//{s} AS BIGINT)*2 + 1, 2))::UBIGINT AS BIGINT)
         END AS s2
  FROM phb CROSS JOIN (SELECT unnest(generate_series(0, {bits - 1})) AS j)),
ph AS MATERIALIZED (
  SELECT doc_id,
         CAST(COALESCE(SUM(CASE WHEN s1 > s2 THEN (1::BIGINT << j) ELSE 0 END), 0) AS BIGINT) AS phash
  FROM phsmp GROUP BY doc_id)"""
