"""File sources: parquet / JSON-lines / CSV.

Parity: the reference file adaptor JSON-decodes one file line by line
(adaptor/file/reader.go:25-71). Spark-side a file source is a distributed
scan with schema inference or an explicit schema, and — unlike the
reference — filters/projections push down into the scan.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession

#: the driver's synthetic star schema (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_ts_columns(path: str):
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark has no nanos
    timestamp type, so these are read as long (nanosAsLong) and converted
    to microsecond timestamps. Metadata-only peek, no data read; handles
    both single-file and directory-style parquet."""
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        if not parts:
            return []
        probe = os.path.join(path, parts[0])
    # Check the PARQUET (not arrow) schema: Spark-written INT96
    # timestamps also surface as timestamp[ns] in arrow, but Spark
    # reads INT96 natively — nanosAsLong only applies to INT64
    # TIMESTAMP(NANOS) columns, so only those may be converted.
    schema = pq.ParquetFile(probe).schema
    out = []
    for i in range(len(schema)):
        col = schema.column(i)
        lt = str(col.logical_type)
        if (
            col.physical_type == "INT64"
            and "Timestamp" in lt
            and "nanoseconds" in lt
        ):
            out.append(col.name)
    return out


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Plain parquet scan — Catalyst handles
    predicate pushdown / column pruning / partition sizing
    (spark.sql.files.maxPartitionBytes) from here."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_ts_columns(path)
    if not nanos_cols:
        return spark.read.parquet(path)
    # ns-precision parquet timestamps: read raw nanos, truncate to micros
    # (matches DuckDB's ns->us truncation). Integer `div`, not `/` —
    # epoch-nanos exceed 2^53 and would lose precision as double.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: Optional[Iterable[str]] = None,
    register_views: bool = False,
) -> Dict[str, DataFrame]:
    out = {}
    for name in names or TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source (the reference's file adaptor format)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (reference adaptor/file/writer.go:21-35)."""
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key,
    buckets: int = 32,
    sorted_by: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    The co-located-join primitive for repeated big-big joins: two tables
    bucketed on their join keys with the same bucket count join with
    ZERO shuffle exchanges (SortMergeJoin reads bucket i against bucket
    i directly — pinned in tests/test_plans.py). At 100TB this converts
    every recurring fact-fact join from a full-network shuffle into a
    local merge; the one-time bucketing write is the amortized cost.
    Uses the session catalog (`saveAsTable`) — set
    spark.sql.warehouse.dir appropriately on a cluster.

    key may be a single column name or a list (composite bucket keys —
    e.g. the LSH band index buckets on (band, bsig)).
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.bucketBy(buckets, *keys)
    if sorted_by is not None:
        writer = writer.sortBy(sorted_by)
    writer.mode(mode).format("parquet").saveAsTable(table)
