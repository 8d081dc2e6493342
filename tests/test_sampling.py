"""cap_per_group / deterministic_shuffle: determinism and scale-shape
guarantees (reproducible selection across partitionings; no global
single-partition sort)."""

from __future__ import annotations

import pyspark.sql.functions as F

from transporter_spark.operators.sampling import cap_per_group, deterministic_shuffle
from transporter_spark.sources.files import read_table
from tests.test_plans import explain_str


def test_cap_per_group_enforces_cap_and_determinism(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = cap_per_group(docs, "source", "doc_id", 7)
    per_group = out.groupBy("source").count().collect()
    assert all(r["count"] <= 7 for r in per_group)
    # same selection regardless of input partitioning
    a = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in cap_per_group(docs.repartition(17), "source", "doc_id", 7)
        .select("doc_id")
        .collect()
    )
    assert a == b


def test_deterministic_shuffle_is_a_permutation(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    out = deterministic_shuffle(docs, "doc_id")
    assert out.count() == n
    # (shard, pos) is unique -> a total read order
    assert out.select("shard", "pos").distinct().count() == n
    # reproducible across partitionings
    a = sorted(map(tuple, out.select("doc_id", "shard", "pos").collect()))
    b = sorted(
        map(
            tuple,
            deterministic_shuffle(docs.repartition(11), "doc_id")
            .select("doc_id", "shard", "pos")
            .collect(),
        )
    )
    assert a == b


def test_deterministic_shuffle_no_single_partition_exchange(spark, sf_dir):
    """The scale property: ranking is per-shard (hash exchange), never
    a global sort / SinglePartition funnel like ORDER BY rand()."""
    docs = read_table(spark, sf_dir, "documents")
    plan = explain_str(deterministic_shuffle(docs, "doc_id"))
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(shard" in plan
