"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full graded inventory from
``transporter_spark.queries`` (one entry per SURVEY.md §2 operator /
capability, each with a DuckDB oracle unless non-SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from transporter_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: query.fn for name, query in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: query.oracle for name, query in QUERIES.items() if query.oracle
    }
