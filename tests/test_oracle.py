"""Differential oracle: every graded query vs DuckDB, value-for-value.

Mirrors the driver's CORRECTNESS gate (rows + schema-name + sorted
value comparison) so mismatches are caught locally before a round ends.
Runs at sf0.001 by default (set SPARK_GRAFT_TEST_SF_DIR for bigger).
"""

from __future__ import annotations

import math

import pytest

from transporter_spark.queries import QUERIES


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # shortest-roundtrip repr: bit-exact comparison, same strictness
        # as the driver's value hash (output policy is decimal-exact
        # sums cast to double, so both engines emit identical doubles)
        return repr(v)
    # decimals, timestamps, dates, strings, ints -> canonical string
    return str(v)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    out.sort()
    return out


ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_duckdb(name, spark, duck, sf_dir):
    query = QUERIES[name]
    sdf = query.fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    rel = duck.sql(query.oracle)
    duck_rows = rel.fetchall()
    duck_cols = rel.columns

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s, d = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(name, spark, sf_dir):
    sdf = QUERIES[name].fn(spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0
