#!/usr/bin/env python3
"""Snapshot query results + explain('formatted') for before/after
equivalence checks during the optimization rounds.

Usage: python scripts/snapshot_results.py <outdir> <query> [<query>...]
Writes <outdir>/<query>.hash (sha256 of the sorted collected rows,
repr-normalized) and <outdir>/<query>.explain.txt.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transporter_spark.queries import QUERIES  # noqa: E402
from transporter_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("transporter-spark-snapshot")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        rows = df.collect()
        # deterministic row order independent of the query's own ordering
        canon = sorted(repr(tuple(r)) for r in rows)
        h = hashlib.sha256("\n".join(canon).encode()).hexdigest()
        with open(os.path.join(outdir, f"{name}.hash"), "w") as f:
            f.write(f"{h} rows={len(rows)} cols={df.columns}\n")
        with open(os.path.join(outdir, f"{name}.explain.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"{name}: rows={len(rows)} {h[:16]}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
