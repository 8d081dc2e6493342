#!/usr/bin/env python3
"""BENCH_FLOORS adjudication run: min-of-12 (after a per-query warm
pass) for the queries named on the command line, controls first.

Usage: python scripts/adjudicate_floors.py [query ...]
Defaults to the r12 above-control-band flag set plus the two controls.
Prints one line per query: name, min, full sequence.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transporter_spark.queries import QUERIES  # noqa: E402
from transporter_spark.session import get_spark  # noqa: E402

DEFAULT = [
    # controls first (same-session band reference)
    "q1_pricing_summary",
    "dedup_exact",
    # the 8 r12 above-control-band flags (VERDICT r12 item 2)
    "ann_cosine_topk",
    "asof_join",
    "curation_pipeline",
    "balanced_shards",
    "ddsketch_quantiles",
    "gopher_quality_gate",
    "semantic_decontaminate",
    "dsir_select",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    names = sys.argv[1:] or DEFAULT
    runs = int(os.environ.get("SPARK_GRAFT_ADJ_RUNS", "12"))

    spark = get_spark("transporter-spark-adjudicate")
    t0 = time.time()
    QUERIES["q1_pricing_summary"].fn(spark, sf_dir).collect()
    print(f"warmup {time.time() - t0:.2f}s", flush=True)

    for name in names:
        fn = QUERIES[name].fn
        fn(spark, sf_dir).count()  # per-query warm pass, untimed
        seq = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).count()
            seq.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(seq):.3f} seq={seq}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
