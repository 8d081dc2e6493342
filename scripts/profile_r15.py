#!/usr/bin/env python3
"""Per-query profiling harness for the r15 optimization round.

Runs one named query (bench methodology: warm pass, then timed .count())
with the Spark UI enabled, and prints:
  - wall time per run
  - top stages by executor run time (from the REST status API)
  - the executed SQL plan node metrics for the slowest execution

Usage: python scripts/profile_r15.py <query_name> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transporter_spark.queries import QUERIES  # noqa: E402
from transporter_spark.session import get_spark  # noqa: E402


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    spark = get_spark(
        "transporter-spark-profile",
        **{"spark.ui.enabled": "true", "spark.ui.port": "4047"},
    )
    q = QUERIES[name]

    # warm: JIT/codegen spin-up (two passes, like the bench's discipline)
    for _ in range(2):
        q.fn(spark, sf_dir).count()

    base = "http://localhost:4047/api/v1/applications"
    app = _get(base)[0]["id"]

    stages_before = {s["stageId"] for s in _get(f"{base}/{app}/stages")}

    times = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"profile:{name}:run{i}")
        t0 = time.time()
        n = q.fn(spark, sf_dir).count()
        times.append(time.time() - t0)
    print(f"\n=== {name}: rows={n} times={[round(t, 2) for t in times]} "
          f"min={min(times):.2f}s ===")

    stages = [
        s for s in _get(f"{base}/{app}/stages?status=complete")
        if s["stageId"] not in stages_before
    ]
    # only the LAST run's share: divide by runs when reading absolute totals
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(f"\ntop stages by executorRunTime (all {runs} runs summed; "
          f"{len(stages)} new stages = {len(stages)/runs:.0f}/run):")
    for s in stages[:18]:
        sub = s.get("submissionTime"); comp = s.get("completionTime")
        print(
            f"  run={s['executorRunTime']/1000:7.2f}s cpu={s.get('executorCpuTime',0)/1e9:7.2f}s "
            f"gc={s.get('jvmGcTime',0)/1000:5.2f}s "
            f"tasks={s['numCompleteTasks']:4d} "
            f"in={s.get('inputBytes',0)>>20:4d}MB sh_r={s.get('shuffleReadBytes',0)>>20:3d}MB "
            f"sh_w={s.get('shuffleWriteBytes',0)>>20:3d}MB  {s['name'][:60]}"
        )
    wall = sum(
        (s["completionTime"] is not None) and 1 or 0 for s in stages
    )
    total_run = sum(s.get("executorRunTime", 0) for s in stages) / 1000
    print(f"\nstage count {len(stages)} ({wall} complete), "
          f"executorRunTime total {total_run:.1f}s over {runs} runs "
          f"(/32 cores = {total_run/32:.2f}s ideal wall per-suite)")

    # SQL executions: find the heaviest and dump node metrics
    try:
        sqls = _get(f"{base}/{app}/sql?length=200")
        sqls = [s for s in sqls if s.get("status") == "COMPLETED"]
        sqls.sort(key=lambda s: -(s.get("duration") or 0))
        for s in sqls[:3]:
            print(f"\nSQL exec {s['id']} duration={s['duration']/1000:.2f}s "
                  f"desc={s['description'][:60]}")
            detail = _get(f"{base}/{app}/sql/{s['id']}?details=true&planDescription=false")
            nodes = detail.get("nodes", [])
            for nd in nodes:
                mets = {m["name"]: m["value"] for m in nd.get("metrics", [])}
                interesting = {
                    k: v for k, v in mets.items()
                    if any(t in k for t in ("time", "rows", "spill"))
                }
                if interesting:
                    line = ", ".join(f"{k}={v}" for k, v in list(interesting.items())[:4])
                    print(f"    [{nd['nodeId']:3d}] {nd['nodeName'][:40]:40s} {line[:110]}")
    except Exception as e:  # pragma: no cover
        print(f"(sql detail unavailable: {e})")

    spark.stop()


if __name__ == "__main__":
    main()
