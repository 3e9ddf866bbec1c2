#!/usr/bin/env python
"""Per-stage profile of registered queries: run warm, bracket a second run
with AppStatusStore snapshots, and print each new stage's executor time,
task count and shuffle bytes — the stage-level evidence the optimization
rounds use to attribute a query's cost (guide §1/§7.1 without the UI).

Usage: python scripts/profile_query.py <query> [query ...]
"""
from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from barberini_analytics_spark.core.session import get_spark  # noqa: E402
from barberini_analytics_spark.plans import QUERIES  # noqa: E402


def stage_rows(spark) -> dict[int, dict]:
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    empty_status = sc._jvm.java.util.ArrayList()
    empty_summaries = sc._jvm.java.util.ArrayList()
    no_quantiles = sc._gateway.new_array(sc._jvm.double, 0)
    stages = store.stageList(empty_status, False, False, no_quantiles,
                             empty_summaries)
    out = {}
    for i in range(stages.size()):
        s = stages.apply(i)
        key = (s.stageId(), s.attemptId())
        out[key] = {
            "name": s.name(),
            "run_ms": s.executorRunTime(),
            "cpu_ms": s.executorCpuTime() // 1_000_000,
            "tasks": s.numCompleteTasks(),
            "shuffle_w": s.shuffleWriteBytes(),
            "input": s.inputBytes(),
        }
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    for name in sys.argv[1:]:
        # warm: JIT + any scoped persists of a first construction
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        cold = time.perf_counter() - t0
        before = stage_rows(spark)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        warm = time.perf_counter() - t0
        after = stage_rows(spark)
        new = {k: v for k, v in after.items() if k not in before}
        tot_run = sum(v["run_ms"] for v in new.values())
        print(f"\n=== {name}: cold {cold:.2f}s warm {warm:.2f}s, "
              f"{len(new)} stages, executor {tot_run/1000:.1f}s ===")
        for k, v in sorted(new.items(), key=lambda kv: -kv[1]["run_ms"])[:14]:
            print(f"  run={v['run_ms']/1000:7.2f}s cpu={v['cpu_ms']/1000:7.2f}s "
                  f"tasks={v['tasks']:4d} shW={v['shuffle_w']/1e6:8.2f}MB "
                  f"in={v['input']/1e6:7.1f}MB  {v['name'][:70]}")


if __name__ == "__main__":
    main()
