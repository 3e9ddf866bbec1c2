#!/usr/bin/env python
"""Capture .explain("formatted") for every registered query into
plans/$BA_PLANS_ROUND/<query>_<tag>.txt (default round "r14") — the
optimization round's plan evidence.

Usage: python scripts/capture_plans.py <tag> [query ...]
  tag    suffix for the files (e.g. "before", "after")
  query  optional subset; default = all registered queries
"""
from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from barberini_analytics_spark.core.session import get_spark  # noqa: E402
from barberini_analytics_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or sorted(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(HERE, "plans",
                           os.environ.get("BA_PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 - record, keep capturing
            plan = f"PLAN CAPTURE FAILED: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}")


if __name__ == "__main__":
    main()
