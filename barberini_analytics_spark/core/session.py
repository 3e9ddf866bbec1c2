"""SparkSession factory.

Single place where execution knobs live so every entry point (tests, bench,
driver contract) runs with the same, scale-minded configuration:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong for some stage; AQE re-plans.
- shuffle partitions sized for the local test box via ``SPARK_GRAFT_CPUS``;
  on a real cluster this would be set to ~2-3x total cores and AQE
  coalesces down.
- Arrow enabled so any pandas interchange (Pandas UDFs, toPandas in tests)
  is batched, not per-row pickled.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "barberini_analytics_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        # \r-progress bars interleave with (and can swallow) the one JSON
        # line the bench driver parses from a merged stdout/stderr tail
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the AppStatusStore backs core/metrics.cumulative_stage_metrics;
        # at the default retention (1000 stages) a long bench run evicts
        # early stages MID-measurement-window and cumulative deltas
        # silently understate (observed: a curve point reporting 0.4 MB
        # shuffle for a 120 MB run).  A stage entry is ~KB of driver
        # memory, so a deep retention is cheap insurance for honest
        # counters.
        .config("spark.ui.retainedStages", "100000")
        .config("spark.ui.retainedJobs", "100000")
    )
    return builder.getOrCreate()
