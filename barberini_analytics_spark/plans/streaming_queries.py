"""Driver queries for the Structured Streaming layer.

``streaming_hourly_rollup`` drains the event stream with the availableNow
trigger and returns the finished rollup as a batch frame — so the driver's
oracle checks the *streaming* pipeline (source → watermark → windowed agg →
sink) against plain SQL.  The float metric is ``sum(floor(value))`` so the
hash is exact (summation-order independence).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..streaming import jobs as SJ
from .registry import query

_counter = itertools.count()


@query(
    "streaming_hourly_rollup",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
               AS value_floor_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type rollup computed BY THE STREAMING ENGINE (file
    source → event-time window + watermark → availableNow drain), compared
    against batch SQL — the cron-hourly performance refresh of the
    reference (scripts/setup/.crontab:5) as a real stream."""
    events = SJ.stream_events(spark, sf_dir).withColumn(
        "value", F.floor("value").cast("double"))
    rolled = SJ.windowed_engagement(events, "1 hour")
    name = f"hourly_rollup_{next(_counter)}"
    out = SJ.run_available_now(rolled, name, output_mode="complete")
    return out.select(
        "window_start", "event_type", "n",
        F.col("value_sum").cast("long").alias("value_floor_sum"))
