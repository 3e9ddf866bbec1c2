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

from ..core.io import load_table
from ..streaming import jobs as SJ
from .registry import query

_counter = itertools.count()


@query(
    "streaming_hourly_rollup",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           CAST(user_id % 4 AS INT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
               AS value_floor_sum
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup computed BY THE STREAMING ENGINE, now driving the
    full stateful chain: file source → in-stream duplicate injection
    (every 10th event is replayed) → ``dedup_stream`` watermark dedup →
    ``enrich_stream`` stream-static broadcast segment join → event-time
    window agg → availableNow drain — the cron-hourly performance refresh
    of the reference (scripts/setup/.crontab:5) as a real stream.

    The oracle reads the PLAIN events table: it is only equal if the
    watermark dedup dropped exactly the injected replicas (a failure
    inflates ``n``) and the enrichment matched the batch join — so the
    hash row covers the stateful dedup and the stream-static join, not
    just the windowed agg.
    """
    events = SJ.stream_events(spark, sf_dir).withColumn(
        "value", F.floor("value").cast("double"))
    # inject replays: every 10th event arrives twice (same event_id)
    dupped = (events.withColumn(
        "__copy",
        F.explode(F.when(F.col("event_id") % 10 == 0,
                         F.array(F.lit(0), F.lit(1)))
                  .otherwise(F.array(F.lit(0))))).drop("__copy"))
    deduped = SJ.dedup_stream(dupped, keys=["event_id"])
    # stream-static enrichment: per-user segment dimension (stateless,
    # broadcast per micro-batch).  Built from the static events table's
    # own key domain so the left join covers every stream key at ANY
    # scale factor — a fixed range bound would silently yield NULL
    # segments once user_id outgrew it.  Persisted (query-scoped):
    # the stream-static contract re-evaluates the static side EVERY
    # micro-batch, and without the persist that re-runs the full
    # distinct-over-events per batch.
    from ..core.cache import scoped_persist

    dim = scoped_persist(
        load_table(spark, sf_dir, "events")
        .select("user_id").distinct()
        .withColumn("segment", (F.col("user_id") % 4).cast("int")))
    enriched = SJ.enrich_stream(deduped, dim, on=["user_id"])
    rolled = SJ.windowed_engagement(enriched, "1 hour", watermark=None,
                                    extra_keys=["segment"])
    name = f"hourly_rollup_{next(_counter)}"
    # 8 state partitions, not the CPU-sized 32: three stateful ops ×
    # one state store per shuffle partition pay per-batch commit
    # overhead per store (measured 4.3 s → 2.0 s warm at sf0.1 with
    # identical results); the production knob tracks state volume
    # (rate × watermark horizon), see state_scoped_shuffle_partitions
    with SJ.state_scoped_shuffle_partitions(spark, 8):
        out = SJ.run_available_now(rolled, name, output_mode="complete")
    return out.select(
        "window_start", "event_type", "segment", "n",
        F.col("value_sum").cast("long").alias("value_floor_sum"))
