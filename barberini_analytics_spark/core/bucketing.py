"""Bucketed-table layout: co-located joins and aggregations.

At 100 TB the single biggest recurring cost is re-shuffling a fact table
on the same key for every join/aggregation.  Bucketing pays that shuffle
ONCE at write time: the table is written pre-hash-partitioned (and
per-bucket sorted) on the key, and every later equi-join or groupBy on
that key runs exchange-free — Catalyst proves the required distribution
from the bucket spec.  The reference's Postgres gets this from PK
indexes; the lakehouse equivalent is the bucket spec.

Plain-parquet caveat: bucket metadata lives in the session catalog, so
bucketed tables go through ``saveAsTable`` (warehouse-managed), not
``.parquet(path)``.  ``tests/test_plan_shapes.py`` pins the payoff: a
self-join of two bucketed tables shows ZERO Exchange operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   n_buckets: int = 32,
                   sort_cols: Sequence[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed (and per-bucket sorted) managed table.

    ``n_buckets`` is the parallelism floor for every downstream
    exchange-free stage — size it to the cluster, not the data (buckets
    split further by row-group for scans, but joins see one task per
    bucket).
    """
    cols = list(bucket_cols)
    writer = (df.write.mode(mode)
              .bucketBy(n_buckets, cols[0], *cols[1:])
              .sortBy(*(list(sort_cols) if sort_cols else cols)))
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed (bucketed) table; the bucket spec rides along and
    downstream joins/aggs on the bucket key skip their exchange."""
    return spark.table(table)
