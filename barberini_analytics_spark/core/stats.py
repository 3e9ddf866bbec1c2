"""Table statistics collection — the ANALYZE TABLE layer.

Per-column min / max / null count / approximate NDV (HLL++ via Spark's
``approx_count_distinct``) and average serialized length, all computed
in ONE aggregate pass over the table (no per-column scans: every
column's statistics are expressions inside the same hash aggregate, so
at 100 TB the cost is one scan + a 1-row result).

The long-format output (one row per column, values stringified for the
mixed-type frame) is what an optimizer or a data catalog ingests; the
reference keeps comparable per-table knowledge only implicitly in its
Postgres catalog — this is the engine-side equivalent for parquet
lakes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def analyze_table(df: DataFrame, ndv_rsd: float = 0.05) -> DataFrame:
    """One-pass column statistics: returns one row per column with
    ``column, dtype, n_rows, n_nulls, ndv_approx, min, max, avg_len``.

    ``min``/``max`` are stringified (the frame mixes column types);
    ``ndv_approx`` is HLL++ with relative standard deviation
    ``ndv_rsd``; ``avg_len`` is the mean string-serialized length —
    a size proxy usable for broadcast-threshold decisions.  Complex
    (array/map/struct) columns report null min/max but still count
    nulls, NDV (over the serialized form), and length.
    """
    simple = {
        f.name: not f.dataType.typeName() in ("array", "map", "struct")
        for f in df.schema.fields
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, is_simple in simple.items():
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"),
            F.approx_count_distinct(
                s if not is_simple else F.col(c), ndv_rsd)
            .alias(f"__ndv_{c}"),
            (F.min(F.col(c)).cast("string") if is_simple
             else F.lit(None).cast("string")).alias(f"__min_{c}"),
            (F.max(F.col(c)).cast("string") if is_simple
             else F.lit(None).cast("string")).alias(f"__max_{c}"),
            F.avg(F.length(s)).alias(f"__len_{c}"),
        ]
    row = df.agg(*aggs)
    dtypes = dict(df.dtypes)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(dtypes[c]).alias("dtype"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__ndv_{c}").alias("ndv_approx"),
            F.col(f"__min_{c}").alias("min"),
            F.col(f"__max_{c}").alias("max"),
            F.round(F.col(f"__len_{c}"), 2).alias("avg_len"),
        )
        for c in simple
    ]
    return (row.select(F.explode(F.array(*per_col)).alias("s"))
            .select("s.*"))
