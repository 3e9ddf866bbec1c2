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


def join_advice(left: DataFrame, right: DataFrame, on: str,
                broadcast_bytes: int = 10 * 1024 * 1024,
                low_containment: float = 0.2,
                ndv_rsd: float = 0.05) -> DataFrame:
    """Join-strategy recommendation from constant-size summaries — the
    planning probe a 100 TB pipeline runs before an expensive join,
    built on :func:`analyze_table` (sizes) and
    :func:`..operators.sketch.hll_overlap_estimate` (key containment):

    - ``broadcast_left`` / ``broadcast_right`` when a side's estimated
      bytes (rows × mean serialized row length) fit the threshold;
    - ``bloom_prune_then_shuffle`` when both sides are big but key
      containment is low (< ``low_containment`` on the larger side: most
      of its rows cannot match, so a Bloom filter on the smaller side's
      keys prunes the shuffle — ``operators/sketch.bloom_build/probe``);
    - ``shuffle_join`` otherwise (and AQE handles residual skew).

    Returns ONE row with the recommendation and the evidence columns, so
    the decision is auditable.  Cost: two stats aggregates + two HLL
    register aggregates; the join inputs are never joined here.
    """
    from ..operators.sketch import hll_overlap_estimate

    def side_size(df: DataFrame):
        stats = analyze_table(df, ndv_rsd)
        return stats.agg(
            F.max("n_rows").alias("rows"),
            F.sum("avg_len").alias("row_len"))

    ls = side_size(left).select(
        F.col("rows").alias("left_rows"),
        (F.col("rows") * F.col("row_len")).alias("left_bytes_est"))
    rs = side_size(right).select(
        F.col("rows").alias("right_rows"),
        (F.col("rows") * F.col("row_len")).alias("right_bytes_est"))
    ov = hll_overlap_estimate(left.select(on), right.select(on), on)
    row = ls.crossJoin(rs).crossJoin(ov)
    bigger_containment = F.when(
        F.col("left_rows") >= F.col("right_rows"),
        F.col("containment_left")).otherwise(F.col("containment_right"))
    l_fit = F.col("left_bytes_est") <= broadcast_bytes
    r_fit = F.col("right_bytes_est") <= broadcast_bytes
    # when both sides fit, broadcast the SMALLER one
    advice = (
        F.when(r_fit & (~l_fit
                        | (F.col("right_bytes_est")
                           <= F.col("left_bytes_est"))), "broadcast_right")
        .when(l_fit, "broadcast_left")
        .when(bigger_containment < low_containment,
              "bloom_prune_then_shuffle")
        .otherwise("shuffle_join"))
    return row.select(
        advice.alias("advice"),
        "left_rows", "right_rows",
        F.round("left_bytes_est").cast("long").alias("left_bytes_est"),
        F.round("right_bytes_est").cast("long").alias("right_bytes_est"),
        "n_overlap_est", "containment_left", "containment_right")


def apply_advice(spark, left: DataFrame, right: DataFrame, on: str, *,
                 how: str = "inner",
                 set_partitions: bool = True,
                 broadcast_bytes: int = 10 * 1024 * 1024,
                 low_containment: float = 0.2,
                 target_partition_bytes: int = 128 * 1024 * 1024,
                 max_skew_ratio: float = 4.0,
                 ndv_rsd: float = 0.05) -> tuple[DataFrame, dict]:
    """CLOSE the advisor loop: run :func:`join_advice` +
    :func:`partition_advice` and APPLY what they recommend, returning
    the hinted join plus the applied evidence.

    - ``spark.sql.shuffle.partitions`` is set to the recommendation for
      the join key over the LARGER side (the shuffle the join pays);
    - ``broadcast_left`` / ``broadcast_right`` become an explicit
      ``F.broadcast`` hint on that side — effective even when the
      statistics Spark itself sees (e.g. post-filter estimates) would
      not trigger its auto-broadcast;
    - ``bloom_prune_then_shuffle`` builds a Bloom filter from the
      smaller side's keys and probes the larger side BEFORE the shuffle
      (``operators/sketch.bloom_build/bloom_probe`` — no false
      negatives, so the pruned join equals the plain join);
    - ``shuffle_join`` stays a plain join (AQE handles residual skew).

    The probes cost two one-pass stats aggregates + two HLL aggregates
    (constant-size outputs, nothing corpus-sized is collected) — the
    planning spend a 100 TB pipeline pays before an expensive join.
    ``tests/test_sinks.py`` pins that applying the advice actually flips
    the chosen physical plan.

    ``how`` supports non-inner joins with the semantics-preserving
    subset of strategies only: a LEFT join keeps unmatched left rows,
    so Bloom-pruning the left side or broadcasting it (Spark builds
    the hash table on the non-preserved side) would change results or
    be unplannable — for ``how != "inner"`` only ``broadcast_right``
    is applied and everything else degrades to the plain join.
    ``set_partitions=False`` skips the shuffle-sizing probe entirely
    (``"partition"`` is ``None`` in the evidence): for a hinted join
    INSIDE a larger query, mutating the session-global partition count
    would leak into unrelated stages — callers own that knob, and
    paying the sizing aggregate for evidence nobody applies doubles
    the probe cost for nothing.
    """
    adv = join_advice(left, right, on, broadcast_bytes,
                      low_containment, ndv_rsd).first().asDict()
    part = None
    if set_partitions:
        bigger = left if adv["left_rows"] >= adv["right_rows"] else right
        part = partition_advice(bigger, [on], target_partition_bytes,
                                max_skew_ratio, ndv_rsd).first().asDict()
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(part["shuffle_partitions"]))
    strategy = adv["advice"]
    inner = how == "inner"
    if strategy == "broadcast_right":
        out = left.join(F.broadcast(right), on, how)
    elif strategy == "broadcast_left" and inner:
        out = F.broadcast(left).join(right, on, how)
    elif strategy == "bloom_prune_then_shuffle" and inner:
        from ..operators.sketch import bloom_build, bloom_probe

        if adv["left_rows"] >= adv["right_rows"]:
            out = bloom_probe(left, bloom_build(right.select(on), on),
                              on).join(right, on, how)
        else:
            out = left.join(
                bloom_probe(right, bloom_build(left.select(on), on), on),
                on, how)
    else:
        out = left.join(right, on, how)
    return out, {"join": adv, "partition": part}


def partition_advice(df: DataFrame, group_keys: list[str] | None = None,
                     target_partition_bytes: int = 128 * 1024 * 1024,
                     max_skew_ratio: float = 4.0,
                     ndv_rsd: float = 0.05) -> DataFrame:
    """Shuffle-sizing recommendation from the same one-pass statistics:
    how many ``spark.sql.shuffle.partitions`` a groupBy/join on
    ``group_keys`` needs so post-shuffle partitions land near
    ``target_partition_bytes`` (the spill-vs-scheduling sweet spot —
    Spark's own AQE coalesce target), plus a skew verdict for the keys.

    - ``est_bytes``: rows × mean serialized row length (the
      :func:`analyze_table` proxy, consistent with :func:`join_advice`);
    - ``shuffle_partitions``: ``ceil(est_bytes / target)``, floored at 1
      — at 100 TB this is ~800 partitions per TB at the default target,
      the knob every oversized-shuffle incident traces back to;
    - ``key_skew``: the OBSERVED max rows-per-key comes from one
      map-side-combined ``(key, count)`` aggregate (cheap: only pairs
      cross the wire, never table rows); ``max_skew_ratio`` is the
      skew-FLAG threshold — when the observed max exceeds
      ``mean rows-per-key × max_skew_ratio``, AQE skew-split or
      :func:`..operators.relational.salted_join` is recommended.

    One aggregate pass (reusing :func:`analyze_table`) plus, when
    ``group_keys`` is given, one key-frequency aggregate for the
    observed max — map-side partial aggregation shrinks that shuffle to
    (key, count) pairs, so the probe never shuffles table rows.
    """
    stats = analyze_table(df, ndv_rsd)
    size = stats.agg(
        F.max("n_rows").alias("n_rows"),
        F.sum("avg_len").alias("row_len"))
    size = size.select(
        "n_rows",
        (F.col("n_rows") * F.col("row_len")).cast("long")
        .alias("est_bytes"))
    if group_keys:
        freq = (df.groupBy(*group_keys)
                .agg(F.count(F.lit(1)).alias("__f"))
                .agg(F.max("__f").alias("max_key_rows"),
                     F.count(F.lit(1)).alias("key_ndv")))
        size = size.crossJoin(freq)
    else:
        size = size.withColumn("max_key_rows", F.lit(None).cast("long")) \
            .withColumn("key_ndv", F.lit(None).cast("long"))
    parts = F.greatest(
        F.lit(1),
        F.ceil(F.col("est_bytes") / F.lit(float(target_partition_bytes))))
    mean_key_rows = F.col("n_rows") / F.col("key_ndv")
    skewed = (F.col("max_key_rows").isNotNull()
              & (F.col("max_key_rows")
                 > mean_key_rows * F.lit(float(max_skew_ratio))))
    return size.select(
        "n_rows", "est_bytes",
        parts.cast("int").alias("shuffle_partitions"),
        F.lit(int(target_partition_bytes)).alias("target_partition_bytes"),
        "key_ndv", "max_key_rows",
        F.round(mean_key_rows, 2).alias("mean_key_rows"),
        F.when(skewed, "salt_or_aqe_skew_split")
        .when(F.col("max_key_rows").isNotNull(), "plain_shuffle_ok")
        .otherwise("no_keys_given").alias("skew_advice"))
