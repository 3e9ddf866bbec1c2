"""Core relational operators.

Each operator re-expresses a pattern the reference implements with Postgres
self-joins or pandas loops as a single declarative Spark plan.  Citations
point at the reference implementation whose semantics each operator
reproduces (see SURVEY.md §2).

Scale notes are attached per operator: these run on key-partitioned shuffles
with map-side partial aggregation; nothing here collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


# ---------------------------------------------------------------------------
# J1 — latest snapshot per key ("rich" views)
# ---------------------------------------------------------------------------

def latest_per_key(df: DataFrame, keys: Sequence[str],
                   order_cols: str | Sequence[str]) -> DataFrame:
    """Latest row per key.

    Reference: max-timestamp self-join in the ``*_rich`` views
    (migration_015.sql:53-82, migration_056.sql:5-27) and
    ``PerformanceValueCondenser.get_latest_performances``
    (src/_utils/data_preparation.py:259-268).

    Spark-first: a single rank window — one shuffle on the key, no
    self-join, no second scan of the snapshot table.  At scale the window
    shuffle partitions by ``keys``; skewed hot keys are handled by AQE.

    Contract: rows tying on the FULL ``order_cols`` tuple get an
    arbitrary, partitioning-dependent survivor — include a unique column
    (a PK) in ``order_cols`` when determinism matters, as every
    oracle-checked caller here does.
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = W.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def attach_latest(base: DataFrame, snapshots: DataFrame, keys: Sequence[str],
                  order_cols: str | Sequence[str], how: str = "left") -> DataFrame:
    """Base table enriched with its latest snapshot (the ``*_rich`` shape).

    Reference: ``NATURAL RIGHT JOIN`` of latest performance onto the post
    table (migration_015.sql:53-60).
    """
    return base.join(latest_per_key(snapshots, keys, order_cols), list(keys), how)


# ---------------------------------------------------------------------------
# A3 — mode (most common value) per group
# ---------------------------------------------------------------------------

def mode_per_group(df: DataFrame, group_keys: Sequence[str], value_col: str,
                   out_col: str | None = None) -> DataFrame:
    """Most frequent ``value_col`` per group; ties break to the smallest value.

    Reference: ``(array_agg(x ORDER BY count DESC))[1]`` over pre-aggregated
    counts — the five ``most_common_*`` CTEs of ``customer_characteristics``
    (migration_034.sql:33-144).

    Spark-first: count + ``max_by`` over a struct so the whole thing is two
    partial-aggregatable hash aggregations (map-side combine on both), not an
    ordered array materialization per group.  The struct orders by
    (count DESC, value ASC) to make ties deterministic — the reference's
    ``array_agg`` tie order is unspecified, so we pin a stricter contract.
    """
    out_col = out_col or f"most_common_{value_col}"
    counted = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_keys, value_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    # min_by over struct(-cnt, value): the minimum is the largest count,
    # ties to the smallest value — type-generic (negating the COUNT, not
    # the value, so strings order naturally).  A hash aggregate with
    # map-side partial combine, replacing the previous rank window (which
    # re-shuffled AND sorted the counted relation): two partial-aggregable
    # exchanges total per mode.
    return counted.groupBy(*group_keys).agg(
        F.min_by(
            F.col(value_col),
            F.struct((-F.col("__cnt")).alias("nc"),
                     F.col(value_col).alias("v")),
        ).alias(out_col))


# ---------------------------------------------------------------------------
# A10 — deltas between consecutive snapshots
# ---------------------------------------------------------------------------

def linear_deltas(df: DataFrame, keys: Sequence[str],
                  order_cols: str | Sequence[str],
                  metric_cols: Sequence[str], prefix: str = "delta_") -> DataFrame:
    """Per-key difference of each metric vs the previous snapshot (first → 0).

    Reference: pandas old-vs-new merge computing ``linear_delta = new - old``
    with fillna(0) (src/_utils/data_preparation.py:292-328,363-365) feeding
    the ``delta_*`` columns of ``ig_post_performance`` (migration_051.sql).

    Spark-first: ``lag`` windows — one shuffle, no merge.
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = W.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_cols])
    out = df
    for m in metric_cols:
        out = out.withColumn(
            prefix + m, F.col(m) - F.coalesce(F.lag(m).over(w), F.col(m))
        )
    return out


# ---------------------------------------------------------------------------
# M13 — performance condensing (drop unchanged consecutive snapshots)
# ---------------------------------------------------------------------------

def condense_snapshots(df: DataFrame, keys: Sequence[str],
                       order_cols: str | Sequence[str],
                       value_cols: Sequence[str]) -> DataFrame:
    """Keep only snapshots whose metric vector differs from the previous one.

    Reference: row-by-row pandas comparison against the latest stored
    performance (src/_utils/data_preparation.py:242-330).

    Spark-first: null-safe struct inequality against ``lag`` — a snapshot is
    kept iff it is the first for its key or any metric changed.  ``<=>``
    (eqNullSafe) mirrors the reference's NaN-tolerant comparison.

    Contract: snapshots tying on the full ``order_cols`` tuple compare in
    arbitrary order; include a tiebreaker column when snapshot timestamps
    can collide.
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = W.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_cols])
    cur = F.struct(*[F.col(c) for c in value_cols])
    prev = F.lag(cur).over(w)
    return (
        df.withColumn("__changed", prev.isNull() | ~cur.eqNullSafe(prev))
        .filter(F.col("__changed"))
        .drop("__changed")
    )


def snapshot_intervals(df: DataFrame, keys: Sequence[str],
                       order_cols: str | Sequence[str],
                       value_cols: Sequence[str]) -> DataFrame:
    """Condense snapshots into SCD2-style validity intervals.

    Extends ``condense_snapshots`` (M13) with the slowly-changing-
    dimension bookkeeping a warehouse keeps: each surviving snapshot
    carries ``valid_from`` (its own order value), ``valid_to`` (the next
    surviving snapshot's order value for the key — NULL while current)
    and ``is_current``.  Point-in-time reconstruction is then a range
    predicate: ``valid_from <= t AND (valid_to IS NULL OR t < valid_to)``
    yields exactly one row per key.

    Scale shape: the condense lag-window and the validity lead-window
    share the same partitioning and ordering, so Catalyst plans ONE
    shuffle + ONE sort for both (the second Window reuses the first's
    distribution).
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = W.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_cols])
    condensed = condense_snapshots(df, keys, order_cols, value_cols)
    return (
        condensed
        .withColumn("valid_from", F.col(order_cols[0]))
        .withColumn("valid_to", F.lead(order_cols[0]).over(w))
        .withColumn("is_current", F.col("valid_to").isNull().cast("int"))
    )


# ---------------------------------------------------------------------------
# J13 — FK-violation filtering
# ---------------------------------------------------------------------------

def filter_fkey_violations(df: DataFrame, ref: DataFrame,
                           fkey: Sequence[tuple[str, str]]) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (valid, violating) w.r.t. a foreign key.

    Rows with ANY NULL FK column pass through as valid (SQL ``MATCH
    SIMPLE`` semantics).  Reference: ``filter_fkey_violations`` left-merge
    + ``isnull().any()`` check (src/_utils/data_preparation.py:76-159).

    Returns ``(valid, violations)`` so callers can log/abort like the
    reference does.  Implemented as semi/anti joins — at scale the referenced
    side is usually a dimension: Catalyst broadcasts it when small.
    """
    ref_keys = ref.select(
        *[F.col(r).alias(f"__ref_{i}") for i, (_, r) in enumerate(fkey)]
    ).distinct()
    cond = [df[l].eqNullSafe(ref_keys[f"__ref_{i}"]) for i, (l, _) in enumerate(fkey)]
    null_fk = None
    for l, _ in fkey:
        c = df[l].isNull()
        null_fk = c if null_fk is None else (null_fk | c)
    matched = df.join(ref_keys, on=cond, how="left_semi")
    unmatched = df.join(ref_keys, on=cond, how="left_anti")
    valid = matched.unionByName(unmatched.filter(null_fk))
    violations = unmatched.filter(~null_fk)
    return valid, violations


# ---------------------------------------------------------------------------
# M11 — sessionization (keyword-interval style gap merging)
# ---------------------------------------------------------------------------

def sessionize(df: DataFrame, keys: Sequence[str], ts_col: str,
               gap: Column, session_col: str = "session_id",
               order_cols: Sequence[str] | None = None) -> DataFrame:
    """Assign a session id per key: a new session starts when the gap from
    the previous row exceeds ``gap``.

    Reference: per-term interval merging with a ±7-day window — a Python
    loop over sorted dates (src/extended_twitter_collection/
    keyword_intervals.py:117-141).

    Spark-first: classic two-window sessionization — ``lag`` to flag gap
    starts, running ``sum`` to number sessions.  One shuffle on ``keys``.
    ``gap`` is a Column (e.g. ``F.expr("INTERVAL 14 DAYS")`` or a numeric
    seconds expression for numeric ts columns).
    """
    order_cols = list(order_cols) if order_cols else [ts_col]
    w = W.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_cols])
    prev = F.lag(ts_col).over(w)
    is_new = F.when(prev.isNull(), F.lit(1)).otherwise(
        (F.col(ts_col) > prev + gap).cast("int")
    )
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )


# ---------------------------------------------------------------------------
# top-k per group (rank windows)
# ---------------------------------------------------------------------------

def top_k_per_group(df: DataFrame, group_keys: Sequence[str],
                    order_by: Sequence[Column], k: int,
                    rank_col: str = "rank", keep_rank: bool = False) -> DataFrame:
    """Top-k rows per group under an explicit ordering.

    Reference: top-20 terms per topic (src/topic_modeling.py:247-254),
    recent-bookings LIMIT 2 (src/gomus/events.py:125-129).
    """
    w = W.partitionBy(*group_keys).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


# ---------------------------------------------------------------------------
# calendar scaffold (generate_series replacement)
# ---------------------------------------------------------------------------

def date_series(spark_df_or_session, start: Column | str, stop: Column | str,
                out_col: str = "date") -> DataFrame:
    """Dense date dimension between two dates (inclusive).

    Reference: ``generate_series(start, end, '1 day')`` building
    ``exhibition_day`` (migration_025.sql:32-42) and the capacities
    zero-grid (src/gomus/capacities.py:120-132).

    Spark-first: ``sequence() + explode`` — generated distributed, no
    driver loop.  Accepts a SparkSession (literal bounds) for convenience.
    """
    from pyspark.sql import SparkSession

    if isinstance(spark_df_or_session, SparkSession):
        df = spark_df_or_session.range(1)
    else:
        df = spark_df_or_session
    start_c = F.to_date(F.lit(start)) if isinstance(start, str) else start
    stop_c = F.to_date(F.lit(stop)) if isinstance(stop, str) else stop
    return df.select(
        F.explode(F.sequence(start_c, stop_c, F.expr("INTERVAL 1 DAY"))).alias(out_col)
    )


# ---------------------------------------------------------------------------
# set-operation helpers (Postgres UNION semantics)
# ---------------------------------------------------------------------------

def union_dedup(*dfs: DataFrame) -> DataFrame:
    """Postgres ``UNION`` (distinct) across frames with column padding.

    Reference: the layered union views — ``social_media_post``
    (migration_023.sql:30-90), ``post`` (migration_015.sql:140-185),
    ``app_review`` (migration_059.sql:22-50).  SQL UNION dedups; Spark's
    ``unionByName`` appends, so an explicit ``dropDuplicates`` preserves the
    reference semantics (SURVEY.md §4 trap 4).
    """
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out.dropDuplicates()


def high_watermark_filter(incoming: DataFrame, processed: DataFrame,
                          ts_col: str) -> DataFrame:
    """Incremental-processing filter: keep rows strictly newer than the
    max ``ts_col`` already processed; keep EVERYTHING when nothing was
    processed yet.

    Reference idiom: ``WHERE post_date > ANY(SELECT max(post_date) …)
    IS NOT FALSE`` (src/absa/post_words.py:106-115, post_ngrams.py:133-141,
    post_aspects.py:61-69) — the ``IS NOT FALSE`` makes the NULL watermark
    (empty history) pass every row, a Postgres 3VL trap (SURVEY §4).

    The watermark is a one-row aggregate broadcast into the scan's filter;
    at 100 TB with date-partitioned tables the comparison prunes whole
    partitions.
    """
    wm = processed.agg(F.max(ts_col).alias("__wm"))
    return (
        incoming.crossJoin(F.broadcast(wm))
        .filter(F.coalesce(F.col(ts_col) > F.col("__wm"), F.lit(True)))
        .drop("__wm")
    )


def anti_processed(incoming: DataFrame, processed: DataFrame,
                   keys: Sequence[str]) -> DataFrame:
    """Processed-key anti-join: drop rows whose key was already handled
    (``known_post_id NOT IN …``, src/absa/phrase_matching.py:28-38)."""
    return incoming.join(
        processed.select(*keys).dropDuplicates(list(keys)),
        list(keys), "left_anti")


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              direction: str = "backward",
              tolerance_seconds: int | None = None) -> DataFrame:
    """Distributed as-of join: attach to each left row the latest right row
    with ``right_ts <= left_ts`` per key (``direction='backward'``; or the
    earliest with ``>=`` for ``'forward'``).

    Spark-first formulation: instead of a per-row range join (which
    Catalyst would execute as a broadcast nested loop over candidate
    windows), the two inputs are unioned on (keys, ts) and the right-side
    payload is propagated with one ``last(..., ignorenulls=True)`` running
    window — a single shuffle on the join keys, linear in rows, the same
    plan a 1000-executor cluster wants.  Right rows at exactly the left
    timestamp match (pandas ``merge_asof`` semantics).

    ``tolerance_seconds`` nulls the payload when the matched row is
    further than the tolerance from the left timestamp.  Right-side
    payload columns keep their names (callers rename on collision).
    """
    keys = list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    ts = F.col("__ts")
    reverse = direction == "forward"
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")

    l_tagged = left.select(
        *keys, F.col(left_ts).alias("__ts"), F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
        F.struct(*left.columns).alias("__row"),
    )
    r_tagged = right.select(
        *keys, F.col(right_ts).alias("__ts"), F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        F.col(right_ts).alias("__r_ts"),
        F.lit(None).cast(l_tagged.schema["__row"].dataType).alias("__row"),
    )
    u = l_tagged.unionByName(r_tagged)

    # right rows sort before left at equal ts so same-instant rows match
    order = [ts.desc(), F.col("__is_left").asc()] if reverse \
        else [ts.asc(), F.col("__is_left").asc()]
    w = (W.partitionBy(*keys).orderBy(*order)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    matched = u.select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
          for c in payload],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__m_ts"),
    ).filter(F.col("__is_left") == 1)

    within = F.lit(True) if tolerance_seconds is None else (
        F.abs(F.col("__m_ts").cast("long") - ts.cast("long"))
        <= tolerance_seconds)
    keep = F.col("__m_ts").isNotNull() & within
    return matched.select(
        F.col("__row.*"),
        *[F.when(keep, F.col(f"__m_{c}")).alias(c) for c in payload],
        F.when(keep, F.col("__m_ts")).alias(f"matched_{right_ts}"),
    )


def sample_per_key(df: DataFrame, keys: Sequence[str], n: int,
                   seed: int = 42,
                   order_col: str | Sequence[str] | None = None) -> DataFrame:
    """Deterministic per-key cap: keep at most ``n`` rows per key group —
    the training-data move that bounds any one domain/source's share of a
    corpus.

    Rows are ranked inside each key by ``xxhash64(all columns, seed)`` (or
    an explicit ``order_col``), so the sample is pseudorandom yet stable
    across runs, engines, and partitionings — unlike ``ORDER BY rand()``,
    reruns pick the same rows.  One shuffle on the keys; with AQE skew
    splitting a hot key does not stall the stage.
    """
    if order_col is None:
        order = [F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))]
    elif isinstance(order_col, str):
        order = [F.col(order_col)]
    else:
        order = [F.col(c) for c in order_col]
    w = W.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= n).drop("__rk"))


def weighted_sample(df: DataFrame, n: int, weight_col: str,
                    keys: Sequence[str] = (), seed: int = 42) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``n`` rows
    (per key group if ``keys`` given): Efraimidis-Spirakis A-Res.

    Priority ``u^(1/w)`` with ``u`` a hash-uniform in (0,1) derived from
    the row (xxhash64 over all columns + seed); the top-``n`` priorities
    are exactly a weight-proportional sample without replacement — and
    because ``u`` is hashed, not drawn, the sample is identical across
    runs, partitionings and cluster sizes.  Rows with weight <= 0 or
    NULL are excluded.  Cost: one top-n-per-group window (shuffle on the
    keys; global n uses a single-partition ORDER BY LIMIT — at 100 TB
    prefer per-key quotas, which is what corpus-balance sampling wants
    anyway).

    The training-data use: sample a corpus proportional to per-document
    quality scores while keeping per-source quotas — compose with
    ``sample_per_key`` caps.
    """
    u = (F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
         .bitwiseAND(F.lit((1 << 56) - 1)) + 1) / float(1 << 56)
    priority = F.pow(u, 1.0 / F.col(weight_col))
    eligible = df.filter(F.col(weight_col).isNotNull()
                         & (F.col(weight_col) > 0))
    if keys:
        w = W.partitionBy(*keys).orderBy(F.desc("__prio"))
        return (eligible.withColumn("__prio", priority)
                .withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") <= n).drop("__prio", "__rk"))
    return (eligible.withColumn("__prio", priority)
            .orderBy(F.desc("__prio")).limit(n).drop("__prio"))


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          keys: Sequence[str],
                          left_bounds: tuple[str, str] = ("start", "end"),
                          right_bounds: tuple[str, str] = ("start", "end"),
                          suffix: str = "_r") -> DataFrame:
    """Per-key interval overlap join: pairs of rows whose [start, end]
    ranges intersect (inclusive bounds).

    Joined on the equi keys first — the range predicate is applied
    *inside* the hash join, so the plan is a keyed shuffle join, not a
    broadcast nested loop over the cross product.  For long-spanning
    intervals at 100 TB, bucketize coarse time-grains into the key
    (interval → grain explode) so each range only meets candidates in its
    grain — the standard range-bucketing refinement; this operator is the
    exact inner step either way.
    """
    lb, le = left_bounds
    rb, re_ = right_bounds
    r = right
    for c in right.columns:
        if c in keys:
            continue
        r = r.withColumnRenamed(c, f"{c}{suffix}")
    cond = (F.col(f"{rb}{suffix}") <= F.col(le)) \
        & (F.col(f"{re_}{suffix}") >= F.col(lb))
    return left.join(r, list(keys)).filter(cond)


def salted_join(left: DataFrame, right: DataFrame, on: Sequence[str],
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Skew-resilient equi join: spread a hot join key over ``salt``
    shuffle partitions.

    Every left row gets a deterministic salt in ``[0, salt)`` (xxhash64 of
    the full row — stable across runs and partitionings); the right side
    is replicated ``salt`` times with one explode; the join runs on
    ``keys + salt``.  A key holding 20% of a 100 TB fact table then lands
    on ``salt`` reducers instead of one.  This is the explicit form of
    what AQE's skew-join splitting does at runtime — use it when the skew
    is KNOWN ahead of planning (AQE can only split after a stage
    materializes) or when the right side is mid-sized: too big to
    broadcast, small enough that ``salt``-fold replication beats a
    stalled straggler.

    Only join types where an unmatched RIGHT row produces no output are
    allowed (inner/left/left_semi/left_anti) — outer-right would emit the
    replicas.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}")
    keys = list(on)
    l_salted = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
               F.lit(salt)).cast("int"))
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l_salted.join(r_salted, keys + ["__salt"], how)
    return out.drop("__salt")


#: decomposable aggregate -> (partial fn, final combine fn)
_SALTED_AGGS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(df: DataFrame, keys: Sequence[str],
                     aggs: dict[str, tuple[str, str]],
                     salt: int = 16) -> DataFrame:
    """Two-phase salted aggregation for hot grouping keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    sum/count/min/max.  Phase 1 aggregates on ``keys + salt`` (the hot
    key's rows split across ``salt`` reducers), phase 2 combines the
    ``salt`` partials per key.  Spark's hash aggregate already does a
    map-side partial combine, which usually absorbs skew for these
    algebraic functions — the explicit salt matters when the partial
    combine is defeated (high-cardinality composite keys spilling the
    hash map, or a first shuffle forced by a prior repartition).  The
    pattern generalizes to any decomposable accumulator.
    """
    keys = list(keys)
    bad = [fn for _, fn in aggs.values() if fn not in _SALTED_AGGS]
    if bad:
        raise ValueError(f"non-decomposable aggregate fns: {bad}")
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                      F.lit(salt)).cast("int")
    partial = (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(*[_SALTED_AGGS[fn][0](col).alias(out)
               for out, (col, fn) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_SALTED_AGGS[fn][1](out).alias(out)
          for out, (_, fn) in aggs.items()])
