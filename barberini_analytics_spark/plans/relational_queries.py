"""Core relational query inventory (SURVEY §2.3-2.8) over the synthetic
TPC-H-ish tables.

Each query exercises one library operator from
``barberini_analytics_spark.operators`` — the same operator that backs the
museum-domain views — on the driver's synthetic tables, paired with a DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..core.io import load_table
from ..functions import cents
from ..operators import relational as R
from .registry import query


# ---------------------------------------------------------------------------
# A1 — grouped aggregation (flagship; TPC-H Q1 shape)
# ---------------------------------------------------------------------------

@query(
    "pricing_summary",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_linestatus,
               CAST(l_quantity AS BIGINT)                    AS qty_i,
               CAST(round(l_extendedprice * 100) AS BIGINT)  AS price_c,
               CAST(round(l_discount * 100) AS BIGINT)       AS disc_pct,
               CAST(round(l_tax * 100) AS BIGINT)            AS tax_pct
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    )
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(sum(qty_i) AS BIGINT)                                       AS sum_qty,
        CAST(sum(price_c) AS BIGINT) / 100.0                             AS sum_base_price,
        CAST(sum(price_c * (100 - disc_pct)) AS BIGINT) / 10000.0        AS sum_disc_price,
        CAST(sum(price_c * (100 - disc_pct) * (100 + tax_pct)) AS BIGINT) / 1000000.0
                                                                         AS sum_charge,
        CAST(sum(qty_i) AS BIGINT) / CAST(count(*) AS DOUBLE)            AS avg_qty,
        CAST(sum(price_c) AS BIGINT) / (100.0 * count(*))                AS avg_price,
        CAST(sum(disc_pct) AS BIGINT) / (100.0 * count(*))               AS avg_disc,
        CAST(count(*) AS BIGINT)                                         AS count_order
    FROM c
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped agg with map-side partial aggregation (SURVEY §2.5 A1).

    Reference shape: order totals / latest-perf aggregations, e.g.
    migration_034.sql:16-31.  The filter is pushed to the parquet scan;
    the aggregation is a single hash-agg shuffle on two low-cardinality
    keys — at 100 TB this is scan-bound, which is the right bound.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty_i = F.col("l_quantity").cast("long")
    price_c = cents("l_extendedprice")
    disc_pct = cents("l_discount")
    tax_pct = cents("l_tax")
    n = F.count(F.lit(1))
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .select("l_returnflag", "l_linestatus",
                qty_i.alias("qty_i"), price_c.alias("price_c"),
                disc_pct.alias("disc_pct"), tax_pct.alias("tax_pct"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty_i").alias("sum_qty"),
            (F.sum("price_c") / 100.0).alias("sum_base_price"),
            (F.sum(F.col("price_c") * (100 - F.col("disc_pct"))) / 10000.0)
                .alias("sum_disc_price"),
            (F.sum(F.col("price_c") * (100 - F.col("disc_pct"))
                   * (100 + F.col("tax_pct"))) / 1000000.0).alias("sum_charge"),
            (F.sum("qty_i") / n.cast("double")).alias("avg_qty"),
            (F.sum("price_c") / (100.0 * n)).alias("avg_price"),
            (F.sum("disc_pct") / (100.0 * n)).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J1 — latest row per key (the "rich" view primitive)
# ---------------------------------------------------------------------------

@query(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest snapshot per key via rank window (SURVEY §2.4 J1).

    Reference: max-timestamp self-join of the ``*_rich`` views
    (migration_015.sql:53-82) — replaced by one window shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    latest = R.latest_per_key(ev, ["user_id"], ["ts", "event_id"])
    return latest.select("user_id", "event_id", "ts", "event_type", "value")


# ---------------------------------------------------------------------------
# A3 — mode per group
# ---------------------------------------------------------------------------

@query(
    "mode_event_type_per_user",
    oracle="""
    SELECT user_id, event_type AS most_common_event_type
    FROM (
        SELECT user_id, event_type, row_number() OVER (
            PARTITION BY user_id ORDER BY count(*) DESC, event_type ASC
        ) AS rn
        FROM events
        GROUP BY user_id, event_type
    )
    WHERE rn = 1
    """,
)
def mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-common value per group (SURVEY §2.5 A3).

    Reference: ``(array_agg(x ORDER BY cnt DESC))[1]`` in
    ``customer_characteristics`` (migration_034.sql:33-144).  Ties break to
    the smallest value — pinned deterministic, unlike the reference.
    """
    ev = load_table(spark, sf_dir, "events")
    return R.mode_per_group(ev, ["user_id"], "event_type")


# ---------------------------------------------------------------------------
# A10 — deltas between consecutive snapshots
# ---------------------------------------------------------------------------

@query(
    "event_value_deltas",
    oracle="""
    SELECT event_id, user_id, ts, value,
           value - coalesce(
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id),
               value
           ) AS delta_value
    FROM events
    """,
)
def event_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key lag deltas (SURVEY §2.5 A10 / §2.6).

    Reference: pandas old-vs-new merge computing ``linear_delta``
    (src/_utils/data_preparation.py:292-328).  The subtraction is exact
    IEEE on identical operands, so no rounding is needed for the oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    out = R.linear_deltas(ev, ["user_id"], ["ts", "event_id"], ["value"])
    return out.select("event_id", "user_id", "ts", "value", "delta_value")


# ---------------------------------------------------------------------------
# M13 — condense: drop unchanged consecutive snapshots
# ---------------------------------------------------------------------------

@query(
    "condense_event_snapshots",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value
    FROM (
        SELECT *,
               lag(value) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ) AS prev_value
        FROM events
    )
    WHERE prev_value IS NULL OR value IS DISTINCT FROM prev_value
    """,
)
def condense_event_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot condensing via null-safe lag comparison (SURVEY §2.10 M13).

    Reference: pandas row-compare against latest stored performance
    (src/_utils/data_preparation.py:242-330).
    """
    ev = load_table(spark, sf_dir, "events")
    out = R.condense_snapshots(ev, ["user_id", "event_type"], ["ts", "event_id"], ["value"])
    return out.select("event_id", "user_id", "event_type", "ts", "value")


# ---------------------------------------------------------------------------
# M11 — sessionization (keyword-interval gap merging)
# ---------------------------------------------------------------------------

@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               CAST(sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (SURVEY §2.10 M11).

    Reference: per-term ±7-day interval merging, a Python loop over sorted
    dates (src/extended_twitter_collection/keyword_intervals.py:117-141) —
    replaced by the lag-flag + running-sum double window.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = R.sessionize(
        ev.select("user_id", "ts", "event_id"),
        ["user_id"], "ts", F.expr("INTERVAL 30 MINUTES"),
        order_cols=["ts", "event_id"],
    )
    return (
        sess.groupBy("user_id", F.col("session_id").cast("long").alias("session_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# ---------------------------------------------------------------------------
# top-k per group (rank window)
# ---------------------------------------------------------------------------

@query(
    "top_parts_by_brand",
    oracle="""
    SELECT p_brand, p_partkey, revenue, rank
    FROM (
        SELECT p_brand, p_partkey, revenue,
               CAST(row_number() OVER (
                   PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC
               ) AS INT) AS rank
        FROM (
            SELECT p.p_brand, p.p_partkey,
                   CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                        AS BIGINT) / 10000.0 AS revenue
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand, p.p_partkey
        )
    )
    WHERE rank <= 3
    """,
)
def top_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (SURVEY §2.7): top-3 revenue parts per brand.

    Reference: top-20 terms per topic (src/topic_modeling.py:247-254).
    Revenue is rounded *before* ranking so the tie order is engine-stable.
    The part side is a dimension — Catalyst broadcasts it under the
    configured threshold.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg((F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))) / 10000.0)
             .alias("revenue"))
    )
    return R.top_k_per_group(
        revenue, ["p_brand"],
        [F.col("revenue").desc(), F.col("p_partkey").asc()],
        k=3, keep_rank=True,
    ).withColumn("rank", F.col("rank").cast("int"))


# ---------------------------------------------------------------------------
# anti join (NOT EXISTS)
# ---------------------------------------------------------------------------

@query(
    "orders_without_lineitems",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
    )
    """,
)
def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (SURVEY §2.8 ``NOT IN`` subqueries; J13 FK check).

    Reference: stopword anti-join (src/absa/post_ngrams.py:149-152),
    FK-violation detection (src/_utils/data_preparation.py:76-159).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# dimension join + agg (broadcast)
# ---------------------------------------------------------------------------

@query(
    "customer_order_stats",
    oracle="""
    SELECT c.c_custkey, n.n_name, r.r_name,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
               AS total_spent,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               / (100.0 * count(o.o_orderkey)) AS avg_order_value
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, n.n_name, r.r_name
    """,
)
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join + grouped agg (SURVEY §2.4 J2/J3, §2.5 A1).

    Reference: the ``customer_characteristics`` join fan
    (migration_034.sql:7-193).  Nation/region are broadcast — no shuffle of
    the fact side for the dimension joins; the single shuffle is the
    group-by on ``c_custkey``.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("c_custkey", "n_name", "r_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (F.sum(cents("o_totalprice")) / 100.0).alias("total_spent"),
            (F.sum(cents("o_totalprice")) / (100.0 * F.count("o_orderkey")))
                .alias("avg_order_value"),
        )
    )


# ---------------------------------------------------------------------------
# J4 — calendar scaffold + range-anchored left join
# ---------------------------------------------------------------------------

@query(
    "daily_order_calendar",
    oracle="""
    WITH bounds AS (
        SELECT CAST(min(o_orderdate) AS DATE) AS s, CAST(max(o_orderdate) AS DATE) AS e
        FROM orders
    ), cal AS (
        SELECT CAST(d AS DATE) AS day FROM (
            SELECT unnest(generate_series(s, e, INTERVAL 1 DAY)) AS d FROM bounds
        )
    ), od AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               count(*) AS cnt,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        FROM orders GROUP BY 1
    )
    SELECT cal.day AS day,
           CAST(coalesce(od.cnt, 0) AS BIGINT) AS n_orders,
           coalesce(od.rev_c, 0) / 100.0 AS revenue
    FROM cal LEFT JOIN od USING (day)
    """,
)
def daily_order_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar dimension + left join (SURVEY §2.4 J4, §1.1 slot grids).

    Reference: ``exhibition_day`` via ``generate_series``
    (migration_025.sql:32-42) and the capacities zero-grid
    (src/gomus/capacities.py:120-132).  ``sequence + explode`` generates the
    scaffold distributed; the per-day agg side is shuffled once.
    """
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("s"),
        F.max(F.to_date("o_orderdate")).alias("e"),
    )
    cal = bounds.select(
        F.explode(F.sequence("s", "e", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    od = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(cents("o_totalprice")).alias("rev_c"))
    )
    return cal.join(od, "day", "left").select(
        "day",
        F.coalesce("cnt", F.lit(0)).cast("long").alias("n_orders"),
        (F.coalesce("rev_c", F.lit(0)) / 100.0).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# A4 — weighted self-normalizing aggregate with zero guard
# ---------------------------------------------------------------------------

@query(
    "weighted_value_by_type",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS value_c
        FROM events
    )
    SELECT event_type,
           CASE WHEN sum(value_c) = 0 THEN NULL
                ELSE CAST(sum(value_c * value_c) AS BIGINT)
                     / (100.0 * CAST(sum(value_c) AS BIGINT))
           END AS weighted_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM c
    GROUP BY event_type
    """,
)
def weighted_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-normalizing weighted aggregate with zero-sum guard (SURVEY §2.5 A4).

    Reference: ``sum(polarity^2)/sum(polarity)`` with zero-division guard
    (migration_038.sql:152-156, src/absa/post_aspect_sentiments.py:52-55).
    """
    ev = load_table(spark, sf_dir, "events").withColumn("value_c", cents("value"))
    return ev.groupBy("event_type").agg(
        F.when(F.sum("value_c") == 0, F.lit(None).cast("double"))
        .otherwise(F.sum(F.col("value_c") * F.col("value_c"))
                   / (100.0 * F.sum("value_c")))
        .alias("weighted_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# J5 — regex whole-word theta join
# ---------------------------------------------------------------------------

_REGEX_TERMS = ("spark", "merge", "window", "vector", "shuffle")

@query(
    "regex_term_match",
    oracle=f"""
    SELECT t.term AS term, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents d
    CROSS JOIN (VALUES {", ".join(f"('{t}')" for t in _REGEX_TERMS)}) AS t(term)
    WHERE regexp_matches(d.text, '(?i)\\b' || t.term || '\\b')
    GROUP BY t.term
    """,
)
def regex_term_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex whole-word theta join (SURVEY §2.4 J5).

    Reference: ``ec.text ~* ('\\m' || term || '\\M')``
    (migration_044.sql:22, collect_tweets.py:80).  The term side is tiny and
    broadcast; the scan side streams — a broadcast nested-loop join, which
    is the right physical plan for a non-equi predicate.
    """
    # repartition: the table arrives as one file; the regex probe is
    # CPU-bound and should run on all cores
    docs = load_table(spark, sf_dir, "documents").repartition("doc_id")
    terms = spark.createDataFrame([(t,) for t in _REGEX_TERMS], ["term"])
    return (
        docs.join(
            F.broadcast(terms),
            F.expr(r"text rlike concat('(?i)\\b', term, '\\b')"),
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# A8 — pivot (groupBy().pivot())
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

@query(
    "event_type_pivot",
    oracle="""
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    """,
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot / unstack (SURVEY §2.5 A8).

    Reference: ``groupby(...).count().unstack()`` in the log report
    (src/diagnostics/log_report.py:114-132).  Pivot values are declared
    explicitly — at scale an undeclared pivot triggers an extra distinct
    scan to discover values.
    """
    ev = load_table(spark, sf_dir, "events")
    out = ev.groupBy("user_id").pivot("event_type", list(_EVENT_TYPES)).count()
    for t in _EVENT_TYPES:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0)).cast("long"))
    return out


# ---------------------------------------------------------------------------
# A2/A6 — count distinct + HAVING
# ---------------------------------------------------------------------------

@query(
    "active_event_types",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS DOUBLE) / count(DISTINCT user_id) AS events_per_user
    FROM events
    GROUP BY event_type
    HAVING count(*) >= 100
    """,
)
def active_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + HAVING (SURVEY §2.5 A2/A6/A7).

    Reference: distinct polarity-word counts (migration_038.sql:157),
    ``HAVING sum(1/r_interval) >= 0.8`` (collect_tweets.py:85).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .withColumn(
            "events_per_user",
            F.col("n_events").cast("double") / F.col("n_users"),
        )
        .filter(F.col("n_events") >= 100)
    )


# ---------------------------------------------------------------------------
# set ops — UNION with dedup (Postgres UNION semantics)
# ---------------------------------------------------------------------------

@query(
    "union_dedup_documents",
    oracle="""
    SELECT doc_id, source, lang FROM documents WHERE lang = 'en'
    UNION
    SELECT doc_id, source, lang FROM documents WHERE source = 'src0'
    """,
)
def union_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postgres ``UNION`` (distinct) semantics (SURVEY §2.8, §4 trap 4).

    Reference: the union views ``social_media_post`` / ``post``
    (migration_023.sql:30-90, migration_015.sql:140-185) — SQL UNION
    dedups, so the Spark side must ``dropDuplicates`` after ``unionByName``.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return R.union_dedup(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("source") == "src0"),
    )


_WATERMARK_CUTOFF = "2024-01-15 00:00:00"


@query(
    "incremental_new_events",
    oracle=f"""
    WITH processed AS (
        SELECT * FROM events WHERE ts < TIMESTAMP '{_WATERMARK_CUTOFF}'
    ),
    wm AS (SELECT max(ts) AS w FROM processed)
    SELECT e.event_id, e.ts, e.user_id, e.event_type
    FROM events e, wm
    WHERE (e.ts > wm.w) IS NOT FALSE
    """,
)
def incremental_new_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4/§7.6 incremental layer: high-watermark new-row filter with the
    reference's ``> ANY(...) IS NOT FALSE`` null semantics — an empty
    processed history admits every row.

    ``processed`` is simulated as all events before a cutoff; the query
    returns exactly the rows an incremental run would process next.
    """
    events = load_table(spark, sf_dir, "events")
    processed = events.filter(F.col("ts") < F.lit(_WATERMARK_CUTOFF))
    return R.high_watermark_filter(events, processed, "ts").select(
        "event_id", "ts", "user_id", "event_type")
