"""Ingest-parse layer (SURVEY §2.1 S1-S17): the reference's largest code
mass re-expressed as Spark parse/flatten transforms.

The HTTP fetch layer is out of scope (SURVEY §1); what IS engine work is
every parse step: XML/JSON/HTML string → typed rows.  Verification uses a
round-trip design: both engines build identical raw payload strings from
the parquet tables, the Spark side parses them back with
``from_json``/``xpath``/``regexp_extract_all``/``explode``, and the DuckDB
oracle derives the expected output relationally — so a wrong parse cannot
hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.io import load_table
from .registry import query


# ---------------------------------------------------------------------------
# S17 — Exhibitions API: nested JSON → exhibition rows + time_frames explode
# ---------------------------------------------------------------------------

_EXH_SCHEMA = (
    "STRUCT<exhibitions: ARRAY<STRUCT<"
    "title: STRING, "
    "picture: STRUCT<original: STRING>, "
    "time_frames: ARRAY<STRUCT<start_at: STRING, end_at: STRING>>"
    ">>>"
)


@query(
    "exhibitions_timeframes",
    oracle="""
    WITH exh AS (
        SELECT 'Exhibition ' || CAST(n_nationkey AS VARCHAR) AS title,
               CASE WHEN n_nationkey % 3 = 0
                    THEN 'https://img.example/' || CAST(n_nationkey AS VARCHAR)
               END AS picture_url,
               n_nationkey AS k
        FROM nation
    ),
    frames AS (
        SELECT title, picture_url,
               CAST(DATE '2024-01-01' + INTERVAL (k * 11 + f * 50) DAY
                    AS DATE) AS start_date,
               CAST(DATE '2024-01-01' + INTERVAL (k * 11 + f * 50 + 40) DAY
                    AS DATE) AS end_date
        FROM exh, (SELECT unnest(generate_series(0, 1)) AS f)
        WHERE f <= k % 2
    )
    SELECT title, picture_url, start_date, end_date FROM frames
    """,
)
def exhibitions_timeframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S17: the gomus exhibitions API payload — one nested JSON document →
    exhibition rows with ``picture.original`` lifted and ``time_frames``
    exploded to (title, start_date, end_date).

    Reference: ``FetchExhibitions.extract_row`` (optional picture URL) and
    ``FetchExhibitionTimes.extract_row`` (one row per time frame,
    ISO-parsed dates) — src/gomus/exhibitions.py:40-115.

    Round-trip design: the raw JSON is built from ``nation`` rows
    (exhibition k has 1 + k%2 time frames), parsed back with ``from_json``
    + double ``explode``; the oracle derives the same rows relationally,
    so a wrong parse cannot hash-match.  At scale each API page is one raw
    row — parse fan-out is ``explode``, never a driver loop.
    """
    nation = load_table(spark, sf_dir, "nation")
    raw = nation.select(
        F.to_json(F.struct(
            F.concat(F.lit("Exhibition "), F.col("n_nationkey").cast("string"))
            .alias("title"),
            F.when(F.col("n_nationkey") % 3 == 0, F.struct(
                F.concat(F.lit("https://img.example/"),
                         F.col("n_nationkey").cast("string"))
                .alias("original"))).alias("picture"),
            F.filter(
                F.array(*[
                    F.struct(
                        F.date_format(
                            F.date_add(F.lit("2024-01-01").cast("date"),
                                       F.col("n_nationkey") * 11 + f * 50),
                            "yyyy-MM-dd'T'HH:mm:ss").alias("start_at"),
                        F.date_format(
                            F.date_add(F.lit("2024-01-01").cast("date"),
                                       F.col("n_nationkey") * 11 + f * 50 + 40),
                            "yyyy-MM-dd'T'HH:mm:ss").alias("end_at"),
                        F.lit(f).alias("f"),
                    )
                    for f in (0, 1)
                ]),
                lambda s: s["f"] <= F.col("n_nationkey") % 2,
            ).alias("time_frames"),
        )).alias("payload")
    )
    # aggregate the per-exhibition objects into ONE API page document, as
    # the endpoint returns {"exhibitions": [...]} (per_page=100)
    page = raw.agg(F.concat(
        F.lit('{"exhibitions": ['),
        F.concat_ws(",", F.collect_list("payload")),
        F.lit("]}"),
    ).alias("body"))
    parsed = page.select(
        F.explode(F.from_json("body", _EXH_SCHEMA)["exhibitions"])
        .alias("e"))
    return (
        parsed.select(
            F.col("e.title").alias("title"),
            F.col("e.picture.original").alias("picture_url"),
            F.explode("e.time_frames").alias("tf"),
        )
        .select(
            "title", "picture_url",
            F.to_date(F.col("tf.start_at")).alias("start_date"),
            F.to_date(F.col("tf.end_at")).alias("end_date"),
        )
    )
