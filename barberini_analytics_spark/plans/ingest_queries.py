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

from ..core.cache import FrameCache
from ..core.io import load_table
from .registry import query

#: synthesized raw feeds — the stand-in for fetched API/HTML payloads.
#: The feed construction is bench scaffolding (production reads stored
#: raw responses from the lake; it never re-renders them per query), so
#: the heavy flattens cache their synthesized inputs per (session, sf):
#: repeated runs then time the ENGINE (parse/flatten/join), not the
#: test-data rendering.  Bounded LRU with unpersist-on-evict.
_FEED_CACHE = FrameCache(max_entries=8)


def _feed(spark: SparkSession, sf_dir: str, tag: str, build) -> DataFrame:
    return _FEED_CACHE.get_or_build(
        (spark.sparkContext.applicationId, sf_dir, tag), build)


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


# ---------------------------------------------------------------------------
# S1 + S10 — app-store review feeds: Apple RSS XML + Google Play JSON
# ---------------------------------------------------------------------------

_GPLAY_SCHEMA = (
    "STRUCT<results: ARRAY<STRUCT<"
    "id: STRING, date: STRING, score: INT, text: STRING, "
    "thumbsUp: INT, version: STRING>>>"
)


def _spread_by(df: DataFrame, *cols: str) -> DataFrame:
    """Keyed variant of :func:`_spread`: pin a CPU-heavy aggregation's
    width by hash-repartitioning on its grouping key first.  The
    following ``groupBy`` on the same key reuses the partitioning (no
    second exchange), and AQE leaves user repartitions alone."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(n, *[F.col(c) for c in cols])


def _spread(df: DataFrame) -> DataFrame:
    """Re-spread a payload table across the full core count before a
    CPU-heavy parse projection.  The payload aggregations shuffle few
    bytes, so AQE's size-based coalescing collapses them to 1-3
    partitions — correct for IO, serial for the DOM/JSON/regex parse that
    follows.  One cheap extra exchange buys full parse parallelism; at
    cluster scale this is the standard rebalance-before-CPU-stage move."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(n)


# one from_xml parse per feed — namespaced element names are plain struct
# fields (`im:rating`), the content @type attribute arrives as `_type`
_APPLE_SCHEMA = (
    "STRUCT<entry: ARRAY<STRUCT<id: STRING, title: STRING, "
    "content: ARRAY<STRUCT<_VALUE: STRING, _type: STRING>>, "
    "`im:rating`: STRING, `im:version`: STRING, "
    "`im:voteCount`: STRING, `im:voteSum`: STRING, "
    "updated: STRING>>>"
)


@query(
    "app_review_ingest",
    oracle="""
    SELECT 'appstore' AS source,
           CAST(doc_id AS VARCHAR) AS review_id,
           'app1' AS app_id,
           CASE doc_id % 3 WHEN 0 THEN 'DE' WHEN 1 THEN 'US' ELSE 'GB' END
               AS country_code,
           'Review ' || CAST(doc_id AS VARCHAR) AS title,
           text,
           CAST(1 + doc_id % 5 AS INT) AS rating,
           '2.' || CAST(doc_id % 10 AS VARCHAR) AS app_version,
           CAST(doc_id % 7 AS INT) AS vote_count,
           CAST(doc_id % 4 AS INT) AS vote_sum,
           CAST(NULL AS INT) AS likes,
           DATE '2024-01-01' + CAST(doc_id % 365 AS INT) AS review_date
    FROM documents WHERE n_chars > 0 AND doc_id % 2 = 0
    UNION ALL
    SELECT 'gplay', 'g' || CAST(doc_id AS VARCHAR), 'app1',
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), text,
           CAST(1 + doc_id % 5 AS INT), '3.' || CAST(doc_id % 8 AS VARCHAR),
           CAST(NULL AS INT), CAST(NULL AS INT), CAST(doc_id % 50 AS INT),
           DATE '2024-01-01' + CAST(doc_id % 365 AS INT)
    FROM documents WHERE n_chars > 0 AND doc_id % 2 = 1
    """,
)
def app_review_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 Apple App Store RSS scan + S10 Google Play reviews scan, as one
    tagged review union (the K5 concat shape both stores feed into).

    Apple: per-country XML feeds are built from ``documents`` (entities
    escaped), then parsed back with a single ``from_xml`` per feed — the
    ``content`` array filter on ``@type = "text"`` mirrors
    ``find_first_conditional_tag`` (src/apple_appstore.py:131-167: one
    entry dict per item, ``im:``-namespaced numeric fields).

    Google Play: one JSON payload per language; the unsupported language
    ``xx`` returns the English payload again (gplay_reviews.py:96-101's
    note), so the union carries exact duplicates that
    ``drop_duplicates`` removes before the rename/retype step
    (src/gplay/gplay_reviews.py:25-174).

    Scale: each feed/payload is one raw row (an API page); parse fan-out
    is ``xpath``/``from_json`` + ``explode`` inside the scan stage — no
    driver loop, no Python UDF.  100 TB of feeds = more rows, same plan.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    day = F.date_add(F.lit("2024-01-01").cast("date"),
                     (F.col("doc_id") % 365).cast("int"))

    # --- Apple: build per-country feeds, parse back via xpath ------------
    apple_src = docs.filter(F.col("doc_id") % 2 == 0)
    esc = F.regexp_replace(
        F.regexp_replace(F.regexp_replace("text", "&", "&amp;"),
                         "<", "&lt;"), ">", "&gt;")
    sid = F.col("doc_id").cast("string")
    entry = F.concat(
        F.lit("<entry><id>"), sid,
        F.lit("</id><title>Review "), sid,
        F.lit('</title><content type="html">&lt;p&gt;html&lt;/p&gt;'
              '</content><content type="text">'), esc,
        F.lit("</content><im:rating>"), (1 + F.col("doc_id") % 5).cast("string"),
        F.lit("</im:rating><im:version>2."),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("</im:version><im:voteCount>"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("</im:voteCount><im:voteSum>"),
        (F.col("doc_id") % 4).cast("string"),
        F.lit("</im:voteSum><updated>"),
        F.date_format(day, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("</updated></entry>"),
    )
    country = (F.when(F.col("doc_id") % 3 == 0, "DE")
               .when(F.col("doc_id") % 3 == 1, "US").otherwise("GB"))
    # one feed document per (country, page) — the reference walks
    # `<link rel="next">` pages; pages parse in parallel, and each of the 8
    # xpath DOM parses touches a bounded-size document
    feeds = apple_src.groupBy(
        country.alias("country_code"),
        (F.col("doc_id") / 400).cast("bigint").alias("page")).agg(
        F.concat(
            F.lit('<feed xmlns="http://www.w3.org/2005/Atom" '
                  'xmlns:im="http://itunes.apple.com/rss/">'),
            F.concat_ws("", F.collect_list(entry)),
            F.lit('<link rel="next" href=""/></feed>'),
        ).alias("body"))
    entries = _spread(feeds).select(
        "country_code",
        F.explode(F.from_xml("body", _APPLE_SCHEMA)["entry"]).alias("e"))
    apple = entries.select(
        F.lit("appstore").alias("source"),
        F.col("e.id").alias("review_id"),
        F.lit("app1").alias("app_id"),
        "country_code",
        F.col("e.title").alias("title"),
        # find_first_conditional_tag: the content element with @type="text"
        F.get(F.filter(F.col("e.content"),
                       lambda c: c["_type"] == "text"), 0)["_VALUE"]
        .alias("text"),
        F.col("e.`im:rating`").cast("int").alias("rating"),
        F.col("e.`im:version`").alias("app_version"),
        F.col("e.`im:voteCount`").cast("int").alias("vote_count"),
        F.col("e.`im:voteSum`").cast("int").alias("vote_sum"),
        F.lit(None).cast("int").alias("likes"),
        F.to_date(F.col("e.updated")).alias("review_date"),
    )

    # --- Google Play: per-language JSON, union, dedup, rename ------------
    gsrc = docs.filter(F.col("doc_id") % 2 == 1)
    review_json = F.to_json(F.struct(
        F.concat(F.lit("g"), sid).alias("id"),
        F.date_format(day, "yyyy-MM-dd").alias("date"),
        (1 + F.col("doc_id") % 5).cast("int").alias("score"),
        F.col("text").alias("text"),
        (F.col("doc_id") % 50).cast("int").alias("thumbsUp"),
        F.concat(F.lit("3."), (F.col("doc_id") % 8).cast("string"))
        .alias("version"),
    ))
    actual = F.when((F.col("doc_id") / 2).cast("bigint") % 2 == 0, "de") \
        .otherwise("en")
    payloads = gsrc.groupBy(
        actual.alias("src_lang"),
        (F.col("doc_id") / 1000).cast("bigint").alias("page")).agg(
        F.concat(F.lit('{"results": ['),
                 F.concat_ws(",", F.collect_list(review_json)),
                 F.lit("]}")).alias("body"))
    # requested language -> language the API actually answers with ('xx' is
    # unsupported and falls back to English — duplicate payload on purpose)
    from ..core.localrel import values_df

    lang_map = values_df(spark, [("de", "de"), ("en", "en"), ("xx", "en")],
                         "lang string, src_lang string")
    fetched = lang_map.join(payloads, "src_lang").select("lang", "body")
    parsed = _spread(fetched).select(
        F.explode(F.from_json("body", _GPLAY_SCHEMA)["results"]).alias("r"))
    gplay = (
        parsed.select("r.id", "r.date", "r.score", "r.text", "r.thumbsUp",
                      "r.version")
        .withColumn("app_id", F.lit("app1"))
        .dropDuplicates()
        .select(
            F.lit("gplay").alias("source"),
            F.col("id").alias("review_id"),
            "app_id",
            F.lit(None).cast("string").alias("country_code"),
            F.lit(None).cast("string").alias("title"),
            "text",
            F.col("score").cast("int").alias("rating"),
            F.col("version").alias("app_version"),
            F.lit(None).cast("int").alias("vote_count"),
            F.lit(None).cast("int").alias("vote_sum"),
            F.col("thumbsUp").cast("int").alias("likes"),
            F.to_date("date").alias("review_date"),
        ))
    return apple.unionByName(gplay)


# ---------------------------------------------------------------------------
# S6 — Instagram audience demographics: breakdown unpivot
# ---------------------------------------------------------------------------

_IG_SCHEMA = (
    "STRUCT<data: ARRAY<STRUCT<total_value: STRUCT<breakdowns: ARRAY<STRUCT<"
    "dimension_keys: ARRAY<STRING>, "
    "results: ARRAY<STRUCT<dimension_values: ARRAY<STRING>, value: BIGINT>>"
    ">>>>>>"
)


@query(
    "ig_audience_breakdown",
    oracle="""
    WITH seg AS (
        SELECT CASE c_custkey % 3 WHEN 0 THEN 'F' WHEN 1 THEN 'M'
                    ELSE 'U' END AS gender,
               CASE (c_custkey // 3) % 6 WHEN 0 THEN '13-17'
                    WHEN 1 THEN '18-24' WHEN 2 THEN '25-34'
                    WHEN 3 THEN '35-44' WHEN 4 THEN '45-54'
                    ELSE '55+' END AS age,
               c_nationkey
        FROM customer
    )
    SELECT 'gender_age' AS metric, gender, age,
           CAST(NULL AS VARCHAR) AS country,
           CAST(count(*) AS BIGINT) AS follower_count
    FROM seg GROUP BY gender, age
    UNION ALL
    SELECT 'country', NULL, NULL, n_name, CAST(count(*) AS BIGINT)
    FROM seg JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
)
def ig_audience_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: the Graph API ``follower_demographics`` breakdown response —
    ``dimension_keys`` zipped against each result's ``dimension_values``
    (the reference's dict-comprehension unpivot,
    src/instagram.py:622-642) — for both the two-dimensional gender×age
    metric (FetchIgAudienceGenderAge) and the one-dimensional country
    metric (FetchIgAudienceOrigin, src/instagram.py:547-584).

    Round-trip: payloads are aggregated from ``customer`` segments, parsed
    with ``from_json``; the zip is ``map_from_arrays`` so the same plan
    serves any breakdown arity.  The oracle groups relationally.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    gender = (F.when(F.col("c_custkey") % 3 == 0, "F")
              .when(F.col("c_custkey") % 3 == 1, "M").otherwise("U"))
    age_idx = (F.col("c_custkey") / 3).cast("bigint") % 6
    age = (F.when(age_idx == 0, "13-17").when(age_idx == 1, "18-24")
           .when(age_idx == 2, "25-34").when(age_idx == 3, "35-44")
           .when(age_idx == 4, "45-54").otherwise("55+"))

    def payload(grouped: DataFrame, keys: list[str], metric: str) -> DataFrame:
        keys_json = ", ".join(f'"{k}"' for k in keys)
        res = F.to_json(F.struct(
            F.array(*keys).alias("dimension_values"),
            F.col("count").alias("value")))
        return grouped.agg(F.concat(
            F.lit('{"data": [{"total_value": {"breakdowns": '
                  '[{"dimension_keys": [' + keys_json + '], "results": ['),
            F.concat_ws(",", F.collect_list(res)),
            F.lit(']}]}}]}'),
        ).alias("body")).withColumn("metric", F.lit(metric))

    ga = payload(
        cust.groupBy(gender.alias("gender"), age.alias("age")).count(),
        ["gender", "age"], "gender_age")
    co = payload(
        cust.join(F.broadcast(nation),
                  cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("country")).count(),
        ["country"], "country")
    raw = ga.select("metric", "body").unionByName(co.select("metric", "body"))

    parsed = (
        raw.select("metric",
                   F.explode(F.from_json("body", _IG_SCHEMA)["data"])
                   .alias("d"))
        .select("metric", F.explode("d.total_value.breakdowns").alias("b"))
        .select("metric", F.col("b.dimension_keys").alias("ks"),
                F.explode("b.results").alias("r"))
        .select("metric",
                F.map_from_arrays("ks", F.col("r.dimension_values"))
                .alias("m"),
                F.col("r.value").alias("follower_count"))
    )
    return parsed.select(
        "metric",
        F.col("m")["gender"].alias("gender"),
        F.col("m")["age"].alias("age"),
        F.col("m")["country"].alias("country"),
        "follower_count",
    )


# ---------------------------------------------------------------------------
# S18b — SePL lexicon parse + two-dataset phrase_polarity union view
# ---------------------------------------------------------------------------

# a small SentiWS-side sample in the raw line format (word|POS \t weight \t
# inflections).  Constant on both sides: the oracle embeds it as VALUES.
SENTIWS_SAMPLE = (
    ("gut", "ADJX", 0.7, ("guter", "gute", "gutes")),
    ("schlecht", "ADJX", -0.8, ("schlechter", "schlechte")),
    ("Freude", "NN", 0.6, ("Freuden",)),
    ("Angst", "NN", -0.5, ("Ängste", "Ängsten")),
    ("lieben", "VVINF", 0.9, ("liebe", "liebt", "liebte")),
)

_SENTIWS_VALUES = ", ".join(
    f"('{w}', '{p}', {v})" for w, p, v, _ in SENTIWS_SAMPLE)


@query(
    "sepl_phrase_polarity",
    oracle=f"""
    WITH sentiws(phrase, pos_tag, weight) AS (VALUES {_SENTIWS_VALUES}),
    sepl AS (
        SELECT lower(array_to_string(
                   (string_split(p_name, ' '))
                       [1:1 + CAST(p_partkey % 3 AS INT)], ' ')) AS phrase,
               ((p_partkey % 21) - 10) / 10.0 AS weight,
               CASE CAST(p_partkey % 3 AS INT) WHEN 0 THEN 'a'
                    WHEN 1 THEN 'n' ELSE 'v' END AS ptype
        FROM part
    ),
    u AS (
        SELECT phrase, pos_tag, CAST(weight AS DOUBLE) AS weight,
               'SentiWS' AS dataset
        FROM sentiws
        UNION
        SELECT phrase,
               CASE ptype WHEN 'a' THEN 'ADJX' WHEN 'n' THEN 'NN'
                    ELSE 'VVINF' END,
               CAST(weight AS DOUBLE), 'SePL'
        FROM sepl
    )
    SELECT phrase, pos_tag, weight,
           CASE WHEN weight > 0 THEN 'positive'
                WHEN weight < 0 THEN 'negative' END AS polarity,
           dataset,
           CAST(len(string_split_regex(phrase, '\\s+')) AS INT) AS n
    FROM u
    """,
)
def sepl_phrase_polarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18: SePL CSV parse (``;``-separated, ``#`` comment lines,
    ``manual_correction`` '' -> false / 'm' -> true,
    src/absa/phrase_polarity.py:125-178) + the SentiWS raw-line parse
    (``sources/sentiws.py``), unioned into the two-dataset
    ``absa.phrase_polarity`` view: SePL ``phrase_type`` a/n/v mapped to
    ADJX/NN/VVINF pos tags, sign-derived polarity (NULL at weight 0 —
    3VL), dataset tag, and ``n`` = phrase word count
    (migration_028.sql:31-63).

    Round-trip: SePL CSV lines are built from ``part`` (1-3-word phrases
    from ``p_name``), interleaved with comment rows, parsed back by
    ``split``; the UNION is distinct, as in the reference view.  Scale:
    lexicons are small by nature, but the parse is still a single
    projection over a line scan — it would take 100 TB of lines unfazed.
    """
    from ..sources.sentiws import parse_sentiws_lines

    part = load_table(spark, sf_dir, "part")
    nw = (1 + F.col("p_partkey") % 3).cast("int")
    words = F.split(F.col("p_name"), " ")
    phrase = F.lower(F.concat_ws(" ", F.slice(words, F.lit(1), nw)))
    weight = ((F.col("p_partkey") % 21) - 10) / F.lit(10.0)
    ptype = (F.when(F.col("p_partkey") % 3 == 0, "a")
             .when(F.col("p_partkey") % 3 == 1, "n").otherwise("v"))
    line = F.concat_ws(
        ";", phrase,
        F.format_string("%.1f", weight),
        F.format_string("%.1f", (F.col("p_partkey") % 7) / F.lit(10.0)),
        F.format_string("%.2f", (F.col("p_partkey") % 5) / F.lit(100.0)),
        ptype,
        F.when(F.col("p_partkey") % 5 == 0, "m").otherwise(""))
    region = load_table(spark, sf_dir, "region")
    comments = region.select(F.concat(F.lit("# "), F.col("r_name"))
                             .alias("value"))
    raw = part.select(line.alias("value")).unionByName(comments)

    s = F.split("value", ";")
    sepl = (
        raw.filter(~F.col("value").startswith("#"))
        .select(
            s.getItem(0).alias("phrase"),
            s.getItem(1).cast("double").alias("weight"),
            s.getItem(2).cast("double").alias("stddev"),
            s.getItem(3).cast("double").alias("stderr"),
            s.getItem(4).alias("phrase_type"),
            (s.getItem(5) == "m").alias("manual_correction"),
        ))

    from ..core.localrel import values_df

    sentiws_lines = values_df(
        spark,
        [(f"{w}|{p}\t{v}\t{','.join(infl)}",)
         for w, p, v, infl in SENTIWS_SAMPLE], "value string")
    sentiws = parse_sentiws_lines(sentiws_lines)

    u = (
        sentiws.select(
            F.col("word").alias("phrase"), "pos_tag",
            F.col("weight").cast("double").alias("weight"),
            F.lit("SentiWS").alias("dataset"))
        .unionByName(sepl.select(
            "phrase",
            F.when(F.col("phrase_type") == "a", "ADJX")
            .when(F.col("phrase_type") == "n", "NN")
            .otherwise("VVINF").alias("pos_tag"),
            F.col("weight").cast("double").alias("weight"),
            F.lit("SePL").alias("dataset")))
        .distinct()
    )
    return u.select(
        "phrase", "pos_tag", "weight",
        F.when(F.col("weight") > 0, "positive")
        .when(F.col("weight") < 0, "negative").alias("polarity"),
        "dataset",
        F.size(F.split("phrase", r"\s+")).alias("n"),
    )


# ---------------------------------------------------------------------------
# S2 + S3 + S4 — Facebook Graph API: posts, insights, comments
# ---------------------------------------------------------------------------

_FB_POSTS_SCHEMA = (
    "STRUCT<data: ARRAY<STRUCT<id: STRING, created_time: STRING, "
    "message: STRING>>>"
)

# the insights `value` is heterogeneous (map for reactions/activity/clicks,
# scalar for negative-feedback/impressions).  The body is parsed ONCE with
# `value` declared STRING — Spark's Jackson parser hands back the raw JSON
# text for object values and the literal for scalars — then each picked
# metric gets a second, per-value parse of a few dozen bytes.  One
# full-document parse instead of two (the two-pass PERMISSIVE variant cost
# 2x the heavy parse; measured ~35% of the query).
_FB_INS_STR_SCHEMA = (
    "STRUCT<data: ARRAY<STRUCT<name: STRING, "
    "values: ARRAY<STRUCT<value: STRING>>>>>"
)

_FB_COMMENTS_SCHEMA = (
    "STRUCT<data: ARRAY<STRUCT<id: STRING, created_time: STRING, "
    "comment_count: INT, message: STRING, `from`: STRUCT<name: STRING>, "
    "comments: STRUCT<data: ARRAY<STRUCT<id: STRING, created_time: STRING, "
    "message: STRING, `from`: STRUCT<name: STRING>>>>>>>"
)

_MUSEUM = "Museum Barberini"
_PAGE_ID = "1234567890"


@query(
    "fb_graph_flatten",
    oracle=f"""
    WITH posts AS (
        SELECT '{_PAGE_ID}' AS page_id,
               CAST(o_orderkey AS VARCHAR) AS post_id,
               CAST(o_orderdate AS TIMESTAMP) + INTERVAL 12 HOUR AS post_date,
               'Post ' || CAST(o_orderkey AS VARCHAR) || ' '
                   || lower(o_orderpriority) AS post_text,
               o_orderkey AS ok, o_orderstatus AS st
        FROM orders
    ),
    ins AS (
        SELECT CAST(ok AS VARCHAR) AS post_id,
               CAST(ok % 100 AS INT) AS react_like,
               CAST(ok % 50 AS INT) AS react_love,
               CAST(ok % 20 AS INT) AS react_wow,
               CAST(CASE WHEN ok % 2 = 0 THEN ok % 30 ELSE 0 END AS INT)
                   AS react_haha,
               CAST(CASE WHEN ok % 2 = 0 THEN ok % 10 ELSE 0 END AS INT)
                   AS react_sorry,
               CAST(CASE WHEN ok % 2 = 0 THEN ok % 5 ELSE 0 END AS INT)
                   AS react_anger,
               CAST(ok % 90 AS INT) AS likes,
               CAST(ok % 40 AS INT) AS shares,
               CAST(ok % 60 AS INT) AS comments,
               CAST(CASE WHEN ok % 3 <> 0 THEN ok % 25 END AS INT)
                   AS video_clicks,
               CAST(CASE WHEN ok % 3 <> 0 THEN ok % 15 END AS INT)
                   AS link_clicks,
               CAST(CASE WHEN ok % 3 <> 0 THEN ok % 35 END AS INT)
                   AS other_clicks,
               CAST(CASE WHEN ok % 7 <> 0 THEN ok % 4 END AS INT)
                   AS negative_feedback,
               CAST(CASE WHEN st = 'O' THEN ok % 1000 END AS INT)
                   AS paid_impressions,
               CAST(ok % 2000 AS INT) AS post_impressions,
               CAST(ok % 1500 AS INT) AS post_impressions_unique
        FROM posts
    ),
    toplevel AS (
        -- duplicate (l_orderkey, l_linenumber) pairs model the reference's
        -- #227 duplicate comment fetches: every field derives from cid, so
        -- the duplicates are byte-identical and the dedup is DISTINCT
        SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS post_id,
               l_orderkey * 10 + l_linenumber AS cid
        FROM lineitem
    ),
    cm AS (
        SELECT post_id, CAST(cid AS VARCHAR) AS comment_id,
               CAST(DATE '2024-01-01' + CAST(cid % 365 AS INT) AS TIMESTAMP)
                   + INTERVAL 8 HOUR AS comment_date,
               'Comment ' || CAST(cid AS VARCHAR) AS comment_text,
               (cid % 10 = 0) AS is_from_museum,
               CAST(NULL AS VARCHAR) AS response_to
        FROM toplevel
        UNION ALL
        SELECT post_id, CAST(cid * 10 + 9 AS VARCHAR),
               CAST(DATE '2024-01-01' + CAST((cid + 1) % 365 AS INT)
                    AS TIMESTAMP) + INTERVAL 9 HOUR,
               'Reply ' || CAST(cid AS VARCHAR),
               (cid % 7 = 0), CAST(cid AS VARCHAR)
        FROM toplevel WHERE cid % 3 = 0 AND cid % 15 <> 0
    )
    SELECT p.page_id, p.post_id, p.post_date, p.post_text,
           i.react_like, i.react_love, i.react_wow, i.react_haha,
           i.react_sorry, i.react_anger, i.likes, i.shares, i.comments,
           i.video_clicks, i.link_clicks, i.other_clicks,
           i.negative_feedback, i.paid_impressions, i.post_impressions,
           i.post_impressions_unique,
           c.comment_id, c.comment_date, c.comment_text, c.is_from_museum,
           c.response_to
    FROM posts p
    JOIN ins i USING (post_id)
    LEFT JOIN cm c USING (post_id)
    """,
)
def fb_graph_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 + S3 + S4: the Facebook Graph API ingest chain as one flatten.

    - S2 posts scan: paginated ``{"data": [...]}`` pages; the composite
      ``id`` splits into ``(page_id, post_id)`` (src/facebook.py:117-124).
    - S3 insights: wide metric extraction from the per-post insights
      response — map-valued metrics (reactions/activity/clicks, with
      ``.get(key, 0)`` defaulting) and scalar metrics, where an absent
      metric leaves NULL but an absent key inside a present metric is 0
      (src/facebook.py:225-305's try/IndexError blocks).
    - S4 comments: toplevel comments plus one reply level; replies carry
      ``response_to`` = parent comment id; ``comment_count > 0`` with a
      missing ``comments`` field is the reference's KeyError skip
      (src/facebook.py:327-477); dedup on (comment_id, post_id).

    The heterogeneous insights ``value`` is parsed with two PERMISSIVE
    ``from_json`` passes re-aligned by ``arrays_zip`` — no UDF.  Output is
    comment-grained with post + metric columns (J2's posts↔rich left
    join); posts without comments survive with NULL comment fields.

    Scale: one raw row per API response; every flatten is
    ``from_json``+``explode`` in the scan stage.  The final joins are
    equi-joins on post_id (AQE picks broadcast for the dim side).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ok = F.col("o_orderkey")

    # --- S2: posts pages ------------------------------------------------
    # payloads are hand-concatenated JSON (all values are JSON-safe by
    # construction): one flat format_string keeps the codegen tree small —
    # the nested to_json/map_from_entries equivalent compiled to ~4x the
    # generated code and dominated the first-run time
    post_obj = F.format_string(
        '{"id":"%s_%d","created_time":"%sT12:00:00",'
        '"message":"Post %d %s"}',
        F.lit(_PAGE_ID), ok, F.date_format("o_orderdate", "yyyy-MM-dd"),
        ok, F.lower("o_orderpriority"))
    # one page per ~100 posts — the API's limit=100 pagination; thousands
    # of page rows parse in parallel instead of 4 giant documents.  The
    # page-concat agg is CPU-heavy with few shuffle bytes — pin its width
    # with a keyed repartition (see _spread_by) or AQE serializes it.
    # The final _spread is INSIDE the cached build: the persisted feed
    # then already carries full-width partitioning, so per-run parses
    # read the cache directly instead of paying a fresh round-robin
    # exchange of the ~100 MB body column on every execution (the r13
    # profile showed two such 22 MB-write exchanges per warm run).
    pages = _feed(spark, sf_dir, "fb_pages", lambda: _spread(
        _spread_by(orders.withColumn("pg", (ok / 100).cast("bigint")), "pg")
        .groupBy("pg")
        .agg(F.concat(F.lit('{"data": ['),
                      F.concat_ws(",", F.collect_list(post_obj)),
                      F.lit("]}")).alias("body"))))
    posts = (
        pages.select(F.explode(F.from_json("body", _FB_POSTS_SCHEMA)["data"])
                     .alias("p"))
        .select(
            F.split("p.id", "_").getItem(0).alias("page_id"),
            F.split("p.id", "_").getItem(1).alias("post_id"),
            F.to_timestamp("p.created_time").alias("post_date"),
            F.col("p.message").alias("post_text"),
        ))

    # --- S3: per-post insights response ---------------------------------
    def metric(name: str, value_fmt: str, *args) -> F.Column:
        return F.format_string(
            '{"name":"%s","values":[{"value":' + value_fmt + "}]}",
            F.lit(name), *args)

    even = ok % 2 == 0
    reactions = F.when(even, metric(
        "post_reactions_by_type_total",
        '{"like":%d,"love":%d,"wow":%d,"haha":%d,"sorry":%d,"anger":%d}',
        ok % 100, ok % 50, ok % 20, ok % 30, ok % 10, ok % 5,
    )).otherwise(metric(
        "post_reactions_by_type_total",
        '{"like":%d,"love":%d,"wow":%d}', ok % 100, ok % 50, ok % 20))
    activity = metric(
        "post_activity_by_action_type",
        '{"like":%d,"share":%d,"comment":%d}', ok % 90, ok % 40, ok % 60)
    clicks = F.when(ok % 3 != 0, metric(
        "post_clicks_by_type",
        '{"video play":%d,"link clicks":%d,"other clicks":%d}',
        ok % 25, ok % 15, ok % 35))
    # spread INSIDE the cached build (see the pages feed note): the local
    # single-row-group parquet scan is 1 partition, so without it the
    # cached feed would serialize the per-run insights parse
    ins_body = _feed(spark, sf_dir, "fb_ins", lambda: _spread(orders.select(
        ok.cast("string").alias("post_id"),
        F.concat(F.lit('{"data": ['), F.concat_ws(
            ",",
            reactions, activity, clicks,
            F.when(ok % 7 != 0,
                   metric("post_negative_feedback", "%d", ok % 4)),
            F.when(F.col("o_orderstatus") == "O",
                   metric("post_impressions_paid", "%d", ok % 1000)),
            metric("post_impressions", "%d", ok % 2000),
            metric("post_impressions_unique", "%d", ok % 1500),
        ), F.lit("]}")).alias("body"))))

    # the wide extraction is shuffle-free: the `data` array is searched with
    # codegen'd array `filter` per metric name (the reference's
    # `[d for d in data if d['name'] == …][0]` list comprehension) — no
    # explode, no re-aggregation; whole-stage codegen CSE evaluates the
    # single full-body from_json once per row
    parsed = ins_body.select(
        "post_id",
        F.from_json("body", _FB_INS_STR_SCHEMA)["data"].alias("d"))

    def pick(name: str) -> F.Column:
        hit = F.get(F.filter(F.col("d"), lambda x: x["name"] == name), 0)
        return hit["values"].getItem(0)["value"]

    def pick_map(name: str) -> F.Column:
        # per-value re-parse: a few dozen bytes, not the whole body
        return F.from_json(pick(name), "MAP<STRING, BIGINT>")

    wide_maps = parsed.select(
        "post_id",
        pick_map("post_reactions_by_type_total").alias("rmap"),
        pick_map("post_activity_by_action_type").alias("amap"),
        pick_map("post_clicks_by_type").alias("cmap"),
        pick("post_negative_feedback").cast("bigint").alias("neg"),
        pick("post_impressions_paid").cast("bigint").alias("paid"),
        pick("post_impressions").cast("bigint").alias("impr"),
        pick("post_impressions_unique").cast("bigint").alias("impru"),
    )

    def from_map(map_col: str, key: str) -> F.Column:
        # present metric + absent key -> 0; absent metric -> NULL
        return F.when(F.col(map_col).isNotNull(),
                      F.coalesce(F.col(map_col)[key], F.lit(0))).cast("int")

    ins = wide_maps.select(
        "post_id",
        from_map("rmap", "like").alias("react_like"),
        from_map("rmap", "love").alias("react_love"),
        from_map("rmap", "wow").alias("react_wow"),
        from_map("rmap", "haha").alias("react_haha"),
        from_map("rmap", "sorry").alias("react_sorry"),
        from_map("rmap", "anger").alias("react_anger"),
        from_map("amap", "like").alias("likes"),
        from_map("amap", "share").alias("shares"),
        from_map("amap", "comment").alias("comments"),
        from_map("cmap", "video play").alias("video_clicks"),
        from_map("cmap", "link clicks").alias("link_clicks"),
        from_map("cmap", "other clicks").alias("other_clicks"),
        F.col("neg").cast("int").alias("negative_feedback"),
        F.col("paid").cast("int").alias("paid_impressions"),
        F.col("impr").cast("int").alias("post_impressions"),
        F.col("impru").cast("int").alias("post_impressions_unique"),
    )

    # --- S4: comments + one reply level ---------------------------------
    # every comment field derives from cid so that the duplicate
    # (l_orderkey, l_linenumber) pairs in the synthetic table model the
    # reference's #227 duplicate comment fetches (byte-identical rows the
    # (comment_id, post_id) dedup removes)
    cid = li.l_orderkey * 10 + F.col("l_linenumber")
    has_reply = cid % 3 == 0
    epoch = F.lit("2024-01-01").cast("date")
    cname = F.when(cid % 10 == 0, _MUSEUM) \
        .otherwise(F.format_string("User %d", cid % 10))
    rname = F.when(cid % 7 == 0, _MUSEUM) \
        .otherwise(F.format_string("User %d", cid % 7))
    base = F.format_string(
        '{"id":"%d_%d","created_time":"%sT08:00:00","comment_count":%d,'
        '"message":"Comment %d","from":{"name":"%s"}',
        li.l_orderkey, cid,
        F.date_format(F.date_add(epoch, (cid % 365).cast("int")),
                      "yyyy-MM-dd"),
        F.when(has_reply, 1).otherwise(0), cid, cname)
    # KeyError case: count > 0 but no `comments` field (cid % 15 == 0)
    reply_part = F.when(has_reply & (cid % 15 != 0), F.format_string(
        ',"comments":{"data":[{"id":"%d_%d","created_time":"%sT09:00:00",'
        '"message":"Reply %d","from":{"name":"%s"}}]}',
        li.l_orderkey, cid * 10 + 9,
        F.date_format(F.date_add(epoch, ((cid + 1) % 365).cast("int")),
                      "yyyy-MM-dd"),
        cid, rname)).otherwise(F.lit(""))
    comment_obj = F.concat(base, reply_part, F.lit("}"))
    # same build-width pin as the posts pages (CPU-heavy concat agg), and
    # the same spread-inside-the-cache move
    cpages = _feed(spark, sf_dir, "fb_cpages", lambda: _spread(
        _spread_by(li, "l_orderkey").groupBy("l_orderkey").agg(
            F.concat(F.lit('{"data": ['),
                     F.concat_ws(",", F.collect_list(comment_obj)),
                     F.lit("]}")).alias("body"))))
    top = cpages.select(
        F.explode(F.from_json("body", _FB_COMMENTS_SCHEMA)["data"])
        .alias("c"))

    # toplevel + replies in ONE pass: the two-branch union consumed `top`
    # twice, and Catalyst re-runs the generator per consumer — the r13
    # profile showed the full-body from_json over the ~100 MB comments
    # cache executing TWICE per run.  Emitting each comment's row and its
    # optional reply row as one array + explode keeps a single parse.
    def _cm_row(c, response_to):
        return F.struct(
            F.split(c["id"], "_").getItem(0).alias("post_id"),
            F.split(c["id"], "_").getItem(1).alias("comment_id"),
            F.to_timestamp(c["created_time"]).alias("comment_date"),
            c["message"].alias("comment_text"),
            (c["from"]["name"] == _MUSEUM).alias("is_from_museum"),
            response_to.alias("response_to"),
        )

    c = F.col("c")
    # guard on comments.DATA, not the comments struct (ADVICE r13):
    # F.concat returns NULL if ANY argument is NULL, so a non-null
    # comments struct carrying a NULL data array would make transform()
    # return NULL, concat NULL out the whole emit array, and explode
    # silently drop the top-level comment row (the struct-null case is
    # covered too — a NULL struct's field access is NULL)
    emit = F.concat(
        F.array(_cm_row(c, F.lit(None).cast("string"))),
        F.when(
            (c["comment_count"] > 0) & c["comments"]["data"].isNotNull(),
            F.transform(
                c["comments"]["data"],
                lambda r: _cm_row(r, F.split(c["id"], "_").getItem(1))),
        ).otherwise(F.array().cast(
            "array<struct<post_id:string,comment_id:string,"
            "comment_date:timestamp,comment_text:string,"
            "is_from_museum:boolean,response_to:string>>")),
    )
    cm = (top.select(F.explode(emit).alias("e")).select("e.*")
          .dropDuplicates(["comment_id", "post_id"]))

    return (
        posts.join(ins, "post_id")
        .join(cm, "post_id", "left")
        .select(
            "page_id", "post_id", "post_date", "post_text",
            "react_like", "react_love", "react_wow", "react_haha",
            "react_sorry", "react_anger", "likes", "shares", "comments",
            "video_clicks", "link_clicks", "other_clicks",
            "negative_feedback", "paid_impressions", "post_impressions",
            "post_impressions_unique",
            "comment_id", "comment_date", "comment_text", "is_from_museum",
            "response_to",
        ))


# ---------------------------------------------------------------------------
# S13 + S14 — gomus admin-page scrape: booking details + order articles
# ---------------------------------------------------------------------------

from .function_queries import MMH3_SQL_CHAIN  # noqa: E402  (shared oracle)

_GOMUS_ORACLE = r"""
    WITH raw AS (
        SELECT o_orderkey, o_orderdate, o_orderkey % 4 AS lk,
               CASE WHEN c_custkey % 5 <> 0
                    THEN lower(regexp_replace(c_name, '[^a-zA-Z0-9]', '', 'g'))
                         || '@example.com'
               END AS email
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    src AS (
        SELECT o_orderkey AS customer_id, email AS s FROM raw
    ),
""" + MMH3_SQL_CHAIN + r"""
    , booking AS (
        SELECT r.o_orderkey AS order_id,
               CAST(r.o_orderdate AS DATE) AS order_date,
               CASE r.lk WHEN 0 THEN 'Deutsch' WHEN 1 THEN 'Englisch'
                    WHEN 2 THEN 'Französisch' ELSE '' END AS language,
               CASE WHEN r.email IS NULL THEN 0
                    WHEN f.f5 >= 2147483648 THEN f.f5 - 4294967296
                    ELSE f.f5 END AS customer_id
        FROM raw r LEFT JOIN fin f ON f.customer_id = r.o_orderkey
    ),
    article AS (
        SELECT l_orderkey AS order_id,
               CAST(l_partkey AS INT) AS article_id,
               CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'Ticket'
                    WHEN 1 THEN 'Führung' ELSE 'Event' END AS article_type,
               'T' || CAST(l_partkey % 20 AS VARCHAR) AS ticket,
               CASE WHEN l_linenumber % 5 <> 0 THEN CAST(l_shipdate AS DATE)
                    ELSE DATE '1900-01-01' END AS date,
               CAST(l_quantity AS INT) AS quantity,
               CAST(round(l_extendedprice * 100) AS BIGINT) % 100000 / 100.0
                   AS price,
               (l_returnflag = 'R') AS is_cancelled
        FROM lineitem
        WHERE l_linenumber % 7 <> 0          -- no id div -> skipped
          AND l_quantity > 2                 -- empty td[3] -> skipped
          AND CAST(l_quantity AS BIGINT) % 10 <> 9   -- empty ticket -> skipped
    )
    SELECT b.order_id, b.order_date, b.language, b.customer_id,
           a.article_id, a.article_type, a.ticket, a.date, a.quantity,
           a.price, a.is_cancelled
    FROM booking b JOIN article a USING (order_id)
    """


@query("gomus_scrape_flatten", oracle=_GOMUS_ORACLE)
def gomus_scrape_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 + S14: the gomus admin-page scrape chain — booking detail parse
    (order date, language, customer email → mmh3(seed=666) id or 0,
    src/gomus/_utils/scrape_gomus.py:59-256) and the order-contains
    article explode (one ``<tr>`` per article with the reference's three
    defective-row workarounds, scrape_gomus.py:259-382).

    One synthetic HTML document per order (orders×customer for the detail
    header, lineitems as article rows).  The parse is all JVM regexp:
    doc-level ``regexp_extract`` for the booking fields, then
    ``regexp_extract_all`` + ``explode`` for the article rows —
    - rows without the id ``<div>`` are skipped (orders like 671144),
    - rows with an empty ``td[3]`` or empty ``<strong>`` ticket are
      skipped (orders like 478531),
    - a missing ``… Uhr`` infobox date falls back to 1.1.1900
      (orders like 679577),
    - German ``12,34 €`` prices and ``d.M.yyyy`` dates are decoded,
    - ``Storno`` mentions anywhere in the row set ``is_cancelled``.

    The email hash rides the shared murmur3 DuckDB oracle chain
    (function_queries.MMH3_SQL_CHAIN), so S13's ``hash_id`` parity is
    value-checked, with the invalid-email → 0 fallback.

    Scale: one raw row per scraped page; booking fields are per-document
    projections, article fan-out is ``explode`` in the scan stage; the
    only Python is the documented mmh3-parity pandas UDF.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    from ..functions import hashing as H

    lk = F.col("o_orderkey") % 4
    lang = (F.when(lk == 0, "Deutsch").when(lk == 1, "Englisch")
            .when(lk == 2, "Französisch").otherwise(""))
    email = F.when(
        F.col("c_custkey") % 5 != 0,
        F.concat(F.lower(F.regexp_replace("c_name", "[^a-zA-Z0-9]", "")),
                 F.lit("@example.com")))
    header = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("o_orderkey"),
        F.concat(
            F.lit('<div class="breadcrumb"><span>'),
            F.col("o_orderkey").cast("string"),
            F.lit("</span></div><dl><dt>Datum</dt><dd>"),
            F.concat_ws(
                ".",
                F.dayofmonth("o_orderdate").cast("string"),
                F.month("o_orderdate").cast("string"),
                F.year("o_orderdate").cast("string")),
            F.lit(" 10:30</dd></dl><dl><dt>Sprache</dt><dd>"),
            lang, F.lit(" </dd></dl>"),
            F.lit('<div class="customer"><small>'),
            F.coalesce(email, F.lit("keine Mail")),
            F.lit("</small></div>"),
        ).alias("head"))

    # --- one <tr> per article, with the three defective-row shapes -------
    qty_bad = F.col("l_quantity") <= 2
    ticket_empty = F.col("l_quantity").cast("bigint") % 10 == 9
    id_div = F.when(F.col("l_linenumber") % 7 == 0, F.lit("<td></td>")) \
        .otherwise(F.concat(F.lit("<td><div> "),
                            F.col("l_partkey").cast("string"),
                            F.lit(" </div>")))
    atype = (F.when(F.col("l_linenumber") % 3 == 0, "Ticket")
             .when(F.col("l_linenumber") % 3 == 1, "Führung")
             .otherwise("Event"))
    raw_date = F.when(
        F.col("l_linenumber") % 5 != 0,
        F.concat(F.concat_ws(
            ".",
            F.dayofmonth("l_shipdate").cast("string"),
            F.month("l_shipdate").cast("string"),
            F.year("l_shipdate").cast("string")), F.lit(" 14:30 Uhr"))
    ).otherwise(F.lit("kein Datum"))
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint") % 100000
    price_txt = F.translate(
        F.format_string("%.2f", cents / F.lit(100.0)), ".", ",")
    td3 = F.when(qty_bad, F.lit("<td></td>")) \
        .when(ticket_empty, F.lit("<td><strong></strong></td>")) \
        .otherwise(F.concat(F.lit("<td><strong>T"),
                            (F.col("l_partkey") % 20).cast("string"),
                            F.lit("</strong></td>")))
    tr = F.concat(
        F.lit("<tr>"), id_div,
        F.lit('<i title="'), atype, F.lit('"></i></td>'),
        F.lit("<td><div>Info "), raw_date, F.lit("</div></td>"),
        td3,
        F.lit("<td>"), F.col("l_quantity").cast("int").cast("string"),
        F.lit("</td><td>"), price_txt, F.lit(" €</td>"),
        F.when(F.col("l_returnflag") == "R",
               F.lit("<td>Stornogebühr</td>")).otherwise(F.lit("")),
        F.lit("</tr>"))
    # explicit keyed repartition BEFORE the build agg: the reduce stage
    # concatenates the per-order HTML (CPU-heavy, few shuffle bytes), so
    # AQE's size-based coalescing would otherwise run it on ~3 tasks —
    # the build-side twin of the _spread() parse fix.  The groupBy reuses
    # this partitioning, so no extra shuffle is added.
    tables = _spread_by(li, "l_orderkey").groupBy("l_orderkey").agg(
        F.concat(F.lit("<table><tbody>"),
                 F.concat_ws("", F.collect_list(tr)),
                 F.lit("</tbody></table>")).alias("tbl"))

    # spread inside the cached build (see fb_graph_flatten): per-run
    # parses read the pre-spread cache with no fresh exchange
    docs = _feed(spark, sf_dir, "gomus_docs", lambda: _spread(
        header.join(tables, header.o_orderkey == tables.l_orderkey)
        .select(F.concat("head", "tbl").alias("doc"))))

    # --- parse: booking fields (doc level), then article explode ---------
    mail_raw = F.regexp_extract("doc", r"<small>([^<]*)</small>", 1)
    mail_valid = F.when(mail_raw.rlike(r"^\S+@\S+\.\S+$"), mail_raw)
    booked = docs.select(
        "doc",
        F.regexp_extract("doc", r"<span>(\d+)</span>", 1).cast("bigint")
        .alias("order_id"),
        F.to_date(
            F.regexp_extract("doc", r"<dt>Datum</dt><dd>([\d.]+)", 1),
            "d.M.yyyy").alias("order_date"),
        F.trim(F.regexp_extract(
            "doc", r"<dt>Sprache</dt><dd>([^<]*)</dd>", 1)).alias("language"),
        F.coalesce(H.hash_id(mail_valid, F.lit(None)), F.lit(0))
        .alias("customer_id"),
    )
    # linear row split: '</tr>'-delimited fragments, each row's content is
    # what follows the fragment's last '<tr>'.  The earlier non-greedy
    # regexp_extract_all backtracked over the whole document per row —
    # O(doc²) on long bookings; split + substring_index is one pass.
    rows = (
        booked.select(
            "order_id", "order_date", "language", "customer_id",
            F.explode(F.split("doc", "</tr>")).alias("__frag"))
        .filter(F.col("__frag").contains("<tr>"))
        .select(
            "order_id", "order_date", "language", "customer_id",
            F.substring_index("__frag", "<tr>", -1).alias("tr"))
    )
    # the reference's skip workarounds: no id div / empty td[3] / '' ticket
    arts = rows.filter(
        (F.regexp_extract("tr", r"^<td><div>([^<]*)</div>", 1) != "")
        & F.col("tr").rlike("<strong>[^<]")
    )
    return arts.select(
        "order_id", "order_date", "language", "customer_id",
        F.trim(F.regexp_extract("tr", r"^<td><div>([^<]*)</div>", 1))
        .cast("int").alias("article_id"),
        F.regexp_extract("tr", r'<i title="([^"]*)"', 1).alias("article_type"),
        F.regexp_extract("tr", r"<strong>([^<]*)</strong>", 1).alias("ticket"),
        F.coalesce(
            F.expr(r"try_to_date(regexp_extract(tr, "
                   r"'(\\d+\\.\\d+\\.\\d+)[^<]*Uhr', 1), 'd.M.yyyy')"),
            F.to_date(F.lit("1.1.1900"), "d.M.yyyy")).alias("date"),
        F.regexp_extract("tr", r"</td><td>(\d+)</td><td>", 1).cast("int")
        .alias("quantity"),
        F.regexp_replace(
            F.regexp_extract("tr", r"<td>([\d.,]+) €</td>", 1), ",", ".")
        .cast("double").alias("price"),
        F.col("tr").rlike("(S|s)torn(o|ier)").alias("is_cancelled"),
    )


# ---------------------------------------------------------------------------
# S5 + S8 + S11 + S16 — misc source adapters, one tagged union
# ---------------------------------------------------------------------------

_MISC_TS_BASE = "TIMESTAMP '2024-01-01 00:00:00'"
_MISC_FETCH_TS = "2024-06-01 12:00:00"


@query(
    "misc_source_parse",
    oracle=f"""
    -- S5: IG media adapter (reels excluded, caption NULL every 3rd)
    SELECT 'ig_post' AS kind,
           'ig' || CAST(doc_id AS VARCHAR) AS id,
           CASE WHEN doc_id % 3 = 0 THEN NULL ELSE text END AS txt,
           CAST(doc_id % 100 AS INT) AS n1,
           CAST(doc_id % 20 AS INT) AS n2,
           CAST(NULL AS DATE) AS dt,
           {_MISC_TS_BASE} + (doc_id % 10000) * INTERVAL 1 MINUTE AS ts
    FROM documents WHERE doc_id % 4 = 0 AND doc_id % 5 <> 0
    UNION ALL
    -- S8: tweet extract (raw fed twice, dropDuplicates collapses)
    SELECT 'tweet',
           CAST(doc_id AS VARCHAR) || ':' ||
               CASE WHEN doc_id % 6 = 1
                    THEN CAST(doc_id - 1 AS VARCHAR) ELSE '' END,
           text, CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS DATE),
           {_MISC_TS_BASE} + (doc_id % 10000) * INTERVAL 1 MINUTE
    FROM documents WHERE doc_id % 4 = 1
    UNION ALL
    -- S8: tweet performance snapshot (constant fetch timestamp)
    SELECT 'tweet_perf', CAST(doc_id AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(doc_id % 97 AS INT), CAST(doc_id % 31 AS INT),
           CAST(NULL AS DATE), TIMESTAMP '{_MISC_FETCH_TS}'
    FROM documents WHERE doc_id % 4 = 1
    UNION ALL
    -- S11: Excel sheet rows (serial date round-trips to the order date)
    SELECT 'excel_order', 'x' || CAST(o_orderkey AS VARCHAR),
           CAST(NULL AS VARCHAR),
           CAST(round(o_totalprice * 100) AS INT), CAST(NULL AS INT),
           CAST(o_orderdate AS DATE), CAST(NULL AS TIMESTAMP)
    FROM orders WHERE o_orderkey % 11 = 0
    UNION ALL
    -- S16: quota admin page fields
    SELECT 'quota', 'q' || CAST(c_custkey AS VARCHAR), trim(c_name),
           CAST(NULL AS INT), CAST(NULL AS INT),
           DATE '2023-01-01' + CAST(c_custkey % 300 AS INT),
           CAST(DATE '2023-01-01' + CAST(c_custkey % 300 AS INT)
                + CAST(c_custkey % 60 AS INT) AS TIMESTAMP)
    FROM customer WHERE c_custkey % 10 = 0
    """,
)
def misc_source_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 + S8 + S11 + S16 in one tagged union: each branch synthesizes the
    raw payload its source would fetch, round-trips it through the REAL
    library adapter, and lands in a common (kind, id, txt, n1, n2, dt, ts)
    frame the oracle recomputes directly.

    * S5 ``ig_post``: raw media rows → ``extract_ig_posts`` typed adapter
      (caption NULL-default) → ``exclude_reels`` permalink predicate
      (src/instagram.py:141-226, 392).
    * S8 ``tweet``/``tweet_perf``: the raw twint frame is fed in TWICE and
      ``extract_tweets``'s dropDuplicates collapses it (src/twitter.py:
      49-67); performance rows stamp a constant fetch timestamp
      (src/twitter.py:79-104).
    * S11 ``excel_order``: orders print as CSV lines of a (sheet_index,
      row_index, line) workbook — junk sheet 0 and a header row prove the
      sheet filter and header skip — then ``parse_sheet`` +
      ``decode_excel_serial`` recover typed rows; the Excel serial date
      round-trips exactly (src/gomus/_utils/fetch_report.py:18-87,
      orders.py:86-87).
    * S16 ``quota``: admin-page HTML built per customer, parsed back by
      ``parse_quota_pages`` regexes — dd[1]=update, dd[2]=creation, German
      d.M.yyyy dates (src/gomus/quotas.py:26-68).

    Scale: every branch is a codegen projection over its scan (regex /
    from_csv / cast — no UDF, no explode beyond the raw build); the union
    is append-only.  100 TB of raw pages = more rows, same plan.
    """
    from ..sources.excel_report import decode_excel_serial, parse_sheet
    from ..sources.gomus_quota import parse_quota_pages
    from ..sources.instagram import exclude_reels, extract_ig_posts
    from ..sources.twitter import extract_tweet_performance, extract_tweets

    docs = load_table(spark, sf_dir, "documents")
    minutes = F.expr(
        "timestamp'2024-01-01 00:00:00' + "
        "make_interval(0, 0, 0, 0, 0, cast(doc_id % 10000 as int), 0)")
    sid = F.col("doc_id").cast("string")

    # --- S5: raw IG media rows → typed adapter → reel filter ------------
    ig_raw = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("ig"), sid).alias("id"),
        F.when(F.col("doc_id") % 3 != 0, F.col("text")).alias("caption"),
        minutes.alias("timestamp"),
        F.lit("IMAGE").alias("media_type"),
        (F.col("doc_id") % 100).cast("int").alias("like_count"),
        (F.col("doc_id") % 20).cast("int").alias("comments_count"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("https://ig/reel/"), sid))
        .otherwise(F.concat(F.lit("https://ig/p/"), sid)).alias("permalink"),
    )
    ig = exclude_reels(extract_ig_posts(ig_raw)).select(
        F.lit("ig_post").alias("kind"),
        F.col("id"),
        F.col("caption").alias("txt"),
        F.col("like_count").alias("n1"),
        F.col("comments_count").alias("n2"),
        F.lit(None).cast("date").alias("dt"),
        F.col("timestamp").alias("ts"),
    )

    # --- S8: twint frame (fed twice) → extract + performance ------------
    tw_raw = docs.filter(F.col("doc_id") % 4 == 1).select(
        (F.col("doc_id") % 50).cast("string").alias("user_id"),
        sid.alias("tweet_id"),
        F.col("text"),
        F.when(F.col("doc_id") % 6 == 1,
               (F.col("doc_id") - 1).cast("string")).alias("parent_tweet_id"),
        minutes.alias("timestamp"),
        (F.col("doc_id") % 97).cast("int").alias("likes"),
        (F.col("doc_id") % 31).cast("int").alias("retweets"),
        (F.col("doc_id") % 13).cast("int").alias("replies"),
    )
    tweets = extract_tweets(tw_raw.unionAll(tw_raw)).select(
        F.lit("tweet").alias("kind"),
        F.concat("tweet_id", F.lit(":"),
                 F.coalesce("response_to", F.lit(""))).alias("id"),
        F.col("text").alias("txt"),
        F.lit(None).cast("int").alias("n1"),
        F.lit(None).cast("int").alias("n2"),
        F.lit(None).cast("date").alias("dt"),
        F.col("post_date").alias("ts"),
    )
    perf = extract_tweet_performance(tw_raw, _MISC_FETCH_TS).select(
        F.lit("tweet_perf").alias("kind"),
        F.col("tweet_id").alias("id"),
        F.lit(None).cast("string").alias("txt"),
        F.col("likes").alias("n1"),
        F.col("retweets").alias("n2"),
        F.lit(None).cast("date").alias("dt"),
        F.col("timestamp").alias("ts"),
    )

    # --- S11: workbook line table → sheet select → typed CSV parse ------
    orders = load_table(spark, sf_dir, "orders") \
        .filter(F.col("o_orderkey") % 11 == 0)
    data_rows = orders.select(
        F.lit(1).alias("sheet_index"),
        # +1: row 0 is the header (and orderkey 0 exists in the data)
        (F.col("o_orderkey") + 1).alias("row_index"),
        F.concat_ws(
            ",",
            F.col("o_orderkey").cast("string"),
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1899-12-30").cast("date")).cast("string"),
            F.round(F.col("o_totalprice") * 100).cast("int").cast("string"),
        ).alias("line"),
    )
    from ..core.localrel import values_df

    fixed = values_df(
        spark,
        [(0, 0, "junk,0,0"), (1, 0, "order_id,order_date,amount_cents")],
        "sheet_index bigint, row_index bigint, line string")
    workbook = data_rows.unionByName(fixed)
    sheet = decode_excel_serial(
        parse_sheet(workbook, sheet_index=1,
                    schema="order_id INT, order_date INT, amount_cents INT"),
        "order_date")
    excel = sheet.select(
        F.lit("excel_order").alias("kind"),
        F.concat(F.lit("x"), F.col("order_id").cast("string")).alias("id"),
        F.lit(None).cast("string").alias("txt"),
        F.col("amount_cents").alias("n1"),
        F.lit(None).cast("int").alias("n2"),
        F.col("order_date").alias("dt"),
        F.lit(None).cast("timestamp").alias("ts"),
    )

    # --- S16: quota admin pages → regex parse ---------------------------
    cust = load_table(spark, sf_dir, "customer") \
        .filter(F.col("c_custkey") % 10 == 0)
    creation = F.date_add(F.lit("2023-01-01").cast("date"),
                          (F.col("c_custkey") % 300).cast("int"))
    update = F.date_add(creation, (F.col("c_custkey") % 60).cast("int"))
    pages = cust.select(F.concat(
        F.lit("<div><span>"), F.col("c_custkey").cast("string"),
        F.lit("</span><h3> "), F.col("c_name"),
        F.lit(" </h3><dl><dt>Daten</dt><dd>"),
        F.date_format(update, "d.M.yyyy"),
        F.lit("</dd> <dd>"),
        F.date_format(creation, "d.M.yyyy"),
        F.lit("</dd></dl></div>"),
    ).alias("html"))
    quotas = parse_quota_pages(pages).select(
        F.lit("quota").alias("kind"),
        F.concat(F.lit("q"), F.col("quota_id").cast("string")).alias("id"),
        F.col("name").alias("txt"),
        F.lit(None).cast("int").alias("n1"),
        F.lit(None).cast("int").alias("n2"),
        F.col("creation_date").alias("dt"),
        F.col("update_date").cast("timestamp").alias("ts"),
    )

    return ig.unionByName(tweets).unionByName(perf) \
        .unionByName(excel).unionByName(quotas)
