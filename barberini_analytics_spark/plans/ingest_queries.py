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


# ---------------------------------------------------------------------------
# S1 + S10 — app-store review feeds: Apple RSS XML + Google Play JSON
# ---------------------------------------------------------------------------

_GPLAY_SCHEMA = (
    "STRUCT<results: ARRAY<STRUCT<"
    "id: STRING, date: STRING, score: INT, text: STRING, "
    "thumbsUp: INT, version: STRING>>>"
)


def _xp(tail: str, alias: str):
    """xpath over the namespaced feed body; local-name() sidesteps the
    xmlns:im prefix (Spark's xpath has no namespace context)."""
    return F.expr(
        "xpath(body, '//*[local-name()=\"entry\"]/" + tail + "')"
    ).alias(alias)


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
    escaped), then parsed back with ``xpath`` array extraction — the
    ``content[@type="text"]`` predicate mirrors
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
    feeds = apple_src.groupBy(country.alias("country_code")).agg(
        F.concat(
            F.lit('<feed xmlns="http://www.w3.org/2005/Atom" '
                  'xmlns:im="http://itunes.apple.com/rss/">'),
            F.concat_ws("", F.collect_list(entry)),
            F.lit('<link rel="next" href=""/></feed>'),
        ).alias("body"))
    zipped = feeds.select(
        "country_code",
        F.arrays_zip(
            _xp('*[local-name()="id"]/text()', "rid"),
            _xp('*[local-name()="content"][@type="text"]/text()', "text"),
            _xp('*[local-name()="rating"]/text()', "rating"),
            _xp('*[local-name()="version"]/text()', "app_version"),
            _xp('*[local-name()="voteCount"]/text()', "vote_count"),
            _xp('*[local-name()="voteSum"]/text()', "vote_sum"),
            _xp('*[local-name()="title"]/text()', "title"),
            _xp('*[local-name()="updated"]/text()', "updated"),
        ).alias("zz"))
    apple = zipped.select("country_code", F.explode("zz").alias("e")).select(
        F.lit("appstore").alias("source"),
        F.col("e.rid").alias("review_id"),
        F.lit("app1").alias("app_id"),
        "country_code",
        F.col("e.title").alias("title"),
        F.col("e.text").alias("text"),
        F.col("e.rating").cast("int").alias("rating"),
        F.col("e.app_version").alias("app_version"),
        F.col("e.vote_count").cast("int").alias("vote_count"),
        F.col("e.vote_sum").cast("int").alias("vote_sum"),
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
    payloads = gsrc.groupBy(actual.alias("src_lang")).agg(
        F.concat(F.lit('{"results": ['),
                 F.concat_ws(",", F.collect_list(review_json)),
                 F.lit("]}")).alias("body"))
    # requested language -> language the API actually answers with ('xx' is
    # unsupported and falls back to English — duplicate payload on purpose)
    lang_map = spark.createDataFrame(
        [("de", "de"), ("en", "en"), ("xx", "en")], ["lang", "src_lang"])
    fetched = lang_map.join(payloads, "src_lang").select("lang", "body")
    parsed = fetched.select(
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

    sentiws_lines = spark.createDataFrame(
        [(f"{w}|{p}\t{v}\t{','.join(infl)}",)
         for w, p, v, infl in SENTIWS_SAMPLE], ["value"])
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
