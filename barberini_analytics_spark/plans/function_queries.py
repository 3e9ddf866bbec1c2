"""Driver queries for the scalar-function layer (SURVEY §2.3/§2.9).

``scalar_parsers`` oracle-checks every SQL-expressible parser; postal
cleansing and mmh3 hashing are not RE2-/DuckDB-expressible (lookarounds,
murmur3), so they run as rows-only checks — their value semantics are
pinned by unit tests (tests/test_functions.py) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.io import load_table
from ..functions import hashing as H
from ..functions import parsing as P
from ..functions import postal as PC
from .registry import query

_TAGS_SQL = "', '".join(P.TOURISM_TAGS)


@query(
    "scalar_parsers",
    oracle=f"""
    SELECT o_orderkey,
           DATE '1899-12-30' + CAST(o_orderkey % 40000 + 1000 AS INT)
               AS excel_date,
           CAST(try_strptime(strftime(o_orderdate, '%d.%m.%Y'),
                             '%d.%m.%Y') AS DATE) AS german_roundtrip,
           lower(regexp_replace(o_orderpriority, '[^a-zA-Z0-9]', '', 'g'))
               AS simplified,
           regexp_replace(o_orderpriority || chr(13) || chr(10)
               || o_orderstatus, '\\r\\n|\\r', chr(10), 'g') AS normalized,
           coalesce(array_to_string(list_sort(list_filter(['{_TAGS_SQL}'],
               t -> contains('user' || CAST(o_orderkey % 100 AS VARCHAR)
                   || '@' || CASE o_orderkey % 3
                                 WHEN 0 THEN 'hotel-reise.de'
                                 WHEN 1 THEN 'example.com'
                                 ELSE 'kultur-verein.org' END, t))), ','), '')
               AS tags,
           (o_orderstatus = 'F') AS paid,
           CASE o_orderkey % 3 WHEN 0 THEN 'w' WHEN 1 THEN 'm'
                ELSE '' END AS gender
    FROM orders
    """,
)
def scalar_parsers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 casts/parsers + P6/P7/P10 string transforms, all JVM expressions."""
    orders = load_table(spark, sf_dir, "orders")
    mail = F.concat(
        F.lit("user"), (F.col("o_orderkey") % 100).cast("string"),
        F.lit("@"),
        F.when(F.col("o_orderkey") % 3 == 0, "hotel-reise.de")
        .when(F.col("o_orderkey") % 3 == 1, "example.com")
        .otherwise("kultur-verein.org"))
    gender_src = (F.when(F.col("o_orderkey") % 3 == 0, "Frau")
                  .when(F.col("o_orderkey") % 3 == 1, "Herr")
                  .otherwise("k.A."))
    return orders.select(
        "o_orderkey",
        P.excel_serial_to_date(F.col("o_orderkey") % 40000 + 1000)
        .alias("excel_date"),
        P.german_date(F.date_format("o_orderdate", "dd.MM.yyyy"))
        .alias("german_roundtrip"),
        P.simplify_text(F.col("o_orderpriority")).alias("simplified"),
        P.normalize_newlines(
            F.concat("o_orderpriority", F.lit("\r\n"), "o_orderstatus"))
        .alias("normalized"),
        # array columns break the driver's pandas sort-canonicalizer, so
        # the tag set is emitted as a sorted CSV string on both sides
        F.array_join(F.sort_array(P.tourism_tags(mail)), ",").alias("tags"),
        P.parse_boolean(F.col("o_orderstatus"), "F").alias("paid"),
        P.parse_gender(gender_src).alias("gender"),
    )


@query("postal_cleansing")  # rows-only: DuckDB RE2 lacks lookarounds
def postal_cleansing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 postal cleansing over synthesized customer codes; value
    semantics pinned by tests/test_functions.py."""
    cust = load_table(spark, sf_dir, "customer")
    df = cust.selectExpr(
        "c_custkey AS customer_id",
        "CASE c_custkey % 7"
        "  WHEN 0 THEN '14467'"
        "  WHEN 1 THEN '!4467'"
        "  WHEN 2 THEN '1446'"
        "  WHEN 3 THEN 'SW1A 1AA'"
        "  WHEN 4 THEN CAST(10000 + c_custkey % 80000 AS STRING)"
        "  WHEN 5 THEN 'abc'"
        "  ELSE NULL END AS postal_code",
        "CASE c_custkey % 3 WHEN 0 THEN 'Deutschland'"
        "  WHEN 1 THEN 'Vereinigtes Königreich'"
        "  ELSE 'Frankreich' END AS country")
    whitelist = spark.createDataFrame(
        [("14467",), ("01446",), ("10115",)], ["plz"])
    out = PC.cleanse_postal_codes(df, whitelist)
    return out.select("customer_id", "postal_code", "country",
                      "cleansed_postal_code", "cleansed_country")


@query("pseudonymize_ids")  # rows-only: mmh3 not available in DuckDB
def pseudonymize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 mmh3(seed=666) pseudonymization via the parity pandas UDF;
    vectors pinned by tests/test_functions.py."""
    cust = load_table(spark, sf_dir, "customer")
    mail = F.when(
        F.col("c_custkey") % 5 != 0,
        F.concat(F.lower(F.regexp_replace("c_name", "[^a-zA-Z0-9]", "")),
                 F.lit("@example.com")))
    return cust.select(
        F.col("c_custkey").alias("customer_id"),
        H.hash_id(mail, F.col("c_custkey")).alias("hashed_id"))


@query(
    "translated_review_split",
    oracle=r"""
    WITH raw AS (
        SELECT doc_id,
               CASE doc_id % 3
                    WHEN 0 THEN '(Translated by Google) ' || text
                                || ' (Original) ' || upper(text)
                    WHEN 1 THEN upper(text) || ' (Translated by Google) '
                                || text
                    ELSE text END AS review
        FROM documents
    )
    SELECT doc_id, review,
           CASE WHEN regexp_matches(review,
                    '(?s)^\(Translated by Google\) (.*) \(Original\) (.*)$')
                THEN regexp_extract(review,
                    '(?s)^\(Translated by Google\) (.*) \(Original\) (.*)$', 2)
                WHEN regexp_matches(review,
                    '(?s)^(.*) \(Translated by Google\) (.*)$')
                THEN regexp_extract(review,
                    '(?s)^(.*) \(Translated by Google\) (.*)$', 1)
                ELSE review END AS original_text,
           CASE WHEN regexp_matches(review,
                    '(?s)^\(Translated by Google\) (.*) \(Original\) (.*)$')
                THEN regexp_extract(review,
                    '(?s)^\(Translated by Google\) (.*) \(Original\) (.*)$', 1)
                WHEN regexp_matches(review,
                    '(?s)^(.*) \(Translated by Google\) (.*)$')
                THEN regexp_extract(review,
                    '(?s)^(.*) \(Translated by Google\) (.*)$', 2)
                ELSE NULL END AS english_text,
           CASE WHEN regexp_matches(review,
                    '(?s)^\(Translated by Google\) (.*) \(Original\) (.*)$')
                THEN 'prefix'
                WHEN regexp_matches(review,
                    '(?s)^(.*) \(Translated by Google\) (.*)$')
                THEN 'suffix'
                ELSE 'none' END AS translation_case
    FROM raw
    """,
)
def translated_review_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: Google translated-review splitter (src/google_maps.py:234-273)
    over synthesized prefix/suffix/plain review texts."""
    docs = load_table(spark, sf_dir, "documents")
    review = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("(Translated by Google) "), F.col("text"),
                        F.lit(" (Original) "), F.upper("text")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.upper("text"), F.lit(" (Translated by Google) "),
                       F.col("text")))
        .otherwise(F.col("text"))
    )
    raw = docs.select("doc_id", review.alias("review"))
    original, english, case = P.split_translated_review(F.col("review"))
    return raw.select(
        "doc_id", "review",
        original.alias("original_text"),
        english.alias("english_text"),
        case.alias("translation_case"),
    )
