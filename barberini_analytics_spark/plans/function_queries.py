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
from ..operators import text as X
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
                ELSE '' END AS gender,
           regexp_replace(regexp_replace(regexp_replace(
               'Order ' || CAST(o_orderkey AS VARCHAR) || ': contact user'
                   || CAST(o_orderkey % 100 AS VARCHAR)
                   || '@example.com or call +49 30 55512'
                   || lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0')
                   || ' from 10.0.' || CAST(o_orderkey % 256 AS VARCHAR)
                   || '.' || CAST(o_orderkey % 100 AS VARCHAR) || ' now',
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
               '<EMAIL>', 'g'),
               '\\b([0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b', '<IP>', 'g'),
               '(^|[^0-9A-Za-z_])(\\+?[0-9][0-9 ()./-]{{5,}}[0-9])([^0-9A-Za-z_]|$)',
               '\\1<PHONE>\\3', 'g') AS pii_scrubbed
    FROM orders
    """,
)
def scalar_parsers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 casts/parsers + P6/P7/P10 string transforms, all JVM expressions
    — plus the PII scrub chain over a synthesized contact line (P-layer of
    the training-data pipeline).  The scrub's phone rule uses lookaround
    boundaries that RE2 cannot express, so the oracle applies a
    capture-group boundary equivalent — exactly equal on one-PII-per-slot
    text like this (the general lookaround semantics are pinned by
    tests/test_ingest_sources.py)."""
    from .ingest_queries import _spread

    # the local single-row-group parquet is unsplittable — re-spread the
    # scan so the regex/parse projection uses every core (on a real lake
    # row groups split naturally and this is one harmless tiny exchange)
    orders = _spread(load_table(spark, sf_dir, "orders"))
    mail = F.concat(
        F.lit("user"), (F.col("o_orderkey") % 100).cast("string"),
        F.lit("@"),
        F.when(F.col("o_orderkey") % 3 == 0, "hotel-reise.de")
        .when(F.col("o_orderkey") % 3 == 1, "example.com")
        .otherwise("kultur-verein.org"))
    gender_src = (F.when(F.col("o_orderkey") % 3 == 0, "Frau")
                  .when(F.col("o_orderkey") % 3 == 1, "Herr")
                  .otherwise("k.A."))
    contact = F.format_string(
        "Order %d: contact user%d@example.com or call +49 30 55512%02d "
        "from 10.0.%d.%d now",
        F.col("o_orderkey"), F.col("o_orderkey") % 100,
        F.col("o_orderkey") % 100, F.col("o_orderkey") % 256,
        F.col("o_orderkey") % 100)
    orders = X.scrub_pii(orders.withColumn("__contact", contact),
                         text_col="__contact", out_col="pii_scrubbed")
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
        "pii_scrubbed",
    )


#: The 7-shape × 3-country postal fixture, as selectExpr fragments over a
#: ``c_custkey`` column — shared with the gomus customer construction in
#: plans/domain_queries.py so the domain view carries the same cleansed +
#: geocoded values that this entry oracles.
POSTAL_CODE_EXPR = (
    "CASE c_custkey % 7"
    "  WHEN 0 THEN '14467'"
    "  WHEN 1 THEN '!4467'"
    "  WHEN 2 THEN '1446'"
    "  WHEN 3 THEN 'SW1A 1AA'"
    "  WHEN 4 THEN CAST(10000 + c_custkey % 80000 AS STRING)"
    "  WHEN 5 THEN 'abc'"
    "  ELSE NULL END"
)
POSTAL_COUNTRY_EXPR = (
    "CASE c_custkey % 3 WHEN 0 THEN 'Deutschland'"
    "  WHEN 1 THEN 'Vereinigtes Königreich'"
    "  ELSE 'Frankreich' END"
)

#: DE whitelist rows for the fixture (one column ``plz``).
POSTAL_WHITELIST_ROWS = [("14467",), ("01446",), ("10115",)]

# DuckDB RE2 lacks the lookarounds the cleansing regexes use, so the
# oracle is an analytically-derived case analysis of the reference
# algorithm (cleanse_data.py:55-303) over the 7 fixture shapes ×
# 3 countries: symbol translation ('!'→'1', strip spaces), zero-pad
# ('1446'→'01446'), DE whitelist containment, and the
# DE→UK→NL→PL→CA fallback order (5-digit non-whitelisted codes land
# on Polen; 'SW1A1AA' zero-pads to '00001' under Frankreich's
# own-country regex).  General-input semantics are pinned by
# tests/test_functions.py.  ``POSTAL_ORACLE_CTES`` ends with
# ``cleansed``/``de_geo`` CTEs so domain oracles can reuse the chain.
POSTAL_ORACLE_CTES = f"""
    src AS (
        SELECT c_custkey AS customer_id,
               CASE c_custkey % 7
                 WHEN 0 THEN '14467'
                 WHEN 1 THEN '!4467'
                 WHEN 2 THEN '1446'
                 WHEN 3 THEN 'SW1A 1AA'
                 WHEN 4 THEN CAST(10000 + c_custkey % 80000 AS VARCHAR)
                 WHEN 5 THEN 'abc'
                 ELSE NULL END AS postal_code,
               CASE c_custkey % 3 WHEN 0 THEN 'Deutschland'
                 WHEN 1 THEN 'Vereinigtes Königreich'
                 ELSE 'Frankreich' END AS country,
               c_custkey % 7 AS shape
        FROM customer
    ), cleansed AS (
        SELECT customer_id, postal_code, country,
           CASE
             WHEN postal_code IS NULL THEN NULL
             WHEN shape IN (0, 1) THEN '14467'
             WHEN shape = 2 THEN '01446'
             WHEN shape = 3 THEN CASE WHEN country = 'Frankreich'
                                      THEN '00001' ELSE 'SW1A1AA' END
             WHEN shape = 4 THEN postal_code
             ELSE NULL
           END AS cleansed_postal_code,
           CASE
             WHEN postal_code IS NULL THEN NULL
             WHEN shape IN (0, 1, 2) THEN
                 CASE WHEN country = 'Frankreich' THEN 'Frankreich'
                      ELSE 'Deutschland' END
             WHEN shape = 3 THEN
                 CASE WHEN country = 'Frankreich' THEN 'Frankreich'
                      ELSE 'Vereinigtes Königreich' END
             WHEN shape = 4 THEN
                 CASE WHEN country = 'Frankreich' THEN 'Frankreich'
                      WHEN postal_code IN ('14467', '10115')
                           THEN 'Deutschland'
                      ELSE 'Polen' END
             ELSE country
           END AS cleansed_country
        FROM src
    ), de_geo AS {PC.de_geocode_oracle_cte("cleansed")}
"""


def cleansed_geocoded_customers(spark: SparkSession,
                                cust: DataFrame) -> DataFrame:
    """Fixture codes → full P8 chain (cleanse + DE geocode) over a raw
    ``customer`` frame; keeps any extra caller columns.

    r14 negative result, measured and recorded: rewriting this as a
    distinct-(postal_code, country)-pairs cleanse + null-safe broadcast
    join back (guide §8 "decide with small rows" — the pair domain is
    bounded, 7× fewer regex rows at sf0.1) LOST at bench scale:
    interleaved min-of-6 noop 1.45 s direct vs 1.56–1.82 s pairs.  The
    regex CPU parallelizes across all cores while the added distinct
    exchange + pair-cache stages are serial job latency, which
    dominates at sf0.1.  The per-row regex count was cut instead
    (``functions/postal._add_zeroes`` single-pass rewrite) — less CPU
    at EVERY scale with zero new stages.  On a real 100 TB lake the
    pairs shape becomes right again (corpus-proportional regex vs a
    bounded pair table); re-evaluate there before resurrecting it.
    """
    df = cust.withColumn("postal_code", F.expr(POSTAL_CODE_EXPR)) \
        .withColumn("country", F.expr(POSTAL_COUNTRY_EXPR))
    from ..core.localrel import values_df

    whitelist = values_df(spark, POSTAL_WHITELIST_ROWS, "plz string")
    return PC.geocode_german_codes(PC.cleanse_postal_codes(df, whitelist))


@query(
    "postal_cleansing",
    oracle=f"""
    WITH {POSTAL_ORACLE_CTES.strip()}
    SELECT c.customer_id, c.postal_code, c.country,
           c.cleansed_postal_code, c.cleansed_country,
           g.latitude, g.longitude
    FROM cleansed c
    LEFT JOIN de_geo g ON c.cleansed_postal_code = g.plz
    """,
)
def postal_cleansing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 postal cleansing + the geocoding tail (cleanse_data.py:55-303 and
    107-140) over synthesized customer codes; general-input value semantics
    pinned by tests/test_functions.py, fixture outputs hash-checked against
    a derived expected-value oracle.

    The geocode stage is the reference's pgeocode lookup re-expressed as a
    broadcast hash join of the (bounded, ~8k real-world) distinct German
    code table — the customer side never shuffles.
    """
    from .ingest_queries import _spread

    cust = _spread(load_table(spark, sf_dir, "customer")) \
        .selectExpr("c_custkey", "c_custkey AS customer_id")
    out = cleansed_geocoded_customers(spark, cust)
    return out.select("customer_id", "postal_code", "country",
                      "cleansed_postal_code", "cleansed_country",
                      "latitude", "longitude")


# MurmurHash3 x86_32(seed=666), signed — implemented in portable DuckDB SQL
# (list fold over the byte stream; HUGEINT-widened multiplications) so the
# P5 pseudonymization UDF is value-checked against an independent
# implementation, not just unit-test vectors.  Input is ASCII here, so
# ascii(substring(...)) is the byte stream.
#
# MMH3_SQL_CHAIN is reusable: prepend a ``src(customer_id, s)`` CTE, append
# a final SELECT joining ``fin`` (columns customer_id, s, f5 — the unsigned
# 32-bit digest; signed = CASE WHEN f5 >= 2^31 THEN f5 - 2^32 ELSE f5 END).
# The gomus booking-detail ingest oracle reuses it for the email hash.
MMH3_SQL_CHAIN = r"""
    prep AS (
        SELECT customer_id, s, length(s) AS n,
               length(s) // 4 AS nc, length(s) % 4 AS r,
               list_transform(generate_series(1, length(s)),
                              i -> CAST(ascii(substring(s, i, 1)) AS BIGINT)) AS b
        FROM src
    ),
    mixed AS (
        SELECT *,
               list_transform(
                   list_transform(
                       list_transform(
                           list_transform(generate_series(0, nc - 1),
                               i -> b[4*i+1] + b[4*i+2]*256 + b[4*i+3]*65536
                                    + b[4*i+4]*16777216),
                           k -> CAST((CAST(k AS HUGEINT) * 3432918353)
                                     % 4294967296 AS BIGINT)),
                       k -> ((k * 32768) | (k // 131072)) & 4294967295),
                   k -> (k * 461845907) & 4294967295) AS ks
        FROM prep
    ),
    body AS (
        SELECT *,
               list_reduce(
                   list_concat([CAST(666 AS BIGINT)], ks),
                   (h, k) -> (((((xor(h, k) * 8192) | (xor(h, k) // 524288))
                                & 4294967295) * 5 + 3864292196) & 4294967295)
               ) AS hb
        FROM mixed
    ),
    tailed AS (
        SELECT *,
               CASE WHEN r = 0 THEN hb
                    ELSE xor(hb,
                        ((((CAST((CAST((CASE WHEN r >= 3 THEN b[4*nc+3] * 65536 ELSE 0 END
                             + CASE WHEN r >= 2 THEN b[4*nc+2] * 256 ELSE 0 END
                             + b[4*nc+1]) AS HUGEINT) * 3432918353)
                             % 4294967296 AS BIGINT) * 32768)
                           | (CAST((CAST((CASE WHEN r >= 3 THEN b[4*nc+3] * 65536 ELSE 0 END
                             + CASE WHEN r >= 2 THEN b[4*nc+2] * 256 ELSE 0 END
                             + b[4*nc+1]) AS HUGEINT) * 3432918353)
                             % 4294967296 AS BIGINT) // 131072))
                          & 4294967295) * 461845907 & 4294967295)
                    )
               END AS ht
        FROM body
    ),
    fin AS (
        SELECT customer_id, s,
               xor(ht, n) AS f0,
               xor(f0, f0 // 65536) AS f1,
               CAST((CAST(f1 AS HUGEINT) * 2246822507) % 4294967296 AS BIGINT) AS f2,
               xor(f2, f2 // 8192) AS f3,
               CAST((CAST(f3 AS HUGEINT) * 3266489909) % 4294967296 AS BIGINT) AS f4,
               xor(f4, f4 // 65536) AS f5
        FROM tailed
    )
    """

_MMH3_ORACLE = r"""
    WITH src AS (
        SELECT c_custkey AS customer_id,
               CASE WHEN c_custkey % 5 <> 0
                    THEN lower(regexp_replace(c_name, '[^a-zA-Z0-9]', '', 'g'))
                         || '@example.com'
               END AS s
        FROM customer
    ),
""" + MMH3_SQL_CHAIN + r"""
    SELECT p.customer_id,
           CASE WHEN p.s IS NULL THEN p.customer_id
                WHEN f.f5 >= 2147483648 THEN f.f5 - 4294967296
                ELSE f.f5 END AS hashed_id
    FROM src p LEFT JOIN fin f USING (customer_id)
    """


@query("pseudonymize_ids", oracle=_MMH3_ORACLE)
def pseudonymize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 mmh3(seed=666) pseudonymization via the parity pandas UDF
    (src/gomus/_utils/extract_customers.py:135-140), hash-checked against
    an independent murmur3 re-implementation in pure DuckDB SQL; vectors
    additionally pinned by tests/test_functions.py.  NULL emails fall back
    to the numeric customer id, as in the reference."""
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
