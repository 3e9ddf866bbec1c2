"""Row-level parsers and casts (SURVEY §2.3 P2/P7, §2.9 3VL idioms).

All JVM-side expressions — no UDFs.  Each mirrors a pandas helper of the
reference; citations inline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: day 0 of the Excel 1900 date system (with the 1900-leap-year quirk folded
#: in, valid for serials ≥ 61 — all modern dates)
_EXCEL_EPOCH = "date'1899-12-30'"

#: substrings marking a tourism-affiliated email address
#: (src/gomus/_utils/extract_customers.py:122-132)
TOURISM_TAGS = ("reise", "kultur", "freunde", "förder", "foerder", "guide",
                "hotel", "travel", "event", "visit", "verein", "stiftung")


def excel_serial_to_date(serial: Column) -> Column:
    """Excel serial number → date (``xldate_as_datetime`` in
    src/gomus/orders.py:86-87, events.py:109-110)."""
    return F.expr(f"date_add({_EXCEL_EPOCH}, 0)") + serial.cast("int")


def excel_serial_to_timestamp(serial: Column) -> Column:
    """Excel serial with day fraction → timestamp (86400 s per day)."""
    days = F.floor(serial).cast("int")
    secs = F.round((serial - days) * 86400).cast("long")
    return F.to_timestamp(
        F.expr(f"date_add({_EXCEL_EPOCH}, 0)") + days
    ) + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs)


def german_date(col: Column) -> Column:
    """``%d.%m.%Y`` with coerce-to-NULL on garbage
    (src/gomus/_utils/extract_customers.py:83-93)."""
    return F.try_to_timestamp(col, F.lit("d.M.yyyy")).cast("date")


def assert_mostly_valid(df: DataFrame, parsed: Column,
                        max_invalid_ratio: float = 0.5) -> None:
    """The reference aborts when > 50 % of date strings fail to parse
    (extract_customers.py:88-93).  Raises on the same condition."""
    total, bad = df.select(
        F.count(F.lit(1)), F.count(F.when(parsed.isNull(), 1))
    ).first()
    if total and bad / total > max_invalid_ratio:
        raise ValueError(
            f"{bad}/{total} values failed to parse "
            f"(> {max_invalid_ratio:.0%})")


def parse_boolean(col: Column, truthy: str = "ja") -> Column:
    """``'ja'`` / ``'bezahlt'`` → boolean (extract_customers.py:103-104,
    src/gomus/orders.py:103-104)."""
    return col == truthy


def parse_gender(col: Column) -> Column:
    """``Frau``→``w``, ``Herr``→``m``, else ``''``
    (extract_customers.py:107-112)."""
    return (F.when(col == "Frau", "w").when(col == "Herr", "m")
            .otherwise(""))


def cut_decimal_digits(col: Column) -> Column:
    """Strip a trailing ``.0`` from stringified numerics
    (extract_customers.py:114-120)."""
    s = col.cast("string")
    return F.when(s.isNull(), None).otherwise(
        F.regexp_replace(s, r"\.0$", ""))


def tourism_tags(mail: Column,
                 tags: Sequence[str] = TOURISM_TAGS) -> Column:
    """Substring-containment tag extraction from an email address;
    NULL mail → empty array (extract_customers.py:122-132)."""
    arr = F.array(*[F.lit(t) for t in tags])
    return F.when(mail.isNull(), F.array().cast("array<string>")).otherwise(
        F.filter(arr, lambda t: mail.contains(t)))


def is_true(c: Column) -> Column:
    """Postgres ``(expr) IS TRUE`` (SURVEY §2.9 3VL idioms)."""
    return F.coalesce(c, F.lit(False))


def is_not_true(c: Column) -> Column:
    """Postgres ``(expr) IS NOT TRUE`` — NULL counts as not-true
    (migration_015.sql:72, capacities.py:271)."""
    return ~F.coalesce(c, F.lit(False))


def normalize_newlines(col: Column) -> Column:
    """``\\r\\n`` / ``\\r`` → ``\\n`` (P6,
    src/_utils/data_preparation.py:56-74)."""
    return F.regexp_replace(col, r"\r\n|\r", "\n")


def simplify_text(col: Column) -> Column:
    """Strip non-alphanumerics + lowercase (P10,
    src/visitor_prediction/exhibition_popularity.py:98-100)."""
    return F.lower(F.regexp_replace(col, "[^a-zA-Z0-9]", ""))


#: Google-translated review markers (src/google_maps.py:234-273)
_TR_PREFIX = r"(?s)^\(Translated by Google\) (.*) \(Original\) (.*)$"
_TR_SUFFIX = r"(?s)^(.*) \(Translated by Google\) (.*)$"


def split_translated_review(col: Column) -> tuple[Column, Column, Column]:
    """P9: 3-case Google-translated review splitter
    (src/google_maps.py:234-273).

    Returns ``(original_text, english_text, translation_case)``:

    - prefix form ``(Translated by Google) EN (Original) ORIG`` →
      ``(ORIG, EN, 'prefix')``
    - suffix form ``ORIG (Translated by Google) EN`` →
      ``(ORIG, EN, 'suffix')``
    - no markers → ``(text, NULL, 'none')``

    Pure ``when``/``regexp_extract`` — one codegen stage, no UDF.
    """
    pre_en = F.regexp_extract(col, _TR_PREFIX, 1)
    pre_orig = F.regexp_extract(col, _TR_PREFIX, 2)
    suf_orig = F.regexp_extract(col, _TR_SUFFIX, 1)
    suf_en = F.regexp_extract(col, _TR_SUFFIX, 2)
    is_prefix = col.rlike(_TR_PREFIX)
    is_suffix = col.rlike(_TR_SUFFIX)
    original = (F.when(is_prefix, pre_orig)
                .when(is_suffix, suf_orig)
                .otherwise(col))
    english = (F.when(is_prefix, pre_en)
               .when(is_suffix, suf_en)
               .otherwise(F.lit(None).cast("string")))
    case = (F.when(is_prefix, "prefix")
            .when(is_suffix, "suffix")
            .otherwise("none"))
    return original, english, case
