"""Postal-code cleansing (SURVEY §2.3 P8) as a vectorized expression plan.

The reference cleanses every customer postal code with a per-row Python
function (~30 min for the full table, src/gomus/_utils/cleanse_data.py:55-56):
symbol translation → own-country regex validation (with zero-padding) →
fallback loop over countries with unique code shapes → German whitelist
check → (cleansed_code, cleansed_country).

Spark-first: the whole decision tree becomes one wide expression — a
coalesce chain over per-country candidate columns (all JVM regex, Java
regex supports the reference's lookarounds) plus ONE broadcast semi-join
against the German postal whitelist.  30 minutes of row-at-a-time Python
becomes a single codegen stage; at 100 TB it scales with the scan.

Country table semantics from cleanse_data.py:17-50 (country → ISO code,
zero-pad width, validation regex, participates-in-fallback).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: country → (iso, zero_pad_width, regex, unique_enough_for_fallback)
#: (cleanse_data.py:17-50)
COUNTRY_TO_DATA: dict[str, tuple[str, int, str, bool]] = {
    "Deutschland":
        ("DE", 5, r"(?!01000|99999)(0[1-9]\d{3}|[1-9]\d{4})", True),
    "Schweiz": ("CH", 0, r"[1-9]\d{3}", False),
    "Vereinigtes Königreich":
        ("UK", 0, r"([A-Za-z][A-Ha-hJ-Yj-y]?[0-9][A-Za-z0-9]"
                  r"? ?[0-9][A-Za-z]{2}|[Gg][Ii][Rr] ?0[Aa]{2})", True),
    "Vereinigte Staaten von Amerika":
        ("US", 5, r"([0-9]{5}(?:[0-9]{4})?)", False),
    "Frankreich": ("FR", 5, r"(?:[0-8]\d|9[0-8])\d{3}", False),
    "Niederlande":
        ("NL", 0, r"[1-9][0-9]{3}?(?!sa|sd|ss)[a-zA-Z]{2}", True),
    "Österreich": ("AT", 4, r"\d{4}", False),
    "Polen": ("PL", 5, r"([0-9]{2}\-[0-9]{3})|[0-9]{5}", True),
    "Belgien": ("BE", 0, r"[1-9]\d{3}", False),
    "Dänemark": ("DK", 0, r"[1-9]\d{3}", False),
    "Italien": ("IT", 5, r"\d{5}", False),
    "Russische Föderation": ("RU", 0, r"\d{6}", False),
    "Schweden": ("SE", 5, r"\d{3}\s*\d{2}", False),
    "Spanien": ("ES", 5, r"(?:0[1-9]|[1-4]\d|5[0-2])\d{3}", False),
    "Kanada":
        ("CA", 0, r"[ABCEGHJKLMNPRSTVXYabceghjklmnprstvxy]{1}"
                  r"\d{1}[A-Za-z]{1}\d{1}[A-Za-z]{1}\d{1}", True),
}

#: boundary guards around every match (cleanse_data.py:68-69)
_LOOKAHEAD = r"(?=$|\s|[a-zA-Z])"
_LOOKBEHIND = r"(?:(?<=^)|(?<=\s)|(?<=[a-zA-Z-]))"

#: typo-symbol translation (cleanse_data.py:223-254): top row of the German
#: keyboard → digits; noise symbols deleted
_DIGITS_FROM = '!"§$%&/()=?ß'
_DIGITS_TO = "123456789000"
_DELETE = "^+* ´,.:;_@"


def replace_rare_symbols(col: Column) -> Column:
    """Two ``translate`` passes: symbol→digit, then noise deletion."""
    return F.translate(F.translate(col, _DIGITS_FROM, _DIGITS_TO),
                       _DELETE, "")


def _extract(col: Column, regex: str) -> Column:
    """First boundary-guarded match, NULL if none."""
    return F.nullif(
        F.regexp_extract(col, f"{_LOOKBEHIND}({regex}){_LOOKAHEAD}", 1),
        F.lit(""))


def _add_zeroes(col: Column, width: int) -> Column:
    """Left-pad the longest (≤ width) boundary-guarded digit run to
    ``width`` zeros; pass through unchanged when no digit run exists
    (cleanse_data.py:256-272).

    One ``regexp_extract_all`` pass instead of the previous ``width``
    separate ``regexp_extract`` passes (r14, guide §4.2): the guarded
    ``\\d{{n}}`` patterns each matched exactly the MAXIMAL runs of
    length n (the boundary guards exclude digits on both sides), and
    the width-to-1 coalesce picked the longest length class, leftmost
    within it.  Extracting every maximal run of length ≤ width in one
    scan and folding to the longest (strict ``>`` keeps the leftmost on
    ties) chooses the identical run; runs longer than ``width`` are
    matched by neither form (backtracking cannot satisfy the non-digit
    lookahead inside a longer run).  Pinned value-for-value by
    tests/test_functions.py.
    """
    runs = F.regexp_extract_all(
        col, F.lit(rf"{_LOOKBEHIND}(\d{{1,{width}}}){_LOOKAHEAD}"), 1)
    best = F.aggregate(
        runs, F.lit(""),
        lambda acc, x: F.when(F.length(x) > F.length(acc), x)
        .otherwise(acc))
    return F.when(best != "", F.lpad(best, width, "0")).otherwise(col)


def _candidate(code: Column, iso: str, zeroes: int, regex: str) -> Column:
    """Per-country candidate: zero-pad policy, then validation regex
    (cleanse_data.py:274-303, sans whitelist)."""
    if zeroes and iso == "PL":
        # Poland: only prepend a single zero when no perfect match
        padded = F.when(_extract(code, regex).isNotNull(), code) \
            .otherwise(F.concat(F.lit("0"), code))
    elif zeroes:
        padded = _add_zeroes(code, zeroes)
    else:
        padded = code
    return _extract(padded, regex)


# --- geocoding tail (cleanse_data.py:107-140) ------------------------------
# The reference geocodes the DISTINCT cleansed German postal codes with
# pgeocode.Nominatim('DE') and dict-maps latitude/longitude back onto every
# customer row (migration_036.sql:5-7 adds the columns).  pgeocode's DE
# table is an external download, so the sandbox stand-in is a DETERMINISTIC
# code→coordinate map inside Germany's bounding box (47.4–54.9 °N,
# 6.1–14.9 °E); in production, swap ``synthetic_de_geocode`` for a parquet
# read of the real pgeocode table — the join shape is identical.
#
# Exact integer arithmetic + one double division keeps both engines
# bit-identical (no rounding anywhere).
LAT_BASE, LAT_SPAN_MILLI = 47.4, 7500
LON_BASE, LON_SPAN_MILLI = 6.1, 8800


def synthetic_de_geocode(codes: DataFrame, code_col: str = "plz") -> DataFrame:
    """(code) → (code, latitude, longitude), deterministic pgeocode stand-in.

    Codes must be digit strings (the DE cleansing regex guarantees that);
    leading zeros are absorbed by the bigint cast, like pgeocode's own
    numeric index.
    """
    n = F.col(code_col).cast("bigint")
    return codes.select(
        F.col(code_col),
        (F.lit(LAT_BASE) + (n * 31 % LAT_SPAN_MILLI) / F.lit(1000.0))
        .alias("latitude"),
        (F.lit(LON_BASE) + (n * 17 % LON_SPAN_MILLI) / F.lit(1000.0))
        .alias("longitude"),
    )


def geocode_german_codes(df: DataFrame,
                         code_col: str = "cleansed_postal_code",
                         country_col: str = "cleansed_country",
                         geocode_table: DataFrame | None = None) -> DataFrame:
    """Adds ``latitude``/``longitude`` via the DE geocode lookup.

    Mirrors the reference's dict semantics exactly (cleanse_data.py:113-137):
    the lookup is built from rows whose cleansed country is Deutschland, but
    mapped onto EVERY row by cleansed code — a foreign customer sharing a
    German code shape inherits the German coordinates, as in the reference.

    ``geocode_table`` is the production injection point: a frame with
    columns ``(plz, latitude, longitude)`` — e.g. a parquet dump of
    pgeocode's DE table — replaces the sandbox's deterministic
    ``synthetic_de_geocode``.  Both sources go through the SAME
    restriction (semi-join to the codes observed on German rows, the
    reference's dict-build population) and the SAME broadcast left join,
    so swapping in the real table changes coordinates only, never the
    join shape (pinned by ``tests/test_functions.py``).  Codes must be
    unique in the table (pgeocode's index is); a duplicate would fan out
    the left join.

    Scale shape: the distinct-codes side is bounded by the ~8k real German
    postal codes regardless of corpus size, so it is always broadcast; the
    corpus side is one map-side hash join — no shuffle of the big table.
    """
    codes = (
        df.filter(F.col(country_col) == "Deutschland")
        .select(F.col(code_col).alias("__plz"))
        .filter(F.col("__plz").isNotNull())
        .distinct()
    )
    if geocode_table is not None:
        geo = geocode_table.select(
            F.col("plz").alias("__plz"), "latitude", "longitude"
        ).join(codes, "__plz", "semi")
    else:
        geo = synthetic_de_geocode(codes, "__plz")
    return (
        df.join(F.broadcast(geo), df[code_col] == geo["__plz"], "left")
        .drop("__plz")
    )


def de_geocode_oracle_cte(src: str) -> str:
    """DuckDB CTE body equivalent to ``geocode_german_codes``'s lookup table
    over ``src`` (columns ``cleansed_postal_code``/``cleansed_country``)."""
    return f"""(
        SELECT DISTINCT cleansed_postal_code AS plz,
               {LAT_BASE} + ((CAST(cleansed_postal_code AS BIGINT) * 31)
                             % {LAT_SPAN_MILLI}) / 1000.0 AS latitude,
               {LON_BASE} + ((CAST(cleansed_postal_code AS BIGINT) * 17)
                             % {LON_SPAN_MILLI}) / 1000.0 AS longitude
        FROM {src}
        WHERE cleansed_country = 'Deutschland'
          AND cleansed_postal_code IS NOT NULL
    )"""


def cleanse_postal_codes(df: DataFrame, german_codes: DataFrame,
                         postal_col: str = "postal_code",
                         country_col: str = "country") -> DataFrame:
    """Adds ``cleansed_postal_code`` / ``cleansed_country``.

    ``german_codes`` is the DE whitelist (one column ``plz``); the
    reference accepts a candidate when any whitelist entry *contains* it
    (cleanse_data.py:296-301) — reproduced with a broadcast theta-join on
    the distinct DE candidates, not per row.
    """
    # stage 1: evaluate every per-country candidate ONCE as a projected
    # column — keeps each codegen expression small (the naive nested
    # decision tree blows the JVM's 64 KB method limit and falls back to
    # interpreted evaluation) and shares the regex work across the
    # own-country and fallback decision chains below.
    code = replace_rare_symbols(F.col(postal_col).cast("string"))
    cand_cols = {
        country: f"__cand_{data[0]}"
        for country, data in COUNTRY_TO_DATA.items()
    }
    with_cands = df.withColumns({
        cand_cols[country]: _candidate(code, iso, zeroes, regex)
        for country, (iso, zeroes, regex, _) in COUNTRY_TO_DATA.items()
    })

    whitelisted = (
        with_cands.select(F.col("__cand_DE")).distinct()
        .filter("__cand_DE IS NOT NULL")
        .join(F.broadcast(german_codes),
              F.col("plz").contains(F.col("__cand_DE")), "left_semi")
        .withColumnRenamed("__cand_DE", "__de_ok")
    )
    out = with_cands.join(F.broadcast(whitelisted),
                          F.col("__cand_DE") == F.col("__de_ok"), "left")

    def national(country: str) -> Column:
        if country == "Deutschland":
            return F.col("__de_ok")
        return F.col(cand_cols[country])

    country = F.col(country_col)
    own = None
    for name in COUNTRY_TO_DATA:
        branch = F.when(country == name, national(name))
        own = branch if own is None else own.when(country == name,
                                                  national(name))

    # fallback loop over unique-shaped countries, dict order
    # (cleanse_data.py:202-207)
    fallback_order = [n for n, d in COUNTRY_TO_DATA.items() if d[3]]
    fb_code = F.coalesce(*[national(n) for n in fallback_order])
    fb_country = None
    for name in fallback_order:
        step = F.when(national(name).isNotNull(), F.lit(name))
        fb_country = step if fb_country is None else fb_country.when(
            national(name).isNotNull(), F.lit(name))

    result_code = F.coalesce(own, fb_code)
    result_country = F.when(F.col(postal_col).isNull(),
                            F.lit(None).cast("string")) \
        .when(own.isNotNull(), country) \
        .when(fb_code.isNotNull(), fb_country) \
        .otherwise(country)
    return (
        out.withColumn("cleansed_postal_code",
                       F.when(F.col(postal_col).isNotNull(), result_code))
        .withColumn("cleansed_country", result_country)
        .drop("__de_ok", *cand_cols.values())
    )
