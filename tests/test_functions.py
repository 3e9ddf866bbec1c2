"""Function-layer tests: murmur3 parity against published test vectors,
postal cleansing against hand-evaluated reference behavior, parsers."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from barberini_analytics_spark.functions import hashing as H
from barberini_analytics_spark.functions import parsing as P
from barberini_analytics_spark.functions import postal as PC


# ---------------------------------------------------------------------------
# murmur3 x86_32 — published reference vectors
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("data,seed,expected_u32", [
    (b"", 0, 0x00000000),
    (b"", 1, 0x514E28B7),
    (b"", 0xFFFFFFFF, 0x81F16F39),
    (b"test", 0, 0xBA6BD213),
    (b"Hello, world!", 0, 0xC0363E43),
    (b"The quick brown fox jumps over the lazy dog", 0x9747B28C,
     0x2FA826CD),
    (b"aaaa", 0x9747B28C, 0x5A97808A),
    (b"abc", 0, 0xB3DD93FA),
])
def test_murmur3_vectors(data, seed, expected_u32):
    got = H.murmur3_32_signed(data, seed)
    assert got & 0xFFFFFFFF == expected_u32


def test_hash_id_udf(spark):
    df = spark.createDataFrame(
        [("anna@example.com", 0), (None, 1234), (None, None)],
        ["mail", "alt"])
    rows = df.select(H.hash_id(F.col("mail"), F.col("alt")).alias("h")) \
        .collect()
    assert rows[0].h == H.murmur3_32_signed(b"anna@example.com")
    assert rows[1].h == 1234
    assert rows[2].h == 0
    # signed 32-bit range
    assert -(2 ** 31) <= rows[0].h < 2 ** 31


# ---------------------------------------------------------------------------
# postal cleansing
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def whitelist(spark):
    return spark.createDataFrame(
        [("14467",), ("01446",), ("10115",), ("00501",)], ["plz"])


def _cleanse(spark, whitelist, rows):
    df = spark.createDataFrame(rows, ["customer_id", "postal_code",
                                      "country"])
    out = PC.cleanse_postal_codes(df, whitelist)
    return {r.customer_id: (r.cleansed_postal_code, r.cleansed_country)
            for r in out.collect()}


def test_postal_cleansing_paths(spark, whitelist):
    got = _cleanse(spark, whitelist, [
        (1, "14467", "Deutschland"),      # clean German code
        (2, "!4467", "Deutschland"),      # symbol typo → 14467
        (3, "1446", "Deutschland"),       # zero-pad → 01446
        (4, "99999", "Deutschland"),      # excluded by DE regex → PL fallback
        (5, "SW1A 1AA", "Vereinigtes Königreich"),  # UK, space stripped
        (6, "abc", "Schweiz"),            # no match anywhere
        (7, None, "Frankreich"),          # NULL code
        (8, "501", "Vereinigte Staaten von Amerika"),  # pad to 00501
        (9, "14467", "Island"),           # unknown country → DE fallback
    ])
    assert got[1] == ("14467", "Deutschland")
    assert got[2] == ("14467", "Deutschland")
    assert got[3] == ("01446", "Deutschland")
    assert got[4] == ("99999", "Polen")
    assert got[5] == ("SW1A1AA", "Vereinigtes Königreich")
    assert got[6] == (None, "Schweiz")
    assert got[7] == (None, None)
    assert got[8] == ("00501", "Vereinigte Staaten von Amerika")
    assert got[9] == ("14467", "Deutschland")


def test_postal_de_whitelist_rejects(spark, whitelist):
    # valid shape but not in the German whitelist → falls through to the
    # fallback chain (PL matches any 5-digit run)
    got = _cleanse(spark, whitelist, [(1, "98765", "Deutschland")])
    assert got[1] == ("98765", "Polen")


# ---------------------------------------------------------------------------
# parsers
# ---------------------------------------------------------------------------

def test_excel_serial_dates(spark):
    df = spark.createDataFrame([(45292,), (61,)], ["serial"])
    rows = df.select(
        P.excel_serial_to_date(F.col("serial")).alias("d")).collect()
    assert rows[0].d == dt.date(2024, 1, 1)
    assert rows[1].d == dt.date(1900, 3, 1)


def test_excel_serial_timestamp(spark):
    df = spark.createDataFrame([(45292.5,)], ["serial"])
    r = df.select(
        P.excel_serial_to_timestamp(F.col("serial")).alias("t")).first()
    assert r.t == dt.datetime(2024, 1, 1, 12, 0, 0)


def test_german_date_coerce(spark):
    df = spark.createDataFrame([("24.12.2023",), ("garbage",), ("5.1.2024",)],
                               ["s"])
    rows = df.select(P.german_date(F.col("s")).alias("d")).collect()
    assert rows[0].d == dt.date(2023, 12, 24)
    assert rows[1].d is None
    assert rows[2].d == dt.date(2024, 1, 5)


def test_assert_mostly_valid_raises(spark):
    df = spark.createDataFrame([("x",), ("y",), ("01.01.2024",)], ["s"])
    with pytest.raises(ValueError, match="failed to parse"):
        P.assert_mostly_valid(df, P.german_date(F.col("s")))


def test_misc_parsers(spark):
    df = spark.createDataFrame(
        [("ja", "Frau", "14467.0", "info@hotel-reise.de")],
        ["b", "g", "p", "mail"])
    r = df.select(
        P.parse_boolean(F.col("b")).alias("b"),
        P.parse_gender(F.col("g")).alias("g"),
        P.cut_decimal_digits(F.col("p")).alias("p"),
        P.tourism_tags(F.col("mail")).alias("tags"),
        P.is_not_true(F.lit(None).cast("boolean")).alias("nt"),
    ).first()
    assert (r.b, r.g, r.p) == (True, "w", "14467")
    assert sorted(r.tags) == ["hotel", "reise"]
    assert r.nt is True


def test_tourism_tags_null_mail(spark):
    df = spark.createDataFrame([(None,)], "mail string")
    assert df.select(P.tourism_tags(F.col("mail")).alias("t")).first().t == []


def test_geocode_german_codes_dict_semantics(spark):
    """The DE lookup is built from German rows only but mapped onto every
    row by code (cleanse_data.py:113-137): a foreign row sharing a German
    code inherits its coordinates; a foreign-only code stays NULL."""
    df = spark.createDataFrame(
        [("14467", "Deutschland"),
         ("14467", "Frankreich"),      # shares a German code -> geocoded
         ("75001", "Frankreich"),      # French-only code -> NULL
         (None, "Deutschland")],
        ["cleansed_postal_code", "cleansed_country"])
    out = {(r.cleansed_postal_code, r.cleansed_country):
           (r.latitude, r.longitude)
           for r in PC.geocode_german_codes(df).collect()}
    lat = PC.LAT_BASE + (14467 * 31 % PC.LAT_SPAN_MILLI) / 1000.0
    lon = PC.LON_BASE + (14467 * 17 % PC.LON_SPAN_MILLI) / 1000.0
    assert out[("14467", "Deutschland")] == (lat, lon)
    assert out[("14467", "Frankreich")] == (lat, lon)
    assert out[("75001", "Frankreich")] == (None, None)
    assert out[(None, "Deutschland")] == (None, None)
    # coordinates stay inside Germany's bounding box by construction
    assert PC.LAT_BASE <= lat < PC.LAT_BASE + PC.LAT_SPAN_MILLI / 1000.0
    assert PC.LON_BASE <= lon < PC.LON_BASE + PC.LON_SPAN_MILLI / 1000.0


def test_geocode_german_codes_file_backed_table(spark, tmp_path):
    """The production swap path: a FILE-BACKED geocode parquet (the shape
    of a pgeocode DE dump) through ``geocode_table=`` must keep the join
    shape of the synthetic stand-in — same row count (no fan-out), same
    dict-build population (built from German-observed codes, mapped onto
    every row), broadcast on the lookup side — with coordinates read
    from the file."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("14467", "Deutschland"),     # in file -> file coords
         ("14467", "Frankreich"),      # shares the German code -> coords
         ("10115", "Deutschland"),     # German but NOT in file -> NULL
         ("75001", "Frankreich"),      # foreign-only code: even though
                                       # the file has 75001, it was never
                                       # observed on a German row -> NULL
         (None, "Deutschland")],
        ["cleansed_postal_code", "cleansed_country"])
    geo_path = str(tmp_path / "pgeocode_de.parquet")
    spark.createDataFrame(
        [("14467", 52.4009, 13.0591),   # real Potsdam coordinates
         ("75001", 48.8606, 2.3376)],   # in file, not German-observed
        ["plz", "latitude", "longitude"]).write.parquet(geo_path)

    out_df = PC.geocode_german_codes(
        df, geocode_table=spark.read.parquet(geo_path))
    rows = out_df.collect()
    assert len(rows) == df.count()      # left join, no fan-out
    out = {(r.cleansed_postal_code, r.cleansed_country):
           (r.latitude, r.longitude) for r in rows}
    assert out[("14467", "Deutschland")] == (52.4009, 13.0591)
    assert out[("14467", "Frankreich")] == (52.4009, 13.0591)
    assert out[("10115", "Deutschland")] == (None, None)
    assert out[("75001", "Frankreich")] == (None, None)
    assert out[(None, "Deutschland")] == (None, None)
    # identical join shape to the synthetic path: lookup side broadcast
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    # column contract identical to the synthetic path
    synth = PC.geocode_german_codes(df)
    assert out_df.columns == synth.columns
