"""SentiWS lexicon parser (SURVEY §2.1 S18).

Reference: ``FetchSentiWs`` parses the proprietary line format
``Word|POS\\tweight\\tinflection1,inflection2,…`` with a Python regex per
line (src/absa/phrase_polarity.py:53-122), plus the derived views
``absa.phrase_polarity`` / ``absa.inflection`` (migration_028.sql:31-76).

Spark-first: ``spark.read.text`` + one ``regexp_extract`` per field +
``split`` for the inflection list — the whole parse is a single projection
over the text scan; inflection unnesting is an ``explode``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_FLOAT = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"
_LINE = rf"^(\p{{L}}+)\|([A-Z]+)\t({_FLOAT})(?:\t(.*))?$"


def parse_sentiws_lines(lines: DataFrame) -> DataFrame:
    """Parse a one-column (``value``) DataFrame of SentiWS-format lines into
    ``(word, pos_tag, weight, inflections array<string>)``."""
    df = lines.select(
        F.regexp_extract("value", _LINE, 1).alias("word"),
        F.regexp_extract("value", _LINE, 2).alias("pos_tag"),
        # try_cast: a malformed line extracts '' and must drop via the
        # word filter, not abort the scan (Spark 4 ANSI default); the
        # filter sits above this projection in the analyzed plan, so the
        # cast can evaluate for non-matching lines
        F.regexp_extract("value", _LINE, 3).try_cast("double")
        .alias("weight"),
        F.regexp_extract("value", _LINE, 4).alias("__infl"),
    ).filter(F.col("word") != "")
    df = df.withColumn(
        "inflections",
        F.when(F.col("__infl") == "", F.array().cast("array<string>"))
        .otherwise(F.split(F.regexp_replace("__infl", r"\s*,\s*", ","), ","))
    ).drop("__infl")
    return df


def parse_sentiws(spark: SparkSession, path: str,
                  polarity: str | None = None) -> DataFrame:
    """Parse one SentiWS file into
    ``(word, pos_tag, weight, inflections array<string>)``."""
    df = parse_sentiws_lines(spark.read.text(path))
    if polarity is not None:
        df = df.withColumn("dataset_polarity", F.lit(polarity))
    return df


def phrase_polarity_view(sentiws: DataFrame) -> DataFrame:
    """``absa.phrase_polarity_sentiws`` shape: polarity sign is a generated
    column of the weight (migration_028.sql:12-17)."""
    return sentiws.withColumn(
        "polarity",
        F.when(F.col("weight") > 0, "positive").otherwise("negative"))


def inflection_view(sentiws: DataFrame) -> DataFrame:
    """``absa.inflection_sentiws``: one row per inflected form, base form
    included (migration_028.sql:60-76's unnest + union)."""
    base = sentiws.select("word", F.col("word").alias("inflected"))
    infl = sentiws.select(
        "word", F.explode("inflections").alias("inflected"))
    return base.unionByName(infl).distinct()
