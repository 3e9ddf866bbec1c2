"""Unit tests for fuzzy matching — trigram semantics pinned against the
documented pg_trgm example, levenshtein ratio, and best-match tie rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from barberini_analytics_spark.operators import fuzzy as FZ


def _sim(spark, a: str, b: str) -> float:
    return (
        spark.range(1)
        .select(FZ.trigram_similarity(F.lit(a), F.lit(b)).alias("s"))
        .collect()[0].s
    )


def test_trigram_similarity_pg_trgm_example(spark):
    # documented pg_trgm example: similarity('word', 'two words') = 0.363636...
    assert _sim(spark, "word", "two words") == pytest.approx(4 / 11, abs=1e-9)


def test_trigram_similarity_identical(spark):
    assert _sim(spark, "spark", "spark") == 1.0


def test_trigram_similarity_disjoint(spark):
    assert _sim(spark, "abc", "xyz") == 0.0


def test_levenshtein_ratio(spark):
    r = (
        spark.range(1)
        .select(FZ.levenshtein_ratio(F.lit("vector"), F.lit("vektor")).alias("r"))
        .collect()[0].r
    )
    assert r == pytest.approx(1 / 6)


def test_fuzzy_match_tie_breaks_to_smallest_lexicon_entry(spark):
    words = spark.createDataFrame([("abcdefgh",)], ["word"])
    # two lexicon entries with identical similarity 8/11 ≈ 0.727 to the word
    lexicon = spark.createDataFrame([("abcdefghx",), ("abcdefghy",)], ["matched"])
    best = FZ.fuzzy_match_words(words, lexicon, "trigram").collect()
    assert len(best) == 1
    assert best[0].matched == "abcdefghx"


def test_equality_match_case_insensitive(spark):
    words = spark.createDataFrame([("Spark",), ("other",)], ["word"])
    lexicon = spark.createDataFrame([("spark",)], ["matched"])
    rows = FZ.fuzzy_match_words(words, lexicon, "equality").collect()
    assert [(r.word, r.matched) for r in rows] == [("Spark", "spark")]
