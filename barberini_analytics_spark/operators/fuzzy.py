"""Fuzzy string matching: the reference's three aspect-match algorithms.

Reference: ``src/absa/post_aspects.py:40-199`` and the generic framework
``src/absa/phrase_matching.py:11-197`` — equality, pg_trgm ``similarity() ≥
0.65``, and normalized ``levenshtein()/length ≤ 0.19``, staged through temp
tables (cross join → best-match agg → re-join).

Spark-first design: the cross product runs on **distinct words**, not word
occurrences — the vocabulary is orders of magnitude smaller than the corpus
(the staging the reference approximates with its temp tables,
post_aspects.py:59-118).  The lexicon side is broadcast.  Scores are exact
integer ratios (distinct-trigram counts, edit distances), so results are
engine-portable without rounding.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

TRIGRAM_THRESHOLD = 0.65   # post_aspects.py:160
LEVENSHTEIN_MAX_RATIO = 0.19  # post_aspects.py:183-188
LEVENSHTEIN_MAX_LEN = 255  # pre-filter before cross join, post_aspects.py:190-194


def trigram_set(col: Column) -> Column:
    """Distinct 3-grams of a string under pg_trgm extraction semantics.

    pg_trgm (documented public behavior): the string is split into *words*
    (maximal alphanumeric runs — ASCII approximation of ``isalnum``), each
    word is padded with two leading and one trailing space, and the distinct
    trigrams of all padded words form the set.  This is what makes the
    documented example ``similarity('word', 'two words') = 4/11`` hold:
    cross-word trigrams are never generated and punctuation never enters a
    trigram.
    """
    words = F.filter(
        F.split(col, r"[^a-zA-Z0-9]+"), lambda s: F.length(s) > 0
    )
    grams = F.flatten(
        F.transform(
            words,
            lambda w: F.transform(
                # padded word has length(w)+3 chars → length(w)+1 trigrams
                F.sequence(F.lit(1), F.length(w) + 1),
                lambda i: F.concat(F.lit("  "), w, F.lit(" ")).substr(i, F.lit(3)),
            ),
        )
    )
    return F.array_distinct(grams)


def trigram_similarity(a: Column, b: Column) -> Column:
    """pg_trgm ``similarity(a, b)``: |∩| / |∪| of distinct padded trigrams.

    Exact integer counts → the division is engine-portable (SURVEY §4
    "genuinely custom work" item 1).
    """
    ta, tb = trigram_set(a), trigram_set(b)
    n_inter = F.size(F.array_intersect(ta, tb))
    n_union = F.size(ta) + F.size(tb) - n_inter
    return n_inter.cast("double") / n_union.cast("double")


def levenshtein_ratio(a: Column, b: Column) -> Column:
    """Edit distance normalized by the longer string's length."""
    return F.levenshtein(a, b).cast("double") / F.greatest(F.length(a), F.length(b)).cast("double")


def _best_per_word(matches: DataFrame, score: str, ascending: bool) -> DataFrame:
    order = [F.col(score).asc() if ascending else F.col(score).desc(),
             F.col("matched").asc()]
    w = W.partitionBy("word").orderBy(*order)
    return (
        matches.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def fuzzy_match_words(words: DataFrame, lexicon: DataFrame, algorithm: str,
                      word_col: str = "word", lexicon_col: str = "matched") -> DataFrame:
    """Best lexicon match per distinct word under one of the three algorithms.

    ``words`` must already be distinct on ``word_col`` (callers dedupe the
    corpus vocabulary first — the staging that keeps the cross product
    vocabulary×lexicon instead of corpus×lexicon).  Returns
    ``(word, matched, score)``; ties break to the smallest lexicon entry,
    mirroring the reference's ``MIN(word)`` tie rule (post_aspects.py:99).
    """
    lex = F.broadcast(lexicon.select(F.col(lexicon_col)).distinct())
    w = F.col(word_col)
    m = F.col(lexicon_col)
    if algorithm == "equality":
        matched = words.join(lex, F.lower(w) == F.lower(m))
        scored = matched.withColumn("score", F.lit(1.0))
        best = scored  # equality is exact: at most one lexicon entry per word
        best = _best_per_word(
            best.select(w.alias("word"), m.alias("matched"), "score"),
            "score", ascending=False,
        )
    elif algorithm == "trigram":
        scored = (
            words.crossJoin(lex)
            .withColumn("score", trigram_similarity(F.lower(w), F.lower(m)))
            .filter(F.col("score") >= TRIGRAM_THRESHOLD)
        )
        best = _best_per_word(
            scored.select(w.alias("word"), m.alias("matched"), "score"),
            "score", ascending=False,
        )
    elif algorithm == "levenshtein":
        scored = (
            words.filter(F.length(w) <= LEVENSHTEIN_MAX_LEN)
            .crossJoin(lex.filter(F.length(m) <= LEVENSHTEIN_MAX_LEN))
            .withColumn("score", levenshtein_ratio(F.lower(w), F.lower(m)))
            .filter(F.col("score") <= LEVENSHTEIN_MAX_RATIO)
        )
        best = _best_per_word(
            scored.select(w.alias("word"), m.alias("matched"), "score"),
            "score", ascending=True,
        )
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    return best.withColumn("match_algorithm", F.lit(algorithm))


def match_occurrences(tokens: DataFrame, lexicon: DataFrame, algorithm: str,
                      id_cols: Sequence[str] = ("doc_id",),
                      word_col: str = "word") -> DataFrame:
    """Corpus-wide fuzzy matching: distinct-vocabulary match + re-join.

    The scalable two-stage plan: (1) fuzzy match on the deduplicated
    vocabulary (tiny cross product, broadcast lexicon), (2) equi-join the
    per-word results back to the token occurrences — one broadcastable join
    against the full corpus.
    """
    vocab = tokens.select(word_col).distinct()
    best = fuzzy_match_words(vocab, lexicon, algorithm, word_col=word_col)
    return tokens.join(F.broadcast(best), word_col)

