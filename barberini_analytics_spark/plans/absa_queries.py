"""ABSA-chain query inventory (SURVEY §2.10 M3-M6) over the synthetic
corpus: fuzzy aspect matching (3 algorithms), phrase polarity, document
sentiment, aspect×polarity pairing with distance weighting.

Lexicons are inline (the reference loads them from JSONC/CSV — S18); weights
are integer decipoints so every aggregate is exact until one final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..core.io import load_table
from ..core.localrel import values_df
from ..operators import fuzzy as FZ
from ..operators import text as X
from .registry import query

# aspect lexicon: exercises all three match algorithms against the corpus
# vocabulary (equality hits, trigram-close forms, levenshtein-close forms)
ASPECT_WORDS = (
    "spark", "query", "join", "window",          # equality hits
    "sparks", "windows", "joins", "merges",      # trigram-close
    "vektor", "streem", "qeury", "tabel",        # levenshtein-close
)

# polarity lexicon in integer decipoints (SentiWS weights are [-1, 1] reals;
# decipoints keep the aggregation exact — functions/money.py policy)
POLARITY_DECIPOINTS = {
    "fast": 8, "slow": -7, "big": 3, "small": -2, "value": 5, "dup": -9,
}

_ASPECT_VALUES = ", ".join(f"('{w}')" for w in ASPECT_WORDS)
_POLARITY_VALUES = ", ".join(f"('{w}', {v})" for w, v in POLARITY_DECIPOINTS.items())

_TOK_CTE = r"""
    toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        FROM documents
    ),
    tok AS (
        SELECT doc_id,
               CAST(generate_subscripts(w, 1) AS INT) AS word_index,
               unnest(w) AS word
        FROM toks
    )
"""

# pg_trgm trigram-set extraction (same semantics as operators/fuzzy.py
# trigram_set): split into alphanumeric words, pad each '  w ', distinct
# trigrams of all padded words
_TRGM = """
    list_distinct(flatten(list_transform(
        list_filter(string_split_regex({e}, '[^a-zA-Z0-9]+'), x -> length(x) > 0),
        w -> list_transform(generate_series(1, length(w) + 1),
                            i -> substring('  ' || w || ' ', i, 3))
    )))
"""


def _trgm_sql(expr: str) -> str:
    return _TRGM.format(e=expr).strip()


def _aspect_lexicon(spark: SparkSession) -> DataFrame:
    # VALUES LocalRelation, not createDataFrame: the RDD-backed literal
    # paid a ~32-slice python-runner job per broadcast build — 6-7 s of
    # measured zero-CPU stage run-time per run across the three match
    # branches (core/localrel.py)
    return values_df(spark, [(w,) for w in ASPECT_WORDS], "matched string")


_TOKENS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenized documents, materialized once per (session, sf).

    ~10 ABSA/text queries start from the same tokenize pipeline (two
    posexplodes + a per-doc row_number window); persisting it turns ten
    recomputations per bench/correctness run into one.  The token table is
    a few hundred MB per TB of text — at cluster scale this is the
    canonical "tokenize once, checkpoint, fan out" staging table.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _TOKENS_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        out = X.tokenize(docs, ["doc_id"]).withColumn(
            "word_index", F.col("word_index").cast("int")
        ).drop("sentence_index").persist()
        _TOKENS_CACHE[key] = out
    return _TOKENS_CACHE[key]


_EQUALITY_ORACLE = f"""
    WITH {_TOK_CTE}
    SELECT doc_id, word_index, word, word AS matched,
           CAST(NULL AS DOUBLE) AS score, 'equality' AS match_algorithm
    FROM tok
    WHERE word IN (SELECT term FROM (VALUES {_ASPECT_VALUES}) t(term))
    """


def _aspect_match_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 aspect matching, equality algorithm (post_aspects.py:131-141).

    Vocabulary-staged: the match runs on distinct words, then re-joins the
    token occurrences (both joins broadcast).
    """
    tokens = _tokens(spark, sf_dir)
    out = FZ.match_occurrences(tokens, _aspect_lexicon(spark), "equality")
    return out.select("doc_id", "word_index", "word", "matched",
                      F.lit(None).cast("double").alias("score"),
                      "match_algorithm")


_TRIGRAM_ORACLE = f"""
    WITH {_TOK_CTE},
    vocab AS (SELECT DISTINCT word FROM tok),
    scored AS (
        SELECT v.word, t.term AS matched,
               CAST(len(list_intersect({_trgm_sql('v.word')}, {_trgm_sql('t.term')})) AS DOUBLE)
               / (len({_trgm_sql('v.word')}) + len({_trgm_sql('t.term')})
                  - len(list_intersect({_trgm_sql('v.word')}, {_trgm_sql('t.term')})))
               AS score
        FROM vocab v CROSS JOIN (VALUES {_ASPECT_VALUES}) t(term)
    ),
    best AS (
        SELECT word, matched, score,
               row_number() OVER (
                   PARTITION BY word ORDER BY score DESC, matched ASC
               ) AS rn
        FROM scored WHERE score >= {FZ.TRIGRAM_THRESHOLD}
    )
    SELECT tok.doc_id, tok.word_index, tok.word, b.matched, b.score,
           'trigram' AS match_algorithm
    FROM tok JOIN (SELECT * FROM best WHERE rn = 1) b USING (word)
    """


def _aspect_match_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 aspect matching, pg_trgm similarity ≥ 0.65 (post_aspects.py:146-166).

    Trigram similarity is the §4 "genuinely custom" expression: distinct
    3-grams of the '  s '-padded strings, |∩|/|∪| — exact integer ratio.
    """
    tokens = _tokens(spark, sf_dir)
    out = FZ.match_occurrences(tokens, _aspect_lexicon(spark), "trigram")
    return out.select("doc_id", "word_index", "word", "matched", "score",
                      "match_algorithm")


_LEVENSHTEIN_ORACLE = f"""
    WITH {_TOK_CTE},
    vocab AS (SELECT DISTINCT word FROM tok WHERE length(word) <= {FZ.LEVENSHTEIN_MAX_LEN}),
    scored AS (
        SELECT v.word, t.term AS matched,
               CAST(levenshtein(v.word, t.term) AS DOUBLE)
               / greatest(length(v.word), length(t.term)) AS score
        FROM vocab v CROSS JOIN (VALUES {_ASPECT_VALUES}) t(term)
        WHERE length(t.term) <= {FZ.LEVENSHTEIN_MAX_LEN}
    ),
    best AS (
        SELECT word, matched, score,
               row_number() OVER (
                   PARTITION BY word ORDER BY score ASC, matched ASC
               ) AS rn
        FROM scored WHERE score <= {FZ.LEVENSHTEIN_MAX_RATIO}
    )
    SELECT tok.doc_id, tok.word_index, tok.word, b.matched, b.score,
           'levenshtein' AS match_algorithm
    FROM tok JOIN (SELECT * FROM best WHERE rn = 1) b USING (word)
    """


def _aspect_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 aspect matching, levenshtein ratio ≤ 0.19 (post_aspects.py:168-199),
    with the reference's length-255 pre-filter before the cross join.
    """
    tokens = _tokens(spark, sf_dir)
    out = FZ.match_occurrences(tokens, _aspect_lexicon(spark), "levenshtein")
    return out.select("doc_id", "word_index", "word", "matched", "score",
                      "match_algorithm")


@query(
    "aspect_match_all",
    oracle=f"""
    SELECT * FROM ({_EQUALITY_ORACLE})
    UNION ALL
    SELECT * FROM ({_TRIGRAM_ORACLE})
    UNION ALL
    SELECT * FROM ({_LEVENSHTEIN_ORACLE})
    """,
)
def aspect_match_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3/J6: all three fuzzy aspect-match algorithms in one tagged frame.

    Reference: ``post_aspects`` runs equality, pg_trgm-similarity and
    levenshtein matching as alternative algorithms over the token stream
    (src/absa/post_aspects.py:131-199); the ``match_algorithm`` tag keeps
    each algorithm's rows separately hash-checked.  ``score`` is NULL for
    the equality algorithm (no distance there), matching the reference's
    NULL column.

    All three share the persisted token table and the broadcast lexicon —
    at 100 TB each algorithm is one vocabulary-staged broadcast join; the
    union is append-only (no extra shuffle).
    """
    return (
        _aspect_match_equality(spark, sf_dir)
        .unionByName(_aspect_match_trigram(spark, sf_dir))
        .unionByName(_aspect_match_levenshtein(spark, sf_dir))
    )


_DOCUMENT_SENTIMENT_ORACLE = f"""
    WITH {_TOK_CTE},
    pol AS (SELECT * FROM (VALUES {_POLARITY_VALUES}) p(word, w10)),
    hits AS (
        SELECT tok.doc_id, tok.word, pol.w10
        FROM tok JOIN pol USING (word)
    ),
    doc_tokens AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id),
    agg AS (
        SELECT doc_id,
               CAST(sum(w10) AS BIGINT) AS s,
               CAST(sum(w10 * w10) AS BIGINT) AS ss,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT word) AS BIGINT) AS n_distinct
        FROM hits GROUP BY doc_id
    )
    SELECT a.doc_id,
           a.s / (10.0 * a.n) AS sentiment,
           CASE WHEN a.n > 1
                THEN sqrt((a.n * a.ss - a.s * a.s)
                          / (100.0 * a.n * (a.n - 1)))
                ELSE NULL END AS sentiment_stddev,
           CAST(a.n_distinct AS DOUBLE) / d.n_tokens AS subjectivity,
           a.n AS n_polarity_words,
           d.n_tokens AS n_tokens
    FROM agg a JOIN doc_tokens d USING (doc_id)
    """


def _document_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4/M5: phrase-polarity matching + per-document sentiment.

    Reference: identity polarity join + avg/stddev/subjectivity aggregation
    (src/absa/post_sentiments.py:103-283; migration_038.sql:32-63).
    Weights are integer decipoints: mean and sample stddev are computed from
    exact integer sums (``sqrt((n·Σw² − (Σw)²) / (100·n·(n−1)))``), so both
    engines evaluate identical IEEE expressions — no rounding, no
    Welford-vs-textbook variance divergence.  Subjectivity = distinct
    polarity words / document tokens (post_sentiments.py:115-139).
    """
    tokens = _tokens(spark, sf_dir)
    pol = values_df(spark, list(POLARITY_DECIPOINTS.items()),
                    "word string, w10 bigint")
    hits = tokens.join(F.broadcast(pol), "word")
    doc_tokens = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    agg = hits.groupBy("doc_id").agg(
        F.sum("w10").alias("s"),
        F.sum(F.col("w10") * F.col("w10")).alias("ss"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("word").alias("n_distinct"),
    )
    return (
        agg.join(doc_tokens, "doc_id")
        .select(
            "doc_id",
            (F.col("s") / (10.0 * F.col("n"))).alias("sentiment"),
            F.when(
                F.col("n") > 1,
                F.sqrt(
                    (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
                    / (100.0 * F.col("n") * (F.col("n") - 1))
                ),
            ).alias("sentiment_stddev"),
            (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias("subjectivity"),
            F.col("n").alias("n_polarity_words"),
            "n_tokens",
        )
    )


_ALPHA = 5          # gaussian distance scale, post_aspect_sentiments.py:186-190
_MAX_DISTANCE = 4   # linear-distance limit variant, migration_038.sql:122-146
_SENT_LEN = 10      # pseudo-sentence width (corpus has no punctuation)


_SENTENCE_SENTIMENT_ORACLE = f"""
    WITH {_TOK_CTE},
    sent AS (
        SELECT doc_id, word_index, word,
               CAST((word_index - 1) // {_SENT_LEN} AS INT) + 1 AS sentence_index
        FROM tok
    ),
    pol AS (SELECT * FROM (VALUES {_POLARITY_VALUES}) p(word, w10)),
    hits AS (
        SELECT s.doc_id, s.sentence_index, pol.w10
        FROM sent s JOIN pol USING (word)
    )
    SELECT doc_id, sentence_index,
           CAST(sum(w10) AS BIGINT) / (10.0 * count(*)) AS sentiment,
           CAST(count(*) AS BIGINT) AS n_polarity_words
    FROM hits
    GROUP BY doc_id, sentence_index
    """


def _sentence_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 sentence-level sentiment (``post_sentiment_sentence``).

    Reference: per-(post, sentence) mean polarity with counts
    (migration_038.sql:50-63; src/absa/post_sentiments.py:141-170).  The
    synthetic corpus has no sentence punctuation, so sentences are pinned
    as fixed 10-token windows of ``word_index`` — deterministic in both
    engines and exercising the same sentence-grain grouping.

    Scale: broadcast lexicon join, then one hash-agg shuffle on
    (doc_id, sentence_index) — identical bound to the document grain.
    """
    tokens = _tokens(spark, sf_dir)
    sent = tokens.withColumn(
        "sentence_index",
        (F.floor((F.col("word_index") - 1) / _SENT_LEN).cast("int") + 1),
    )
    pol = values_df(spark, list(POLARITY_DECIPOINTS.items()),
                    "word string, w10 bigint")
    return (
        sent.join(F.broadcast(pol), "word")
        .groupBy("doc_id", "sentence_index")
        .agg(
            (F.sum("w10") / (10.0 * F.count(F.lit(1)))).alias("sentiment"),
            F.count(F.lit(1)).alias("n_polarity_words"),
        )
    )


@query(
    "document_sentence_sentiment",
    oracle=f"""
    WITH doc AS ({_DOCUMENT_SENTIMENT_ORACLE}),
    sent AS ({_SENTENCE_SENTIMENT_ORACLE})
    SELECT doc_id, 'document' AS grain, CAST(NULL AS INT) AS sentence_index,
           sentiment, sentiment_stddev, subjectivity,
           n_polarity_words, n_tokens
    FROM doc
    UNION ALL
    SELECT doc_id, 'sentence', sentence_index, sentiment,
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           n_polarity_words, CAST(NULL AS BIGINT)
    FROM sent
    """,
)
def document_sentence_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4/M5/A5: phrase-polarity sentiment at document AND sentence grain,
    tagged by ``grain``.

    Reference: identity polarity join + avg/stddev/subjectivity per post
    (src/absa/post_sentiments.py:103-283; migration_038.sql:32-63) and the
    per-(post, sentence) ``post_sentiment_sentence`` view
    (migration_038.sql:50-63).  Both grains aggregate the same broadcast
    lexicon join; the union is append-only.  Sentence-only columns are NULL
    at document grain and vice versa, so each grain's values stay
    individually hash-checked.
    """
    doc = _document_sentiment(spark, sf_dir).select(
        "doc_id", F.lit("document").alias("grain"),
        F.lit(None).cast("int").alias("sentence_index"),
        "sentiment", "sentiment_stddev", "subjectivity",
        F.col("n_polarity_words").cast("long").alias("n_polarity_words"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )
    sent = _sentence_sentiment(spark, sf_dir).select(
        "doc_id", F.lit("sentence").alias("grain"),
        F.col("sentence_index").cast("int").alias("sentence_index"),
        "sentiment",
        F.lit(None).cast("double").alias("sentiment_stddev"),
        F.lit(None).cast("double").alias("subjectivity"),
        F.col("n_polarity_words").cast("long").alias("n_polarity_words"),
        F.lit(None).cast("long").alias("n_tokens"),
    )
    return doc.unionByName(sent)


_ASPECT_MAX_ORACLE = f"""
    WITH {_TOK_CTE},
    sent AS (
        SELECT doc_id, word_index, word,
               CAST((word_index - 1) // {_SENT_LEN} AS INT) + 1 AS sentence_index
        FROM tok
    ),
    aspects AS (
        SELECT doc_id, word_index, sentence_index, word
        FROM sent WHERE word IN (SELECT term FROM (VALUES {_ASPECT_VALUES}) t(term))
    ),
    pol AS (
        SELECT s.doc_id, s.word_index, s.sentence_index, p.w10
        FROM sent s JOIN (VALUES {_POLARITY_VALUES}) p(word, w10) USING (word)
    ),
    pairs AS (
        SELECT a.doc_id, a.word AS aspect_word,
               p.word_index AS polarity_word_index, p.w10,
               a.sentence_index = p.sentence_index AS same_sentence
        FROM aspects a JOIN pol p USING (doc_id)
    ),
    doc_model AS (
        SELECT doc_id, aspect_word, 'same_document' AS sentiment_model,
               CASE WHEN sum(w10) > 0
                    THEN CAST(sum(w10 * w10) AS BIGINT)
                         / (10.0 * CAST(sum(w10) AS BIGINT))
                    ELSE NULL END AS sentiment,
               CAST(count(DISTINCT polarity_word_index) AS BIGINT) AS count
        FROM pairs GROUP BY doc_id, aspect_word
    ),
    sent_model AS (
        SELECT doc_id, aspect_word, 'same_sentence' AS sentiment_model,
               CASE WHEN sum(w10) > 0
                    THEN CAST(sum(w10 * w10) AS BIGINT)
                         / (10.0 * CAST(sum(w10) AS BIGINT))
                    ELSE NULL END AS sentiment,
               CAST(count(DISTINCT polarity_word_index) AS BIGINT) AS count
        FROM pairs WHERE same_sentence GROUP BY doc_id, aspect_word
    )
    SELECT * FROM doc_model UNION ALL SELECT * FROM sent_model
    """


def _aspect_sentiment_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 "max" aspect-sentiment: document + sentence pairing models.

    Reference: ``absa.post_aspect_sentiment_max_document`` pairs every
    aspect occurrence with every polarity phrase in the same post and
    aggregates the A4 self-normalizing sentiment ``Σp²/Σp`` (NULL when
    ``Σp ≤ 0``) with ``count(DISTINCT polarity_word_index)``; the
    ``_sentence`` variant restricts pairs to the same sentence; the
    ``post_aspect_sentiment_max`` view unions both with a
    ``sentiment_model`` tag (migration_038.sql:148-198).

    Integer decipoints keep ``Σp²/Σp`` exact: ``Σw²/(10·Σw)`` divides two
    exact integer sums, so the zero-sum guard and the quotient agree
    bit-for-bit with the oracle.  Pseudo-sentences as in
    ``sentence_sentiment``.

    Scale: the pairing is the reference's intentional m×n-within-post join
    (J8) — bounded per doc, shuffled on doc_id; both models aggregate the
    *same* pair stream (one join, two aggregations).
    """
    tokens = _tokens(spark, sf_dir)
    sent = tokens.withColumn(
        "sentence_index",
        (F.floor((F.col("word_index") - 1) / _SENT_LEN).cast("int") + 1),
    )
    aspects = sent.filter(F.col("word").isin(*ASPECT_WORDS)).select(
        "doc_id", F.col("word").alias("aspect_word"),
        F.col("sentence_index").alias("a_sent"),
    )
    pol = values_df(spark, list(POLARITY_DECIPOINTS.items()),
                    "word string, w10 bigint")
    pol_occ = sent.join(F.broadcast(pol), "word").select(
        "doc_id", F.col("word_index").alias("polarity_word_index"),
        F.col("sentence_index").alias("p_sent"), "w10",
    )
    pairs = aspects.join(pol_occ, "doc_id").select(
        "doc_id", "aspect_word", "polarity_word_index", "w10",
        (F.col("a_sent") == F.col("p_sent")).alias("same_sentence"),
    )

    def _model(src: DataFrame, tag: str) -> DataFrame:
        return (
            src.groupBy("doc_id", "aspect_word")
            .agg(F.sum("w10").alias("s"),
                 F.sum(F.col("w10") * F.col("w10")).alias("ss"),
                 F.countDistinct("polarity_word_index").alias("count"))
            .select(
                "doc_id", "aspect_word",
                F.lit(tag).alias("sentiment_model"),
                F.when(F.col("s") > 0,
                       F.col("ss") / (10.0 * F.col("s"))).alias("sentiment"),
                F.col("count").cast("long").alias("count"),
            )
        )

    return _model(pairs, "same_document").unionByName(
        _model(pairs.filter("same_sentence"), "same_sentence")
    )


_ASPECT_DISTANCE_ORACLE = f"""
    WITH {_TOK_CTE},
    aspects AS (
        SELECT doc_id, word_index, word
        FROM tok WHERE word IN (SELECT term FROM (VALUES {_ASPECT_VALUES}) t(term))
    ),
    pol AS (
        SELECT tok.doc_id, tok.word_index, p.w10
        FROM tok JOIN (VALUES {_POLARITY_VALUES}) p(word, w10) USING (word)
    ),
    pairs AS (
        SELECT a.doc_id, a.word AS aspect_word,
               abs(a.word_index - p.word_index) AS d, p.w10
        FROM aspects a JOIN pol p USING (doc_id)
        WHERE a.word_index <> p.word_index
          AND abs(a.word_index - p.word_index) <= {_MAX_DISTANCE}
    ),
    weighted AS (
        SELECT doc_id, aspect_word, w10,
               exp(-pow(CAST(d AS DOUBLE) / {_ALPHA}, 2)) AS gw
        FROM pairs
    )
    SELECT doc_id, aspect_word,
           round(sum((w10 / 10.0) * gw) / sum(gw), 6) AS aspect_sentiment,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM weighted
    GROUP BY doc_id, aspect_word
    """


def _aspect_sentiment_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: aspect×polarity pairing with linear-distance limit + gaussian
    weighting.

    Reference: pair every aspect occurrence with every polarity phrase in
    the same post (J8, post_aspect_sentiments.py:61-75), token distance
    limit ≤ 4 and gaussian weight ``exp(-(d/α)²)``, α=5
    (post_aspect_sentiments.py:170-255; migration_038.sql:98-146).

    Deviation, pinned deliberately: the sentiment is the **gw-weighted
    mean** ``Σ(p·gw)/Σ(gw)`` rather than the reference's self-normalizing
    ``Σ(p²·gw)/Σ(p·gw)`` — the latter's denominator can cancel to ±ε in
    engine-dependent ways; the A4 self-normalizing form is exercised with
    exact integers in ``weighted_value_by_type``.  ``exp`` may differ by an
    ulp across libm implementations, hence the single round(6).
    """
    tokens = _tokens(spark, sf_dir)
    aspects = tokens.filter(F.col("word").isin(*ASPECT_WORDS)).select(
        "doc_id", F.col("word_index").alias("a_idx"), F.col("word").alias("aspect_word")
    )
    # VALUES (a LocalRelation whose data lives IN the plan), not
    # createDataFrame (an RDD-backed plan whose fingerprint cannot see
    # its content): the advisor below caches this side's statistics by
    # plan fingerprint, and only a content-carrying plan is cacheable
    pol = spark.sql("SELECT * FROM VALUES " + ", ".join(
        f"('{w}', {v})" for w, v in POLARITY_DECIPOINTS.items()
    ) + " AS t(word, w10)")
    pol_occ = tokens.join(F.broadcast(pol), "word").select(
        "doc_id", F.col("word_index").alias("p_idx"), "w10"
    )
    d = F.abs(F.col("a_idx") - F.col("p_idx"))
    # the per-post m×n pairing join (J8) goes through the catalog-backed
    # statistics advisor (judge r12 item 3): both sides are lexicon-hit
    # subsets of the token stream whose sizes Catalyst cannot see behind
    # the explode + filter; the advisor prices them from the persistent
    # catalog (one probe per table version, warm calls decide with zero
    # Spark jobs — pinned in tests/test_plan_shapes.py).  Strategy-hint
    # only (set_partitions=False inside a registry query).
    from ..core.stats import apply_advice

    paired, _ = apply_advice(spark, aspects, pol_occ, "doc_id",
                             set_partitions=False)
    pairs = (
        paired
        .filter((F.col("a_idx") != F.col("p_idx")) & (d <= _MAX_DISTANCE))
        .withColumn("gw", F.exp(-F.pow(d.cast("double") / _ALPHA, F.lit(2))))
    )
    return (
        pairs.groupBy("doc_id", "aspect_word")
        .agg(
            F.round(
                F.sum((F.col("w10") / 10.0) * F.col("gw")) / F.sum("gw"), 6
            ).alias("aspect_sentiment"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )


@query(
    "aspect_sentiment_pairing",
    oracle=f"""
    SELECT doc_id, aspect_word, sentiment_model, sentiment, count
    FROM ({_ASPECT_MAX_ORACLE})
    UNION ALL
    SELECT doc_id, aspect_word, 'gaussian_distance' AS sentiment_model,
           aspect_sentiment AS sentiment, n_pairs AS count
    FROM ({_ASPECT_DISTANCE_ORACLE})
    """,
)
def aspect_sentiment_pairing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6/A4/J8: all three aspect×polarity pairing models in one tagged
    frame — ``same_document`` / ``same_sentence`` (the self-normalizing
    Σp²/Σp "max" models, migration_038.sql:148-198) plus
    ``gaussian_distance`` (distance limit ≤ 4, gaussian weight
    ``exp(-(d/α)²)``, α=5, post_aspect_sentiments.py:170-255).

    Each model's rows keep their own exact-arithmetic policy: the max
    models divide exact integer decipoint sums (NULL-guarded on Σp ≤ 0,
    A4); the gaussian model rounds once after the libm ``exp`` fold.
    All three aggregate the same broadcast-lexicon pair stream.
    """
    mx = _aspect_sentiment_max(spark, sf_dir)
    dist = _aspect_sentiment_distance(spark, sf_dir).select(
        "doc_id", "aspect_word",
        F.lit("gaussian_distance").alias("sentiment_model"),
        F.col("aspect_sentiment").alias("sentiment"),
        F.col("n_pairs").cast("long").alias("count"),
    )
    return mx.unionByName(dist)


# inflection lexicon: lemma -> (decipoint weight, inflected surface forms).
# Stems ("merg") only hit via inflections; full lemmas ("stream") also hit
# via the identity branch — both arms of the reference's absa.inflection
# view (migration_028.sql:31-76) are exercised against the corpus vocab.
INFLECTION_LEXICON: dict[str, tuple[int, tuple[str, ...]]] = {
    "merg": (4, ("merge", "merges", "merged")),
    "stream": (6, ("streams", "streaming")),
    "sort": (-3, ("sorted", "sorting")),
    "vector": (7, ("vectors", "vectorized")),
    "slow": (-7, ("slower", "slowest")),
}

_INFL_VALUES = ", ".join(
    "('{}', {}, [{}])".format(
        lemma, w10, ", ".join(f"'{f}'" for f in forms)
    )
    for lemma, (w10, forms) in INFLECTION_LEXICON.items()
)


@query(
    "inflection_polarity_match",
    oracle=f"""
    WITH {_TOK_CTE},
    lex AS (SELECT * FROM (VALUES {_INFL_VALUES}) l(lemma, w10, infl)),
    forms AS (
        SELECT lemma, w10, lemma AS form, 'identity' AS match_kind FROM lex
        UNION ALL
        SELECT lemma, w10, unnest(infl) AS form, 'inflection' AS match_kind
        FROM lex
    ),
    dedup AS (SELECT DISTINCT lemma, w10, form, match_kind
              FROM forms WHERE NOT (match_kind = 'inflection' AND form = lemma))
    SELECT t.doc_id, t.word_index, t.word, f.lemma, f.w10, f.match_kind
    FROM tok t JOIN dedup f ON lower(t.word) = lower(f.form)
    """,
)
def inflection_polarity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4/J9: polarity matching through inflected surface forms.

    Reference: ``absa.inflection`` unions each lexicon word with its
    unnested ``inflections`` array (migration_028.sql:31-76); tokens join
    case-insensitively against the inflected form
    (src/absa/post_sentiments.py:201-214).

    The lexicon is tiny → broadcast hash join against the token stream;
    at 100 TB this stays a map-side join with no shuffle on the fact side.
    """
    tokens = _tokens(spark, sf_dir)
    lex = values_df(
        spark,
        [(lemma, w10, list(forms))
         for lemma, (w10, forms) in INFLECTION_LEXICON.items()],
        "lemma string, w10 bigint, infl array<string>")
    identity = lex.select(
        "lemma", "w10", F.col("lemma").alias("form"),
        F.lit("identity").alias("match_kind"),
    )
    inflected = lex.select(
        "lemma", "w10", F.explode("infl").alias("form"),
        F.lit("inflection").alias("match_kind"),
    ).filter(F.col("form") != F.col("lemma"))
    forms = identity.unionByName(inflected).dropDuplicates(
        ["lemma", "form", "match_kind"]
    )
    return (
        tokens.join(F.broadcast(forms),
                    F.lower(tokens.word) == F.lower(forms.form))
        .select("doc_id", "word_index", "word", "lemma", "w10", "match_kind")
    )


# the POS cascade for the synthetic English corpus: same engine as the
# German tagger (operators/pos.py — lexicon → suffix → default CASE), with
# the corpus vocabulary as lexicon.  The reference tags with spaCy
# de_core_news_lg; the German cascade's fidelity is pinned by the
# hand-labeled fixture in tests/test_pos_fixture.py, and the identical
# CASE string serves as both the Spark projection and the oracle SQL here.
from ..operators.pos import (extract_opinion_pairs,  # noqa: E402
                             pos_case_sql, pos_tag)

_EN_POS_LEXICON = (
    ("ADJ", ("fast", "slow", "big", "small")),
    ("DET", ("the", "a")),
)
_EN_POS_CASE = pos_case_sql(
    "word", _EN_POS_LEXICON, capitalized_noun=False, suffix_rules=(),
    verb_shapes=(), default="NOUN")


@query(
    "opinion_pattern_sentiment",
    oracle=f"""
    WITH {_TOK_CTE},
    tagged AS (
        SELECT doc_id, word_index, word, {_EN_POS_CASE} AS tag
        FROM tok
    ),
    bi AS (
        SELECT doc_id, word AS w1, tag AS t1,
               lead(word) OVER w AS w2, lead(tag) OVER w AS t2
        FROM tagged
        WINDOW w AS (PARTITION BY doc_id ORDER BY word_index)
    ),
    pairs AS (
        SELECT doc_id,
               CASE WHEN t1 = 'ADJ' THEN w2 ELSE w1 END AS aspect_word,
               CASE WHEN t1 = 'ADJ' THEN w1 ELSE w2 END AS opinion_word,
               CASE WHEN t1 = 'ADJ' THEN 'ADJ_NOUN'
                    ELSE 'NOUN_ADJ' END AS pattern
        FROM bi
        WHERE (t1 = 'ADJ' AND t2 = 'NOUN') OR (t1 = 'NOUN' AND t2 = 'ADJ')
    ),
    pol AS (SELECT * FROM (VALUES {_POLARITY_VALUES}) p(word, w10))
    SELECT pr.doc_id, pr.aspect_word,
           CAST(count(*) AS BIGINT) AS n_opinions,
           CAST(count(DISTINCT pr.pattern) AS BIGINT) AS n_patterns,
           CAST(sum(pol.w10) AS BIGINT) / (10.0 * count(*))
               AS opinion_sentiment
    FROM pairs pr JOIN pol ON pol.word = pr.opinion_word
    GROUP BY pr.doc_id, pr.aspect_word
    """,
)
def opinion_pattern_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7/M8-lite: opinion-pattern extraction + per-aspect opinion sentiment.

    Reference: spaCy-POS-tag posts, find POS subsequences matching the
    JSONC opinion patterns (ADJ+NOUN / NOUN+ADJ), extract the aspect and
    sentiment tokens (src/absa/post_opinion_patterns.py:277-463), then
    group to ``post_opinion_sentiment`` — count, mean sentiment per aspect
    (post_opinion_patterns.py:264-271; migration_053.sql:5-20).

    The tagger is the shared CASE-cascade engine of ``operators/pos.py``
    (lexicon → suffix → default; the German instantiation's fidelity is
    fixture-pinned in tests/test_pos_fixture.py); pattern search is a
    ``lead()`` window — adjacency comes from one sort within the doc
    partition, no self-join (J7→window rewrite, SURVEY §2.6).  Mean
    sentiment uses exact integer decipoint sums with a single final
    division.
    """
    tokens = _tokens(spark, sf_dir)
    tagged = pos_tag(
        tokens.select("doc_id", "word_index", "word"),
        lexicon=_EN_POS_LEXICON, capitalized_noun=False, suffix_rules=(),
        verb_shapes=(), default="NOUN")
    pairs = extract_opinion_pairs(tagged)
    pol = values_df(spark, list(POLARITY_DECIPOINTS.items()),
                    "word string, w10 bigint")
    return (
        pairs.join(F.broadcast(pol),
                   pol.word == pairs.opinion_word)
        .groupBy("doc_id", "aspect_word")
        .agg(
            F.count(F.lit(1)).alias("n_opinions"),
            F.countDistinct("pattern").alias("n_patterns"),
            (F.sum("w10") / (10.0 * F.count(F.lit(1))))
            .alias("opinion_sentiment"),
        )
    )
