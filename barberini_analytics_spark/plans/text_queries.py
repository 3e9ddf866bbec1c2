"""Text-analysis query inventory (tokenizer, n-grams, quality, language ID,
fingerprinting) over the ``documents`` table — SURVEY §2.10 M1/M2 plus the
training-data-pipeline text operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.io import load_table
from ..operators import text as X
from .registry import query

# Shared oracle fragment: tokenized documents with 1-based continuous word
# index (document texts carry no sentence punctuation, so sentence_index=1 —
# multi-sentence behavior is pinned by unit tests on crafted fixtures).
_TOK_CTE = r"""
    toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        FROM documents
    ),
    tok AS (
        SELECT doc_id,
               generate_subscripts(w, 1) AS word_index,
               unnest(w) AS word,
               1 AS sentence_index
        FROM toks
    )
"""


@query(
    "tokenize_documents",
    oracle=f"""
    WITH {_TOK_CTE}
    SELECT doc_id, CAST(word_index AS INT) AS word_index, word,
           CAST(sentence_index AS INT) AS sentence_index
    FROM tok WHERE word <> ''
    """,
)
def tokenize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 tokenizer: text → (doc_id, word_index, word, sentence_index).

    Reference: ``src/absa/post_words.py:150-231`` (the ``post_word`` table,
    migration_014.sql:11-17).  Indices are 1-based like the reference's.
    """
    docs = load_table(spark, sf_dir, "documents")
    return X.tokenize(docs, ["doc_id"]).withColumn(
        "word_index", F.col("word_index").cast("int")
    ).withColumn("sentence_index", F.col("sentence_index").cast("int"))


@query(
    "document_ngrams",
    oracle=f"""
    WITH {_TOK_CTE}
    SELECT doc_id, 1 AS n, CAST(word_index AS INT) AS word_index,
           word AS phrase, CAST(sentence_index AS INT) AS sentence_index
    FROM tok WHERE word NOT IN ('a', 'the')
    UNION ALL
    SELECT doc_id, 2 AS n, CAST(word_index AS INT) AS word_index,
           phrase, CAST(sentence_index AS INT) AS sentence_index
    FROM (
        SELECT doc_id, word_index, sentence_index,
               word || ' ' || lead(word) OVER (
                   PARTITION BY doc_id, sentence_index ORDER BY word_index
               ) AS phrase
        FROM tok
    ) WHERE phrase IS NOT NULL AND phrase LIKE '% %'
    """,
)
def document_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 n-gram generation (n=1,2), sentence-bounded, stopword-filtered
    unigrams.

    Reference: ``src/absa/post_ngrams.py:111-168`` — n-way self-join there,
    one ``lead`` window here (SURVEY §2.4 J7: strictly better plan).
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = X.tokenize(docs, ["doc_id"])
    out = X.ngrams(tokens, ["doc_id"], [1, 2], stopwords=("a", "the"))
    return out.select(
        "doc_id", F.col("n").cast("int").alias("n"),
        F.col("word_index").cast("int").alias("word_index"),
        "phrase", F.col("sentence_index").cast("int").alias("sentence_index"),
    )


@query(
    "document_quality",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, text,
               string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
           CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS BIGINT)
               AS n_stopwords,
           CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / len(toks)
               AS mean_token_len,
           CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE) / len(toks)
               AS stopword_ratio,
           CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
               / length(text) AS alpha_ratio,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio
    FROM t
    """,
)
def document_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring for corpus filtering (training-data op).

    All counts are exact integers; ratios are single divisions of exact
    integers → engine-portable without rounding.
    """
    docs = load_table(spark, sf_dir, "documents")
    out = X.quality_features(docs, stopwords=("a", "the"))
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
        F.col("n_stopwords").cast("long").alias("n_stopwords"),
        "mean_token_len", "stopword_ratio", "alpha_ratio", "distinct_ratio",
    )


def _lex_sql(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "document_language_id",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, lang,
               string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents
    ), h AS (
        SELECT doc_id, lang,
               len(list_filter(toks, x -> list_contains({_lex_sql(X.LANG_LEXICONS['de'])}, x))) AS h_de,
               len(list_filter(toks, x -> list_contains({_lex_sql(X.LANG_LEXICONS['en'])}, x))) AS h_en,
               len(list_filter(toks, x -> list_contains({_lex_sql(X.LANG_LEXICONS['es'])}, x))) AS h_es,
               len(list_filter(toks, x -> list_contains({_lex_sql(X.LANG_LEXICONS['fr'])}, x))) AS h_fr
        FROM t
    )
    SELECT doc_id, lang,
           CASE WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
                WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                ELSE 'fr' END AS predicted_lang
    FROM h
    """,
)
def document_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word language-ID heuristic (training-data op; reference
    analogue: langdetect gate, src/topic_modeling.py:155-160).

    Ties resolve to the lexicographically first language (both sides).
    """
    docs = load_table(spark, sf_dir, "documents")
    return X.language_id(docs).select("doc_id", "lang", "predicted_lang")


@query(
    "document_fingerprints",
    oracle=r"""
    SELECT doc_id,
           CAST(('0x' || substring(md5(
               array_to_string(string_split_regex(trim(lower(text)), '\s+'), ' ')
           ), 1, 14)) AS BIGINT) AS fingerprint
    FROM documents
    """,
)
def document_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting (md5-derived 56-bit, whitespace-normalized).

    The exact-dedup key; portable across engines by construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    return X.fingerprint(docs).select("doc_id", "fingerprint")


# BPE-ish pre-tokenizer pattern (GPT-2 style, minus the \s+(?!\S) lookahead
# so the same pattern runs on Java regex AND DuckDB's RE2): contractions,
# optionally space-prefixed letter runs / digit runs / symbol runs.
_BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"
_BPE_SQL = _BPE_PATTERN.replace("'", "''")


@query(
    "token_counts",
    oracle=rf"""
    SELECT doc_id,
           CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS ws_tokens,
           CAST(length(regexp_extract_all(text, '{_BPE_SQL}'))
               AS BIGINT) AS bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting: whitespace tokens + BPE-ish regex
    pre-tokens (the training-data-pipeline budget metric).

    Both counts are single JVM regex expressions inside one codegen stage —
    no UDF, no shuffle; at 100 TB this is a pure map over the scan with
    only (doc_id, 3 ints) leaving each task.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0))
        .cast("long").alias("bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
