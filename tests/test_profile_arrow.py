"""Parity pin for ``operators.text.profile_features_arrow``.

The Arrow operator replaces the quality/language/fingerprint/repetition/
winnow expression chain inside ``document_profile`` (r13 optimization).
This test runs BOTH paths over a fixture that exercises every edge the
expression semantics carry — Java-``\\s``-class whitespace runs, short
documents below the winnow window, 1/2-token documents (NULL bigram/
trigram arms), repeated tokens, non-ASCII code points, language-lexicon
ties — and asserts bit-identical rows.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from barberini_analytics_spark.operators import text as X

_BPE_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+"
                r"| ?[^a-zA-Z0-9\s]+|\s+")
_STOPWORDS = ("a", "the")

_FIXTURE = [
    (1, "de", "Der Hund und die Katze und der Hund ist ein Tier"),
    (2, "en", "the cat of the house is a cat the cat"),
    (3, "xx", "short"),                      # < winnow minimum (11 chars)
    (4, "xx", "x"),                          # 1 token: NULL bigram arm
    (5, "xx", "two tokens!"),                # 2 tokens: NULL trigram arm
    (6, "de", "tab\tand\nnewline\x0bsplit\fchars\rhere end"),
    (7, "fr", "le la de et un une est le la de et un une est"),
    (8, "es", "Umlaute äöü and éléphant café"),
    (9, "en", "aa aa aa aa aa aa aa aa aa aa aa aa"),
    (10, "en", "  leading and trailing spaces   "),
    (11, "en", "a " * 40 + "long repeated doc for chunk windows " * 6),
    (12, "xx", "1234567890 numbers 0x0 and $ymbols %%% ___"),
    # trim() strips only 0x20, so a leading tab survives and the split
    # yields a leading empty token — both paths must agree on it
    (13, "en", "\tstarts with tab and ends with newline\n"),
]


def _expression_path(df):
    out = X.quality_features(df, stopwords=_STOPWORDS)
    out = X.language_id(out)
    out = X.fingerprint(out)
    out = X.repetition_signals(out)
    out = X.winnow_fingerprints(out)
    return out.select(
        "doc_id", "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
        F.col("n_stopwords").cast("long").alias("n_stopwords"),
        "mean_token_len", "stopword_ratio", "alpha_ratio", "distinct_ratio",
        "predicted_lang", "fingerprint",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0))
        .cast("long").alias("bpe_tokens"),
        "top_unigram_frac", "top_bigram_frac", "dup_trigram_frac",
        F.size("winnow_fps").cast("long").alias("n_winnow_fp"),
        F.aggregate("winnow_fps", F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("winnow_checksum"),
        F.md5(F.array_join(
            F.transform(X.chunk_texts(F.col("tokens"), 32, 4),
                        lambda c: c["chunk_text"]), "|"))
        .alias("chunks_digest"),
    )


def _cell_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return a == b  # bit-exact: both sides are int/int IEEE divisions
    return a == b


def test_profile_arrow_matches_expression_chain(spark):
    df = spark.createDataFrame(_FIXTURE, "doc_id long, lang string, text string")
    expected = {r["doc_id"]: r.asDict()
                for r in _expression_path(df).collect()}
    actual_df = X.profile_features_arrow(
        df, id_cols=("doc_id", "lang"), stopwords=_STOPWORDS,
        bpe_pattern=_BPE_PATTERN)
    assert [f.name for f in actual_df.schema.fields] == \
        list(expected[1].keys())
    actual = {r["doc_id"]: r.asDict() for r in actual_df.collect()}
    assert sorted(actual) == sorted(expected)
    for doc_id, exp_row in expected.items():
        act_row = actual[doc_id]
        for col, exp_v in exp_row.items():
            assert _cell_eq(act_row[col], exp_v), (
                f"doc {doc_id} col {col}: arrow={act_row[col]!r} "
                f"expr={exp_v!r}")


def test_profile_arrow_null_text_row(spark):
    df = spark.createDataFrame(
        [(1, "en", None), (2, "en", "ok text here")],
        "doc_id long, lang string, text string")
    rows = {r["doc_id"]: r for r in X.profile_features_arrow(
        df, id_cols=("doc_id", "lang"), stopwords=_STOPWORDS,
        bpe_pattern=_BPE_PATTERN).collect()}
    assert rows[1]["n_tokens"] is None
    assert rows[1]["chunks_digest"] is None
    assert rows[2]["n_tokens"] == 3


def test_profile_arrow_non_long_id_columns(spark):
    """ADVICE r13: id columns of any input type pass through verbatim —
    the output Arrow schema must take their type from the INPUT batch,
    not assume long/double/string.  An int id previously crashed
    RecordBatch.from_arrays with a schema mismatch."""
    df = spark.createDataFrame(
        [(7, "en", "some ok text here")],
        "doc_id int, lang string, text string")
    row = X.profile_features_arrow(
        df, id_cols=("doc_id", "lang"), stopwords=_STOPWORDS,
        bpe_pattern=_BPE_PATTERN).collect()[0]
    assert row["doc_id"] == 7
    assert row["n_tokens"] == 4
