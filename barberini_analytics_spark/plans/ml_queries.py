"""ML-layer driver queries (SURVEY §2.10 M8/M9/M10) — rows-only checks:
Gibbs sampling, iterative forecasting and density clustering have no ANSI-SQL
equivalent; their semantics are pinned by unit tests (tests/test_ml.py).

Split of labor (mirrors the reference): heavy row work (tokenization,
stopword/hapax filtering, feature engineering, top-term counting) runs
distributed; only the tiny model core (GSDMM sampler / KNN loop / DBSCAN
over ≤ thousands of rows) runs on the driver, on deterministically sorted
collected data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.io import load_table
from ..ml.dbscan import cosine_dbscan
from ..ml.gsdmm import GSDMM
from ..ml.knn import KNNRegressor, MinMaxScaler
from ..operators import text as X
from ..operators.relational import top_k_per_group
from .registry import query

# a compact stopword list for the synthetic English corpus (the reference
# loads NLTK german stopwords, src/topic_modeling.py:300-320)
_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
              "for", "on", "with", "as", "at", "by", "be", "this", "that")


#: per-(session, sf) persisted preprocessing result — topic_modeling_texts
#: and _terms run back-to-back over the same corpus; one materialization
#: serves both (the reference fits all its models off one Doc list too,
#: src/topic_modeling.py:163-189)
_TOKENS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _topic_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 preprocessing, fully distributed (src/topic_modeling.py:300-335):
    keep one language, tokenize, drop stopwords/non-alpha/single chars,
    drop corpus-hapax tokens, drop docs with ≤ 2 tokens."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _TOKENS_CACHE:
        return _TOKENS_CACHE[key]
    docs = load_table(spark, sf_dir, "documents").filter("lang = 'en'")
    tokens = X.tokenize(docs, ["doc_id"]).select("doc_id", "word")
    tokens = tokens.filter(
        (~F.col("word").isin(*_STOPWORDS))
        & F.col("word").rlike("^[a-z]+$") & (F.length("word") > 1))
    non_hapax = (tokens.groupBy("word").count()
                 .filter("count > 1").select("word"))
    tokens = tokens.join(F.broadcast(non_hapax), "word")
    keep = tokens.groupBy("doc_id").count().filter("count > 2") \
        .select("doc_id")
    out = tokens.join(keep, "doc_id").persist()
    _TOKENS_CACHE[key] = out
    return out


#: deterministic fit cache — topic_modeling_texts and _terms share one fit
_FIT_CACHE: dict[str, list[tuple[int, int]]] = {}


def _fit_topics(tokens: DataFrame, cache_key: str) -> DataFrame:
    """Collect (sorted) token lists, fit GSDMM on the driver, return
    (doc_id, topic) as a DataFrame.  The fit is deterministic, so the two
    topic queries share it via a per-sf cache."""
    spark = tokens.sparkSession
    if cache_key not in _FIT_CACHE:
        grouped = (tokens.groupBy("doc_id")
                   .agg(F.sort_array(F.collect_list("word")).alias("words"))
                   .orderBy("doc_id").collect())
        doc_ids = [r.doc_id for r in grouped]
        labels = GSDMM(n_clusters=10, alpha=0.1, beta=0.1, n_iters=30,
                       seed=42).fit_predict([r.words for r in grouped])
        _FIT_CACHE[cache_key] = [
            (int(d), int(z)) for d, z in zip(doc_ids, labels)]
    return spark.createDataFrame(_FIT_CACHE[cache_key],
                                 ["doc_id", "topic"])


@query("topic_modeling_texts")  # rows-only: Gibbs sampling is not SQL
def topic_modeling_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9: text→topic assignment; the topic is renamed to its top term
    (src/topic_modeling.py:247-254), computed distributed via explode +
    rank window."""
    tokens = _topic_tokens(spark, sf_dir)
    assign = _fit_topics(tokens, sf_dir)
    term_counts = (tokens.join(assign, "doc_id")
                   .groupBy("topic", "word").count())
    top1 = top_k_per_group(term_counts, ["topic"],
                           [F.col("count").desc(), F.col("word").asc()], 1)
    return (assign.join(top1.select("topic",
                                    F.col("word").alias("topic_name")),
                        "topic")
            .select("doc_id", "topic", "topic_name"))


@query("topic_modeling_terms")  # rows-only: Gibbs sampling is not SQL
def topic_modeling_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9: top-20 terms per topic by count (A11 rank window)."""
    tokens = _topic_tokens(spark, sf_dir)
    assign = _fit_topics(tokens, sf_dir)
    term_counts = (tokens.join(assign, "doc_id")
                   .groupBy("topic", "word").count())
    return top_k_per_group(
        term_counts, ["topic"],
        [F.col("count").desc(), F.col("word").asc()], 20,
        rank_col="rank", keep_rank=True,
    ).select("topic", "word", F.col("count").cast("long").alias("n"), "rank")


# ---------------------------------------------------------------------------
# M10 — visitor prediction
# ---------------------------------------------------------------------------

_SEQ_LEN = 7     # lag-feature depth (reference SEQUENCE_LENGTH)
_DAYS_AHEAD = 7  # days_to_predict default (predict.py:63)


@query("visitor_prediction_forecast")  # rows-only: iterative KNN forecast
def visitor_prediction_forecast(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """M10: daily-entry series (purchase events per day) + weekday one-hot +
    lag features → min-max scaling → KNN(k=5) → sequential 7-day forecast
    with closed-day zeroing (predict.py:59-206).

    Feature engineering (grouping, one-hots, lags) is distributed; the
    collected series is tiny (one row per day).  ``weekday_1`` (Tuesday,
    the museum's closing day) forces a 0 prediction, as in the reference.
    """
    events = load_table(spark, sf_dir, "events")
    daily = (events.filter("event_type = 'purchase'")
             .groupBy(F.to_date("ts").alias("date"))
             .agg(F.sum(F.floor("value")).cast("double").alias("entries"))
             .withColumn("weekday", F.weekday("date"))
             .orderBy("date"))
    rows = daily.collect()
    dates = [r.date for r in rows]
    entries = np.array([r.entries for r in rows])
    weekdays = [r.weekday for r in rows]

    scaler = MinMaxScaler().fit(entries)
    scaled = scaler.transform(entries)

    def feats(weekday: int, lags: list[float]) -> list[float]:
        onehot = [1.0 if weekday == i else 0.0 for i in range(7)]
        return onehot + lags

    x, y = [], []
    for i in range(_SEQ_LEN, len(scaled)):
        x.append(feats(weekdays[i], list(scaled[i - _SEQ_LEN:i][::-1])))
        y.append(scaled[i])
    model = KNNRegressor(5).fit(np.array(x), np.array(y))

    history = list(scaled)
    out = []
    last = dates[-1]
    for step in range(1, _DAYS_AHEAD + 1):
        day = last + __import__("datetime").timedelta(days=step)
        wd = day.weekday()
        if wd == 1:  # Tuesday → closed (predict.py:180-183)
            # deviation pinned: the reference feeds scaled 0 through
            # inverse_transform (= series minimum when min > 0); closed
            # days report 0 visitors here
            history.append(0.0)
            out.append((day, 0))
            continue
        pred = float(model.predict(
            [feats(wd, history[-_SEQ_LEN:][::-1])])[0])
        history.append(pred)
        out.append((day, int(scaler.inverse(np.array([pred]))[0])))
    return spark.createDataFrame(out, ["date", "entries"])


# ---------------------------------------------------------------------------
# M8 — embedding-space density clustering
# ---------------------------------------------------------------------------

@query("embedding_dbscan_clusters")  # rows-only: density clustering not SQL
def embedding_dbscan_clusters(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """M8: cosine DBSCAN (eps=.37, min 2) over the embedding table; cluster
    labels canonicalized to the smallest member id
    (src/absa/post_opinion_patterns.py:73-210).  Collected sorted by
    vec_id — the reference's phrase-vector sets are of comparable size;
    the LSH scale path is documented in ml/dbscan.py."""
    emb = load_table(spark, sf_dir, "embeddings").orderBy("vec_id")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    labels = cosine_dbscan(vecs, eps=0.37, min_samples=2)
    return spark.createDataFrame(
        [(int(r.vec_id), int(lb)) for r, lb in zip(rows, labels)],
        ["vec_id", "cluster"])
