"""The ``FillDb`` analogue: ONE composed driver program running the whole
museum pipeline end-to-end through the real sinks, idempotently.

Reference: ``src/_fill_db.py:15-54`` organizes everything under a
``FillDb`` wrapper task split into a DAILY cadence (post ingest, gomus
ingest, ABSA, topic modeling, visitor prediction, diagnostics —
``FillDbDaily``) and an HOURLY cadence (post-performance ingest only —
``FillDbHourly``), with ``src/_posts.py:14-36`` fanning the post ingest
out per platform.  Luigi gives the reference its DAG and idempotence
(targets exist → task skipped); here both come from the sinks instead:

* every ingest lands via ``upsert_by_pk`` — re-running a day merges the
  same rows onto the same keys and the table is byte-identical;
* every derived table (views, ABSA, topics, predictions) lands via
  ``materialize`` (snapshot overwrite of a deterministic plan);
* nothing appends, so there is no run counter to dedupe.

Stage order is the reference's dependency order: base tables first, the
``post`` view stack over them, analysis tables over ``post``.  Each
stage reads its INPUTS back from the warehouse (not from the in-memory
frames of the previous stage), so a stage can be re-run alone and the
composition stays a restartable DAG rather than one giant plan — at
100 TB that is also what bounds lineage and lets the scheduler place
each stage independently.

The ingest layer maps the synthetic corpus onto the reference's base
tables with the same deterministic fixture the oracle-checked
``domain_queries`` use (``_social_tables`` / ``_gomus_tables``) — in
production those builders are replaced by the real source parsers in
``sources/`` (the parsing itself is oracle-checked via the
``ingest_queries`` registry entries); everything downstream is the real
pipeline.

Returned manifest: ``{table_name: rows_written}`` per run — the
diagnostics summary (reference ``Diagnostics``) is itself written as a
warehouse table keyed by (cadence, table), so it is upserted, not
appended, and stays idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .core import sinks
from .domain import views as V
from .operators.fuzzy import match_occurrences
from .operators.text import tokenize

#: base-table primary keys (reference migration PKs; SURVEY §1.1)
_SOCIAL_PKS: dict[str, list[str]] = {
    "fb_post": ["page_id", "post_id"],
    "fb_post_comment": ["post_id", "comment_id"],
    "ig_post": ["ig_post_id"],
    "tweet": ["tweet_id"],
    "tweet_author": ["user_id"],
    "appstore_review": ["app_id", "review_id"],
    "gplay_review": ["playstore_review_id"],
    "google_maps_review": ["google_maps_review_id"],
}
_PERFORMANCE_PKS: dict[str, list[str]] = {
    "fb_post_performance": ["page_id", "post_id", "timestamp"],
    "ig_post_performance": ["ig_post_id", "timestamp"],
    "tweet_performance": ["tweet_id", "timestamp"],
}
_GOMUS_PKS: dict[str, list[str]] = {
    "gomus_customer": ["customer_id"],
    "gomus_order": ["order_id"],
    "gomus_order_contains": ["article_id"],
    "gomus_booking": ["booking_id"],
    "gomus_event": ["event_id"],
}


def _table_path(warehouse: str, name: str) -> str:
    return os.path.join(warehouse, name)


def _upsert_tables(spark: SparkSession, warehouse: str,
                   tables: dict[str, DataFrame],
                   pks: dict[str, list[str]]) -> dict[str, int]:
    written = {}
    for name, pk in pks.items():
        path = _table_path(warehouse, name)
        sinks.upsert_by_pk(spark, tables[name], path, pk)
        written[name] = spark.read.parquet(path).count()
    return written


def _read_tables(spark: SparkSession, warehouse: str,
                 names) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(_table_path(warehouse, n)) for n in names}


# ---------------------------------------------------------------------------
# daily stages
# ---------------------------------------------------------------------------

def posts_to_db(spark: SparkSession, sf_dir: str,
                warehouse: str) -> dict[str, int]:
    """``PostsToDb`` (src/_posts.py:14-36): every platform's post table,
    upserted by its PK."""
    from .plans.domain_queries import _social_tables

    return _upsert_tables(spark, warehouse, _social_tables(spark, sf_dir),
                          _SOCIAL_PKS)


def gomus_to_db(spark: SparkSession, sf_dir: str,
                warehouse: str) -> dict[str, int]:
    """``GomusToDb``: customers, orders, order items, bookings, events."""
    from .plans.domain_queries import _gomus_tables

    return _upsert_tables(spark, warehouse, _gomus_tables(spark, sf_dir),
                          _GOMUS_PKS)


def post_view_to_db(spark: SparkSession, warehouse: str) -> dict[str, int]:
    """The layered ``post`` view stack over the WAREHOUSE base tables
    (not the ingest frames), materialized as the cache table every
    analysis stage reads (reference migration_015 ``post`` + the ABSA
    caches)."""
    t = _read_tables(spark, warehouse,
                     list(_SOCIAL_PKS) + list(_PERFORMANCE_PKS))
    post = sinks.materialize(V.post(t), _table_path(warehouse, "post"))
    return {"post": post.count()}


def absa_to_db(spark: SparkSession, warehouse: str) -> dict[str, int]:
    """``AspectBasedSentimentAnalysis``: tokenize ``post``, stage the
    aspect matchers over the distinct vocabulary, score document
    sentiment from the polarity lexicon — two cache tables,
    ``post_aspect`` and ``post_sentiment`` (src/absa/* chain)."""
    from .plans.absa_queries import ASPECT_WORDS, POLARITY_DECIPOINTS

    post = spark.read.parquet(_table_path(warehouse, "post"))
    tokens = tokenize(post, ["source", "post_id"])
    from .core.localrel import values_df

    aspects = values_df(spark, [(w,) for w in ASPECT_WORDS],
                        "matched string")
    matched = match_occurrences(tokens, aspects, "equality",
                                id_cols=("source", "post_id"))
    sinks.materialize(
        matched.select("source", "post_id", "word_index", "word",
                       "matched"),
        _table_path(warehouse, "post_aspect"))

    polarity = values_df(spark, list(POLARITY_DECIPOINTS.items()),
                         "word string, decipoints bigint")
    sentiment = (
        tokens.join(F.broadcast(polarity), "word")
        .groupBy("source", "post_id")
        .agg((F.sum("decipoints") / F.count(F.lit(1)) / 10.0)
             .alias("sentiment"),
             F.count(F.lit(1)).alias("n_polarity_words"))
    )
    sinks.materialize(sentiment, _table_path(warehouse, "post_sentiment"))
    return {
        "post_aspect":
            spark.read.parquet(_table_path(warehouse, "post_aspect"))
            .count(),
        "post_sentiment":
            spark.read.parquet(_table_path(warehouse, "post_sentiment"))
            .count(),
    }


def topics_to_db(spark: SparkSession, warehouse: str) -> dict[str, int]:
    """``TopicModeling``: GSDMM over the ``post`` texts (gated driver
    fit / sharded ``applyInPandas`` above the gate — ``ml/gsdmm.py``),
    one topic per post (src/topic_modeling.py)."""
    from .plans.ml_queries import _fit_topics

    post = spark.read.parquet(_table_path(warehouse, "post"))
    # surrogate numeric doc id for the fit: deterministic hash of the PK
    keyed = post.withColumn(
        "__doc_id", F.abs(F.xxhash64("source", "post_id")))
    tokens = (
        tokenize(keyed, ["__doc_id"])
        .select(F.col("__doc_id").alias("doc_id"), "word"))
    fit = _fit_topics(tokens, cache_key=("pipeline", warehouse))
    assignment = (
        keyed.select("source", "post_id",
                     F.col("__doc_id").alias("doc_id"))
        .join(fit, "doc_id")
        .select("source", "post_id", "topic"))
    sinks.materialize(assignment, _table_path(warehouse, "post_topic"))
    return {"post_topic":
            spark.read.parquet(_table_path(warehouse, "post_topic"))
            .count()}


def predictions_to_db(spark: SparkSession, sf_dir: str,
                      warehouse: str) -> dict[str, int]:
    """``PredictionsToDb``: the KNN visitor forecast (deterministic →
    snapshot overwrite is idempotent)."""
    from .plans.ml_queries import visitor_prediction_forecast

    forecast = visitor_prediction_forecast(spark, sf_dir)
    sinks.materialize(forecast, _table_path(warehouse, "visitor_prediction"))
    return {"visitor_prediction":
            spark.read.parquet(_table_path(warehouse, "visitor_prediction"))
            .count()}


def diagnostics_to_db(spark: SparkSession, warehouse: str, cadence: str,
                      written: dict[str, int]) -> None:
    """``Diagnostics``: the run summary as an upserted warehouse table
    (keyed by cadence+table — re-runs update in place, never append)."""
    rows = [(cadence, name, int(n)) for name, n in sorted(written.items())]
    summary = spark.createDataFrame(rows, ["cadence", "table_name", "rows"])
    sinks.upsert_by_pk(spark, summary,
                       _table_path(warehouse, "pipeline_diagnostics"),
                       ["cadence", "table_name"])


# ---------------------------------------------------------------------------
# cadence entry points (src/_fill_db.py:24-54)
# ---------------------------------------------------------------------------

def fill_db_daily(spark: SparkSession, sf_dir: str,
                  warehouse: str) -> dict[str, int]:
    """``FillDbDaily``: ingest → base tables → view stack → ABSA →
    topics → prediction → diagnostics."""
    written: dict[str, int] = {}
    written.update(posts_to_db(spark, sf_dir, warehouse))
    written.update(gomus_to_db(spark, sf_dir, warehouse))
    written.update(post_view_to_db(spark, warehouse))
    written.update(absa_to_db(spark, warehouse))
    written.update(topics_to_db(spark, warehouse))
    written.update(predictions_to_db(spark, sf_dir, warehouse))
    diagnostics_to_db(spark, warehouse, "daily", written)
    return written


def fill_db_hourly(spark: SparkSession, sf_dir: str,
                   warehouse: str) -> dict[str, int]:
    """``FillDbHourly``: post-performance snapshots only
    (``PostPerformanceToDb``, src/_posts.py:39-47)."""
    from .plans.domain_queries import _social_tables

    tables = _social_tables(spark, sf_dir)
    written = _upsert_tables(spark, warehouse, tables, _PERFORMANCE_PKS)
    diagnostics_to_db(spark, warehouse, "hourly", written)
    return written


def fill_db(spark: SparkSession, sf_dir: str,
            warehouse: str) -> dict[str, int]:
    """``FillDb``: both cadences, hourly first (cheap performance
    snapshots land even if the daily analysis half fails)."""
    written = fill_db_hourly(spark, sf_dir, warehouse)
    written.update(fill_db_daily(spark, sf_dir, warehouse))
    return written


def curate_to_shards(spark: SparkSession, sf_dir: str, out_dir: str,
                     shard_tokens: int = 50_000,
                     scrub: bool = True,
                     gopher: bool = False,
                     lm_quantile: float | None = 0.95,
                     targets: dict[str, float] | None = None,
                     near_dup_max_bucket: int | None = None,
                     span_k: int | None = None,
                     quality_model: dict | None = None,
                     quality_threshold: float = 0.5,
                     seed: int = 42) -> dict[str, int]:
    """The LLM-corpus counterpart of :func:`fill_db`: one call takes the
    raw ``documents`` parquet through the full curation recipe
    (scrub/quarantine → quality+LM gates → exact → segment → near-dup
    dedup → optional mixing → leak-free split → token-budgeted packing,
    ``operators/curation.curate_corpus``) and materializes self-contained
    JSONL training shards per split under ``out_dir``
    (``core/sinks.write_training_shards``).

    Returns per-split document-copy counts.  Idempotent: every stage is
    deterministic in (seed, id) and the shard write is an overwrite —
    re-running reproduces byte-identical shard assignments.
    """
    from .core.cache import release_scoped, scope_mark, scoped_persist
    from .core.io import load_table
    from .core.sinks import write_training_shards
    from .operators.curation import curate_corpus

    # standalone invocations never hit the registry's release-on-entry
    # hook, so free what THIS call registers (the curated frame plus
    # curate_corpus's internal staging) before returning — otherwise the
    # full curated corpus stays pinned in executor memory for the rest
    # of the session.  Scoped to a mark so a caller's own scoped
    # persists/checkpoints survive when this runs inside another query.
    mark = scope_mark()

    docs = load_table(spark, sf_dir, "documents")
    curated = curate_corpus(
        docs, source_col="source", lm_quantile=lm_quantile,
        targets=targets, shard_tokens=shard_tokens, seed=seed,
        scrub=scrub, gopher=gopher,
        near_dup_max_bucket=near_dup_max_bucket, span_k=span_k,
        quality_model=quality_model, quality_threshold=quality_threshold)
    curated = scoped_persist(curated)
    from .core.sinks import shard_manifest

    try:
        counts: dict[str, int] = {}
        for split_id, name in enumerate(("train", "valid", "test")):
            part = curated.filter(F.col("split") == split_id)
            counts[name] = part.count()
            if counts[name]:
                write_training_shards(
                    part.drop("split"), os.path.join(out_dir, name), "shard")
                # per-shard verification manifest next to the shards
                shard_manifest(part).coalesce(1).write.mode("overwrite") \
                    .json(os.path.join(out_dir, f"{name}_manifest"))
        return counts
    finally:
        release_scoped(since=mark)
