"""Twitter ingest transforms (SURVEY §2.1 S8).

Reference: ``ExtractTweets`` filters/renames the raw twint frame and drops
full duplicates (src/twitter.py:40-70); ``ExtractTweetPerformance`` takes
the engagement columns, stamps the fetch timestamp, and (downstream)
rides the FK filter and performance condenser (src/twitter.py:79-104).

Spark-first: both are single typed projections + ``dropDuplicates`` —
one shuffle on the full row hash, nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def extract_tweets(raw: DataFrame) -> DataFrame:
    """``raw_tweets -> tweets``: keep (user_id, tweet_id, text,
    parent_tweet_id, timestamp), rename to (user_id, tweet_id, text,
    response_to, post_date), drop full duplicates
    (src/twitter.py:49-67).  Ids stay strings (the reference reads them
    with ``dtype=str`` to avoid float mangling)."""
    return (
        raw.select(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("tweet_id").cast("string").alias("tweet_id"),
            F.col("text"),
            F.col("parent_tweet_id").cast("string").alias("response_to"),
            F.col("timestamp").alias("post_date"),
        )
        .dropDuplicates()
    )


def extract_tweet_performance(raw: DataFrame, fetch_ts: str) -> DataFrame:
    """``raw_tweets -> tweet_performance``: engagement columns + the fetch
    timestamp (src/twitter.py:79-104).  FK filtering and snapshot
    condensing are the shared J13/M13 operators downstream."""
    return raw.select(
        F.col("tweet_id").cast("string").alias("tweet_id"),
        F.col("likes").cast("int").alias("likes"),
        F.col("retweets").cast("int").alias("retweets"),
        F.col("replies").cast("int").alias("replies"),
        F.lit(fetch_ts).cast("timestamp").alias("timestamp"),
    )
