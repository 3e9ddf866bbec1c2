"""Write modes (SURVEY §2.2 sinks) over a plain-parquet lakehouse layout.

The reference's one write primitive is ``CsvToDb``: CSV → temp table →
``INSERT … ON CONFLICT ON CONSTRAINT pk DO UPDATE SET`` all columns
(src/_utils/database.py:140-174), with a ``replace_content`` variant that
additionally deletes rows missing from the batch (database.py:158-170) and a
cache-table materializer that truncate+inserts a query result
(``QueryCacheToDb``, database.py:300-325).

Spark-first mapping (plain parquet — on a Delta/Iceberg catalog ``upsert``
becomes a real ``MERGE INTO`` and the staging swap disappears; the call
signatures here are the stable surface):

- ``append``            → append-mode parquet write (performance snapshots).
- ``upsert_by_pk`` (K1) → read target ∪ batch, rank window per PK preferring
                          batch rows, rewrite.  One shuffle on the PK.
- ``overwrite``    (K2) → snapshot semantics: the batch IS the new table.
- ``materialize``  (K4) → ``overwrite`` of a query result (cache table).
- ``concat_frames``(K5) → ``unionByName`` fold of N frames.

All rewrites go through a staging directory + atomic-ish swap so a failed job
never truncates the target (the reference gets this from Postgres
transactions; object stores would use a table format's commit protocol).

At 100 TB the upsert rewrite must not touch the whole table: partition the
target (e.g. by date) and restrict the rewrite to partitions present in the
batch — ``upsert_by_pk`` accepts ``partition_cols`` and uses dynamic
partition overwrite for exactly that.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F


def _exists(path: str) -> bool:
    return os.path.exists(path)


def append(df: DataFrame, path: str) -> None:
    """Append-only write — the performance-snapshot tables (§1.1)."""
    df.write.mode("append").parquet(path)


def _refresh_stats(spark: SparkSession, path: str) -> None:
    """Post-write statistics maintenance: warm the stats catalog's
    full-table summary for the path's new file set (parquet-footer
    read — zero scan).  The reference gets the equivalent from
    Postgres autovacuum/ANALYZE keeping ``pg_statistic`` fresh after
    writes; here the write is the one moment the new snapshot's
    footers are guaranteed hot.  Never raises — statistics upkeep must
    not fail a write."""
    try:
        from .catalog import StatsCatalog

        StatsCatalog.default().refresh_table(spark, path)
    except Exception:
        pass


def overwrite(df: DataFrame, path: str,
              partition_cols: Sequence[str] | None = None,
              refresh_stats: bool = True) -> None:
    """K2 snapshot overwrite via staging swap (safe even if ``df`` reads
    from ``path``: the plan is fully materialized into staging first)."""
    staging = tempfile.mkdtemp(prefix="__staging_", dir=os.path.dirname(path) or ".")
    try:
        writer = df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(staging)
        backup = path + ".__old__"
        if _exists(path):
            os.rename(path, backup)
        os.rename(staging, path)
        if _exists(backup):
            shutil.rmtree(backup)
    finally:
        if _exists(staging):
            shutil.rmtree(staging, ignore_errors=True)
    if refresh_stats:
        _refresh_stats(df.sparkSession, path)


def _stored_pruned(spark: SparkSession, path: str, batch: DataFrame,
                   partition_cols: Sequence[str]) -> DataFrame:
    """Stored-side reader restricted to the batch's partitions by a STATIC
    In-filter.

    The batch's distinct partition tuples are collected (bounded: a batch
    touches few partitions — and every touched partition gets rewritten
    anyway, so the collect is negligible next to the write) and applied as
    a literal OR-of-ANDs predicate.  Literal predicates reach the scan as
    ``PartitionFilters``; a broadcast-semi-join formulation does NOT — the
    optimizer's dynamic-partition-pruning heuristic declines it (no
    selective build-side filter), leaving a full scan of 100 TB of history
    filtered after the read.  Pinned by tests/test_plan_shapes.py.
    """
    part_rows = batch.select(*partition_cols).distinct().collect()
    stored = spark.read.parquet(path)
    if not part_rows:
        return stored.limit(0)
    conds = [
        reduce(lambda a, b: a & b,
               [F.col(c).eqNullSafe(F.lit(r[c])) for c in partition_cols])
        for r in part_rows
    ]
    return stored.filter(reduce(lambda a, b: a | b, conds))


def upsert_by_pk(spark: SparkSession, batch: DataFrame, path: str,
                 pk: Sequence[str],
                 partition_cols: Sequence[str] | None = None) -> None:
    """K1: insert-or-update-all-columns by primary key.

    Batch rows win over stored rows on PK collision (``DO UPDATE SET`` all
    columns, database.py:150-157).  Within a batch, duplicates on the PK are
    reduced to one deterministic survivor first (Postgres would raise on
    ``ON CONFLICT`` hitting the same row twice; we pin max-by-all-columns
    instead of failing).

    Scale: the union shuffles once on the PK.  With ``partition_cols`` the
    stored side is pre-filtered to the batch's partitions via static
    ``PartitionFilters`` at the scan (``_stored_pruned``) and only those
    partitions are rewritten — the 100 TB path.
    """
    # within-batch dedup with the DOCUMENTED deterministic survivor:
    # max over the non-PK column tuple (dropDuplicates would keep an
    # arbitrary, partitioning-dependent row)
    others = [c for c in batch.columns if c not in pk]
    if others:
        batch = (
            batch.groupBy(*pk)
            .agg(F.max(F.struct(*others)).alias("__s"))
            .select(*pk, *[F.col(f"__s.{c}").alias(c) for c in others])
        )
    else:
        batch = batch.dropDuplicates(list(pk))
    if not _exists(path):
        writer = batch.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(path)
        _refresh_stats(spark, path)
        return
    if partition_cols:
        stored = _stored_pruned(spark, path, batch, partition_cols)
    else:
        stored = spark.read.parquet(path)
    merged = (
        batch.withColumn("__is_new", F.lit(1))
        .unionByName(stored.withColumn("__is_new", F.lit(0)),
                     allowMissingColumns=True)
    )
    w = W.partitionBy(*pk).orderBy(F.col("__is_new").desc())
    winners = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__is_new")
    )
    if partition_cols:
        # dynamic partition overwrite: untouched partitions stay as-is
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (winners.write.mode("overwrite").partitionBy(*partition_cols)
         .parquet(path))
        _refresh_stats(spark, path)
    else:
        overwrite(winners, path)


def materialize(df: DataFrame, path: str,
                partition_cols: Sequence[str] | None = None) -> DataFrame:
    """K4: cache-table materialization (truncate + insert of a query result,
    "results won't leave the DBMS" — here: won't leave the lake).  Returns a
    reader over the materialized result so downstream stages scan parquet
    instead of recomputing the plan (the reference's ABSA caches)."""
    overwrite(df, path, partition_cols)
    return df.sparkSession.read.parquet(path)


def concat_frames(dfs: Sequence[DataFrame]) -> DataFrame:
    """K5 ``ConcatCsvs``: union of N inputs with column padding."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def shuffle_sample(df: DataFrame, n: int, seed: int = 42,
                   key_cols: Sequence[str] | None = None) -> DataFrame:
    """K3 ``QueryDb`` shuffle+limit: the reference injects ``ORDER BY
    RANDOM()`` + ``LIMIT n`` into arbitrary queries to export a sample CSV
    (src/_utils/database.py:279-288).

    Spark-first, reproducibly: ordering by ``md5(seed || key)`` is a
    deterministic pseudo-random permutation identical in any engine with
    ``md5`` — unlike ``rand(seed)``, whose stream is engine- and
    partitioning-specific.  ``orderBy(...).limit(n)`` compiles to a
    distributed TakeOrdered (per-partition top-n + single merge), so no
    global sort materializes at 100 TB.  Pass ``key_cols=None`` to key on
    all columns.
    """
    keys = list(key_cols) if key_cols else list(df.columns)
    order = F.md5(F.concat_ws("|", F.lit(str(seed)),
                              *[F.col(c).cast("string") for c in keys]))
    return df.orderBy(order, *keys).limit(n)


def write_training_shards(df: DataFrame, path: str,
                          shard_col: str = "shard",
                          max_records_per_file: int | None = None) -> None:
    """Export a packed corpus as shard-partitioned JSONL — the layout
    training jobs stream (one directory per shard, newline-delimited
    JSON inside).

    Pairs with ``operators.text.assign_token_shards``: partitioning by
    the shard id makes each shard a self-contained directory a data
    loader can claim atomically; ``max_records_per_file`` caps file size
    inside a shard (Spark splits files, loaders often don't).
    """
    writer = df.write.mode("overwrite").partitionBy(shard_col)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.json(path)


def shard_manifest(df: DataFrame, shard_col: str = "shard",
                   id_col: str = "doc_id",
                   token_col: str = "n_tokens") -> DataFrame:
    """Per-shard manifest for a packed corpus: document count, token
    total, and an order-independent membership checksum (XOR of the
    56-bit id hashes — associative, commutative, overflow-free, so the
    aggregate needs no sort, map-side-combines, and any engine with
    ``bit_xor`` re-derives it).

    A training job that claims shard directories verifies each one
    against this manifest (count + tokens + checksum) before use — the
    reproducibility contract for multi-epoch runs.  One hash aggregate
    on the shard id; write it next to the shards as a single small
    parquet/JSON.

    When the frame carries a ``copy_id`` (``mix_sources`` replicates
    documents, so one shard can legitimately hold several copies of the
    same id), the checksum hashes the FULL copy identity — identical
    bare ids would XOR-cancel pairwise and two shards differing only in
    which copies they hold would collide.
    """
    from pyspark.sql import functions as F

    from ..operators.text import hash56

    identity = F.col(id_col).cast("string")
    if "copy_id" in df.columns:
        identity = F.concat_ws("|", identity,
                               F.col("copy_id").cast("string"))
    member = hash56(identity)
    return (
        df.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).cast("long").alias("n_tokens"),
            F.bit_xor(member).alias("membership_checksum"),
        )
    )
