"""Z-order clustered parquet layout: multi-column data skipping.

Parquet scans prune row groups by footer min/max statistics.  Sorting on
ONE column gives perfect skipping for that column and none for others;
interleaving the bits of several columns (the Z-order / Morton curve)
clusters rows so that EVERY interleaved column has narrow per-row-group
ranges — the standard lakehouse layout trick (Delta/Iceberg `OPTIMIZE
ZORDER BY`) expressed with plain Spark: a codegen bit-interleave
expression, ``repartitionByRange`` on the key, sort-within-partitions,
write.

At 100 TB this is the difference between scanning every file for a
two-predicate query and touching the few row groups whose hyper-rectangle
intersects it.  The payoff is measurable locally: ``rowgroup_ranges``
reads the written footers (pyarrow) and reports per-column fraction of
row groups a point/range predicate would skip.

Quantization note: each column is scaled to ``bits``-bit integers by
min/max — rank-preserving and cheap, but skew compresses the dense
region into few distinct cells (heavily skewed columns should be
pre-transformed, e.g. log, or bucketed by rank at write time).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 16) -> Column:
    """Morton key interleaving ``bits`` quantized bits of each column.

    The min/max needed for quantization are computed in ONE tiny
    aggregate and folded into the expression as literals, so the key
    itself is a pure per-row codegen lambda (no join, no window).  NULLs
    quantize to cell 0 (they cluster together at the curve origin).
    """
    stats = df.agg(*[f(c).cast("double").alias(f"{n}_{c}")
                     for c in cols for n, f in
                     (("min", F.min), ("max", F.max))]).first()
    n_cols = len(cols)
    quantized = []
    for c in cols:
        lo = stats[f"min_{c}"] if stats[f"min_{c}"] is not None else 0.0
        hi = stats[f"max_{c}"] if stats[f"max_{c}"] is not None else 0.0
        span = (hi - lo) or 1.0
        quantized.append(
            f"least({(1 << bits) - 1}, greatest(0, CAST(floor("
            f"(coalesce(CAST({c} AS DOUBLE), {lo}) - {lo})"
            f" * {1 << bits}.0 / {span}) AS BIGINT)))")
    # interleave: output bit (i*n_cols + j) = bit i of column j
    parts = " | ".join(
        f"shiftleft(shiftright({q}, i) & 1L, i * {n_cols} + {j})"
        for j, q in enumerate(quantized))
    return F.expr(f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> "
                  f"acc | {parts})")


def write_zordered(df: DataFrame, path: str, cols: Sequence[str],
                   n_files: int = 32, bits: int = 16) -> None:
    """Write ``df`` to parquet clustered along the Z-curve of ``cols``.

    ``repartitionByRange`` on the Morton key gives globally disjoint key
    ranges per file (one range-exchange — the same cost as any global
    sort) and the within-partition sort orders row groups inside each
    file, so footer min/max stats are tight for every clustered column.
    """
    key = zorder_key(df, cols, bits)
    (df.withColumn("__z", key)
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def compact_files(spark, path: str,
                  target_bytes: int = 128 << 20) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_bytes)`` files — the maintenance pass
    every streaming/micro-batch sink needs (each micro-batch lands its
    own files; a month of 5-minute batches is ~8,600 files per
    partition, and open/plan overhead starts dominating the scan).

    ``coalesce`` (no shuffle) merges read-splits into the reduced task
    count, and the rewrite goes through the staging-swap ``overwrite``
    so a failed compaction never truncates the table.  Returns the
    file count written.  At 100 TB run per partition (pass the
    partition dir) so compaction parallelizes across partitions and
    never rewrites cold history.

    A hive-partitioned table ROOT is handled, not flattened: ``key=value``
    subdirectories are detected, partition discovery turns them into
    columns, and the rewrite re-``partitionBy``s the same columns so
    downstream partition pruning survives compaction (``target_bytes``
    then applies per partition, since files can't span partitions).
    Byte sizing walks the local filesystem — on a real lake, drive this
    from the catalog's file listing instead.
    """
    import math
    import re as _re

    from .sinks import overwrite

    part_cols = []
    probe = path
    while True:   # nested partition dirs: year=2024/month=05/...
        subdirs = [d for d in sorted(os.listdir(probe))
                   if os.path.isdir(os.path.join(probe, d))]
        hits = [m for d in subdirs
                if (m := _re.fullmatch(r"([^=/]+)=[^/]*", d))]
        if not hits:
            break
        part_cols.append(hits[0].group(1))
        # descend into the dir that PRODUCED the matched key, not
        # blindly into subdirs[0] — a stray non-key=value dir sorting
        # first (e.g. ".stage_x") would otherwise derail nested-key
        # discovery
        probe = os.path.join(probe, hits[0].group(0))

    if part_cols:
        sizes = {}   # per-partition-dir bytes → per-partition file budget
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    sizes[root] = sizes.get(root, 0) \
                        + os.path.getsize(os.path.join(root, f))
        n_parts = max(1, len(sizes))
        # worst partition's budget; a deterministic salt splits oversized
        # partitions into that many tasks while small ones still collapse
        # to one file each (each (partition, salt) pair → one task → one
        # file under partitionBy)
        n_per = max((max(1, math.ceil(s / target_bytes))
                     for s in sizes.values()), default=1)
        df = spark.read.option("basePath", path).parquet(path)
        salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]),
                      F.lit(n_per))
        overwrite(df.withColumn("__salt", salt)
                    .repartition(n_parts * n_per, *part_cols, "__salt")
                    .drop("__salt"),
                  path, partition_cols=part_cols)
        # report what actually landed (consistent with the non-partitioned
        # branch), not the per-partition budget
        return sum(
            1 for root, _, files in os.walk(path)
            for f in files if f.endswith(".parquet"))

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files if f.endswith(".parquet"))
    n_out = max(1, math.ceil(total / target_bytes))
    overwrite(spark.read.parquet(path).coalesce(n_out), path)
    return n_out


def rowgroup_ranges(path: str, cols: Sequence[str]) -> dict[str, float]:
    """Mean per-row-group (max-min)/(global span) for each column, read
    from the parquet footers — 1.0 means no skipping possible, values
    near 1/n_groups mean near-perfect clustering.  Pure metadata read.
    """
    import pyarrow.parquet as pq

    dataset = pq.ParquetDataset(path)
    spans: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for frag in dataset.fragments:
        md = frag.metadata
        schema_names = frag.physical_schema.names
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            for c in cols:
                col = group.column(schema_names.index(c))
                st = col.statistics
                if st is not None and st.has_min_max:
                    spans[c].append((float(st.min), float(st.max)))
    out = {}
    for c, ranges in spans.items():
        glo = min(r[0] for r in ranges)
        ghi = max(r[1] for r in ranges)
        span = (ghi - glo) or 1.0
        out[c] = sum((hi - lo) for lo, hi in ranges) / (len(ranges) * span)
    return out
