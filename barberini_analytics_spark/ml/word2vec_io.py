"""Word2vec text-format adapter — the real-artifact injection point for
the M8 embedding chain.

The reference resolves opinion phrases against a pretrained German
word2vec model loaded in-process (reference
``src/absa/post_opinion_patterns.py:161-167``).  This sandbox has no
network to fetch those vectors, so the engine's embedding consumers
(``plans/ml_queries.embedding_dbscan_clusters``,
``operators/similarity``) read an *embeddings parquet* whose producer is
pluggable: synthetic in tests, a real export in production.  This module
is the adapter for the most common real export format — word2vec's plain
text ``.vec`` layout (``gensim``'s ``save_word2vec_format(binary=False)``,
fastText ``.vec``)::

    <n_words> <dim>
    word v1 v2 ... v_dim
    ...

Parsing is driver-side line streaming (these artifacts are MBs–GBs; for
a 100 TB-scale vocabulary export the producer writes parquet directly
and this adapter is unnecessary) with an explicit ``limit`` for bounded
loads.  ``tests/test_real_artifacts.py`` runs the full DBSCAN chain over
a real file when ``BA_REAL_W2V`` points at one, and skips otherwise —
the honest boundary between "the plumbing is proven" and "the artifact
is present".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def load_word2vec_text(spark: SparkSession, path: str,
                       limit: int | None = None,
                       expect_dim: int | None = None) -> DataFrame:
    """Read a word2vec text-format file into the engine's embedding
    schema: ``(vec_id, word, embedding array<float>, label)``.

    ``vec_id`` is the file row order (stable across loads of the same
    artifact); ``label`` is a deterministic coarse bucket (``vec_id %
    64``) so consumers that expect the synthetic table's IVF-cell
    column (``ivf_assign`` inputs) work unchanged.  ``limit`` bounds
    the rows parsed; ``expect_dim`` validates the header dimension.
    Malformed rows (wrong component count, unparseable floats) raise
    with the offending line number — a torn download should fail the
    load, not corrupt downstream cosines.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    rows = []
    with open(path, encoding="utf-8", errors="strict") as fh:
        header = fh.readline().split()
        if len(header) != 2 or not all(p.isdigit() for p in header):
            raise ValueError(
                f"{path}: not word2vec text format (header {header!r})")
        n_words, dim = int(header[0]), int(header[1])
        if expect_dim is not None and dim != expect_dim:
            raise ValueError(
                f"{path}: dimension {dim}, expected {expect_dim}")
        take = n_words if limit is None else min(limit, n_words)
        for i in range(take):
            line = fh.readline()
            if not line:
                raise ValueError(
                    f"{path}: truncated at row {i} of declared {n_words}")
            parts = line.rstrip("\n").split(" ")
            # trailing-space variants produce one empty tail token
            if parts and parts[-1] == "":
                parts = parts[:-1]
            if len(parts) != dim + 1:
                raise ValueError(
                    f"{path}:{i + 2}: {len(parts) - 1} components, "
                    f"expected {dim}")
            try:
                vec = [float(x) for x in parts[1:]]
            except ValueError as exc:
                raise ValueError(f"{path}:{i + 2}: {exc}") from exc
            rows.append((i, parts[0], vec, i % 64))
    return spark.createDataFrame(
        rows, "vec_id: bigint, word: string, "
              "embedding: array<float>, label: int")
