"""Cosine DBSCAN for opinion-phrase clustering (SURVEY §2.10 M8).

Reference: sklearn ``DBSCAN(eps=.37, min_samples=2, metric='cosine')`` over
word2vec phrase vectors (src/absa/post_opinion_patterns.py:73-210).  The
container has no sklearn, and the reference operates on at most thousands of
phrase vectors — a vectorized O(n²) NumPy implementation on the driver is
exact and fast at that size.

Scale path (documented, SURVEY §7.7): at millions of vectors, replace the
exact neighbor search with ``BucketedRandomProjectionLSH``-bucketed
candidate pairs and run the same flood-fill over the sparse neighbor graph.

Determinism: cluster ids are canonicalized to the smallest member index, so
output does not depend on visit order.
"""

from __future__ import annotations

import numpy as np

NOISE = -1


def cosine_dbscan(vectors: np.ndarray, eps: float = 0.37,
                  min_samples: int = 2) -> np.ndarray:
    """DBSCAN labels under cosine distance; noise → -1."""
    n = len(vectors)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    norms = np.linalg.norm(vectors, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = vectors / norms
    dist = 1.0 - unit @ unit.T
    neighbors = dist <= eps  # includes self
    core = neighbors.sum(axis=1) >= min_samples

    labels = np.full(n, NOISE, dtype=np.int64)
    cluster = 0
    for i in range(n):
        if labels[i] != NOISE or not core[i]:
            continue
        # BFS flood fill from this core point
        stack = [i]
        labels[i] = cluster
        while stack:
            j = stack.pop()
            if not core[j]:
                continue
            for k in np.nonzero(neighbors[j])[0]:
                if labels[k] == NOISE:
                    labels[k] = cluster
                    stack.append(k)
        cluster += 1

    # canonicalize: cluster id := smallest member index
    for c in range(cluster):
        members = np.nonzero(labels == c)[0]
        labels[members] = members.min()
    return labels


def dbscan_distributed(vectors, id_col: str = "vec_id",
                       vec_col: str = "embedding", dim: int = 64,
                       eps: float = 0.37, min_samples: int = 2,
                       bands: int = 8, bits: int = 4, max_iter: int = 25,
                       max_bucket: int | None = None):
    """Distributed cosine DBSCAN — the documented LSH scale path.

    Candidate ε-neighbors come from SRP-LSH banding
    (``operators.similarity.srp_candidate_pairs``), verified with the
    exact cosine; core points are nodes with ≥ ``min_samples - 1``
    ε-neighbors (the ε-ball includes self); clusters are connected
    components of the core-core ε-graph, computed by iterative min-label
    propagation (labels start as node ids, converge to the smallest core
    id per component in O(graph diameter) rounds, each one shuffle);
    border points attach to the smallest neighboring core label; the rest
    are noise (-1).

    Returns ``(id_col, label)``.  Exact vs the driver-side
    ``cosine_dbscan`` on core-point partitions whenever the banding
    recall is complete — more ``bands`` raise recall, and the LSH misses
    only pairs whose similarity is near the threshold.

    Scale: every step is a keyed shuffle bounded by bucket collisions —
    no driver collect; ``localCheckpoint`` truncates the loop lineage.
    At 100 TB, this (not the NumPy core above) is the plan.
    """
    from pyspark.sql import functions as F

    from ..core.cache import scoped_checkpoint
    from ..operators.similarity import _dot, l2_normalize, srp_candidate_pairs

    ids = vectors.select(F.col(id_col).alias("id")).distinct()
    # normalize ONCE per vector before the bucket fan-out: each vector
    # appears in ~bucket-size candidate pairs, and a per-pair cosine()
    # would recompute its norm every time.  SRP bucket keys are sign-only
    # (scale-invariant), so candidates are identical; the ε-check becomes
    # a plain dot — the same unit ∙ unit form the driver-side
    # cosine_dbscan computes (numpy `unit @ unit.T`), which the
    # LSH-vs-driver equivalence tests compare against.
    unit = vectors.select(
        F.col(id_col), l2_normalize(F.col(vec_col), dim).alias(vec_col))
    pairs = srp_candidate_pairs(unit, id_col, vec_col, dim, bands, bits,
                                max_bucket=max_bucket)
    near = (
        pairs.withColumn("cos", _dot(F.col("e1"), F.col("e2")))
        .filter(F.col("cos") >= 1.0 - eps)
        .select("id1", "id2")
    )
    edges = scoped_checkpoint(near.union(
        near.select(F.col("id2").alias("id1"), F.col("id1").alias("id2"))
    ))

    degree = edges.groupBy("id1").count()
    core = (
        ids.join(degree, ids.id == degree.id1, "left")
        .select("id", (F.coalesce("count", F.lit(0)) + 1 >= min_samples)
                .alias("is_core"))
    )
    core = scoped_checkpoint(core)

    core_ids = core.filter("is_core").select("id")
    core_edges = (
        edges.join(core_ids.withColumnRenamed("id", "id1"), "id1")
        .join(core_ids.withColumnRenamed("id", "id2"), "id2")
        .select("id1", "id2")
    )

    # clusters = connected components of the core-core ε-graph (shared
    # min-label-propagation core, operators/graph.py; ``edges`` already
    # carries both directions)
    from ..operators.graph import connected_components

    labels = connected_components(core_ids, core_edges, id_col="id",
                                  symmetrize=False, max_iter=max_iter)

    # border points: non-core with a core ε-neighbor -> smallest such label
    border = (
        edges.join(core.filter("NOT is_core").select("id"),
                   edges.id1 == F.col("id"))
        .join(labels.withColumnRenamed("id", "cid")
              .withColumnRenamed("label", "clabel"),
              F.col("id2") == F.col("cid"))
        .groupBy(F.col("id")).agg(F.min("clabel").alias("label"))
    )

    return (
        ids.join(labels.unionByName(border), "id", "left")
        .select(F.col("id").alias(id_col),
                F.coalesce("label", F.lit(NOISE)).alias("label"))
    )
