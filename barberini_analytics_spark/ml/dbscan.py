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
