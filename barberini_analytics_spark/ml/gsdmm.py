"""GSDMM — Gibbs-Sampling Dirichlet Multinomial Mixture (Yin & Wang, KDD
2014), the reference's topic model (src/topic_modeling.py:232-245:
``MovieGroupProcess(K=10, alpha=0.1, beta=0.1, n_iters=30)``).

Driver-side fit, NumPy only (the container has no gensim/gsdmm): the
reference corpora are thousands of short posts — the Gibbs loop over the
collected token lists is milliseconds.  The *preprocessing* (tokenize,
stopword/hapax removal) and the *reporting* (top terms per topic) run
distributed (plans/ml_queries.py); only the sampler touches the driver —
the same split the reference uses.

Determinism: a fixed-seed ``numpy.random.Generator`` plus sorted input
order makes cluster assignments reproducible run-to-run (SURVEY §7 "GSDMM
determinism" hard part).

Past the driver gate, ``fit_topics_sharded`` keeps the same sampler but
distributes it: docs hash into shards sized under the gate and each shard
fits its own model inside ``applyInPandas`` — the reference's
one-model-per-year sharding (src/topic_modeling.py:140-180) generalized
to a size-bounded deterministic hash shard.  No driver collect at any
corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


class GSDMM:
    """Movie-group-process clustering of short token lists."""

    def __init__(self, n_clusters: int = 10, alpha: float = 0.1,
                 beta: float = 0.1, n_iters: int = 30, seed: int = 42):
        self.K = n_clusters
        self.alpha, self.beta, self.n_iters = alpha, beta, n_iters
        self.seed = seed
        self.labels_: np.ndarray | None = None

    def fit_predict(self, docs: list[list[str]]) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        vocab = sorted({t for d in docs for t in d})
        vid = {t: i for i, t in enumerate(vocab)}
        V, D, K = len(vocab), len(docs), self.K
        docs_i = [np.array([vid[t] for t in d], dtype=np.int64)
                  for d in docs]

        m_z = np.zeros(K, dtype=np.int64)          # docs per cluster
        n_z = np.zeros(K, dtype=np.int64)          # tokens per cluster
        n_zw = np.zeros((K, V), dtype=np.int64)    # token counts per cluster

        # per-doc unique tokens + counts, precomputed once
        uniq_cnt = [np.unique(w, return_counts=True) for w in docs_i]

        labels = rng.integers(0, K, size=D)
        for d, z in enumerate(labels):
            uniq, cnt = uniq_cnt[d]
            m_z[z] += 1
            n_z[z] += len(docs_i[d])
            n_zw[z, uniq] += cnt

        # Prefix-sum log tables turn every Σ log(base + j) term of the
        # conditional into an O(1) table difference per cluster:
        #   Σ_{j<c} log(n + β + j)  = B[n + c] − B[n]
        #   Σ_{i<Nd} log(n_z + Vβ + i) = C[n_z + Nd] − C[n_z]
        # with B/C[k] = Σ_{i<k} log(i + β | Vβ).  No per-step np.log at all.
        total = int(sum(len(w) for w in docs_i))
        max_nd = max((len(w) for w in docs_i), default=0)
        grid = np.arange(total + max_nd + 1, dtype=np.float64)
        tblA = np.log(np.arange(D + 1) + self.alpha)
        tblB = np.concatenate(([0.0], np.cumsum(np.log(grid + self.beta))))
        tblC = np.concatenate(([0.0], np.cumsum(np.log(grid + V * self.beta))))

        for _ in range(self.n_iters):
            for d in range(D):
                z_old = labels[d]
                uniq, cnt = uniq_cnt[d]
                Nd = len(docs_i[d])
                m_z[z_old] -= 1
                n_z[z_old] -= Nd
                n_zw[z_old, uniq] -= cnt

                nzw_u = n_zw[:, uniq]
                logp = (tblA[m_z]
                        + (tblB[nzw_u + cnt] - tblB[nzw_u]).sum(axis=1)
                        - (tblC[n_z + Nd] - tblC[n_z]))

                p = np.exp(logp - logp.max())
                # inverse-CDF draw (rng.choice is ~10x slower per call)
                cdf = np.cumsum(p)
                z_new = int(np.searchsorted(cdf, rng.random() * cdf[-1]))
                labels[d] = z_new
                m_z[z_new] += 1
                n_z[z_new] += Nd
                n_zw[z_new, uniq] += cnt

        self.labels_ = labels
        return labels


def fit_topics_sharded(
    tokens: DataFrame,
    n_docs: int,
    n_clusters: int = 10,
    alpha: float = 0.1,
    beta: float = 0.1,
    n_iters: int = 30,
    seed: int = 42,
    max_docs_per_shard: int = 200_000,
) -> DataFrame:
    """Distributed GSDMM over a ``(doc_id, word)`` frame: one independent
    model per deterministic hash shard, fit inside ``applyInPandas``.

    The reference never fits one model over everything either — it shards
    one model per year (src/topic_modeling.py:140-180).  Here the shard key
    is ``xxhash64(doc_id) mod ceil(n_docs / max_docs_per_shard)`` so each
    shard's collected token lists stay bounded regardless of corpus size,
    and the global topic id is ``shard * K + local_topic``.  Every step —
    grouping, shard fit, output — runs on executors; the driver never sees
    a token.

    Determinism: shard membership is a pure hash of ``doc_id``; each shard
    sorts by ``doc_id`` and seeds ``seed + shard``, so assignments are
    reproducible independent of partitioning.
    """
    n_shards = max(1, -(-n_docs // max_docs_per_shard))
    docs = (
        tokens.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("word")).alias("words"))
        .withColumn(
            "shard",
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_shards)).cast("int"),
        )
    )

    K = n_clusters

    def _fit_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        labels = GSDMM(
            n_clusters=K, alpha=alpha, beta=beta, n_iters=n_iters,
            seed=seed + shard,
        ).fit_predict([list(w) for w in pdf["words"]])
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "topic": shard * K + labels,
            }
        )

    return docs.groupBy("shard").applyInPandas(
        _fit_shard, "doc_id long, topic long")
