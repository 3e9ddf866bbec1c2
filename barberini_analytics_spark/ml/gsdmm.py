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
"""

from __future__ import annotations

import numpy as np


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

        labels = rng.integers(0, K, size=D)
        for d, z in enumerate(labels):
            m_z[z] += 1
            n_z[z] += len(docs_i[d])
            np.add.at(n_zw[z], docs_i[d], 1)

        # per-doc unique tokens + counts, precomputed once
        uniq_cnt = [np.unique(w, return_counts=True) for w in docs_i]

        for _ in range(self.n_iters):
            for d in range(D):
                z_old = labels[d]
                w = docs_i[d]
                uniq, cnt = uniq_cnt[d]
                m_z[z_old] -= 1
                n_z[z_old] -= len(w)
                np.add.at(n_zw[z_old], w, -1)

                # log p(z|rest) ∝ log(m_z + α) + Σ_w log(n_zw + β + seen)
                #                − Σ_i log(n_z + Vβ + i)
                logp = np.log(m_z + self.alpha)
                once = uniq[cnt == 1]
                if len(once):
                    logp += np.log(n_zw[:, once] + self.beta).sum(axis=1)
                for u, c in zip(uniq[cnt > 1], cnt[cnt > 1]):
                    base = n_zw[:, u] + self.beta
                    logp += np.log(base[:, None]
                                   + np.arange(c)).sum(axis=1)
                Nd = len(w)
                logp -= np.log((n_z + V * self.beta)[:, None]
                               + np.arange(Nd)).sum(axis=1)

                p = np.exp(logp - logp.max())
                # inverse-CDF draw (rng.choice is ~10x slower per call)
                cdf = np.cumsum(p)
                z_new = int(np.searchsorted(cdf, rng.random() * cdf[-1]))
                labels[d] = z_new
                m_z[z_new] += 1
                n_z[z_new] += Nd
                np.add.at(n_zw[z_new], w, 1)

        self.labels_ = labels
        return labels
