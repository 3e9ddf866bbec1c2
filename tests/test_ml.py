"""ML-layer tests: GSDMM separates obvious topics, DBSCAN clusters cosine
balls with noise, KNN predicts neighbor means, forecast determinism."""

from __future__ import annotations

import numpy as np

from barberini_analytics_spark.ml.dbscan import cosine_dbscan
from barberini_analytics_spark.ml.gsdmm import GSDMM
from barberini_analytics_spark.ml.knn import KNNRegressor, MinMaxScaler


def test_gsdmm_separates_disjoint_topics():
    docs = ([["apple", "banana", "fruit"]] * 10
            + [["engine", "wheel", "car"]] * 10)
    labels = GSDMM(n_clusters=5, n_iters=15, seed=7).fit_predict(docs)
    a, b = set(labels[:10]), set(labels[10:])
    assert len(a) == 1 and len(b) == 1 and a != b


def test_gsdmm_deterministic():
    docs = [["a", "b"], ["b", "c"], ["x", "y"], ["y", "z"]] * 3
    l1 = GSDMM(n_clusters=3, seed=42).fit_predict(docs)
    l2 = GSDMM(n_clusters=3, seed=42).fit_predict(docs)
    assert (l1 == l2).all()


def test_dbscan_two_balls_and_noise():
    rng = np.random.default_rng(0)
    a = rng.normal([10, 0, 0], 0.01, (5, 3))
    b = rng.normal([0, 10, 0], 0.01, (5, 3))
    outlier = np.array([[5.0, 5.0, 30.0]])
    labels = cosine_dbscan(np.vstack([a, b, outlier]), eps=0.05,
                           min_samples=2)
    assert len(set(labels[:5])) == 1
    assert len(set(labels[5:10])) == 1
    assert labels[0] != labels[5]
    assert labels[10] == -1
    # canonical ids: cluster id == smallest member index
    assert labels[0] == 0 and labels[5] == 5


def test_knn_mean_of_neighbors():
    x = np.array([[0.0], [1.0], [2.0], [10.0], [11.0]])
    y = np.array([0.0, 1.0, 2.0, 10.0, 11.0])
    model = KNNRegressor(2).fit(x, y)
    assert model.predict([[0.4]])[0] == 0.5       # neighbors 0,1
    assert model.predict([[10.6]])[0] == 10.5     # neighbors 10,11


def test_minmax_roundtrip():
    s = MinMaxScaler().fit(np.array([10.0, 20.0, 30.0]))
    scaled = s.transform(np.array([10.0, 30.0]))
    assert scaled.tolist() == [0.0, 1.0]
    assert s.inverse(scaled).tolist() == [10.0, 30.0]


def test_ml_queries_deterministic(spark):
    from barberini_analytics_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    a = QUERIES["embedding_dbscan_clusters"](spark, sf).collect()
    b = QUERIES["embedding_dbscan_clusters"](spark, sf).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    t1 = QUERIES["topic_model"](spark, sf).collect()
    t2 = QUERIES["topic_model"](spark, sf).collect()
    assert sorted(map(tuple, t1)) == sorted(map(tuple, t2))
    f = QUERIES["visitor_prediction_forecast"](spark, sf).collect()
    assert len(f) == 7
    # Tuesday forecasts are forced to zero
    assert all(r.entries == 0 for r in f if r.date.weekday() == 1)


def test_distributed_dbscan_matches_driver_on_cores(spark):
    """The LSH scale path produces the same core-point partitions as the
    exact driver DBSCAN (sf0.001 embeddings), and each border point's
    cluster contains an ε-near core neighbor."""
    import numpy as np

    from barberini_analytics_spark.core.io import load_table
    from barberini_analytics_spark.ml.dbscan import (
        cosine_dbscan, dbscan_distributed)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = [r.vec_id for r in rows]
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    eps, min_samples = 0.37, 2

    exact = cosine_dbscan(vecs, eps=eps, min_samples=min_samples)

    dist = {r["vec_id"]: r["label"]
            for r in dbscan_distributed(
                emb, eps=eps, min_samples=min_samples,
                bands=16, bits=3).collect()}

    # exact core mask (driver side)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = vecs / norms
    nbrs = (1.0 - unit @ unit.T) <= eps
    core = nbrs.sum(axis=1) >= min_samples

    def partitions(labels_by_idx):
        clusters = {}
        for i, vid in enumerate(ids):
            if core[i]:
                clusters.setdefault(labels_by_idx(i), set()).add(vid)
        return {frozenset(v) for v in clusters.values()}

    assert partitions(lambda i: exact[i]) == \
        partitions(lambda i: dist[ids[i]])

    # border validity: a labelled non-core point has an ε-near core
    # neighbor carrying the same cluster
    for i, vid in enumerate(ids):
        if core[i] or dist[vid] == -1:
            continue
        ok = any(core[j] and nbrs[i][j] and dist[ids[j]] == dist[vid]
                 for j in range(len(ids)))
        assert ok, f"border {vid} attached to a cluster with no near core"


def test_gsdmm_sharded_single_shard_matches_driver(spark):
    """One shard ⇒ the applyInPandas fit is the driver fit: same sampler,
    same seed, same sorted doc order, identical labels."""
    from barberini_analytics_spark.ml.gsdmm import fit_topics_sharded

    docs = ([(i, w) for i in range(10)
             for w in ("apple", "banana", "fruit")]
            + [(i, w) for i in range(10, 20)
               for w in ("engine", "wheel", "car")])
    tokens = spark.createDataFrame(docs, ["doc_id", "word"])

    dist = {r.doc_id: r.topic
            for r in fit_topics_sharded(
                tokens, n_docs=20, n_clusters=5, n_iters=15, seed=7,
                max_docs_per_shard=1000).collect()}

    driver = GSDMM(n_clusters=5, n_iters=15, seed=7).fit_predict(
        [sorted(("apple", "banana", "fruit"))] * 10
        + [sorted(("engine", "wheel", "car"))] * 10)
    assert dist == {i: int(z) for i, z in enumerate(driver)}


def test_gsdmm_gate_routes_large_corpus_through_shards(spark):
    """Past the doc gate, _fit_topics never collects: the sharded path
    assigns every doc exactly once, topic ids stay inside their shard's
    band, and the result is deterministic."""
    from barberini_analytics_spark.plans.ml_queries import (
        _FIT_CACHE, _fit_topics, _topic_tokens)

    tokens = _topic_tokens(spark, "/root/testdata/sf0.001")
    n_docs = tokens.select("doc_id").distinct().count()
    assert n_docs > 10  # the override below must actually trip the gate

    _FIT_CACHE.pop("gate-test", None)
    sharded = _fit_topics(tokens, "gate-test", max_docs=10)
    rows = sharded.collect()
    _FIT_CACHE.pop("gate-test", None)
    again = _fit_topics(tokens, "gate-test", max_docs=10).collect()
    _FIT_CACHE.pop("gate-test", None)

    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    n_shards = -(-n_docs // 10)
    for r in rows:
        assert 0 <= r.topic < n_shards * 10
