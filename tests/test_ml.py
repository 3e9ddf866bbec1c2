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

    _FIT_CACHE.evict("gate-test")
    sharded = _fit_topics(tokens, "gate-test", max_docs=10)
    rows = sharded.collect()
    _FIT_CACHE.evict("gate-test")
    again = _fit_topics(tokens, "gate-test", max_docs=10).collect()
    _FIT_CACHE.evict("gate-test")

    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    # shard count is sized from approx_count_distinct * 1.05 headroom
    n_shards_max = -(-int(n_docs * 1.05 + 1) // 10)
    for r in rows:
        assert 0 <= r.topic < n_shards_max * 10


def test_distributed_dbscan_planted_clusters_at_scale(spark):
    """The LSH path on a generated corpus 16x the sf0.001 table, with
    planted ground truth: every planted ball must come out as one cluster,
    distinct balls as distinct clusters, and background noise as -1 —
    under the session's real shuffle partitioning, with no driver-side
    neighbor matrix anywhere."""
    import numpy as np

    from barberini_analytics_spark.ml.dbscan import dbscan_distributed

    rng = np.random.default_rng(7)
    n_balls, per_ball, n_noise, dim = 40, 100, 400, 64
    centers = rng.normal(size=(n_balls, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    truth = {}
    for b in range(n_balls):
        for _ in range(per_ball):
            v = centers[b] + 0.05 * rng.normal(size=dim)
            rows.append((vid, [float(x) for x in v]))
            truth[vid] = b
            vid += 1
    for _ in range(n_noise):
        v = rng.normal(size=dim)
        rows.append((vid, [float(x) for x in v]))
        truth[vid] = -1
        vid += 1

    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]) \
        .repartition(32)
    labels = {r.vec_id: r.label
              for r in dbscan_distributed(
                  emb, eps=0.37, min_samples=2, bands=8, bits=4).collect()}

    assert len(labels) == n_balls * per_ball + n_noise
    # each planted ball is exactly one cluster; balls don't merge
    ball_labels = {}
    for v, b in truth.items():
        if b == -1:
            assert labels[v] == -1, f"noise point {v} got cluster {labels[v]}"
        else:
            ball_labels.setdefault(b, set()).add(labels[v])
    assert all(len(ls) == 1 for ls in ball_labels.values()), \
        "a planted ball split into multiple clusters"
    flat = [next(iter(ls)) for ls in ball_labels.values()]
    assert len(set(flat)) == n_balls, "planted balls merged"


def test_dbscan_query_gate_override_runs_lsh_path(spark):
    """embedding_dbscan_clusters with max_rows=0 must produce the same
    core-point clustering through the distributed path as the default
    driver path on the sf0.001 table (labels are canonical smallest-member
    ids in both, since vec_id equals collect order there)."""
    import numpy as np

    from barberini_analytics_spark.core.io import load_table
    from barberini_analytics_spark.plans.ml_queries import (
        embedding_dbscan_clusters)

    sf = "/root/testdata/sf0.001"
    driver = {r.vec_id: (r.cluster, r.cluster_label)
              for r in embedding_dbscan_clusters(spark, sf).collect()}
    dist = {r.vec_id: (r.cluster, r.cluster_label)
            for r in embedding_dbscan_clusters(spark, sf,
                                               max_rows=0).collect()}
    assert set(driver) == set(dist)

    # exact core mask to scope the strict comparison
    emb = load_table(spark, sf, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    core_mask = ((1.0 - unit @ unit.T) <= 0.37).sum(axis=1) >= 2
    core = {r.vec_id for r, c in zip(rows, core_mask) if c}

    mismatches = {v for v in core if driver[v] != dist[v]}
    assert not mismatches, f"core rows disagree: {sorted(mismatches)[:5]}"


def test_dbscan_chain_on_externally_written_embedding_parquet(spark,
                                                              tmp_path):
    """The M8 injection point, proven end-to-end: an embedding parquet
    written by an EXTERNAL producer (raw pyarrow, the way a word2vec /
    SBERT export job would write it — never touching Spark) drops into
    ``load_table(..., "embeddings")``'s place and the full
    ``embedding_dbscan_clusters`` chain (DBSCAN → canonical cluster ids
    → centroid top-3 labeling → SemDeDup map) runs unchanged on it,
    recovering the planted geometry — on BOTH the driver path and the
    LSH-distributed path (README §Embedding provenance)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from barberini_analytics_spark.plans.ml_queries import (
        embedding_dbscan_clusters)

    rng = np.random.default_rng(7)
    dim, per = 64, 6
    ids, vecs, labels = [], [], []
    # three tight clusters around orthogonal axes: within-cluster cosine
    # distance << 0.37, between-cluster ~= 1.0
    for c, axis in enumerate((0, 1, 2)):
        for j in range(per):
            v = rng.normal(0, 0.01, dim)
            v[axis] += 1.0
            ids.append(c * 100 + j)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            labels.append(c * 7 % 64)
    # two isolated points: no neighbor within eps -> noise (-1)
    for k, axis in enumerate((10, 20)):
        v = np.zeros(dim); v[axis] = 1.0
        ids.append(900 + k)
        vecs.append(v.astype(np.float32))
        labels.append(50 + k)

    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))

    expected = {c * 100: {c * 100 + j for j in range(per)}
                for c in range(3)}

    for max_rows in (200_000, 0):        # driver path, then LSH path
        out = embedding_dbscan_clusters(
            spark, str(tmp_path), max_rows=max_rows).collect()
        assert len(out) == len(ids)
        by_cluster: dict[int, set] = {}
        for r in out:
            by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
        assert by_cluster.pop(-1) == {900, 901}         # noise
        # the planted partition is recovered (cluster ids are canonical
        # smallest-member VEC ids on the LSH path but smallest-member
        # POSITIONS on the driver path, so compare memberships)
        assert (set(map(frozenset, by_cluster.values()))
                == set(map(frozenset, expected.values()))), max_rows
        for r in out:
            if r.cluster >= 0:
                assert r.cluster_label, r    # labeled from the file's vocab
            assert r.sem_kept is not None
            # singleton label groups legitimately have no pairwise cosine
            if r.sem_dup_of >= 0:
                assert r.sem_max_cosine is not None


# ---------------------------------------------------------------------------
# trained quality classifier (hashed-feature logistic regression)
# ---------------------------------------------------------------------------

def _lr_fixture(spark):
    import random

    rng = random.Random(11)
    clean = ["the", "museum", "opens", "a", "new", "exhibition", "about",
             "modern", "art", "with", "guided", "tours", "every", "day"]
    junk = ["click", "here", "buy", "now", "$$$", "free", "winner",
            "@@@", "spam", "qqq"]
    rows = [(i, " ".join(rng.choices(clean, k=rng.randint(8, 25))), 1.0)
            for i in range(120)]
    rows += [(i + 120, " ".join(rng.choices(junk, k=rng.randint(8, 25))), 0.0)
             for i in range(120)]
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_quality_classifier_separates_and_generalizes(spark):
    from pyspark.sql import functions as F

    from barberini_analytics_spark.ml.logreg import (
        quality_classifier_score, train_quality_classifier)

    df = _lr_fixture(spark)
    model = train_quality_classifier(df, "doc_id", "label",
                                     dim=128, iters=15)
    scored = quality_classifier_score(df, model)
    acc = scored.select(
        ((F.col("quality_prob") > 0.5).cast("int")
         == F.col("label").cast("int")).cast("int").alias("ok")) \
        .agg(F.avg("ok")).first()[0]
    assert acc >= 0.95
    # held-out docs from the same distributions score on the right side
    test = spark.createDataFrame([
        (1000, "the museum opens guided tours about modern art"),
        (1001, "click here free winner buy now spam"),
    ], ["doc_id", "text"])
    probs = {r.doc_id: r.quality_prob
             for r in quality_classifier_score(test, model).collect()}
    assert probs[1000] > 0.7 > 0.3 > probs[1001]


def test_quality_classifier_apply_matches_sparse_training_path(spark):
    """The map-only per-token fold and the trainer's sparse
    Σ w_b·tf_b formulation must be the SAME number (modulo float
    associativity) — otherwise the corpus-scale apply path scores a
    different model than the one trained."""
    import math

    from pyspark.sql import functions as F

    from barberini_analytics_spark.ml.logreg import (
        hashed_token_counts, quality_classifier_score,
        train_quality_classifier)

    df = _lr_fixture(spark)
    model = train_quality_classifier(df, "doc_id", "label",
                                     dim=64, iters=5)
    fast = {r.doc_id: r.quality_prob
            for r in quality_classifier_score(df, model).collect()}
    wt = spark.createDataFrame(
        [(i, w) for i, w in enumerate(model["weights"])],
        ["bucket", "__w"])
    sparse = {
        r.doc_id: 1.0 / (1.0 + math.exp(-(r.m + model["bias"])))
        for r in hashed_token_counts(df, "doc_id", dim=64)
        .join(wt, "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("__w")).alias("m")).collect()}
    assert set(fast) == set(sparse)
    assert all(abs(fast[d] - sparse[d]) < 1e-9 for d in fast)


def test_quality_classifier_featurization_is_portable_md5(spark):
    """Bucket assignment is the engine-portable hash56 (md5) — pinned
    against an independent hashlib computation so the featurization can
    be reproduced outside Spark (e.g. to apply the model in another
    engine)."""
    import hashlib

    from barberini_analytics_spark.ml.logreg import hashed_token_counts

    df = spark.createDataFrame([(1, "alpha beta beta gamma")],
                               ["doc_id", "text"])
    rows = {r.bucket: r.cnt
            for r in hashed_token_counts(df, "doc_id", dim=32).collect()}

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:14], 16) % 32

    expected = {}
    for tok, n in (("alpha", 1.0), ("beta", 2.0), ("gamma", 1.0)):
        b = bucket(tok)
        expected[b] = expected.get(b, 0.0) + n
    assert rows == expected


def test_quality_classifier_apply_is_map_only(spark):
    """The corpus-scale path must not shuffle: no Exchange, no UDF —
    the weight array rides the plan as a bounded O(dim) literal."""
    from barberini_analytics_spark.ml.logreg import quality_classifier_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = {"weights": [0.01] * 64, "bias": -0.5, "dim": 64}
    plan = quality_classifier_score(docs, model)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_classifier_empty_doc_scores_bias(spark):
    import math

    from barberini_analytics_spark.ml.logreg import quality_classifier_score

    df = spark.createDataFrame([(1, "   "), (2, "")], ["doc_id", "text"])
    model = {"weights": [5.0] * 16, "bias": -1.25, "dim": 16}
    probs = {r.doc_id: r.quality_prob
             for r in quality_classifier_score(df, model).collect()}
    want = 1.0 / (1.0 + math.exp(1.25))
    assert all(abs(p - want) < 1e-12 for p in probs.values())


def test_quality_classifier_model_roundtrip(spark, tmp_path):
    """save → load → score is the identity: the persisted parquet is
    the build-once/apply-many handoff, so scores after a round trip are
    bit-identical to the in-memory model's."""
    from barberini_analytics_spark.ml.logreg import (
        load_quality_model, quality_classifier_score, save_quality_model,
        train_quality_classifier)

    df = _lr_fixture(spark)
    model = train_quality_classifier(df, "doc_id", "label",
                                     dim=32, iters=4)
    path = str(tmp_path / "qmodel")
    save_quality_model(spark, model, path)
    back = load_quality_model(spark, path)
    assert back["dim"] == model["dim"]
    assert back["bias"] == model["bias"]
    assert back["weights"] == model["weights"]
    a = {r.doc_id: r.quality_prob
         for r in quality_classifier_score(df, model).collect()}
    b = {r.doc_id: r.quality_prob
         for r in quality_classifier_score(df, back).collect()}
    assert a == b


def test_quality_classifier_table_path_matches_literal(spark):
    """Above the literal bound the weights ride a one-row broadcast
    table; the fold must be the same number as the literal path (r10
    advice: the ADC-LUT treatment for the classifier weights)."""
    import random

    from barberini_analytics_spark.ml.logreg import quality_classifier_score

    rng = random.Random(7)
    dim = 512
    model = {"weights": [rng.uniform(-1, 1) for _ in range(dim)],
             "bias": 0.3, "dim": dim}
    df = _lr_fixture(spark).drop("label")
    lit = {r.doc_id: r.quality_prob
           for r in quality_classifier_score(
               df, model, weight_literal_max=dim).collect()}
    tab = {r.doc_id: r.quality_prob
           for r in quality_classifier_score(
               df, model, weight_literal_max=dim - 1).collect()}
    assert set(lit) == set(tab)
    assert all(abs(lit[d] - tab[d]) < 1e-12 for d in lit)
    # the helper column must not leak into the output schema
    cols = quality_classifier_score(
        df, model, weight_literal_max=dim - 1).columns
    assert "__qc_weights" not in cols


def test_quality_classifier_plan_bounded_at_large_dim(spark):
    """A dim=2^16 model must NOT inflate the plan: the weights are a
    broadcast row (data), so plan text stays small and the scan side
    still has no shuffle Exchange."""
    from barberini_analytics_spark.ml.logreg import quality_classifier_score

    dim = 1 << 16
    model = {"weights": [0.0001] * dim, "bias": -0.5, "dim": dim}
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = quality_classifier_score(docs, model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 50_000, f"plan grew with dim: {len(plan)} chars"
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert out.count() > 0


def test_load_quality_model_validates_torn_file(spark, tmp_path):
    """A model parquet missing the bias row or with gapped buckets (the
    state a torn overwrite can leave) raises a ValueError naming the
    path, not a bare KeyError (r10 advice)."""
    import pytest

    from barberini_analytics_spark.ml.logreg import load_quality_model

    no_bias = str(tmp_path / "no_bias")
    spark.createDataFrame([(0, 0.1), (1, 0.2)], ["bucket", "weight"]) \
        .write.parquet(no_bias)
    with pytest.raises(ValueError, match="bias row"):
        load_quality_model(spark, no_bias)

    gapped = str(tmp_path / "gapped")
    spark.createDataFrame([(-1, 0.0), (0, 0.1), (2, 0.2)],
                          ["bucket", "weight"]).write.parquet(gapped)
    with pytest.raises(ValueError, match="contiguous"):
        load_quality_model(spark, gapped)

    duped = str(tmp_path / "duped")
    spark.createDataFrame([(-1, 0.0), (0, 0.1), (0, 0.2)],
                          ["bucket", "weight"]).write.parquet(duped)
    with pytest.raises(ValueError, match="duplicate"):
        load_quality_model(spark, duped)


def test_save_quality_model_swaps_via_rename(spark, tmp_path):
    """Re-training over an existing local model leaves no temp/old
    residue and the re-loaded model is the new one (the rename-swap
    replacement path)."""
    import os

    from barberini_analytics_spark.ml.logreg import (
        load_quality_model, save_quality_model)

    path = str(tmp_path / "model")
    save_quality_model(spark, {"weights": [1.0, 2.0], "bias": 0.5,
                               "dim": 2}, path)
    save_quality_model(spark, {"weights": [3.0, 4.0], "bias": -0.5,
                               "dim": 2}, path)
    back = load_quality_model(spark, path)
    assert back == {"weights": [3.0, 4.0], "bias": -0.5, "dim": 2}
    residue = [d for d in os.listdir(tmp_path)
               if "__tmp_" in d or "__old_" in d]
    assert residue == []
