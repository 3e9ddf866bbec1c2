"""Product-quantization (IVF-PQ memory tier) unit tests.

The oracle parity of the encode + ADC chain is hash-checked inside the
``ivf_assignments`` entry (``plans/similarity_queries.py``); these tests
pin the operator-level properties: codebook shape, deterministic
map-only encoding, Lloyd convergence, and ADC ranking quality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from barberini_analytics_spark.core.cache import release_scoped
from barberini_analytics_spark.core.io import load_table
from barberini_analytics_spark.operators import similarity as S

M, K, DIM = 8, 16, 64
D_SUB = DIM // M


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


@pytest.fixture(scope="module")
def codebook(spark, emb):
    cb = S.pq_train(emb, m=M, k=K, iters=2)
    rows = cb.collect()
    release_scoped()
    return rows


def test_codebook_shape_and_domain(codebook):
    assert len(codebook) == M * K
    assert {(r["sub"], r["code"]) for r in codebook} == {
        (s, j) for s in range(M) for j in range(K)
    }
    for r in codebook:
        assert len(r["centroid"]) == D_SUB


def test_encode_is_map_only_and_deterministic(spark, emb, codebook):
    enc = S.pq_encode(emb, codebook, m=M, k=K)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert "EvalPython" not in plan, plan[:2000]
    a = {r["vec_id"]: r["pq_code"] for r in enc.collect()}
    b = {r["vec_id"]: r["pq_code"] for r in
         S.pq_encode(emb, codebook, m=M, k=K).collect()}
    assert a == b
    # codes use the full packed domain: every subspace code < K
    for code in a.values():
        assert 0 <= code < K ** M
    # quantization actually distinguishes vectors (not all-one-bucket)
    assert len(set(a.values())) > len(a) // 2


def test_lloyd_iterations_reduce_distortion(spark, emb):
    """Mean squared quantization error must not increase with training —
    the Lloyd convergence guarantee (each assign/update step is
    non-increasing in total distortion)."""
    def distortion(iters: int) -> float:
        cb = S.pq_train(emb, m=M, k=K, iters=iters)
        rows = cb.collect()
        release_scoped()
        enc_in = emb.select(
            "vec_id", S.l2_normalize(F.col("embedding"), DIM).alias("__nv"))
        total = 0.0
        cents = {(r["sub"], r["code"]): list(r["centroid"]) for r in rows}
        data = enc_in.collect()
        for r in data:
            nv = r["__nv"]
            for s in range(M):
                sv = nv[s * D_SUB:(s + 1) * D_SUB]
                best = min(
                    sum((sv[i] - cents[(s, j)][i]) ** 2
                        for i in range(D_SUB))
                    for j in range(K)
                )
                total += best
        return total / len(data)

    assert distortion(2) <= distortion(0) + 1e-12


def test_adc_recall_beats_random(spark, emb, codebook):
    """ADC top-10 must overlap the exact cosine top-10 far above the
    random baseline (10/500 = 2%).  PQ on *random* synthetic embeddings
    is the worst case (no cluster structure to exploit); measured mean
    recall@10 here is ~0.30 — pinned at ≥ 0.15 for slack."""
    enc = S.pq_encode(emb, codebook, m=M, k=K)
    recalls = []
    for qid in range(3):
        q = emb.filter(F.col("vec_id") == qid).select("embedding").first()[0]
        q_lit = F.array(*[F.lit(float(x)) for x in q])
        exact = [r["vec_id"] for r in
                 emb.filter(F.col("vec_id") != qid)
                 .select("vec_id",
                         S.cosine(F.col("embedding"), q_lit).alias("c"))
                 .orderBy(F.desc("c"), "vec_id").limit(10).collect()]
        approx = [r["vec_id"] for r in
                  S.pq_adc_scores(enc.filter(F.col("vec_id") != qid),
                                  codebook, list(q), m=M, k=K)
                  .orderBy(F.desc("adc_score"), "vec_id")
                  .limit(10).collect()]
        recalls.append(len(set(exact) & set(approx)) / 10)
    assert sum(recalls) / len(recalls) >= 0.15, recalls


def test_arrow_encode_bit_equals_expression_encode(spark, emb, codebook):
    """pq_encode_arrow (the 100 TB path: numpy over Arrow batches, all
    reductions via sequential cumsum folds) must produce BIT-IDENTICAL
    packed codes to the pure-expression pq_encode — this equality is
    what lets the registry entry run the fast path while the DuckDB
    oracle hash-checks the math."""
    exact = {r["vec_id"]: r["pq_code"] for r in
             S.pq_encode(emb, codebook, m=M, k=K).collect()}
    fast = {r["vec_id"]: r["pq_code"] for r in
            S.pq_encode_arrow(emb, codebook, m=M, k=K).collect()}
    assert exact == fast


def test_ivf_pq_search_recall_and_shape(spark, emb, codebook):
    """The composite probe → ADC-shortlist → exact-re-rank pipeline.

    With full probing (no cell loss) and a shortlist of 100/497 the
    exact re-rank recovers most of the true top-10 (measured ~0.90 —
    pinned ≥ 0.7); narrowing to nprobe=4/shortlist=50 trades recall for
    scan fraction but must stay far above the 2% random baseline.
    Output schema matches brute_force_topk (query_id, vec_id, cosine,
    rank)."""
    from barberini_analytics_spark.operators.similarity import (
        brute_force_topk, centroids_by_key, ivf_pq_search)

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    corpus = emb.filter(F.col("vec_id") >= 3).select("vec_id", "embedding")
    cents = centroids_by_key(emb, "label")

    exact = {}
    for r in brute_force_topk(corpus, queries, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    full = ivf_pq_search(corpus, cents, codebook, queries,
                         k=10, nprobe=10, shortlist=100)
    assert set(full.columns) == {"query_id", "vec_id", "cosine", "rank"}
    got = {}
    for r in full.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & got[q]) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.7, recalls

    narrow = ivf_pq_search(corpus, cents, codebook, queries,
                           k=10, nprobe=4, shortlist=50)
    got_n = {}
    for r in narrow.collect():
        got_n.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls_n = [len(exact[q] & got_n[q]) / 10 for q in exact]
    assert sum(recalls_n) / len(recalls_n) >= 0.25, recalls_n
    # each query returns exactly k ranked rows
    for q, ids in got_n.items():
        assert len(ids) == 10


def test_adc_self_query_ranks_first(spark, emb, codebook):
    """A vector scored against its own (un-excluded) corpus must rank
    itself first: quantization noise is symmetric, so nothing should
    beat the query's own code cell by a margin."""
    enc = S.pq_encode(emb, codebook, m=M, k=K)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    top = (S.pq_adc_scores(enc, codebook, list(q), m=M, k=K)
           .orderBy(F.desc("adc_score"), "vec_id").limit(3).collect())
    assert top[0]["vec_id"] == 0
