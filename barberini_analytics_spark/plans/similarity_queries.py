"""Similarity-search query inventory over the ``embeddings`` table
(``array<float>``, 64-dim): brute-force cosine top-k (exact baseline) and
IVF nearest-centroid assignment (the scale path's build step).

Float math is widened to double and folded in element order on both engines
(`F.aggregate` in Spark, `list_reduce` in DuckDB start from the same
sequence), so cosine values are bit-identical before the final 6-decimal
round used to stabilize ranking ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.io import load_table
from ..operators import similarity as S
from .registry import query

_N_QUERIES = 5
_TOP_K = 10

# element-order dot/norm fold, identical to Spark's aggregate() semantics
_DOT = (
    "list_reduce(list_transform(generate_series(1, 64), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), "
    "(acc, x) -> acc + x)"
)
_NORM_A = (
    "sqrt(list_reduce(list_transform(generate_series(1, 64), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), "
    "(acc, x) -> acc + x))"
)
_NORM_Q = (
    "sqrt(list_reduce(list_transform(generate_series(1, 64), "
    "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), "
    "(acc, x) -> acc + x))"
)


@query(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, a.vec_id AS vec_id,
               round({_DOT} / ({_NORM_A} * {_NORM_Q}), 6) AS cosine
        FROM embeddings a
        CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}) q
        WHERE a.vec_id >= {_N_QUERIES}
    )
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
        ) AS INT) AS rank
        FROM scored
    )
    WHERE rank <= {_TOP_K}
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: brute-force cosine top-10 for 5 query vectors.

    Queries are broadcast; the corpus side is one scan with the dot-product
    fold inside codegen (``zip_with`` + ``aggregate`` — no Python).  At
    100 TB this plan is scan-bound and embarrassingly parallel; the IVF
    variant below cuts the scanned fraction.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    corpus = emb.filter(F.col("vec_id") >= _N_QUERIES).select("vec_id", "embedding")
    return S.brute_force_topk(corpus, queries, k=_TOP_K)


_C_DOT = (
    "list_reduce(list_transform(generate_series(1, 64), "
    "i -> CAST(v.embedding[i] AS DOUBLE) * c.centroid[i]), "
    "(acc, x) -> acc + x)"
)
_C_NORM_V = (
    "sqrt(list_reduce(list_transform(generate_series(1, 64), "
    "i -> CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)), "
    "(acc, x) -> acc + x))"
)
_C_NORM_C = (
    "sqrt(list_reduce(list_transform(generate_series(1, 64), "
    "i -> c.centroid[i] * c.centroid[i]), (acc, x) -> acc + x))"
)


@query(
    "ivf_assignments",
    oracle=f"""
    WITH per_dim AS (
        SELECT label, dim,
               sum(CAST(x AS DOUBLE)) / count(*) AS c
        FROM (
            SELECT label,
                   generate_subscripts(embedding, 1) AS dim,
                   unnest(embedding) AS x
            FROM embeddings
        )
        GROUP BY label, dim
    ), cents AS (
        SELECT label AS cell, list(c ORDER BY dim) AS centroid
        FROM per_dim GROUP BY label
    ), scored AS (
        SELECT v.vec_id, c.cell,
               round({_C_DOT} / ({_C_NORM_V} * {_C_NORM_C}), 6) AS cosine
        FROM embeddings v CROSS JOIN cents c
    )
    SELECT vec_id, cell AS assigned_cell, cosine AS cell_cosine FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY cosine DESC, cell ASC
        ) AS rn
        FROM scored
    )
    WHERE rn = 1
    """,
)
def ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF build step: per-label centroids + nearest-centroid assignment.

    Centroid build is one (key, dim) shuffle; assignment broadcasts the
    centroid table and scans the corpus once — the inverted-file layout
    that bounds ANN search cost at scale.  Per-dim means are summed in
    engine-specific order, so cosines may differ in the last ulp between
    engines; the 6-decimal round absorbs that (ties then break by cell id).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents = S.centroids_by_key(emb, "label")
    return S.ivf_assign(emb.select("vec_id", "embedding"), cents, key_col="label")
