"""Vector similarity search over embedding columns (``array<float>``).

Two tiers, as a 100 TB pipeline needs:

- **brute-force cosine top-k** — the exact baseline.  The query side is
  broadcast (queries are few); the corpus side streams through one scan.
  Dot products run JVM-side via ``zip_with`` + ``aggregate`` in codegen —
  no Python in the loop.
- **IVF (inverted-file) cosine top-k** — the scale path: assign every
  vector to its nearest centroid (broadcast centroids), then search only
  the probed cells.  Centroids here are computed per partition-key (the
  synthetic ``label``) or by a provided centroid table; at real scale
  they come from k-means (Spark MLlib) — the search plan is identical.

All float math is widened to double before accumulation so results are
engine-portable (the DuckDB oracle folds the same element order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two numeric array columns (double-widened)."""
    return _dot(a, b) / (_norm2(a) * _norm2(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries`` carries ``(query_id, embedding)``.  The join is a broadcast
    cross join (few queries × corpus scan); ranking is one window per
    query id.  Cosine is rounded to 6 decimals *before* ranking with an id
    tie-break, so the top-k set is reproducible across engines.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
        )
    )
    from .relational import top_k_per_group

    return top_k_per_group(
        scored, [query_id_col],
        [F.col("cosine").desc(), F.col(id_col).asc()],
        k=k, rank_col="rank", keep_rank=True,
    ).withColumn("rank", F.col("rank").cast("int"))


def centroids_by_key(vectors: DataFrame, key_col: str = "label",
                     vec_col: str = "embedding") -> DataFrame:
    """Per-key mean vector (IVF cell centroids).

    MLlib ``Summarizer.mean`` is a true map-side-combining vector
    aggregate: each map task keeps one (running-mean, count) buffer per
    key, so the shuffle moves one dim-length array per (key, map task) —
    not one row per (key, dim) element like a ``posexplode`` formulation
    would (64× the shuffle volume at dim=64).  At 100 TB this is the
    standard k-means centroid-update plan.

    Mean summation order is engine/partition dependent either way; callers
    round derived cosines (6 decimals) before ranking, which absorbs the
    last-ulp noise.
    """
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer

    return (
        vectors.select(
            F.col(key_col),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("__v"),
        )
        .groupBy(key_col)
        .agg(Summarizer.mean(F.col("__v")).alias("__m"))
        .select(key_col, vector_to_array("__m").alias("centroid"))
    )


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               key_col: str = "label", centroid_col: str = "centroid") -> DataFrame:
    """Nearest-centroid assignment (the IVF build step).

    Broadcast the centroid table (bounded: n_cells × dim), score every
    vector against every cell in one projection, keep the argmax by
    (rounded cosine, key) — a single corpus scan, no shuffle.
    """
    c = centroids.select(
        F.col(key_col).alias("cell"), F.col(centroid_col)
    )
    scored = (
        vectors.crossJoin(F.broadcast(c))
        .select(
            id_col,
            "cell",
            F.round(cosine(F.col(vec_col), F.col(centroid_col)), 6).alias("cosine"),
        )
    )
    from .relational import top_k_per_group

    return top_k_per_group(
        scored, [id_col],
        [F.col("cosine").desc(), F.col("cell").asc()],
        k=1,
    ).select(id_col, F.col("cell").alias("assigned_cell"), F.col("cosine").alias("cell_cosine"))


def srp_candidate_pairs(vectors: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding", dim: int = 64,
                        bands: int = 4, bits: int = 6) -> DataFrame:
    """Signed-random-projection LSH candidate pairs (AND-OR banding).

    Deterministic pseudo-hyperplanes (same integer-coefficient family as
    ``plans/dedup_queries.embedding_cosine_near_dup``, so behavior is
    pinned by that query's DuckDB oracle).  Returns distinct
    ``(id1, id2, e1, e2)`` with ``id1 < id2``; a pair is a candidate when
    any of the ``bands`` bucket keys (each ``bits`` sign bits) matches.

    Scale shape: one narrow projection per row, then a self-join keyed on
    (band, bucket) — candidate volume is O(sum of bucket sizes squared),
    never O(n²).  ``bands``/``bits`` are the recall/cost dials: more
    bands raise recall, more bits shrink buckets.
    """
    projs = [
        F.expr(
            f"aggregate(sequence(1, {dim}), CAST(0.0 AS DOUBLE), "
            f"(a, i) -> a + CAST(element_at({vec_col}, i) AS DOUBLE) "
            f"* (((i*31 + {p + 1}*17) % 7) - 3))"
        )
        for p in range(bands * bits)
    ]
    sign_bits = [F.when(pr >= 0, 1).otherwise(0) for pr in projs]
    band_structs = F.explode(F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            sum(sign_bits[b * bits + j] * (1 << j)
                for j in range(bits)).alias("bucket"),
        )
        for b in range(bands)
    ]))
    banded = (
        vectors.select(F.col(id_col).alias("__id"),
                       F.col(vec_col).alias("__vec"),
                       band_structs.alias("bb"))
        .select("__id", "__vec", "bb.band", "bb.bucket")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.__id") < F.col("b.__id")))
        .select(F.col("a.__id").alias("id1"), F.col("b.__id").alias("id2"),
                F.col("a.__vec").alias("e1"), F.col("b.__vec").alias("e2"))
        .dropDuplicates(["id1", "id2"])
    )


def ivf_search(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
               k: int = 10, nprobe: int = 4, id_col: str = "vec_id",
               vec_col: str = "embedding", key_col: str = "label",
               query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k via inverted-file probing (the ANN scale path).

    Build side: every corpus vector is assigned to its nearest centroid
    cell (``ivf_assign`` — broadcast centroids, one scan).  Query side:
    each query scores the centroid table, keeps its ``nprobe`` closest
    cells, and is joined to the corpus on the cell key — so each query
    reads ~``nprobe / n_cells`` of the corpus instead of all of it.  The
    exact cosine then ranks the probed candidates.

    ``nprobe`` is the recall dial (nprobe = n_cells degrades to exact
    search); tests pin recall@k against ``brute_force_topk``.
    """
    from .relational import top_k_per_group

    assigned = ivf_assign(corpus, centroids, id_col, vec_col, key_col) \
        .join(corpus, id_col)
    c = centroids.select(F.col(key_col).alias("cell"), "centroid")
    q = queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
    probe_scores = q.crossJoin(F.broadcast(c)).select(
        query_id_col, "__qvec", "cell",
        F.round(cosine(F.col("__qvec"), F.col("centroid")), 6).alias("csim"))
    probed = top_k_per_group(
        probe_scores, [query_id_col],
        [F.col("csim").desc(), F.col("cell").asc()], k=nprobe,
    ).select(query_id_col, "__qvec", F.col("cell").alias("assigned_cell"))
    cand = probed.join(assigned, "assigned_cell").select(
        query_id_col, id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"))
    return top_k_per_group(
        cand, [query_id_col],
        [F.col("cosine").desc(), F.col(id_col).asc()],
        k=k, rank_col="rank", keep_rank=True,
    ).withColumn("rank", F.col("rank").cast("int"))


def kmeans_refine(vectors: DataFrame, init_centroids: DataFrame,
                  iters: int = 3, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  key_col: str = "label") -> DataFrame:
    """Lloyd iterations to turn arbitrary seed cells into geometric IVF
    cells: assign every vector to its nearest centroid (broadcast, one
    scan), recompute per-cell means (map-side-combining vector aggregate),
    repeat.  Each round is scan + one small shuffle; centroid tables stay
    broadcast-sized throughout — the standard distributed k-means plan.
    """
    cents = init_centroids
    for _ in range(iters):
        assigned = ivf_assign(vectors, cents, id_col, vec_col, key_col) \
            .join(vectors, id_col)
        cents = centroids_by_key(assigned, "assigned_cell", vec_col) \
            .withColumnRenamed("assigned_cell", key_col) \
            .localCheckpoint(eager=True)
    return cents
