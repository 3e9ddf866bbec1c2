"""Distributed logistic-regression quality classifier over hashed token
features — the GPT-3 / LLaMA-lineage "webtext filter" (Brown et al. 2020
trained LR on WebText-vs-CommonCrawl; the LLaMA/CCNet pipeline keeps the
same shape): label a small positive corpus (curated text) against a
negative corpus (raw crawl), train a linear classifier on hashed
bag-of-token counts, then score the full corpus map-only and keep the
high-probability tail.

Why this shape at 100 TB:

- **Training is sample-sized, application is corpus-sized** — the design
  optimizes the latter.  Applying the model needs NO feature vector:
  ``score(doc) = σ(b + Σ_tokens w[h(token)])`` is a single codegen-free
  fold over the token array against a broadcast weight array, a map-only
  scan with zero shuffle (:func:`quality_classifier_score`).
- Training materializes features SPARSELY — ``(doc, bucket, count)``
  rows from one explode + groupBy, persisted once; each gradient-descent
  step is two map-side-combining aggregates over those rows (score per
  doc, gradient per bucket) plus a ``dim``-row collect.  No dense
  ``dim``-wide vectors ever exist on the wire.
- The hash trick (``pmod(hash56(token), dim)``) bounds the model at
  ``dim`` weights regardless of vocabulary, and hash56 keeps the
  featurization engine-portable (same md5 arithmetic the dedup family
  uses).

This is the *trained* member of the quality-gate family: the Gopher rule
table and the char-trigram LM score (operators/text.py) are its
heuristic siblings; CCNet terciles (operators/curation.py) consume
scores like the ones this model emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.text import hash56


def hashed_token_counts(df: DataFrame, id_col: str, text_col: str = "text",
                        dim: int = 1024) -> DataFrame:
    """Sparse hashed bag-of-tokens: one row per ``(id, bucket, cnt)``.

    Normalized (lowercase, whitespace) tokens hash into ``dim`` buckets
    via the portable 56-bit md5 hash.  One explode + one
    map-side-combining count aggregate; rows per document are bounded by
    ``min(n_tokens, dim)``.
    """
    tokens = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                          "32"))
    return (
        df.repartition(n_part, F.col(id_col))
        .select(F.col(id_col), F.explode(tokens).alias("__tok"))
        .filter(F.col("__tok") != "")
        .select(id_col, F.pmod(hash56(F.col("__tok")), F.lit(dim))
                .cast("int").alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )


def train_quality_classifier(labeled: DataFrame, id_col: str,
                             label_col: str, text_col: str = "text",
                             dim: int = 1024, iters: int = 30,
                             lr: float = 0.5,
                             l2: float = 1e-4) -> dict:
    """Batch gradient descent for L2-regularized logistic regression on
    hashed token counts.  ``label_col`` is 1.0 for the curated/positive
    corpus, 0.0 for the raw/negative corpus.

    Distributed shape per iteration (weights live on the driver — ``dim``
    doubles, broadcast back as a literal table each step):

    1. per-doc margin: sparse rows ⋈ broadcast ``(bucket, w)`` table,
       one sum-aggregate by doc (reuses the persisted sparse frame's
       partitioning);
    2. per-bucket gradient: errors ⋈ sparse rows, one sum-aggregate by
       bucket, ``dim``-row collect.

    Both joins broadcast the tiny side; the corpus-sized sparse frame is
    shuffled ONCE at featurization and persisted.  Iterations cost two
    aggregates each — no growing lineage (the weights are data, not
    plan).

    Returns ``{"weights": list[float], "bias": float, "dim": dim}``.
    """
    from ..core.cache import scoped_persist

    spark = labeled.sparkSession
    feats = scoped_persist(
        hashed_token_counts(labeled, id_col, text_col, dim))
    labels = scoped_persist(
        labeled.select(id_col, F.col(label_col).cast("double")
                       .alias("__y")))
    n_docs = labels.count()  # also materializes the persists

    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        wt = spark.createDataFrame(
            [(i, wi) for i, wi in enumerate(w)], ["bucket", "__w"])
        margins = (
            feats.join(F.broadcast(wt), "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("cnt") * F.col("__w")).alias("__m"))
        )
        # errors are sample-sized (the training corpora, not the 100 TB
        # target); collect ONCE and re-ship as the broadcast side of the
        # gradient join rather than recomputing the margin aggregate
        err_rows = (
            labels.join(margins, id_col, "left")
            .select(id_col,
                    (F.lit(1.0)
                     / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("__m"),
                                                        F.lit(0.0))
                                             + F.lit(b))))
                     - F.col("__y")).alias("__e"))
        ).collect()
        g_b = sum(r["__e"] for r in err_rows)
        errs = spark.createDataFrame(err_rows)
        grad_rows = (
            feats.join(F.broadcast(errs), id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("cnt") * F.col("__e")).alias("__g"))
            .collect()
        )
        grad = [0.0] * dim
        for r in grad_rows:
            grad[r["bucket"]] = r["__g"]
        w = [wi - lr * (gi / n_docs + l2 * wi)
             for wi, gi in zip(w, grad)]
        b -= lr * g_b / n_docs
    return {"weights": w, "bias": b, "dim": dim}


def save_quality_model(spark, model: dict, path: str) -> None:
    """Persist a trained model as a plain parquet of ``(bucket, weight)``
    rows plus a ``bucket = -1`` bias row — the build-once/apply-many
    split (same production shape as ``ivf_pq_build``/``ivf_pq_search``):
    train where the labeled sample lives, apply in any later job or any
    other engine (the featurization hash is portable md5).  Overwrite
    write: re-training replaces the model atomically at the parquet
    directory grain."""
    rows = [(int(i), float(w)) for i, w in enumerate(model["weights"])]
    rows.append((-1, float(model["bias"])))
    spark.createDataFrame(rows, ["bucket", "weight"]) \
        .coalesce(1).write.mode("overwrite").parquet(path)


def load_quality_model(spark, path: str) -> dict:
    """Inverse of :func:`save_quality_model`; ``dim`` is recovered from
    the row count, so the file is self-describing."""
    rows = spark.read.parquet(path).collect()
    weights = {r.bucket: r.weight for r in rows}
    bias = weights.pop(-1)
    dim = len(weights)
    return {"weights": [weights[i] for i in range(dim)], "bias": bias,
            "dim": dim}


def quality_classifier_score(df: DataFrame, model: dict,
                             text_col: str = "text",
                             out_col: str = "quality_prob") -> DataFrame:
    """Map-only application: ``σ(b + Σ_tokens w[h(token)])`` as a fold
    over the token array against the broadcast weight literal — no
    feature vector, no shuffle, no UDF.  This is the path that runs over
    the full 100 TB corpus; plan size is O(dim) (the weight literal),
    independent of data.

    The token-sum formulation is exactly the sparse ``Σ_b w_b·tf_b`` the
    trainer optimizes — per-token lookup and per-bucket count·weight are
    the same sum, so train and apply scores agree (test-pinned).
    """
    w = model["weights"]
    dim = model["dim"]
    weights_lit = F.array(*[F.lit(float(x)) for x in w])
    tokens = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "")
    margin = F.aggregate(
        tokens, F.lit(float(model["bias"])),
        lambda acc, t: acc + F.get(weights_lit,
                                   F.pmod(hash56(t), F.lit(dim))
                                   .cast("int")))
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)))
