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
    other engine (the featurization hash is portable md5).

    Replacement semantics: on a local filesystem the new model is
    written to a sibling temp directory and swapped in with two
    renames, so a concurrent :func:`load_quality_model` can race only
    with a millisecond rename pair, never with the parquet write
    itself (Spark's ``mode("overwrite")`` deletes-then-writes, which
    would expose a missing or torn directory for the whole write).
    For non-local URIs (``scheme://``) rename semantics vary by store,
    so the plain overwrite is used and replacement is NOT atomic for
    concurrent readers — version the path and flip a pointer there.
    """
    import os
    import shutil
    import uuid

    rows = [(int(i), float(w)) for i, w in enumerate(model["weights"])]
    rows.append((-1, float(model["bias"])))
    frame = spark.createDataFrame(rows, ["bucket", "weight"]).coalesce(1)
    if "://" in path:
        frame.write.mode("overwrite").parquet(path)
        return
    tmp = f"{path.rstrip('/')}.__tmp_{uuid.uuid4().hex}"
    frame.write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}.__old_{uuid.uuid4().hex}"
    moved_aside = False
    try:
        if os.path.isdir(path):
            os.rename(path, old)
            moved_aside = True
        os.rename(tmp, path)
    except OSError:
        # if the previous model was already moved aside, roll it back
        # before raising — otherwise a failed second rename would leave
        # NO model at `path` and the old one stranded under a random
        # __old_<uuid> name, strictly worse than the failure it replaced
        if moved_aside and not os.path.isdir(path):
            try:
                os.rename(old, path)
            except OSError:
                pass  # rollback is best-effort; the original error wins
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)


def load_quality_model(spark, path: str) -> dict:
    """Inverse of :func:`save_quality_model`; ``dim`` is recovered from
    the row count, so the file is self-describing.

    The loaded rows are validated — bias row present, bucket ids
    contiguous ``0..dim-1`` with no duplicates — so a torn or
    hand-damaged model file raises a descriptive :class:`ValueError`
    naming the path instead of a bare ``KeyError`` deep in scoring.
    """
    rows = spark.read.parquet(path).collect()
    buckets = [r.bucket for r in rows]
    if len(set(buckets)) != len(buckets):
        dupes = sorted({b for b in buckets if buckets.count(b) > 1})[:5]
        raise ValueError(
            f"quality model at {path!r} is corrupt: duplicate bucket "
            f"rows {dupes}")
    weights = {r.bucket: r.weight for r in rows}
    if -1 not in weights:
        raise ValueError(
            f"quality model at {path!r} is corrupt: missing the "
            f"bucket=-1 bias row ({len(rows)} rows present)")
    bias = weights.pop(-1)
    dim = len(weights)
    missing = [i for i in range(dim) if i not in weights]
    if missing:
        raise ValueError(
            f"quality model at {path!r} is corrupt: bucket ids are not "
            f"contiguous 0..{dim - 1} (first missing: {missing[:5]}, "
            f"unexpected: {sorted(b for b in weights if not 0 <= b < dim)[:5]})")
    return {"weights": [weights[i] for i in range(dim)], "bias": bias,
            "dim": dim}


#: above this ``dim`` the weight array rides a one-row broadcast table
#: instead of a plan literal — same bound-the-plan pattern as the ADC
#: LUT path (``operators/similarity.py`` ``lut_literal_max``): a
#: dim=2^20 model as a literal would be megabytes of plan text re-parsed
#: per query, while the broadcast row is data, not plan.
WEIGHT_LITERAL_MAX = 4096


def quality_classifier_score(df: DataFrame, model: dict,
                             text_col: str = "text",
                             out_col: str = "quality_prob",
                             weight_literal_max: int | None = None,
                             ) -> DataFrame:
    """Map-only application: ``σ(b + Σ_tokens w[h(token)])`` as a fold
    over the token array against the broadcast weight array — no
    feature vector, no shuffle, no UDF.  This is the path that runs
    over the full 100 TB corpus.

    Plan size is bounded: models up to ``weight_literal_max`` buckets
    (default :data:`WEIGHT_LITERAL_MAX`) embed the weights as an O(dim)
    array literal; larger models ride a ONE-ROW broadcast table through
    a broadcast nested-loop join (still map-only — no shuffle of corpus
    rows, and the plan is O(1) in ``dim``).  Both paths compute the
    identical fold, test-pinned against each other.

    The token-sum formulation is exactly the sparse ``Σ_b w_b·tf_b`` the
    trainer optimizes — per-token lookup and per-bucket count·weight are
    the same sum, so train and apply scores agree (test-pinned).
    """
    w = model["weights"]
    dim = model["dim"]
    cap = WEIGHT_LITERAL_MAX if weight_literal_max is None \
        else weight_literal_max
    drop_cols: list[str] = []
    if dim <= cap:
        weights_arr = F.array(*[F.lit(float(x)) for x in w])
    else:
        spark = df.sparkSession
        wdf = spark.createDataFrame([([float(x) for x in w],)],
                                    "__qc_weights: array<double>")
        df = df.crossJoin(F.broadcast(wdf))
        weights_arr = F.col("__qc_weights")
        drop_cols = ["__qc_weights"]
    tokens = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "")
    margin = F.aggregate(
        tokens, F.lit(float(model["bias"])),
        lambda acc, t: acc + F.get(weights_arr,
                                   F.pmod(hash56(t), F.lit(dim))
                                   .cast("int")))
    return df.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).drop(*drop_cols)
