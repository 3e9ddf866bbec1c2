"""Corpus-curation query inventory: the pre-training data-governance
steps a 100 TB pipeline runs between dedup and shard-writing —
benchmark decontamination, SemDeDup semantic pruning, and
temperature-scaled mixture planning.

All three are hash-checked against DuckDB: shingle containment and the
within-cluster cosine math are re-derived bit-exactly (ordered float
folds on both engines), and the mixture plan's tiny cross-source
normalization sums are rounded on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.io import load_table
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text as X
from .registry import query

#: deterministic eval-set carve-out for the contamination screen: every
#: 37th document plays the held-out benchmark.  In production the eval
#: side is the real benchmark suite (MMLU/GSM8K/... dumps) — tiny either
#: way, which is what lets the eval shingle table broadcast.
_EVAL_MOD = 37
_DECON_K = 3
_DECON_MIN = 0.1

#: SemDeDup threshold, calibrated to the synthetic embeddings (labels
#: are sampling strata, not geometric clusters; within-label cosines
#: top out near 0.45, so production's 0.95 would be a vacuous 0-row
#: check).  The POLICY under test — within-cluster pairs, lowest-id
#: domination, total keep/drop map — is threshold-independent.
_SEM_TAU = 0.3


@query(
    "benchmark_decontamination",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(w) >= {_DECON_K}
                 THEN [array_to_string(w[i:i+{_DECON_K - 1}], ' ')
                       for i in generate_series(1, len(w) - {_DECON_K - 1})]
                 ELSE [array_to_string(w, ' ')] END)) AS shingle
        FROM toks
    ),
    ev AS (SELECT doc_id AS eval_id, shingle FROM sh
           WHERE doc_id % {_EVAL_MOD} = 0),
    tr AS (SELECT doc_id AS train_id, shingle FROM sh
           WHERE doc_id % {_EVAL_MOD} <> 0),
    evsz AS (SELECT eval_id, count(*) AS n_ev FROM ev GROUP BY 1),
    shared AS (
        SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM tr JOIN ev USING (shingle) GROUP BY 1, 2
    )
    SELECT train_id, eval_id, n_shared,
           CAST(n_shared AS DOUBLE) / n_ev AS eval_containment
    FROM shared JOIN evsz USING (eval_id)
    WHERE CAST(n_shared AS DOUBLE) / n_ev >= {_DECON_MIN}
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen (operators/dedup.cross_corpus_overlap):
    flag training documents containing ≥10% of an eval document's 3-gram
    shingles — the n-gram decontamination pass (GPT-3 appendix C / Dolma
    style) run before an LLM training corpus ships.

    Shape: shingle both corpora, broadcast the (tiny) eval shingle table,
    join on the shingle string, count per (train, eval) pair.  The only
    corpus-sized shuffle is the per-pair count; no doc×doc comparison
    exists anywhere.  ``eval_containment`` is an exact int/int division —
    bit-identical across engines, no rounding needed.

    Parity: reference has no decontamination (museum-domain engine);
    this is part of the LLM-training extension family
    (cf. ``cross_corpus_overlap``, SURVEY §2 extension table).
    """
    docs = load_table(spark, sf_dir, "documents")
    evalset = docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
    train = docs.filter(F.col("doc_id") % _EVAL_MOD != 0)
    return D.cross_corpus_overlap(train, evalset, "doc_id",
                                  k=_DECON_K, min_overlap=_DECON_MIN)


_C_NV = """
        list_transform(embedding, x -> CAST(x AS DOUBLE) /
            sqrt(list_reduce(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                (a, x) -> a + x)))
"""


@query(
    "semantic_dedup_embeddings",
    oracle=f"""
    WITH nv AS (
        SELECT vec_id, label, {_C_NV} AS v
        FROM embeddings
    ),
    p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_reduce(
                   list_transform(generate_series(1, 64),
                                  i -> a.v[i] * b.v[i]),
                   (a, x) -> a + x), 6) AS c
        FROM nv a JOIN nv b ON a.label = b.label AND a.vec_id < b.vec_id
    ),
    dom AS (
        SELECT id_b AS vec_id, min(id_a) AS dup_of, max(c) AS max_cosine
        FROM p WHERE c >= {_SEM_TAU} GROUP BY 1
    )
    SELECT e.vec_id,
           d.vec_id IS NULL AS kept,
           coalesce(d.dup_of, -1) AS dup_of,
           d.max_cosine
    FROM embeddings e LEFT JOIN dom d USING (vec_id)
    """,
)
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic pruning (operators/similarity.semantic_dedup):
    within each cluster, drop every vector dominated (cosine ≥ τ) by a
    lower id — keep the minimal elements, a deterministic
    partitioning-invariant policy.  Returns the TOTAL keep/drop map.

    The self-join is bounded to one cluster cell (the SemDeDup design
    point: Σ|cell|² work, never N²); the cosine is an ordered double
    fold rounded to 6 decimals before thresholding on both engines.
    ``dup_of`` is coalesced to -1 for kept rows (a NULL-able int column
    round-trips through pandas as float, muddying the exact hash).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.semantic_dedup(emb, threshold=_SEM_TAU)
    return out.withColumn("dup_of", F.coalesce("dup_of", F.lit(-1)))


@query(
    "temperature_mixture_plan",
    oracle=r"""
    WITH t AS (
        SELECT source,
               len(string_split_regex(trim(lower(text)), '\s+')) AS n_tok
        FROM documents
    ),
    per_src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM t GROUP BY 1
    ),
    z AS (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS z FROM per_src)
    SELECT source, n_docs, n_tokens,
           round(sqrt(CAST(n_tokens AS DOUBLE)) / z, 6) AS weight,
           round(sqrt(CAST(n_tokens AS DOUBLE)) / z * 1000000, 3)
               AS target_tokens,
           round(sqrt(CAST(n_tokens AS DOUBLE)) / z * 1000000 / n_tokens, 6)
               AS epochs
    FROM per_src CROSS JOIN z
    """,
)
def temperature_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture plan (operators/text.temperature_mixture):
    per-source token counts → α=0.5 sampling weights → token allocation
    and epochs under a 1M-token budget — the mBERT/XLM-R mixture rule
    that up-weights small sources without hand-tuned shares (contrast
    ``mix_sources``' fixed targets inside ``union_dedup_documents``).

    One per-source aggregate plus a broadcast scalar; nothing
    corpus-sized shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    with_tok = docs.select(
        "source",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n_tok"))
    return X.temperature_mixture(with_tok, "source", "n_tok",
                                 alpha=0.5, token_budget=1_000_000)
