"""Distributed BPE tokenizer training — byte-pair-encoding merge
discovery over a corpus, in pure DataFrame expressions.

Classic word-level BPE (the GPT-2 recipe): training operates on the
WORD-FREQUENCY table, not the corpus — after one aggregation the working
set is bounded by the vocabulary, so a 100 TB corpus trains as fast as
its distinct-word table.  Each round:

1. explode adjacent symbol pairs of every distinct word, weighted by the
   word's corpus frequency — one hash aggregate;
2. pick the most frequent pair (ties → lexicographically smallest), a
   1-row collect — the only driver data per round;
3. apply the merge to every word's symbol array with a greedy
   left-to-right ``aggregate`` fold — a codegen higher-order function,
   no UDF: ``[a, a, a, a]`` under merge ``(a, a)`` becomes
   ``[aa, aa]`` (non-overlapping, exactly like the reference
   implementation's scan).

``apply_bpe`` replays a learned merge list on any corpus as a chain of
the same fold expressions — map-only, whole-stage-codegen, and usable
for the token-count budgeting every training pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _merge_fold(symbols_col: str, left: str, right: str) -> Column:
    """Greedy left-to-right application of one merge to a symbol array,
    as a single ``aggregate`` fold (JVM-side, no UDF)."""
    a = left.replace("\\", "\\\\").replace("'", "\\'")
    b = right.replace("\\", "\\\\").replace("'", "\\'")
    return F.expr(
        f"aggregate({symbols_col}, CAST(array() AS array<string>), "
        f"(acc, s) -> "
        f"IF(size(acc) > 0 AND element_at(acc, -1) = '{a}' AND s = '{b}', "
        f"concat(slice(acc, 1, size(acc) - 1), array('{a}{b}')), "
        f"concat(acc, array(s))))")


def train_bpe_merges(df: DataFrame, n_merges: int,
                     text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    order.  Deterministic: pair ties break on (left, right) ascending.

    The per-round collect is ONE row (the winning pair) — the word table
    itself never leaves the executors; it is re-persisted per round with
    the merge applied (bounded by the vocabulary, shrinking as merges
    fuse symbols).
    """
    from ..core.cache import scoped_persist

    words = (
        df.select(F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
        .select(F.expr("split(w, '')").alias("syms"), "n")
    )
    words = scoped_persist(words)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            words.select(
                F.explode(F.expr(
                    "CASE WHEN size(syms) >= 2 THEN transform("
                    "sequence(1, size(syms) - 1), "
                    "i -> struct(element_at(syms, i) AS l, "
                    "element_at(syms, i + 1) AS r)) "
                    "ELSE array() END")).alias("p"), "n")
            .groupBy("p.l", "p.r").agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), F.col("l").asc(),
                            F.col("r").asc()).limit(1).collect()
        if not top or top[0]["cnt"] < 2:
            break          # nothing left to merge (all pairs unique)
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        words = scoped_persist(
            words.select(_merge_fold("syms", left, right).alias("syms"),
                         "n"))
    return merges


def apply_bpe(df: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text",
              out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word, start
    from characters and replay every merge in order — a chain of
    map-only fold expressions (no shuffle, no UDF).  Output column is
    the flat token array across the document's words."""
    word_syms = F.transform(
        F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                 lambda w: w != ""),
        lambda w: F.split(w, ""))
    out = df.withColumn("__wsyms", word_syms)
    for left, right in merges:
        a = left.replace("\\", "\\\\").replace("'", "\\'")
        b = right.replace("\\", "\\\\").replace("'", "\\'")
        out = out.withColumn("__wsyms", F.expr(
            "transform(__wsyms, syms -> "
            "aggregate(syms, CAST(array() AS array<string>), (acc, s) -> "
            f"IF(size(acc) > 0 AND element_at(acc, -1) = '{a}' "
            f"AND s = '{b}', "
            f"concat(slice(acc, 1, size(acc) - 1), array('{a}{b}')), "
            "concat(acc, array(s)))))"))
    return out.withColumn(out_col, F.flatten("__wsyms")).drop("__wsyms")
