"""Distributed BPE tokenizer training — byte-pair-encoding merge
discovery over a corpus.

Classic word-level BPE (the GPT-2 recipe): training operates on the
WORD-FREQUENCY table, not the corpus — after one aggregation the working
set is bounded by the vocabulary, so a 100 TB corpus trains as fast as
its distinct-word table.  Like every model fit in this repo (GSDMM,
DBSCAN, KNN) the trainer is GATED:

* word table ≤ ``max_driver_words`` → the table is collected and an
  EXACT in-memory Sennrich trainer runs with incremental pair-count
  updates and a lazy-invalidation heap — 32k merges in seconds, one
  Spark job total.  This is the common case: even web-scale corpora
  have vocabularies in the tens of millions, and the table that is
  collected is ``(word, freq)``, never documents.
* above the gate → distributed BATCHED rounds: one pair-count job per
  round discovers up to ``batch_size`` mutually non-interacting merges
  at once, so the job count is O(n_merges / batch_size), not
  O(n_merges) — the round-5 design (one job + one chained persist per
  merge = 32k driver round trips for a real vocabulary) is gone.

Batch-exactness argument (why a batched round equals Sennrich's
one-at-a-time picks): candidates are scanned in global order
(count desc, pair asc) and accepted as a PREFIX that stops at the first
candidate sharing a symbol or merged token with an earlier acceptance;
any pair the batch's merges could newly create has count bounded by an
existing OVERLAPPING pair (an occurrence of ``x·l·r`` is an occurrence
of ``(x, l)``), and every overlapping pair is outside the accepted
prefix, so the trailing guard — drop accepted tails whose count is not
strictly greater than the best non-accepted candidate — makes
interference impossible; self-chaining pairs (``l == r``, whose run
rewrites create pairs bounded by their own count rather than by a
skipped candidate) close their batch.  The differential test
``test_bpe_batched_matches_exact_on_random_corpora`` pins this
empirically against the exact trainer.

``apply_bpe`` replays a learned merge list on any corpus.  Short lists
use a chain of codegen ``aggregate`` folds (no Python); past
``arrow_threshold`` merges the chain would blow janino's 64 KB method
limit (the failure class SCALE.md documents for PQ), so the replay
switches to ONE Arrow ``mapInPandas`` pass with the rank-dict encoder
every tokenizer library uses (merge the lowest-rank pair present,
greedy leftmost, repeat) plus a per-partition word cache — for learned
(self-consistent) merge lists this is equivalent to in-order replay,
pinned by ``test_bpe_arrow_apply_matches_expression_apply``.

Reference analogue: the reference has no tokenizer trainer; this is
LLM-pipeline surface (SURVEY §6 training-data ops).
"""

from __future__ import annotations

import heapq
import re
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

# Pinned to SPARK's tokenization semantics, not Python's: Java regex \s
# is ASCII-only ([ \t\n\x0b\f\r]) while Python \s is unicode-aware, and
# Spark `trim` strips only ASCII spaces while str.strip() strips all
# unicode whitespace — the Arrow encoder must split words exactly like
# the expression path and `_word_table` or apply_bpe's output silently
# differs across the arrow_threshold route for text containing e.g.
# \xa0 (non-breaking space).
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _sql_str(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


# ---------------------------------------------------------------------------
# shared: the word-frequency table
# ---------------------------------------------------------------------------

def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    """``(w, n)`` — distinct lowercased whitespace words with corpus
    frequency; the only aggregate that ever touches the corpus."""
    return (
        df.select(F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# exact in-memory trainer (gated driver path)
# ---------------------------------------------------------------------------

def _train_exact(word_freqs: list[tuple[str, int]],
                 n_merges: int) -> list[tuple[str, str]]:
    """Sennrich's algorithm with incremental pair-count maintenance and
    a lazy-invalidation heap: each round pops the true max pair
    (ties → lexicographically smallest), rewrites only the words that
    contain it, and adjusts counts by the per-word delta."""
    words = [list(w) for w, _ in word_freqs]
    freqs = [n for _, n in word_freqs]
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freqs[i]
            where.setdefault((a, b), set()).add(i)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)

    def push(p: tuple[str, str]) -> None:
        heapq.heappush(heap, (-counts[p], p))

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, pair = heapq.heappop(heap)
        if counts.get(pair, 0) != -negc:       # stale heap entry
            continue
        if -negc < 2:
            break
        merges.append(pair)
        left, right = pair
        merged = left + right
        for i in sorted(where.get(pair, ())):
            syms, f = words[i], freqs[i]
            old = list(zip(syms, syms[1:]))
            out, j = [], 0
            while j < len(syms):
                if (j + 1 < len(syms) and syms[j] == left
                        and syms[j + 1] == right):
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            touched = set()
            for p in old:
                counts[p] -= f
                where[p].discard(i)
                touched.add(p)
            for p in zip(out, out[1:]):
                counts[p] = counts.get(p, 0) + f
                where.setdefault(p, set()).add(i)
                touched.add(p)
            for p in touched:
                if counts.get(p, 0) > 0:
                    push(p)
        counts.pop(pair, None)
        where.pop(pair, None)
    return merges


# ---------------------------------------------------------------------------
# distributed batched trainer (scale path)
# ---------------------------------------------------------------------------

def _batch_fold(pairs: list[tuple[str, str]], symbols_col: str) -> Column:
    """One greedy left-to-right fold applying every pair of a
    non-interacting batch simultaneously (JVM-side, no UDF)."""
    branches = "".join(
        f"WHEN size(acc) > 0 AND element_at(acc, -1) = '{_sql_str(a)}' "
        f"AND s = '{_sql_str(b)}' THEN "
        f"concat(slice(acc, 1, size(acc) - 1), "
        f"array('{_sql_str(a + b)}')) "
        for a, b in pairs)
    return F.expr(
        f"aggregate({symbols_col}, CAST(array() AS array<string>), "
        f"(acc, s) -> CASE {branches}"
        f"ELSE concat(acc, array(s)) END)")


def _select_batch(cands: list, batch_size: int,
                  truncated: bool) -> list[tuple[str, str]]:
    """The exactness-preserving batch: prefix of the globally-ordered
    candidate list, stopping at the first symbol/merged-token overlap,
    trailing pairs dropped unless strictly above the best skipped count,
    self-chaining pairs closing the batch (module docstring argument)."""
    accepted: list[tuple[str, str, int]] = []
    used: set[str] = set()
    next_cnt = 0
    for idx, row in enumerate(cands):
        left, right, cnt = row["l"], row["r"], row["cnt"]
        if cnt < 2 or len(accepted) >= batch_size:
            next_cnt = cnt if cnt >= 2 else 0
            break
        if accepted and (left in used or right in used
                         or (left + right) in used):
            next_cnt = cnt
            break
        accepted.append((left, right, cnt))
        used.update((left, right, left + right))
        if left == right:                      # self-chaining closes it
            next_cnt = cands[idx + 1]["cnt"] if idx + 1 < len(cands) else 0
            break
    else:
        # ran out of collected candidates; if the collect was truncated
        # there may be unseen pairs at the tail count — be conservative
        next_cnt = cands[-1]["cnt"] if truncated and cands else 0
    while len(accepted) > 1 and accepted[-1][2] <= next_cnt:
        accepted.pop()
    return [(a, b) for a, b, _ in accepted]


def train_bpe_merges_batched(words: DataFrame, n_merges: int,
                             batch_size: int = 32) -> list[tuple[str, str]]:
    """Distributed rounds over a ``(w, n)`` word table: one pair-count
    job + one candidate collect (≤ ~4·batch_size rows) + one fold per
    round — O(n_merges / batch_size) jobs.  Each round's folded table is
    ``localCheckpoint``ed, not merely persisted: a chain of persists
    keeps the FULL logical plan alive, so Catalyst re-analyzes a plan
    that grows by one fold per round (quadratic analysis time — measured
    as the dominant cost of a many-round fit), while the checkpoint
    truncates lineage and keeps every round's plan O(1).  The table is
    vocabulary-bounded, so executor-local checkpoint storage holds even
    for a 100 TB corpus (tens of millions of (syms, n) rows)."""
    from ..core.cache import scoped_checkpoint

    top_k = max(4 * batch_size, 64)
    table = scoped_checkpoint(
        words.select(F.expr("split(w, '')").alias("syms"), "n"))
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pairs = (
            table.select(
                F.explode(F.expr(
                    "CASE WHEN size(syms) >= 2 THEN transform("
                    "sequence(1, size(syms) - 1), "
                    "i -> struct(element_at(syms, i) AS l, "
                    "element_at(syms, i + 1) AS r)) "
                    "ELSE array() END")).alias("p"), "n")
            .groupBy("p.l", "p.r").agg(F.sum("n").alias("cnt"))
        )
        cands = pairs.orderBy(F.col("cnt").desc(), F.col("l").asc(),
                              F.col("r").asc()).limit(top_k).collect()
        if not cands or cands[0]["cnt"] < 2:
            break
        batch = _select_batch(cands, min(batch_size,
                                         n_merges - len(merges)),
                              truncated=len(cands) == top_k)
        merges.extend(batch)
        table = scoped_checkpoint(
            table.select(_batch_fold(batch, "syms").alias("syms"), "n"))
    return merges


def train_bpe_merges(df: DataFrame, n_merges: int, text_col: str = "text",
                     batch_size: int = 32,
                     max_driver_words: int = 200_000
                     ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    order.  Deterministic: pair ties break on (left, right) ascending.
    Gated exact driver fit below ``max_driver_words`` distinct words,
    distributed batched rounds above (module docstring)."""
    from ..core.cache import scoped_persist

    # persist BEFORE the gate probe: the probe and the subsequent
    # collect (or batched rounds) would otherwise each recompute the
    # full corpus explode+groupBy — two corpus scans for "one job"
    words = scoped_persist(_word_table(df, text_col))
    probe = words.limit(max_driver_words + 1).count()   # gate+1 probe
    if probe <= max_driver_words:
        rows = words.collect()
        return _train_exact(sorted((r["w"], r["n"]) for r in rows),
                            n_merges)
    return train_bpe_merges_batched(words, n_merges, batch_size)


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _encode_word(word: str, ranks: dict[tuple[str, str], int],
                 cache: dict[str, list[str]]) -> list[str]:
    """Rank-dict BPE encode of one word (lowest-rank pair present,
    greedy leftmost, repeat) with a bounded per-partition cache."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        left, right = best
        merged = left + right
        out, j = [], 0
        while j < len(syms):
            if (j + 1 < len(syms) and syms[j] == left
                    and syms[j + 1] == right):
                out.append(merged)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    if len(cache) >= 100_000:     # bound executor memory on huge vocabs
        cache.clear()
    cache[word] = syms
    return syms


def apply_bpe_arrow(df: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text",
                    out_col: str = "bpe_tokens") -> DataFrame:
    """ONE Arrow ``mapInPandas`` pass replaying the whole merge list —
    the scale path for real (32k-entry) vocabularies, where an
    expression chain would exceed codegen method limits.  Map-only: no
    shuffle, ranks broadcast once per executor."""
    ranks = {p: i for i, p in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    schema = StructType(df.schema.fields
                        + [StructField(out_col, ArrayType(StringType()))])

    def _encode(it: Iterator) -> Iterator:
        rk = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in it:
            toks = []
            for text in pdf[text_col]:
                if text is None:
                    toks.append(None)
                    continue
                out: list[str] = []
                for w in _WS.split(str(text).strip(" ").lower()):
                    if w:
                        out.extend(_encode_word(w, rk, cache))
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    return df.mapInPandas(_encode, schema)


def apply_bpe(df: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text", out_col: str = "bpe_tokens",
              arrow_threshold: int = 48) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list.  Short lists
    replay in order as chained map-only codegen folds (no Python at
    all); past ``arrow_threshold`` the single-pass Arrow encoder takes
    over (module docstring)."""
    if len(merges) > arrow_threshold:
        return apply_bpe_arrow(df, merges, text_col, out_col)
    word_syms = F.transform(
        F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                 lambda w: w != ""),
        lambda w: F.split(w, ""))
    out = df.withColumn("__wsyms", word_syms)
    for left, right in merges:
        a, b = _sql_str(left), _sql_str(right)
        out = out.withColumn("__wsyms", F.expr(
            "transform(__wsyms, syms -> "
            "aggregate(syms, CAST(array() AS array<string>), (acc, s) -> "
            f"IF(size(acc) > 0 AND element_at(acc, -1) = '{a}' "
            f"AND s = '{b}', "
            f"concat(slice(acc, 1, size(acc) - 1), array('{a}{b}')), "
            "concat(acc, array(s)))))"))
    return out.withColumn(out_col, F.flatten("__wsyms")).drop("__wsyms")
