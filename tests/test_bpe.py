"""Distributed BPE tokenizer training: merge discovery + application."""

from __future__ import annotations

from barberini_analytics_spark.operators.bpe import (apply_bpe,
                                                     train_bpe_merges)


def test_bpe_learns_the_classic_sennrich_merges(spark):
    """The canonical BPE example: 'low'×5, 'lower'×2, 'newest'×6,
    'widest'×3 — merges must come out es, est, lo, low, ew, ewest."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                    + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges = train_bpe_merges(df, 6)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"),
                      ("lo", "w"), ("e", "w"), ("ew", "est")]
    toks = apply_bpe(df, merges).collect()[0].bpe_tokens
    assert toks[:5] == ["low"] * 5
    assert "ewest" in toks and "est" in toks  # newest -> n+ewest, widest -> w,i,d,est


def test_bpe_greedy_merge_is_non_overlapping(spark):
    df = spark.createDataFrame([(1, "aaaa aaaa")], ["doc_id", "text"])
    merges = train_bpe_merges(df, 1)
    assert merges == [("a", "a")]
    toks = apply_bpe(df, merges).collect()[0].bpe_tokens
    assert toks == ["aa", "aa", "aa", "aa"]


def test_bpe_tie_breaks_lexicographically_and_stops_when_done(spark):
    # 'ab' and 'ba' pairs appear equally often -> ('a','b') wins the tie;
    # asking for more merges than exist stops early instead of looping
    df = spark.createDataFrame([(1, "ab ab ba ba")], ["doc_id", "text"])
    merges = train_bpe_merges(df, 10)
    assert merges[0] == ("a", "b")
    assert len(merges) <= 2


def test_bpe_apply_is_partitioning_invariant(spark):
    text = " ".join(["hello"] * 4 + ["help"] * 3)
    df = spark.createDataFrame([(i, text) for i in range(6)],
                               ["doc_id", "text"])
    merges = train_bpe_merges(df, 3)
    a = {r.doc_id: tuple(r.bpe_tokens)
         for r in apply_bpe(df, merges).collect()}
    b = {r.doc_id: tuple(r.bpe_tokens)
         for r in apply_bpe(df.repartition(5), merges).collect()}
    assert a == b and len(set(a.values())) == 1
