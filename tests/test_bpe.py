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


def test_bpe_batched_matches_exact_on_random_corpora(spark):
    """The distributed batched trainer must reproduce the exact
    (one-pick-at-a-time Sennrich) merge sequence — the batch selection
    rule's whole job is to make batching invisible."""
    import random

    from barberini_analytics_spark.operators.bpe import (
        _train_exact, _word_table, train_bpe_merges_batched)

    rng = random.Random(7)
    for trial in range(4):
        vocab = ["".join(rng.choices("abcdef", k=rng.randint(2, 7)))
                 for _ in range(30)]
        text = " ".join(rng.choices(vocab, k=300))
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        words = _word_table(df, "text")
        exact = _train_exact(
            sorted((r["w"], r["n"]) for r in words.collect()), 25)
        batched = train_bpe_merges_batched(words, 25, batch_size=8)
        assert batched == exact, f"trial {trial} diverged"


def test_bpe_exact_trainer_is_the_gated_default(spark):
    """Below the word gate train_bpe_merges must use the driver trainer
    and still produce the Sennrich answer (same as the classic test)."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                    + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges = train_bpe_merges(df, 6, max_driver_words=10_000)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"),
                      ("lo", "w"), ("e", "w"), ("ew", "est")]
    # forcing the gate DOWN routes through the distributed batched path
    # and must agree
    assert train_bpe_merges(df, 6, max_driver_words=0) == merges


def test_bpe_arrow_apply_matches_expression_apply(spark):
    """Past arrow_threshold the single-pass mapInPandas encoder takes
    over; on a learned merge list it must tokenize identically to the
    in-order expression replay."""
    import random

    from barberini_analytics_spark.operators.bpe import apply_bpe_arrow

    rng = random.Random(11)
    vocab = ["".join(rng.choices("abcde", k=rng.randint(2, 6)))
             for _ in range(25)]
    text = " ".join(rng.choices(vocab, k=200))
    df = spark.createDataFrame(
        # row 4: non-ASCII whitespace (\xa0,  ) — Java \s does NOT
        # split on these while Python \s does; both paths must agree on
        # Spark's (Java) semantics: "ab\xa0ba" is ONE word
        [(1, text), (2, "aaaa aaa"), (3, None),
         (4, " ab\xa0ba cd \t ae ")],
        "doc_id long, text string")
    merges = train_bpe_merges(df, 20)
    expr = {r.doc_id: r.bpe_tokens
            for r in apply_bpe(df, merges, arrow_threshold=1000).collect()}
    arrow = {r.doc_id: r.bpe_tokens
             for r in apply_bpe_arrow(df, merges).collect()}
    assert expr == arrow
    assert arrow[3] is None
    # and the dispatcher routes long lists to the arrow path
    routed = {r.doc_id: r.bpe_tokens
              for r in apply_bpe(df, merges, arrow_threshold=5).collect()}
    assert routed == expr


def test_bpe_batched_self_chaining_pair_stays_exact(spark):
    """An l==r pair inside a round must close its batch: runs of 'a'
    create (aa, a) pairs whose count is bounded by the pair itself, not
    by any skipped candidate."""
    from barberini_analytics_spark.operators.bpe import (
        _train_exact, _word_table, train_bpe_merges_batched)

    # 'aaa'x30 -> (a,a)=60; 'cd'x25 -> (c,d)=25; after merging (a,a)
    # the new pair (aa,a)=30 must be picked BEFORE (c,d)
    text = " ".join(["aaa"] * 30 + ["cd"] * 25)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    words = _word_table(df, "text")
    exact = _train_exact(
        sorted((r["w"], r["n"]) for r in words.collect()), 3)
    assert exact[:2] == [("a", "a"), ("aa", "a")]
    assert train_bpe_merges_batched(words, 3, batch_size=8) == exact
