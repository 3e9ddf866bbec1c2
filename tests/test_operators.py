"""Unit tests for library operators on crafted fixtures — covers edge cases
the synthetic corpus doesn't reach (multi-sentence text, FK nulls, ties,
empty inputs).  Mirrors the reference's golden-file test level (SURVEY §5.1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from barberini_analytics_spark.operators import dedup as D
from barberini_analytics_spark.operators import relational as R
from barberini_analytics_spark.operators import text as X


def test_tokenize_multi_sentence(spark):
    df = spark.createDataFrame(
        [(1, "Hello world. Second sentence here! And a third?")], ["doc_id", "text"]
    )
    rows = X.tokenize(df, ["doc_id"]).orderBy("word_index").collect()
    words = [r.word for r in rows]
    assert words == ["hello", "world", "second", "sentence", "here", "and", "a", "third"]
    # continuous 1-based word index, per-sentence sentence index
    assert [r.word_index for r in rows] == list(range(1, 9))
    assert [r.sentence_index for r in rows] == [1, 1, 2, 2, 2, 3, 3, 3]


def test_tokenize_empty_and_whitespace(spark):
    df = spark.createDataFrame([(1, "   "), (2, "one")], ["doc_id", "text"])
    rows = X.tokenize(df, ["doc_id"]).collect()
    assert [(r.doc_id, r.word) for r in rows] == [(2, "one")]


def test_ngrams_sentence_bounded(spark):
    df = spark.createDataFrame([(1, "a b c. d e")], ["doc_id", "text"])
    tokens = X.tokenize(df, ["doc_id"])
    grams = X.ngrams(tokens, ["doc_id"], [2], stopwords=()).collect()
    phrases = sorted(g.phrase for g in grams)
    # no bigram spans the sentence boundary (no "c d")
    assert phrases == ["a b", "b c", "d e"]


def test_mode_per_group_tie_breaks_to_smallest(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "b"), (1, "a"), (1, "a"), (2, "z")], ["k", "v"]
    )
    rows = R.mode_per_group(df, ["k"], "v").orderBy("k").collect()
    assert [(r.k, r.most_common_v) for r in rows] == [(1, "a"), (2, "z")]


def test_filter_fkey_violations_null_passthrough(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], ["id", "parent_id"]
    )
    parent = spark.createDataFrame([(10,), (20,)], ["pid"])
    valid, bad = R.filter_fkey_violations(child, parent, [("parent_id", "pid")])
    assert sorted(r.id for r in valid.collect()) == [1, 3]  # null FK passes
    assert [r.id for r in bad.collect()] == [2]


def test_condense_keeps_first_and_changes(spark):
    df = spark.createDataFrame(
        [("k", 1, 5.0), ("k", 2, 5.0), ("k", 3, 6.0), ("k", 4, 6.0), ("k", 5, 5.0)],
        ["key", "seq", "v"],
    )
    kept = R.condense_snapshots(df, ["key"], "seq", ["v"]).orderBy("seq").collect()
    assert [r.seq for r in kept] == [1, 3, 5]


def test_union_dedup_matches_sql_union(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
    b = spark.createDataFrame([(2, "y"), (3, "z")], ["id", "v"])
    out = R.union_dedup(a, b)
    assert out.count() == 3


def test_date_series_inclusive(spark):
    days = R.date_series(spark, "2024-01-30", "2024-02-02").collect()
    assert len(days) == 4


def test_latest_per_key_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 10, "new")], ["k", "ts", "v"]
    ).withColumn("id", F.monotonically_increasing_id())
    # same ts: order falls to the second order column
    out = R.latest_per_key(df, ["k"], ["ts", "v"]).collect()
    assert out[0].v == "old"  # 'old' > 'new' lexicographically


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "just two")], ["doc_id", "text"])
    rows = D.word_shingles(df, "doc_id", k=3).collect()
    assert [r.shingle for r in rows] == ["just two"]


def test_simhash_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
        ["doc_id", "text"],
    )
    sig = {r.doc_id: r.simhash for r in D.simhash(df, "doc_id").collect()}
    assert sig[1] == sig[2]
    assert sig[1] != sig[3]


def test_exact_dedup_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        ["doc_id", "text"],
    )
    groups = {r.rep_id: r.n_dups for r in D.exact_dedup(df, "doc_id").collect()}
    assert groups == {1: 2, 3: 1}


def test_high_watermark_filter_empty_history_admits_all(spark):
    inc = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-02-01")], ["id", "d"]
    ).withColumn("d", F.to_date("d"))
    empty = inc.filter("1 = 0")
    assert R.high_watermark_filter(inc, empty, "d").count() == 2


def test_high_watermark_filter_strictly_newer(spark):
    inc = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-15"), (3, "2024-02-01")], ["id", "d"]
    ).withColumn("d", F.to_date("d"))
    processed = inc.filter("id <= 2")
    got = sorted(r.id for r in R.high_watermark_filter(inc, processed, "d").collect())
    assert got == [3]  # the watermark row itself (=) is NOT reprocessed


def test_anti_processed_drops_known_keys(spark):
    inc = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"])
    known = spark.createDataFrame([(1,), (3,), (3,)], ["id"])
    got = sorted(r.id for r in R.anti_processed(inc, known, ["id"]).collect())
    assert got == [2]


def test_ivf_search_recall_vs_bruteforce(spark):
    from pyspark.sql import functions as F

    from barberini_analytics_spark.core.io import load_table
    from barberini_analytics_spark.operators.similarity import (
        brute_force_topk, centroids_by_key, ivf_search, kmeans_refine)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = (emb.filter(F.col("vec_id") % 10 == 0)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    # the synthetic label cells are not geometric — refine with Lloyd
    # iterations first, as a real IVF build does
    cents0 = centroids_by_key(emb, "label")
    n_cells = cents0.count()
    cents = kmeans_refine(emb, cents0, iters=3)
    k = 10

    exact = brute_force_topk(emb, queries, k=k)
    approx = ivf_search(emb, cents, queries, k=k, nprobe=n_cells // 2)

    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # near-uniform synthetic vectors: probing half the cells must still
    # clearly beat the scanned fraction (0.5) — geometry is doing work
    assert recall >= 0.6, f"recall@{k} too low: {recall:.2f}"

    # probing every cell must reproduce the exact result set
    full = ivf_search(emb, cents, queries, k=k, nprobe=n_cells)
    f = {(r["query_id"], r["vec_id"]) for r in full.collect()}
    assert f == e


def test_asof_join_matches_pandas_merge_asof(spark):
    import pandas as pd

    from barberini_analytics_spark.operators.relational import asof_join

    quotes = pd.DataFrame({
        "sym": ["a"] * 4 + ["b"] * 3,
        "ts": pd.to_datetime([
            "2024-01-01 10:00", "2024-01-01 10:05", "2024-01-01 10:10",
            "2024-01-01 10:30",
            "2024-01-01 10:02", "2024-01-01 10:20", "2024-01-01 10:21"]),
        "px": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0],
    })
    trades = pd.DataFrame({
        "sym": ["a", "a", "a", "b", "b", "c"],
        "ts": pd.to_datetime([
            "2024-01-01 10:03", "2024-01-01 10:05", "2024-01-01 09:00",
            "2024-01-01 10:20", "2024-01-01 11:00", "2024-01-01 10:00"]),
        "qty": [5, 6, 7, 8, 9, 10],
    })
    expect = pd.merge_asof(
        trades.sort_values("ts"), quotes.sort_values("ts"),
        on="ts", by="sym", direction="backward")

    got = asof_join(
        spark.createDataFrame(trades), spark.createDataFrame(quotes),
        on=["sym"]).toPandas()

    merged = expect.merge(
        got.rename(columns={"px": "px_spark"}),
        on=["sym", "ts", "qty"], how="outer")
    assert len(merged) == len(expect) == len(got)
    for _, r in merged.iterrows():
        if pd.isna(r["px"]):
            assert pd.isna(r["px_spark"]), r
        else:
            assert r["px"] == r["px_spark"], r

    # tolerance: the 11:00 'b' trade is 39 min after the last quote
    tol = asof_join(
        spark.createDataFrame(trades), spark.createDataFrame(quotes),
        on=["sym"], tolerance_seconds=600).toPandas()
    late = tol[(tol.sym == "b")
               & (tol.ts == pd.Timestamp("2024-01-01 11:00"))]
    assert late["px"].isna().all()


def test_sample_per_key_deterministic_cap(spark):
    df = spark.createDataFrame(
        [(k, i) for k in ("a", "b") for i in range(20)] + [("c", 0)],
        ["src", "i"])
    got1 = R.sample_per_key(df, ["src"], 5).collect()
    got2 = R.sample_per_key(df, ["src"], 5).collect()
    by_key = {}
    for r in got1:
        by_key.setdefault(r.src, set()).add(r.i)
    assert len(by_key["a"]) == 5 and len(by_key["b"]) == 5
    assert by_key["c"] == {0}                      # under-cap keys intact
    assert sorted(map(tuple, got1)) == sorted(map(tuple, got2))  # stable
    # a different seed draws a different sample
    other = R.sample_per_key(df, ["src"], 5, seed=7).collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, got1))


def test_interval_overlap_join(spark):
    import datetime as dt

    d = dt.date
    left = spark.createDataFrame(
        [("k", d(2024, 1, 1), d(2024, 1, 10), "a"),
         ("k", d(2024, 2, 1), d(2024, 2, 5), "b"),
         ("z", d(2024, 1, 1), d(2024, 1, 10), "c")],
        ["key", "start", "end", "tag"])
    right = spark.createDataFrame(
        [("k", d(2024, 1, 10), d(2024, 1, 20), "x"),   # touches 'a' at the bound
         ("k", d(2024, 1, 11), d(2024, 1, 31), "y"),   # gap: no overlap
         ("k", d(2024, 2, 4), d(2024, 2, 28), "w"),    # overlaps 'b'
         ("q", d(2024, 1, 1), d(2024, 1, 10), "v")],   # other key
        ["key", "start", "end", "tag"])
    got = sorted(
        (r["tag"], r["tag_r"])
        for r in R.interval_overlap_join(
            left, right, ["key"]).collect())
    assert got == [("a", "x"), ("b", "w")]


def test_winnow_fingerprints_locality_and_overlap(spark):
    """MOSS properties: identical docs → identical fingerprint sets; a
    shared long substring → large overlap; a point edit perturbs only
    nearby fingerprints; short docs → NULL."""
    from pyspark.sql import functions as F

    from barberini_analytics_spark.operators.text import winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again"
    edited = base.replace("jumps", "hops!")
    shared = "XYZ " + base[:40]          # long shared prefix chunk
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, edited), (3, shared), (4, "tiny")],
        ["doc_id", "text"])
    fps = {r.doc_id: (set(r.winnow_fps) if r.winnow_fps is not None
                      else None)
           for r in winnow_fingerprints(df).collect()}

    assert fps[0] == fps[1]                      # deterministic
    assert fps[4] is None                        # below k + window - 1
    inter = len(fps[0] & fps[2])
    assert inter > 0.5 * len(fps[0])             # edit is local
    assert fps[0] != fps[2]                      # but detected
    assert len(fps[0] & fps[3]) > 0              # shared chunk found


def test_salted_join_matches_plain_join(spark):
    """Salting must not change join semantics: inner and left results
    equal the unsalted join on a deliberately skewed key distribution."""
    from pyspark.sql import functions as F

    from barberini_analytics_spark.operators.relational import salted_join

    # 90% of left rows share key 0 (the hot key); right covers 0..9 + 99
    left = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id") % 97)
        .alias("k"), F.col("id").alias("v"))
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in list(range(10)) + [99]], ["k", "name"])

    for how in ["inner", "left"]:
        plain = {tuple(r) for r in left.join(right, ["k"], how).collect()}
        salted = {tuple(r) for r in
                  salted_join(left, right, ["k"], salt=8, how=how).collect()}
        assert salted == plain, how

    sem = {tuple(r) for r in
           salted_join(left, right, ["k"], salt=8, how="left_semi").collect()}
    plain_sem = {tuple(r) for r in
                 left.join(right, ["k"], "left_semi").collect()}
    assert sem == plain_sem


def test_salted_aggregate_matches_plain(spark):
    from pyspark.sql import functions as F

    from barberini_analytics_spark.operators.relational import (
        salted_aggregate)

    df = spark.range(0, 20000).select(
        (F.when(F.col("id") % 5 != 0, 0).otherwise(F.col("id") % 7))
        .alias("k"),
        (F.col("id") % 100).alias("v"))
    plain = {(r.k, r.s, r.n, r.lo, r.hi) for r in
             df.groupBy("k").agg(F.sum("v").alias("s"),
                                 F.count("v").alias("n"),
                                 F.min("v").alias("lo"),
                                 F.max("v").alias("hi")).collect()}
    salted = {(r.k, r.s, r.n, r.lo, r.hi) for r in
              salted_aggregate(df, ["k"], {
                  "s": ("v", "sum"), "n": ("v", "count"),
                  "lo": ("v", "min"), "hi": ("v", "max")},
                  salt=8).collect()}
    assert salted == plain


def test_snapshot_intervals_point_in_time_and_one_shuffle(spark):
    """SCD2 contract: intervals tile the key's history — at any probe
    time after a key's first snapshot, the range predicate matches
    exactly one row holding the then-current value; the lead window
    reuses the condense window's shuffle (one Exchange total)."""
    from pyspark.sql import functions as F

    from barberini_analytics_spark.operators.relational import (
        snapshot_intervals)

    rows = [
        # key a: value changes at seq 1, 3, 6 (2 and 4,5 are unchanged)
        ("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 20.0),
        ("a", 4, 20.0), ("a", 5, 20.0), ("a", 6, 15.0),
        # key b: single snapshot, stays current
        ("b", 2, 7.0),
    ]
    df = spark.createDataFrame(rows, "key string, seq int, v double")
    iv = snapshot_intervals(df, ["key"], "seq", ["v"])
    plan = iv._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:1500]

    got = {(r["key"], r["valid_from"]): (r["valid_to"], r["is_current"],
                                         r["v"])
           for r in iv.collect()}
    assert got == {
        ("a", 1): (3, 0, 10.0),
        ("a", 3): (6, 0, 20.0),
        ("a", 6): (None, 1, 15.0),
        ("b", 2): (None, 1, 7.0),
    }
    # point-in-time probes: exactly one interval matches per key
    for t, expect in [(1, 10.0), (2, 10.0), (4, 20.0), (9, 15.0)]:
        hit = iv.filter(
            (F.col("key") == "a") & (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.lit(t) < F.col("valid_to")))
        ).collect()
        assert len(hit) == 1 and hit[0]["v"] == expect, (t, hit)


def test_tfidf_top_terms_hand_computed(spark):
    """3-doc fixture: 'common' appears in all docs (idf = ln(1) = 0, so
    it can never outrank a distinctive word); distinctive words rank by
    tf * ln(3/1); ties break alphabetically."""
    import math

    from barberini_analytics_spark.operators.text import tfidf_top_terms

    rows = [
        ("d1", w) for w in ["common", "apple", "apple", "kiwi"]
    ] + [
        ("d2", w) for w in ["common", "banana"]
    ] + [
        ("d3", w) for w in ["common", "cherry", "date"]
    ]
    tok = spark.createDataFrame(rows, "doc_id string, word string")
    got = {r["doc_id"]: r["tfidf_terms"]
           for r in tfidf_top_terms(tok, k=2).collect()}
    # d1: apple tf=2 (2·ln3) > kiwi (1·ln3) > common (0)
    assert got["d1"] == "apple|kiwi"
    # d2: banana > common (score 0 still ranks above nothing — k=2 keeps it)
    assert got["d2"] == "banana|common"
    # d3: cherry and date tie at 1·ln3 → alphabetical
    assert got["d3"] == "cherry|date"
    assert math.isclose(math.log(3), 1.0986, abs_tol=1e-4)  # sanity


def test_ngram_lm_score_hand_computed_and_ordering(spark):
    """Corpus-typical text scores LOW, gibberish HIGH; exact value pinned
    against a hand-computed add-1 trigram model."""
    import math

    from barberini_analytics_spark.operators.text import ngram_lm_score

    df = spark.createDataFrame(
        [(1, "aaaaaaaaaa"), (2, "aaaaaaaaab"), (3, "xq"),
         (4, "zzqqkkvvww")],
        ["doc_id", "text"])
    got = {r.doc_id: r.lm_score
           for r in ngram_lm_score(df).select("doc_id", "lm_score").collect()}
    # corpus trigram counts: 'aaa'×15, 'aab'×1, plus doc4's 8 unique tris
    # → V = {a,b,q,k,v,w} = 6; C2('aa') = 16; p('aaa') = 16/22
    assert got[1] == round(-math.log(16 / 22), 6)
    # the all-repeat doc is most typical; gibberish least
    assert got[1] < got[2] < got[4]
    assert got[3] is None  # < 3 chars: no trigram evidence


def test_ngram_lm_score_model_join_is_broadcast(spark):
    """The alphabet³-bounded model must reach scoring as a broadcast —
    a shuffle join there would re-shuffle every trigram occurrence."""
    from barberini_analytics_spark.operators.text import ngram_lm_score

    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    plan = ngram_lm_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_ngram_lm_score_int64_codes_match_string_grain(spark):
    """The packed-int64 trigram codes (cp₀<<42 | cp₁<<21 | cp₂) must
    reproduce the string-grain model EXACTLY — multi-script text incl.
    astral code points (> U+FFFF, e.g. 🦜 = U+1F99C) exercises the
    21-bit packing, short/NULL docs the explode(NULL) arm."""
    import math

    from barberini_analytics_spark.operators.text import ngram_lm_score

    docs = [(1, "grüße aus potsdam"), (2, "  padded  "),
            (3, "🦜🦜🦜 papagei 🦜"), (4, "ab"), (5, None), (6, "ααβγδε")]

    # string-sliced reference of the same add-1 trigram model
    tri_counts: dict = {}
    doc_tris: dict = {}
    for i, t in docs:
        lt = t.strip().lower() if t is not None else None
        ts = ([lt[j:j + 3] for j in range(len(lt) - 2)]
              if lt is not None and len(lt) >= 3 else [])
        doc_tris[i] = ts
        for x in ts:
            tri_counts[x] = tri_counts.get(x, 0) + 1
    c2: dict = {}
    for x, c in tri_counts.items():
        c2[x[:2]] = c2.get(x[:2], 0) + c
    vv = len({x[2] for x in tri_counts})
    logp = {x: math.log((c + 1.0) / (c2[x[:2]] + 1.0 * vv))
            for x, c in tri_counts.items()}
    expected = {
        i: (round(-sum(logp[x] for x in ts) / len(ts), 6) if ts else None)
        for i, ts in doc_tris.items()}

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.lm_score
           for r in ngram_lm_score(df).select("doc_id", "lm_score").collect()}
    assert got == expected
