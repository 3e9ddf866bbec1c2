"""Training-pipeline operator tests: chunking, contamination screen,
hash splitting, and token-budgeted shard packing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from barberini_analytics_spark.operators.dedup import cross_corpus_overlap
from barberini_analytics_spark.operators.text import chunk_documents


def test_chunking_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    rows = chunk_documents(df, "doc_id", max_tokens=10, overlap=2).collect()
    assert len(rows) == 1
    assert (rows[0].chunk_index, rows[0].n_chunk_tokens,
            rows[0].chunk_text) == (0, 3, "a b c")


def test_chunking_stride_overlap_and_total_coverage(spark):
    words = [f"w{i}" for i in range(25)]
    df = spark.createDataFrame([(7, " ".join(words))], ["doc_id", "text"])
    rows = sorted(chunk_documents(df, "doc_id", max_tokens=10,
                                  overlap=3).collect(),
                  key=lambda r: r.chunk_index)
    # stride 7: starts 0, 7, 14, 21
    assert [r.chunk_index for r in rows] == [0, 1, 2, 3]
    assert rows[0].chunk_text.split() == words[0:10]
    assert rows[1].chunk_text.split() == words[7:17]
    assert rows[3].chunk_text.split() == words[21:25]   # short tail
    assert rows[3].n_chunk_tokens == 4
    # overlap: consecutive chunks share exactly `overlap` tokens
    assert rows[0].chunk_text.split()[-3:] == rows[1].chunk_text.split()[:3]
    # no token lost
    seen = set()
    for r in rows:
        seen.update(r.chunk_text.split())
    assert seen == set(words)


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", max_tokens=8, overlap=8)


def test_contamination_screen_directional_containment(spark):
    eval_text = "the quick brown fox jumps over the lazy dog"
    train = spark.createDataFrame(
        [
            # contains the whole eval doc verbatim inside more text
            (1, "prefix words " + eval_text + " suffix words here"),
            # shares a fragment only
            (2, "the quick brown fox went elsewhere entirely today"),
            # unrelated
            (3, "museum analytics pipelines process visitor data"),
        ],
        ["doc_id", "text"])
    evalset = spark.createDataFrame([(100, eval_text)], ["doc_id", "text"])
    out = {r.train_id: r for r in
           cross_corpus_overlap(train, evalset, "doc_id", k=3,
                                min_overlap=0.2).collect()}
    # eval doc has 7 distinct 3-gram shingles; doc 1 contains all of them
    assert out[1].eval_containment == pytest.approx(1.0)
    assert out[1].n_shared == 7
    # doc 2 shares exactly the 2 leading shingles -> 2/7 ≈ 0.29
    assert out[2].n_shared == 2
    assert out[2].eval_containment == pytest.approx(2 / 7)
    assert 3 not in out


def test_chunking_emits_no_fully_redundant_chunk(spark):
    # 22 tokens, max 10, overlap 3 (stride 7): a start at 21 would emit a
    # 1-token chunk already contained in the chunk starting at 14
    words = [f"w{i}" for i in range(22)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(chunk_documents(df, "doc_id", max_tokens=10,
                                  overlap=3).collect(),
                  key=lambda r: r.chunk_index)
    assert [r.chunk_index for r in rows] == [0, 1, 2]
    assert rows[2].chunk_text.split() == words[14:22]


def test_hash_split_deterministic_and_proportional(spark):
    from barberini_analytics_spark.operators.text import hash_split

    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: r.split for r in
         hash_split(df, [0.8, 0.1, 0.1], "doc_id", seed=7).collect()}
    b = {r.doc_id: r.split for r in
         hash_split(df.repartition(13), [0.8, 0.1, 0.1], "doc_id",
                    seed=7).collect()}
    assert a == b, "split must be partitioning-invariant"
    counts = [sum(1 for v in a.values() if v == i) for i in range(3)]
    assert abs(counts[0] / 5000 - 0.8) < 0.03
    assert abs(counts[1] / 5000 - 0.1) < 0.02
    assert abs(counts[2] / 5000 - 0.1) < 0.02
    # a different seed reshuffles membership
    c = {r.doc_id: r.split for r in
         hash_split(df, [0.8, 0.1, 0.1], "doc_id", seed=8).collect()}
    assert c != a


def test_token_shard_packing_budgets_and_determinism(spark):
    from barberini_analytics_spark.operators.text import assign_token_shards

    rng = np.random.default_rng(3)
    docs = [(int(i), int(t)) for i, t in
            enumerate(rng.integers(1, 400, size=2000))]
    max_doc = max(t for _, t in docs)
    target = 5_000
    df = spark.createDataFrame(docs, ["doc_id", "n_tokens"])
    out = assign_token_shards(df, "n_tokens", "doc_id", target).collect()
    assert len(out) == len(docs)

    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append((r.doc_id, r.n_tokens))
    # every shard except possibly the last lands inside the budget band
    sizes = {s: sum(t for _, t in rows) for s, rows in by_shard.items()}
    last = max(sizes)
    for s, tot in sizes.items():
        assert tot < target + max_doc
        if s != last:
            assert tot > target - max_doc
    # shards are contiguous runs of the packing order
    shard_of = {d: r for (d, _), r in
                zip(sorted(docs), [r.shard for r in sorted(
                    out, key=lambda r: r.doc_id)])}
    order = [shard_of[d] for d, _ in sorted(docs)]
    assert order == sorted(order)
    # partitioning-invariant
    again = assign_token_shards(df.repartition(17), "n_tokens", "doc_id",
                                target).collect()
    assert {(r.doc_id, r.shard) for r in again} == \
        {(r.doc_id, r.shard) for r in out}


def test_training_shard_export_roundtrip(spark, tmp_path):
    """pack → export → read back: shard directories are self-contained
    JSONL, the read-back corpus is exactly the input, and the per-file
    record cap holds."""
    import glob
    import json as _json

    from barberini_analytics_spark.core.sinks import write_training_shards
    from barberini_analytics_spark.operators.text import assign_token_shards

    docs = spark.createDataFrame(
        [(i, 40 + (i * 7) % 50, f"text {i}") for i in range(200)],
        ["doc_id", "n_tokens", "text"])
    packed = assign_token_shards(docs, "n_tokens", "doc_id", 1_000,
                                 out_col="shard")
    out = str(tmp_path / "shards")
    write_training_shards(packed, out, "shard", max_records_per_file=5)

    shard_dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(shard_dirs) > 3
    # JSONL inside, honoring the record cap
    for f in glob.glob(f"{shard_dirs[0]}/part-*.json"):
        lines = open(f).read().splitlines()
        assert 0 < len(lines) <= 5
        _json.loads(lines[0])
    back = spark.read.json(out)
    got = {(r.doc_id, r.n_tokens, r.text) for r in back.collect()}
    assert got == {(i, 40 + (i * 7) % 50, f"text {i}") for i in range(200)}


def test_dedup_keep_best_keeps_highest_score(spark):
    from barberini_analytics_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, 0.2), (2, base + " extra", 0.9), (3, base + " extra", 0.5),
        (10, "completely different text about museums and art", 0.1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")
    out = D.dedup_keep_best(df, "doc_id", "score", k=3, num_perm=8,
                            bands=4, threshold=0.3).toPandas()
    kept = set(out.doc_id)
    assert 2 in kept          # best of the near-dup group
    assert 1 not in kept and 3 not in kept
    assert 10 in kept         # singleton survives
    assert out[out.doc_id == 2].group_size.iloc[0] >= 2


def test_incremental_dedup_only_new_content_survives(spark):
    from barberini_analytics_spark.operators import dedup as D

    corpus = spark.range(500).selectExpr(
        "id AS doc_id", "'corpus doc number ' || CAST(id AS STRING) AS text")
    fps, bloom = D.fingerprint_index(corpus, "doc_id", m_bits=1 << 14)
    new = spark.range(1000).selectExpr(
        "id + 10000 AS doc_id",
        # first 200 replicate corpus content (different ids), rest new
        "CASE WHEN id < 200 THEN 'corpus doc number ' || CAST(id AS STRING)"
        " ELSE 'fresh crawl doc ' || CAST(id AS STRING) END AS text")
    kept = D.incremental_dedup(new, fps, bloom, "doc_id")
    got = sorted(r.doc_id for r in kept.collect())
    assert got == list(range(10200, 11000))
    assert kept.columns == ["doc_id", "text"]


def test_incremental_dedup_normalizes_whitespace(spark):
    from barberini_analytics_spark.operators import dedup as D

    corpus = spark.createDataFrame(
        [(1, "Hello   World")], "doc_id long, text string")
    fps, bloom = D.fingerprint_index(corpus, "doc_id")
    new = spark.createDataFrame(
        [(2, "hello world"), (3, "goodbye world")],
        "doc_id long, text string")
    kept = D.incremental_dedup(new, fps, bloom, "doc_id").collect()
    assert [r.doc_id for r in kept] == [3]  # 2 is a normalized dup


def test_assign_token_shards_no_nulls_at_scale(spark):
    """Regression (sf0.1 oracle sweep): the totals job and the window job
    must see the SAME partition ids — AQE re-coalescing the range
    exchange between the two executions renumbered pids, missed the
    offset map, and produced NULL shards on 74% of rows."""
    from barberini_analytics_spark.operators.text import assign_token_shards

    df = spark.range(200_000).selectExpr(
        "id AS doc_id", "CAST(1 + id % 37 AS LONG) AS n_tokens")
    out = assign_token_shards(df, "n_tokens", "doc_id", 10_000)
    assert out.filter("shard IS NULL").count() == 0
    # exact parity with a single-partition reference cumsum
    got = {r.doc_id: r.shard for r in out.collect()}
    ref = df.coalesce(1).selectExpr(
        "doc_id",
        "CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " - n_tokens) / 10000.0) AS LONG) AS shard").collect()
    assert got == {r.doc_id: r.shard for r in ref}


# ---------------------------------------------------------------------------
# corpus-level segment dedup (CCNet line dedup / C4 boilerplate removal)
# ---------------------------------------------------------------------------

def _seg_rows(spark, docs, **kw):
    from barberini_analytics_spark.operators.dedup import dedup_segments

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {r.doc_id: r for r in dedup_segments(df, "doc_id", **kw).collect()}


def test_dedup_segments_keep_first_and_reassembly(spark):
    # newline-separated "paragraphs"; "SHARED" appears in all three docs
    docs = [
        (1, "alpha one\nSHARED LINE\nbeta two"),
        (2, "SHARED LINE\ngamma three"),
        (3, "delta four\nSHARED LINE"),
    ]
    out = _seg_rows(spark, docs, sep=r"\n")
    # first global occurrence of the shared line is (doc 1, index 1)
    assert out[1].n_segments == 3 and out[1].n_kept_first == 3
    assert out[1].text_kept_first == "alpha one SHARED LINE beta two"
    # later occurrences dropped, original order of survivors preserved
    assert out[2].n_kept_first == 1
    assert out[2].text_kept_first == "gamma three"
    assert out[3].n_kept_first == 1
    assert out[3].text_kept_first == "delta four"
    # boilerplate counter: only the shared line crosses min_docs=2
    assert (out[1].n_common_segments, out[2].n_common_segments,
            out[3].n_common_segments) == (1, 1, 1)


def test_dedup_segments_fully_duplicated_doc_empties(spark):
    docs = [(1, "same line"), (2, "same line")]
    out = _seg_rows(spark, docs, sep=r"\n")
    assert out[1].text_kept_first == "same line"
    assert out[2].n_kept_first == 0
    assert out[2].text_kept_first == ""


def test_dedup_segments_within_doc_repeat_collapses(spark):
    # the same line twice INSIDE one document: keep-first also dedups
    # intra-document repetition (second occurrence is not first globally)
    docs = [(5, "x y\nx y\nz")]
    out = _seg_rows(spark, docs, sep=r"\n")
    assert out[5].n_segments == 3
    assert out[5].n_kept_first == 2
    assert out[5].text_kept_first == "x y z"
    # both copies of "x y" count as common within one doc?  No: min_docs
    # counts DISTINCT documents, so intra-doc repetition is not boilerplate
    assert out[5].n_common_segments == 0


def test_dedup_segments_token_blocks_mode(spark):
    # 10-token blocks: craft two docs sharing their first block exactly
    block = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    docs = [(1, block + " tail one"), (2, block + " other words here")]
    out = _seg_rows(spark, docs)  # sep=None -> 10-token blocks
    assert out[1].n_segments == 2 and out[1].n_kept_first == 2
    assert out[2].n_segments == 2 and out[2].n_kept_first == 1
    assert out[2].text_kept_first == "other words here"
    assert out[1].n_common_segments == 1 == out[2].n_common_segments


def test_dedup_segments_blank_runs_dropped(spark):
    docs = [(1, "a\n\n\nb")]
    out = _seg_rows(spark, docs, sep=r"\n")
    assert out[1].n_segments == 2
    assert out[1].text_kept_first == "a b"


# ---------------------------------------------------------------------------
# deterministic corpus mixing (source reweighting)
# ---------------------------------------------------------------------------

def test_mix_sources_rates_and_determinism(spark):
    from barberini_analytics_spark.operators.text import mix_sources

    rows = [(i, "a" if i < 800 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "text_source"])
    targets = {"a": 0.5, "b": 0.5}  # rebalance 800/200 -> 500/500
    out = mix_sources(df, "text_source", targets, seed=3)
    got = out.groupBy("text_source").agg(
        F.sum("n_copies").alias("tot")).collect()
    tot = {r.text_source: r.tot for r in got}
    # expectation = 500 per source; hash uniform keeps it within a few %
    assert abs(tot["a"] - 500) < 50 and abs(tot["b"] - 500) < 50
    # source b upsamples: rate 2.5 -> every doc gets >= 2 copies
    assert out.filter("text_source = 'b' AND n_copies < 2").count() == 0
    # source a downsamples: rate 0.625 -> copies in {0, 1}
    assert out.filter("text_source = 'a' AND n_copies > 1").count() == 0
    # partitioning-invariant: same counts after a reshuffle
    re = mix_sources(df.repartition(13), "text_source", targets, seed=3)
    assert {(r.doc_id, r.n_copies) for r in re.select("doc_id", "n_copies").collect()} \
        == {(r.doc_id, r.n_copies) for r in out.select("doc_id", "n_copies").collect()}


def test_mix_sources_drops_untargeted_sources(spark):
    from barberini_analytics_spark.operators.text import mix_sources

    df = spark.createDataFrame(
        [(1, "keep"), (2, "keep"), (3, "drop_me")],
        ["doc_id", "text_source"])
    out = mix_sources(df, "text_source", {"keep": 1.0})
    got = {r.doc_id: r.n_copies for r in out.collect()}
    assert got[3] == 0
    # kept source redistributes the full corpus size (rate 3/2 = 1.5)
    assert got[1] + got[2] >= 2


# ---------------------------------------------------------------------------
# end-to-end curation pipeline
# ---------------------------------------------------------------------------

def test_curate_corpus_every_stage_fires(spark):
    from barberini_analytics_spark.operators.curation import curate_corpus

    block = " ".join(f"b{i}" for i in range(10))
    a_text = " ".join(f"a{i}" for i in range(12))
    docs = spark.createDataFrame([
        (1, a_text, "s0"),                                   # survives
        (2, a_text, "s0"),                                   # exact dup of 1
        (3, block + " c0 c1 c2 c3 c4", "s0"),                # 1st block owner
        (4, block + " d0 d1 d2 d3 d4 d5", "s1"),             # loses the block
        (5, " ".join(f"n{i}" for i in range(14)), "s1"),     # near-dup, shorter
        (6, "m0 " + " ".join(f"n{i}" for i in range(1, 16)), "s1"),  # longest
        (7, "tiny doc", "s0"),                               # < min_tokens
    ], ["doc_id", "text", "source"])

    out = curate_corpus(docs, source_col="source", min_tokens=5,
                        lm_quantile=None, shard_tokens=8).collect()
    rows = {r.doc_id: r for r in out}
    assert set(rows) == {1, 3, 4, 6}
    # boilerplate block stripped from the later doc, kept in the earlier
    assert rows[4].text == "d0 d1 d2 d3 d4 d5"
    assert rows[3].text.startswith(block)
    # n_tokens recomputed after segment removal
    assert rows[4].n_tokens == 6
    # near-dup group collapsed to its longest member
    assert rows[6].group_size == 2
    # split/shard assigned everywhere
    assert all(r.split in (0, 1, 2) and r.shard is not None for r in out)
    assert all(r.copy_id == 1 for r in out)
    # near_dup_max_bucket plumbing reaches the LSH join: a cap larger
    # than any bucket on this corpus is a no-op (identical output), and
    # a cap of 0 excludes every bucket so near-dup grouping finds
    # nothing — doc 5 (the shorter near-dup) then survives too
    capped = curate_corpus(docs, source_col="source", min_tokens=5,
                           lm_quantile=None, shard_tokens=8,
                           near_dup_max_bucket=1_000).collect()
    assert {(r.doc_id, r.text, r.split, r.shard) for r in capped} == \
        {(r.doc_id, r.text, r.split, r.shard) for r in out}
    no_lsh = curate_corpus(docs, source_col="source", min_tokens=5,
                           lm_quantile=None, shard_tokens=8,
                           near_dup_max_bucket=0).collect()
    assert {r.doc_id for r in no_lsh} == {1, 3, 4, 5, 6}


def test_curate_corpus_lm_gate_drops_gibberish(spark):
    from barberini_analytics_spark.operators.curation import curate_corpus

    normal = [(i, "the cat sat on the mat and saw the dog", "s0")
              for i in range(20)]
    docs = spark.createDataFrame(
        normal + [(99, "zx qv jq kx wq vz xj qk zv jx", "s0")],
        ["doc_id", "text", "source"])
    out = curate_corpus(docs, source_col="source", min_tokens=3,
                        lm_quantile=0.9, near_dup_threshold=1.01).collect()
    ids = {r.doc_id for r in out}
    assert 99 not in ids           # the LM gate rejects the outlier
    assert 0 in ids                # exact dedup keeps one typical doc
    # all 20 normal docs are identical -> exact dedup collapses to doc 0
    assert ids == {0}


def test_curate_corpus_mixing_replicates(spark):
    from barberini_analytics_spark.operators.curation import curate_corpus

    docs = spark.createDataFrame(
        [(i, f"unique text number {i} with plenty of extra words "
             + " ".join(f"u{i}x{j}" for j in range(8)),
          "big" if i < 40 else "small") for i in range(50)],
        ["doc_id", "text", "source"])
    out = curate_corpus(docs, source_col="source", min_tokens=3,
                        lm_quantile=None,
                        targets={"big": 0.5, "small": 0.5}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # small source (10 docs) upsamples toward 25 copies; big downsamples
    assert len(by_src["small"]) > 10
    assert len(by_src["big"]) < 40
    # copies of one doc share their split (no train/eval leakage)
    splits = {}
    for r in out:
        splits.setdefault(r.doc_id, set()).add(r.split)
    assert all(len(s) == 1 for s in splits.values())


def test_curate_corpus_lm_gate_passes_unscoreable_docs(spark):
    """NULL lm_score means "too short to score", not "bad": with
    min_tokens lowered so a 2-char doc reaches the LM gate, it must
    survive (NULL <= q three-valued logic must not silently drop it)."""
    from barberini_analytics_spark.operators.curation import curate_corpus

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "a"),
         (2, "a clean and fluent sentence about the museum hall", "a"),
         (3, "ab", "a")],   # 1 token, 2 chars -> lm_score NULL
        "doc_id long, text string, source string")
    out = curate_corpus(docs, source_col="source", min_tokens=1,
                        lm_quantile=0.99, targets=None).toPandas()
    assert 3 in set(out["doc_id"])
    assert out.loc[out["doc_id"] == 3, "lm_score"].isna().all()


def test_semantic_dedup_domination_policy(spark):
    """Chain a~b~c (but a!~c): the keep-minimal policy keeps only a —
    b is dominated by a, c by b — and cross-cluster pairs never meet."""
    from barberini_analytics_spark.operators.similarity import semantic_dedup

    # 2-d vectors, cluster 0: three unit vectors at 0°, 25°, 50° —
    # cos(25°)≈0.906 ≥ 0.9, cos(50°)≈0.643 < 0.9.  cluster 1: a copy of
    # vector a that must NOT dominate anything in cluster 0.
    import math
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [math.cos(math.radians(25)), math.sin(math.radians(25))], 0),
        (3, [math.cos(math.radians(50)), math.sin(math.radians(50))], 0),
        (4, [1.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = {r["vec_id"]: r for r in
           semantic_dedup(emb, threshold=0.9).collect()}
    assert out[1]["kept"] and out[4]["kept"]
    assert not out[2]["kept"] and out[2]["dup_of"] == 1
    assert not out[3]["kept"] and out[3]["dup_of"] == 2
    assert out[1]["dup_of"] is None and out[1]["max_cosine"] is None


def test_temperature_mixture_flattens_and_sums_to_one(spark):
    """α=0.5 weights ∝ sqrt(tokens): a 100×-larger source gets only
    10× the weight; weights sum to 1; epochs = alloc/available."""
    from barberini_analytics_spark.operators.text import temperature_mixture

    docs = spark.createDataFrame(
        [("big", 10000), ("small", 100)], "source string, n_tok int")
    out = {r["source"]: r for r in
           temperature_mixture(docs, "source", "n_tok",
                               token_budget=1000).collect()}
    assert abs(out["big"]["weight"] / out["small"]["weight"] - 10.0) < 1e-4
    assert abs(out["big"]["weight"] + out["small"]["weight"] - 1.0) < 1e-5
    assert abs(out["small"]["epochs"]
               - out["small"]["target_tokens"] / 100) < 1e-6
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        temperature_mixture(docs, "source", "n_tok", alpha=0.3)


# ---------------------------------------------------------------------------
# Gopher quality rules (operators/text.gopher_quality_filter)
# ---------------------------------------------------------------------------

def _gopher_rows(spark, texts):
    from barberini_analytics_spark.operators.text import gopher_quality_filter

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    return {r.doc_id: r for r in gopher_quality_filter(df).collect()}


def test_gopher_rules_fire_individually(spark):
    good = ("the data and that point be to of have with great value "
            + " ".join(f"word{i} item{i} note{i}" for i in range(20)))
    # 72 words, stopwords present, no repeated n-grams
    rows = _gopher_rows(spark, [
        good,                                    # 0: passes everything
        "short text only",                       # 1: word count
        good + " ###### ##### ##### #####",      # 2: symbol ratio
        "\n".join(["- bullet line"] * 20),       # 3: bullets (and others)
        good.replace("value", "value..."),       # 4: still fine (few ...)
    ])
    assert rows[0].keep
    assert not rows[1].rule_word_count and not rows[1].keep
    assert not rows[2].rule_symbol_ratio and not rows[2].keep
    assert rows[3].bullet_line_frac == 1.0 and not rows[3].rule_bullets
    assert rows[4].rule_ellipsis   # 12/72 words end with ... but 1 line


def test_gopher_line_signals_and_ellipsis(spark):
    text = "a good line of the data\n- one bullet\nthis trails off...\n\n"
    r = _gopher_rows(spark, [text])[0]
    # 3 non-empty lines: 1 bullet-started, 1 ellipsis-terminated
    assert r.bullet_line_frac == pytest.approx(1 / 3)
    assert r.ellipsis_line_frac == pytest.approx(1 / 3)
    assert not r.rule_word_count          # 13 words < 50
    assert r.rule_bullets and r.rule_ellipsis is False


def test_gopher_alpha_and_mean_length_rules(spark):
    digits = " ".join(["12345"] * 60)      # no alphabetic words, mean 5
    r = _gopher_rows(spark, [digits])[0]
    assert r.alpha_word_frac == 0.0 and not r.rule_alpha_words
    assert r.rule_mean_word_len and r.rule_word_count
    assert not r.keep


def test_gopher_repetition_ceilings(spark):
    looped = " ".join(["spam ham"] * 40)   # one bigram dominates
    r = _gopher_rows(spark, [looped])[0]
    assert r.top_bigram_frac > 0.18 and not r.rule_top_bigram
    assert r.dup_trigram_frac > 0.30 and not r.rule_dup_trigram
    assert not r.keep


# ---------------------------------------------------------------------------
# int8 quantization (operators/similarity.quantize_int8)
# ---------------------------------------------------------------------------

def test_quantize_int8_roundtrip_and_zero_vector(spark):
    from barberini_analytics_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 127.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"])
    rows = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert rows[1].scale == pytest.approx(1.0)
    assert rows[1].codes == [1, 0, 0, 127]     # -0.5/1.0+0.5 floors to 0
    assert rows[2].scale == 0.0 and rows[2].codes == [0, 0, 0, 0]
    # codes stay inside int8 range by construction
    assert all(-128 <= c <= 127 for c in rows[1].codes)


def test_quantize_int8_error_bounded_by_half_step(spark):
    from barberini_analytics_spark.operators.similarity import (
        dequantize_int8, quantize_int8)

    vals = [(i, [((i * 31 + j * 17) % 1009 - 504) / 504.0
                 for j in range(16)]) for i in range(50)]
    df = spark.createDataFrame(vals, ["vec_id", "embedding"])
    out = quantize_int8(df).withColumn(
        "err", F.array_max(F.zip_with(
            F.col("embedding"),
            dequantize_int8(F.col("codes"), F.col("scale")),
            lambda x, y: F.abs(x - y))))
    for r in out.select("scale", "err").collect():
        assert r.err <= r.scale / 2 + 1e-12   # half a quantization step


# ---------------------------------------------------------------------------
# stratified sampling (operators/curation)
# ---------------------------------------------------------------------------

def _strata_df(spark):
    rows = [(i, "a" if i % 3 else "b", f"t{i}") for i in range(300)]
    return spark.createDataFrame(rows, ["id", "grp", "text"])


def test_stratified_sample_exact_quota_and_determinism(spark):
    from barberini_analytics_spark.operators.curation import stratified_sample

    df = _strata_df(spark)
    out = stratified_sample(df, ["grp"], 0.25, "id")
    got = out.groupBy("grp").count().collect()
    import math
    want = {"a": math.ceil(0.25 * 200), "b": math.ceil(0.25 * 100)}
    assert {r.grp: r["count"] for r in got} == want
    # deterministic + partitioning-invariant membership
    ids1 = sorted(r.id for r in out.select("id").collect())
    ids2 = sorted(r.id for r in stratified_sample(
        df.repartition(13), ["grp"], 0.25, "id").select("id").collect())
    assert ids1 == ids2


def test_stratified_sample_fraction_override(spark):
    from barberini_analytics_spark.operators.curation import stratified_sample

    df = _strata_df(spark)
    out = stratified_sample(df, ["grp"], 0.1, "id",
                            fractions={("b",): 1.0})
    got = {r.grp: r["count"] for r in out.groupBy("grp").count().collect()}
    assert got == {"a": 20, "b": 100}


def test_stratified_sample_threshold_binomial_and_no_window(spark):
    from barberini_analytics_spark.operators.curation import (
        stratified_sample_threshold)

    df = _strata_df(spark)
    out = stratified_sample_threshold(df, ["grp"], 0.3, "id")
    n = out.count()
    # binomial bound: 90 ± 5·sqrt(90·0.7) ≈ ±45 (generous, deterministic
    # hash either passes or fails forever — this pins gross correctness)
    assert 45 <= n <= 135
    assert "stratum_n" in out.columns
    # scale path: the plan must not contain a window (the whole point)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# deterministic epoch ordering (operators/curation.epoch_order/epoch_shards)
# ---------------------------------------------------------------------------

def test_epoch_order_is_deterministic_and_varies_by_epoch(spark):
    from barberini_analytics_spark.operators.curation import epoch_order

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    o1 = [r.doc_id for r in epoch_order(df, "doc_id", epoch=1)
          .orderBy("epoch_rank").collect()]
    o1b = [r.doc_id for r in epoch_order(df.repartition(7), "doc_id", 1)
           .orderBy("epoch_rank").collect()]
    o2 = [r.doc_id for r in epoch_order(df, "doc_id", epoch=2)
          .orderBy("epoch_rank").collect()]
    assert o1 == o1b                      # partitioning-invariant
    assert sorted(o1) == sorted(o2) == list(range(200))
    assert o1 != o2                       # epochs reshuffle
    # a real permutation, not a rotation of the id order
    assert o1[:20] != list(range(20))


def test_epoch_shards_cover_and_rank_within_shard(spark):
    from barberini_analytics_spark.operators.curation import epoch_shards

    df = spark.range(300).withColumnRenamed("id", "doc_id")
    out = epoch_shards(df, "doc_id", epoch=3, n_shards=8).collect()
    assert len(out) == 300
    by_shard = {}
    for r in out:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    # every shard's positions are 1..n contiguous
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # roughly uniform (uniform hash: 300/8 = 37.5 +- wide margin)
    assert all(15 <= len(v) <= 70 for v in by_shard.values())


# ---------------------------------------------------------------------------
# unicode scrubbing (operators/text.scrub_text)
# ---------------------------------------------------------------------------

def test_scrub_text_normalizes_and_flags_mojibake(spark):
    from barberini_analytics_spark.operators.text import scrub_text

    rows = [
        (1, "caf\u00c3\u00a9 and \u00e2\u0080\u0093 dash"),
        (2, "a\u00a0b c\u3000d"),
        (3, "\u201cq\u201d \u2018x\u2019 \u2013\u2014 \u2026 end"),
        (4, "zero\u200bwidth\u200c and ctrl\u0007char\ttab kept"),
        (5, "plain ascii stays"),
    ]
    out = {r.doc_id: r for r in scrub_text(
        spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
    # mojibake is FLAGGED (quarantine contract), not silently altered
    assert out[1].mojibake_hits == 2
    assert "\u00c3" in out[1].text
    assert out[2].text == "a b c d" and out[2].mojibake_hits == 0
    assert out[3].text == "\"q\" 'x' -- ... end"
    assert out[4].text == "zerowidth and ctrlchar\ttab kept"
    assert out[5].text == "plain ascii stays"


def test_curate_corpus_scrub_and_gopher_stages(spark):
    """Stage 0 (scrub + mojibake quarantine) and the optional Gopher gate
    compose with the rest of the recipe: damaged docs are quarantined,
    rule-violating docs are gated, clean long docs survive end-to-end
    with normalized text feeding the dedup fingerprints."""
    from barberini_analytics_spark.operators.curation import curate_corpus

    good = ("the data and that point be to of have with great value "
            + " ".join(f"word{i} item{i} note{i}" for i in range(20)))
    rows = [
        (1, good + ' he said "yes"'),
        # same text with curly quotes: scrub normalizes them to ASCII,
        # so the fingerprint collides with doc 1 (exact dedup drops it)
        (2, good + " he said “yes”"),
        (3, "cafÃ© " + good),          # mojibake -> quarantined
        (4, "too short to pass gopher rules"),   # word-count gate
        (5, good.replace("value", "treasure")),  # distinct survivor
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate_corpus(df, min_tokens=5, lm_quantile=None,
                        near_dup_threshold=0.99,  # keep 1 vs 5 distinct
                        scrub=True, gopher=True)
    ids = sorted(r.doc_id for r in out.collect())
    # 2 deduped against 1 (scrub made them byte-identical), 3 quarantined,
    # 4 gated; near-dup threshold set high so 1 vs 5 both survive
    assert ids == [1, 5]


def test_ccnet_buckets_per_language_terciles(spark):
    """Head/middle/tail are assigned within each language's own score
    distribution; unscoreable docs land in tail."""
    from barberini_analytics_spark.operators.curation import ccnet_buckets

    # two languages with very different fluency mixes: per-language
    # bucketing must still split each language ~in thirds
    import random
    rnd = random.Random(5)
    rows = []
    for i in range(60):
        fluent = "the cat sat on the mat and then the cat sat again " * 2
        noisy = "".join(rnd.choice("qxzjvkw ") for _ in range(90))
        mixed = fluent[:50] + noisy[:40]
        rows.append((i, "en", [fluent, mixed, noisy][i % 3]))
    for i in range(60, 120):
        rows.append((i, "de", "der hund und die katze und der hund " * 3
                     if i % 2 else "zzzqqqxxx " * 9))
    rows.append((999, "en", "ab"))          # < 3 chars -> NULL score
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = ccnet_buckets(df)
    got = {r.doc_id: r.ccnet_bucket for r in out.collect()}
    assert got[999] == "tail"
    from collections import Counter
    en = Counter(got[i] for i in range(60))
    de = Counter(got[i] for i in range(60, 120))
    # every bucket is populated per language, head is the fluent third
    assert set(en) == {"head", "middle", "tail"}
    assert len(set(de.values())) >= 1 and set(de) <= {"head", "middle",
                                                      "tail"}
    # the repeated-fluent-text docs (i % 3 == 0) dominate the en head
    head_en = [i for i in range(60) if got[i] == "head"]
    assert head_en and all(i % 3 == 0 for i in head_en)
    # rows preserved (bucketing filters nothing)
    assert len(got) == 121


def test_stratified_sample_rejects_partial_override_key(spark):
    from barberini_analytics_spark.operators.curation import stratified_sample

    df = _strata_df(spark).withColumn("lang", F.lit("en"))
    with pytest.raises(ValueError, match="must name all strata"):
        stratified_sample(df, ["grp", "lang"], 0.5, "id",
                          fractions={("a",): 1.0})


def test_corpus_report_datasheet_rates(spark):
    from barberini_analytics_spark.operators.curation import corpus_report

    good = ("the data and that point be to of have with great value "
            + " ".join(f"word{i} item{i} note{i}" for i in range(20)))
    rows = [
        (1, "a", good),
        (2, "a", good),                    # exact dup of 1
        (3, "a", "short junk"),            # fails gopher word count
        (4, "b", "cafÃ© " + good),    # mojibake, src b
        (5, "b", good.replace("value", "gem")),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    rep = {r.source: r for r in corpus_report(df).collect()}
    a, b = rep["a"], rep["b"]
    assert a.n_docs == 3 and b.n_docs == 2
    assert a.exact_dup_rate == pytest.approx(2 / 3)
    assert b.exact_dup_rate == 0.0
    assert a.gopher_keep_rate == pytest.approx(2 / 3)
    assert b.mojibake_rate == pytest.approx(1 / 2)
    assert a.mojibake_rate == 0.0
    # quarantine DISPOSITION, not just the signal average: the count of
    # docs stage 0 of the curation pipeline would drop per group
    assert a.n_quarantined == 0 and b.n_quarantined == 1
    assert a.n_tokens == 72 + 72 + 2


def test_repetition_signals_total_on_tiny_docs(spark):
    """Regression: 1-2-token documents used to hit Spark's descending
    sequence(1, 0) and crash with element_at(tokens, 0)."""
    from barberini_analytics_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "three word doc"), (4, " ")],
        ["doc_id", "text"])
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert rows[1].top_bigram_frac is None
    # one bigram total -> the top one is all of them
    assert rows[2].top_bigram_frac == 1.0 and rows[2].dup_trigram_frac is None
    assert rows[3].dup_trigram_frac == 0.0


def test_lsh_max_bucket_guards_degenerate_buckets(spark):
    """The 100 TB hot-bucket guard: a band value shared by b documents
    emits b(b-1)/2 candidate pairs, so one degenerate bucket (here: 40
    IDENTICAL documents whose every band collides) turns the bucket
    join quadratic.  With max_bucket the oversized buckets are excluded
    before the self-join; genuinely similar pairs in small buckets
    still come through, and default None preserves classic semantics."""
    from barberini_analytics_spark.operators.dedup import (
        minhash_signatures, lsh_candidate_pairs, word_shingles)

    boiler = "the same boilerplate text repeated across every mirror page"
    distinct = ("an unusual sentence about cadmium pigments in painting "
                "restoration workflows")
    rows = [(i, boiler) for i in range(40)]
    rows += [(100, distinct), (101, distinct + " extended")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = minhash_signatures(word_shingles(df, "doc_id"), "doc_id")

    classic = lsh_candidate_pairs(sigs, "doc_id", bands=4).collect()
    classic_pairs = {(r.id_a, r.id_b) for r in classic}
    assert (100, 101) in classic_pairs
    assert len(classic_pairs) >= 40 * 39 / 2          # quadratic blow-up

    capped = lsh_candidate_pairs(sigs, "doc_id", bands=4,
                                 max_bucket=10).collect()
    capped_pairs = {(r.id_a, r.id_b) for r in capped}
    assert (100, 101) in capped_pairs                 # small bucket kept
    assert not any(a < 100 and b < 100 for a, b in capped_pairs), (
        "hot-bucket pairs leaked through the cap")


def test_srp_max_bucket_guards_degenerate_buckets(spark):
    """Same guard on the embedding side: a dense region (here 30
    IDENTICAL vectors) floods every band bucket; with max_bucket those
    buckets are excluded while a genuinely similar small pair
    survives."""
    import numpy as np

    from barberini_analytics_spark.operators.similarity import (
        srp_candidate_pairs)

    rng = np.random.default_rng(3)
    hot = [float(x) for x in rng.normal(0, 1, 64)]
    a = [float(x) for x in rng.normal(0, 1, 64)]
    b = [x + float(e) for x, e in zip(a, rng.normal(0, 0.01, 64))]
    rows = [(i, hot) for i in range(30)] + [(100, a), (101, b)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    classic = {(r.id1, r.id2) for r in srp_candidate_pairs(df).collect()}
    assert (100, 101) in classic
    assert len(classic) >= 30 * 29 / 2

    capped = {(r.id1, r.id2)
              for r in srp_candidate_pairs(df, max_bucket=10).collect()}
    assert (100, 101) in capped
    assert not any(i < 100 and j < 100 for i, j in capped)


# ---------------------------------------------------------------------------
# exact substring-span dedup (Lee et al. 2021 grain)
# ---------------------------------------------------------------------------

def _span_rows(spark, docs, k):
    from barberini_analytics_spark.operators.dedup import dedup_spans

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {r.doc_id: r for r in dedup_spans(df, "doc_id", k=k).collect()}


def test_dedup_spans_removes_copied_passage_exactly(spark):
    # doc b embeds tokens 5..16 of doc a (12 tokens) inside unique text;
    # block-grain segment dedup would miss this (the copy starts mid-block)
    a = [f"w{i}" for i in range(20)]
    b = ["x0", "x1", "x2"] + a[5:17] + ["y0", "y1"]
    out = _span_rows(spark, [("a", " ".join(a)), ("b", " ".join(b)),
                             ("c", "entirely unrelated tokens only")], k=8)
    # keep-first: the original is untouched
    assert out["a"].n_dup_spans == 0
    assert out["a"].text_span_deduped == " ".join(a)
    # the copy is removed at its exact 12-token extent, nothing more
    assert out["b"].n_dup_spans == 1
    assert out["b"].n_dup_span_tokens == 12
    assert out["b"].n_dup_kgrams == 12 - 8 + 1
    assert out["b"].text_span_deduped == "x0 x1 x2 y0 y1"
    assert out["c"].n_dup_spans == 0


def test_dedup_spans_straddling_block_boundary_caught(spark):
    # the case that motivates span grain: a 10-token copy placed so it
    # straddles a 10-token block boundary in the copying doc — block-grain
    # dedup_segments sees no duplicate block, span dedup sees the copy
    from barberini_analytics_spark.operators.dedup import dedup_segments

    a = [f"a{i}" for i in range(30)]
    copied = a[0:10]
    b = [f"b{i}" for i in range(5)] + copied + [f"c{i}" for i in range(5)]
    docs = [("a", " ".join(a)), ("b", " ".join(b))]
    seg = {r.doc_id: r for r in dedup_segments(
        spark.createDataFrame(docs, ["doc_id", "text"]),
        "doc_id", tokens_per_segment=10).collect()}
    assert seg["b"].n_kept_first == seg["b"].n_segments  # blocks blind
    out = _span_rows(spark, docs, k=10)
    assert out["b"].n_dup_spans == 1
    assert out["b"].n_dup_span_tokens == 10
    assert out["b"].text_span_deduped == \
        " ".join([f"b{i}" for i in range(5)] + [f"c{i}" for i in range(5)])


def test_dedup_spans_adjacent_and_overlapping_hits_merge(spark):
    # two copied passages separated by ONE unique token stay two spans;
    # back-to-back copies merge into one maximal span
    a = [f"s{i}" for i in range(8)]
    b = [f"t{i}" for i in range(8)]
    gap_doc = a + ["u0"] + b                   # two spans
    fused_doc = a + b                          # one maximal span
    # keep-first is global (doc_id, pos) order — name originals so they
    # sort first
    out = _span_rows(spark, [
        ("a1", " ".join(a)), ("a2", " ".join(b)),
        ("gap", " ".join(gap_doc)), ("fused", " ".join(fused_doc)),
    ], k=8)
    assert out["gap"].n_dup_spans == 2
    assert out["gap"].n_dup_span_tokens == 16
    assert out["gap"].text_span_deduped == "u0"
    assert out["fused"].n_dup_spans == 1
    assert out["fused"].n_dup_span_tokens == 16
    assert out["fused"].text_span_deduped == ""


def test_dedup_spans_intra_document_repeat(spark):
    # a doc repeating its own opening: the SECOND occurrence is the dup
    a = [f"r{i}" for i in range(8)]
    doc = a + ["mid"] + a
    out = _span_rows(spark, [("solo", " ".join(doc))], k=8)
    assert out["solo"].n_dup_spans == 1
    assert out["solo"].n_dup_span_tokens == 8
    assert out["solo"].text_span_deduped == " ".join(a + ["mid"])


def test_dedup_spans_short_and_empty_docs_pass_through(spark):
    out = _span_rows(spark, [("short", "only three tokens"),
                             ("empty", "   ")], k=8)
    assert out["short"].n_dup_spans == 0
    assert out["short"].text_span_deduped == "only three tokens"
    assert out["empty"].n_dup_spans == 0
    assert out["empty"].text_span_deduped == ""


def test_dedup_spans_partitioning_invariant(spark):
    import random

    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(40)]
    base = [" ".join(rng.choices(vocab, k=rng.randint(4, 30)))
            for _ in range(30)]
    # plant copies: doc i>=30 embeds a slice of doc i-30
    docs = [(f"d{i}", t) for i, t in enumerate(base)]
    docs += [(f"d{i + 30}", "pre " + t + " post") for i, t in enumerate(base)]
    df1 = spark.createDataFrame(docs, ["doc_id", "text"])
    df8 = df1.repartition(8)
    from barberini_analytics_spark.operators.dedup import dedup_spans

    r1 = {tuple(r) for r in dedup_spans(df1, "doc_id", k=5).collect()}
    r8 = {tuple(r) for r in dedup_spans(df8, "doc_id", k=5).collect()}
    assert r1 == r8


def test_curate_corpus_span_dedup_stage(spark):
    from barberini_analytics_spark.operators.curation import curate_corpus

    # doc 1 is the original; doc 2 embeds a 12-token passage of doc 1
    # between unique halves (NOT aligned to the 10-token segment grid, so
    # the block stage alone cannot remove it); doc 3 is entirely a copy
    # of doc 1's interior plus nothing else — fully covered, must drop
    # out at the span stage; doc 4 is independent.
    a = [f"a{i}" for i in range(30)]
    copied = a[7:19]
    d2 = [f"x{i}" for i in range(9)] + copied + [f"y{i}" for i in range(9)]
    docs = spark.createDataFrame([
        (1, " ".join(a), "s0"),
        (2, " ".join(d2), "s0"),
        (3, " ".join(a[5:25]), "s0"),
        (4, " ".join(f"z{i}" for i in range(20)), "s1"),
    ], ["doc_id", "text", "source"])

    out = curate_corpus(docs, source_col="source", min_tokens=5,
                        lm_quantile=None, span_k=10).collect()
    rows = {r.doc_id: r for r in out}
    # without span_k doc 2 keeps the copied passage — blocks are blind
    # to the straddling copy (doc 3, a pure subset, still dies later at
    # the near-dup stage; the span stage catches it EXACTLY, earlier)
    base = {r.doc_id: r for r in curate_corpus(
        docs, source_col="source", min_tokens=5,
        lm_quantile=None).collect()}
    assert " ".join(copied) in base[2].text
    # with span_k: exact-extent cut, fully-covered doc gone
    assert set(rows) == {1, 2, 4}
    assert rows[2].text == " ".join(
        [f"x{i}" for i in range(9)] + [f"y{i}" for i in range(9)])
    assert rows[2].n_tokens == 18
    assert rows[1].text == " ".join(a)   # keep-first: original intact


def test_curate_stage_profile_includes_span_stage(spark):
    from barberini_analytics_spark.operators.curation import (
        curate_stage_profile)

    a = [f"p{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [(1, " ".join(a), "s0"),
         (2, "q0 q1 " + " ".join(a[3:23]) + " q2 q3", "s0"),
         (3, " ".join(f"r{i}" for i in range(25)), "s1")],
        ["doc_id", "text", "source"])
    prof = curate_stage_profile(docs, source_col="source",
                                lm_quantile=None, span_k=10)
    stages = [p["stage"] for p in prof]
    assert "span_dedup" in stages
    i = stages.index("span_dedup")
    assert stages[i - 1] == "segment_dedup" and stages[i + 1] == "near_dup"
    span_row = prof[i]
    assert span_row["rows_in"] == 3 and span_row["rows_out"] == 3
    assert span_row["plan_chars"] < 2_000_000


def test_curate_corpus_trained_quality_gate(spark):
    """The trained webtext filter composes into stage 1: junk documents
    that sail past the heuristic gates (long enough, alphabetic, LM gate
    off) are dropped by the classifier; clean docs and the rest of the
    pipeline are untouched."""
    import random

    from barberini_analytics_spark.ml.logreg import (
        train_quality_classifier)
    from barberini_analytics_spark.operators.curation import curate_corpus

    rng = random.Random(5)
    clean_v = ["museum", "opens", "new", "exhibition", "modern", "art",
               "guided", "tours", "visitors", "enjoy", "paintings"]
    junk_v = ["click", "here", "buy", "now", "free", "winner", "spam",
              "offer", "cash", "prize"]
    labeled = spark.createDataFrame(
        [(i, " ".join(rng.choices(clean_v, k=15)), 1.0)
         for i in range(80)]
        + [(i + 80, " ".join(rng.choices(junk_v, k=15)), 0.0)
           for i in range(80)],
        ["doc_id", "text", "label"])
    model = train_quality_classifier(labeled, "doc_id", "label",
                                     dim=64, iters=12)

    target = spark.createDataFrame([
        (1, " ".join(rng.choices(clean_v, k=20)), "s0"),
        (2, " ".join(rng.choices(junk_v, k=20)), "s0"),
        (3, " ".join(rng.choices(clean_v, k=20)), "s1"),
    ], ["doc_id", "text", "source"])
    base = {r.doc_id for r in curate_corpus(
        target, source_col="source", min_tokens=5,
        lm_quantile=None).collect()}
    assert base == {1, 2, 3}          # heuristics alone keep the junk
    gated = {r.doc_id for r in curate_corpus(
        target, source_col="source", min_tokens=5, lm_quantile=None,
        quality_model=model).collect()}
    assert gated == {1, 3}


def test_dedup_spans_drop_all_policy(spark):
    """policy='drop_all' is the paper's exact semantics: EVERY copy of
    a corpus-repeated passage goes, including the first occurrence."""
    from barberini_analytics_spark.operators.dedup import dedup_spans

    a = [f"w{i}" for i in range(8)]
    docs = spark.createDataFrame([
        ("a1", " ".join(a + ["tail1"])),
        ("b1", " ".join(["head2"] + a)),
        ("c1", " ".join(f"u{i}" for i in range(10))),
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           dedup_spans(docs, "doc_id", k=8, policy="drop_all").collect()}
    assert out["a1"].text_span_deduped == "tail1"     # first copy ALSO cut
    assert out["b1"].text_span_deduped == "head2"
    assert out["c1"].n_dup_spans == 0
    kept = {r.doc_id: r for r in
            dedup_spans(docs, "doc_id", k=8).collect()}
    assert kept["a1"].text_span_deduped == " ".join(a + ["tail1"])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dedup_spans(docs, "doc_id", k=8, policy="nope").collect()


def test_planted_span_corpus_ground_truth(spark):
    """The scale-curve generator's planted duplication is exactly what
    span dedup must find: one span per carrier document after each
    template's global first occurrence, at the exact passage extent —
    the invariant the bench/SCALE.md curves rely on to call a run
    correct, not just fast."""
    from pyspark.sql import functions as F

    from barberini_analytics_spark.core.synthdata import planted_span_corpus
    from barberini_analytics_spark.operators.dedup import dedup_spans

    n_docs, n_templates, passage = 2_000, 100, 30
    corpus = planted_span_corpus(spark, n_docs, n_templates=n_templates,
                                 passage_tokens=passage)
    agg = dedup_spans(corpus, "doc_id", k=20).agg(
        F.sum("n_dup_spans").alias("spans"),
        F.sum("n_dup_span_tokens").alias("cut"),
        F.max("n_dup_span_tokens").alias("max_cut")).first()
    planted = n_docs // 10 - n_templates  # carriers minus global firsts
    assert agg["spans"] == planted
    # extents are the planted passage, except the rare boundary bleed:
    # two same-template carriers whose hash-scattered filler happens to
    # agree on the token right at a passage edge extend that span by
    # one (~pairs/vocab per edge — single digits per 100k docs, kept
    # because a collision-free vocabulary would de-realism the corpus)
    assert planted * passage <= agg["cut"] <= int(planted * passage * 1.01)
    assert passage <= agg["max_cut"] <= 2 * passage
    # k above the passage length finds nothing (filler never repeats)
    none = dedup_spans(corpus, "doc_id", k=40).agg(
        F.sum("n_dup_spans")).first()[0]
    assert none == 0


def test_hot_bucket_corpus_shape(spark):
    """One degenerate bucket of n/20 identical docs, everything else
    unique — the geometry the LSH max_bucket guard is measured on."""
    from pyspark.sql import functions as F

    from barberini_analytics_spark.core.synthdata import hot_bucket_corpus

    corpus = hot_bucket_corpus(spark, 400)
    counts = (corpus.groupBy("text").count()
              .agg(F.max("count").alias("mx"),
                   F.count(F.lit(1)).alias("distinct_texts")).first())
    assert counts["mx"] == 20          # 400/20 identical members
    assert counts["distinct_texts"] == 381  # 380 unique + 1 boilerplate


def test_cumulative_shuffle_bytes_observes_an_exchange(spark):
    """The AppStatusStore probe must move when a shuffle runs and not
    when a map-only job runs — the property the bench's per-run
    shuffle-byte deltas depend on."""
    from pyspark.sql import functions as F

    from barberini_analytics_spark.core.metrics import (
        cumulative_shuffle_bytes)

    base = cumulative_shuffle_bytes(spark)
    assert isinstance(base, int) and base >= 0
    spark.range(200_000).select(F.col("id") * 2).write \
        .format("noop").mode("overwrite").save()
    after_map = cumulative_shuffle_bytes(spark)
    spark.range(200_000).groupBy(F.pmod("id", F.lit(1000)).alias("k")) \
        .count().write.format("noop").mode("overwrite").save()
    after_shuffle = cumulative_shuffle_bytes(spark)
    assert after_map == base, "map-only job must not add shuffle bytes"
    assert after_shuffle > after_map, "groupBy must add shuffle bytes"
