"""Training-pipeline operator tests: chunking + contamination screen."""

from __future__ import annotations

import pytest

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
