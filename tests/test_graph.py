"""Connected-components + near-dup group resolution tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from barberini_analytics_spark.operators.dedup import near_dup_groups
from barberini_analytics_spark.operators.graph import connected_components


def _cc(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(i,) for i in node_ids], ["id"])
    edges = spark.createDataFrame(edge_pairs or [(None, None)],
                                  "id1 long, id2 long").filter(
        F.col("id1").isNotNull())
    out = connected_components(nodes, edges, **kw)
    return {r.id: r.label for r in out.collect()}


def test_cc_chain_and_singletons(spark):
    # chain 1-2-3-4 plus isolated 10, pair 20-21
    got = _cc(spark, [1, 2, 3, 4, 10, 20, 21],
              [(1, 2), (2, 3), (3, 4), (20, 21)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 20: 20, 21: 20}


def test_cc_long_path_converges(spark):
    # a 20-node path needs ~diameter rounds — well inside max_iter
    n = 20
    got = _cc(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)])
    assert set(got.values()) == {0} and len(got) == n


def test_cc_directed_edges_symmetrized(spark):
    # edges only given one way; symmetrize=True must still merge
    got = _cc(spark, [5, 6, 7], [(7, 6), (6, 5)])
    assert got == {5: 5, 6: 5, 7: 5}


def test_near_dup_groups_transitive(spark):
    # A≈B (share most shingles), B≈C, but A vs C drift further apart —
    # transitivity must still put all three in ONE group; D is unrelated
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, base),
        (2, base + " extra"),
        (3, base.replace("quick", "rapid") + " extra"),
        (4, "completely different content about museums and art exhibits"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r for r in
           near_dup_groups(df, "doc_id", threshold=0.4).collect()}
    assert len(out) == 4                       # total map over all docs
    assert out[1].group_id == out[2].group_id == out[3].group_id == 1
    assert out[4].group_id == 4 and out[4].group_size == 1
    assert out[1].group_size == 3
    reps = [i for i, r in out.items() if r.is_representative]
    assert sorted(reps) == [1, 4]              # one survivor per group
