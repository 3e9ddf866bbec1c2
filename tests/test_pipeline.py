"""End-to-end ``FillDb`` pipeline: both cadences, run twice, idempotent.

Mirrors the reference's post-run schema assertions
(``tests/schema/check_posts.py:20-103``): expected sources present,
(source, post_id) unique, permalinks present and URL-shaped — plus the
table-level idempotence the sink design promises (re-running a cadence
leaves every warehouse table value-identical).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from barberini_analytics_spark.pipeline import (
    fill_db, fill_db_daily, fill_db_hourly)

SF_DIR = "/root/testdata/sf0.001"


def _table_state(spark, warehouse: str) -> dict[str, tuple[int, int]]:
    """(row count, order-independent value checksum) per warehouse table."""
    state = {}
    for name in sorted(os.listdir(warehouse)):
        df = spark.read.parquet(os.path.join(warehouse, name))
        row_hash = F.xxhash64(*[F.col(c).cast("string") for c in
                                sorted(df.columns)])
        agg = df.agg(F.count(F.lit(1)),
                     F.sum(row_hash.cast("decimal(38,0)"))).first()
        state[name] = (agg[0], agg[1])
    return state


def test_fill_db_both_cadences_twice_is_idempotent(spark, tmp_path):
    wh = str(tmp_path / "warehouse")
    os.makedirs(wh)

    first = fill_db(spark, SF_DIR, wh)
    assert first and all(n > 0 for n in first.values()), first
    state_1 = _table_state(spark, wh)

    # second full run: hourly + daily again, same inputs
    second = fill_db(spark, SF_DIR, wh)
    assert second == first
    state_2 = _table_state(spark, wh)
    assert state_2 == state_1

    # and each cadence alone is also a no-op on re-run
    fill_db_hourly(spark, SF_DIR, wh)
    fill_db_daily(spark, SF_DIR, wh)
    assert _table_state(spark, wh) == state_1

    # every stage's output table actually landed
    expected_tables = {
        "post", "post_aspect", "post_sentiment", "post_topic",
        "visitor_prediction", "pipeline_diagnostics",
        "fb_post", "fb_post_performance", "gomus_customer", "gomus_order",
    }
    assert expected_tables <= set(state_1)

    # ---- reference check_posts.py invariants over the built warehouse
    post = spark.read.parquet(os.path.join(wh, "post"))

    # test_post_sources: the expected platforms all reached the view
    sources = {r.source for r in post.select("source").distinct().collect()}
    assert {"Facebook Post", "Instagram", "Twitter",
            "Google Play", "Apple Appstore", "Google Maps"} <= sources

    # test_post_unique: (source, post_id) is a key
    dupes = (post.groupBy("source", "post_id").count()
             .filter("count <> 1").count())
    assert dupes == 0

    # test_permalink_missing / _valid: permalinks present and URL-shaped
    assert post.filter(F.col("permalink").isNull()).count() == 0
    bad = post.filter(~F.col("permalink").rlike(r"^https?://\S+$")).count()
    assert bad == 0

    # diagnostics table is keyed by (cadence, table): re-runs updated in
    # place, never appended
    diag = spark.read.parquet(os.path.join(wh, "pipeline_diagnostics"))
    assert (diag.groupBy("cadence", "table_name").count()
            .filter("count <> 1").count()) == 0
    assert {r.cadence for r in diag.select("cadence").distinct().collect()} \
        == {"daily", "hourly"}


def test_curate_to_shards_end_to_end(spark, sf_dir, tmp_path):
    """One call: raw documents parquet -> curated JSONL training shards
    per split, idempotent across re-runs."""
    import glob
    import json as _json

    from barberini_analytics_spark.pipeline import curate_to_shards

    out = str(tmp_path / "corpus")
    counts = curate_to_shards(spark, sf_dir, out, shard_tokens=2_000,
                              lm_quantile=None)
    assert counts["train"] > 0
    assert sum(counts.values()) > 0
    files = glob.glob(f"{out}/train/shard=*/part-*.json")
    assert files
    rec = _json.loads(open(files[0]).readline())
    # `shard` lives in the partition directory (shard=N), not the record
    assert {"doc_id", "text", "n_tokens", "copy_id"} <= set(rec)
    # idempotence: identical counts and identical shard assignment
    counts2 = curate_to_shards(spark, sf_dir, out, shard_tokens=2_000,
                               lm_quantile=None)
    assert counts2 == counts
    back = spark.read.json(f"{out}/train")
    pairs = {(r.doc_id, r.shard) for r in back.select("doc_id", "shard")
             .collect()}
    assert len(pairs) == counts["train"]


def test_curate_stage_profile_matches_fused_pipeline(spark):
    """The per-stage profiler runs the SAME stage list as curate_corpus
    (one _curation_stages definition serves both), so its final rows_out
    must equal the fused pipeline's count, stage names must cover the
    full recipe in order, and gate/dedup stages can only shrink the
    corpus (rows_out <= rows_in) until the copy-attach."""
    from barberini_analytics_spark.core.io import load_table
    from barberini_analytics_spark.operators.curation import (
        curate_corpus, curate_stage_profile)

    docs = load_table(spark, SF_DIR, "documents")
    before = {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs()
              .keySet().toArray()}
    prof = curate_stage_profile(docs, source_col="source", scrub=True,
                                shard_tokens=50_000)
    # no-leak contract: boundary checkpoints are freed as the next one
    # materializes, and stage-INTERNAL scoped checkpoints (per-round
    # label propagation) are released via the scope mark on exit — a
    # standalone profiler call must pin nothing for the session
    after = {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs()
             .keySet().toArray()}
    assert after <= before, f"profiler leaked persisted RDDs: {after - before}"
    assert [p["stage"] for p in prof] == [
        "scrub", "gates", "exact_dedup", "segment_dedup", "near_dup",
        "mix", "split", "pack"]
    for p in prof:
        assert p["sec"] >= 0 and p["loadavg1m"] is not None
        # checkpointed boundaries bound every stage's plan tree to ONE
        # stage — the r9 persist-only profiler compounded self-join
        # subtrees past the JVM's 1 GiB plan-string limit (1.14e9 chars
        # at this very SF); any lineage leak would show up here first
        assert 0 < p["plan_chars"] < 2_000_000, (p["stage"],
                                                 p["plan_chars"])
        if p["stage"] in ("scrub", "gates", "exact_dedup",
                          "segment_dedup", "near_dup"):
            assert p["rows_out"] <= p["rows_in"], p
        if p["stage"] in ("split", "pack"):  # grain-preserving stages
            assert p["rows_out"] == p["rows_in"], p
    # boundaries chain: each stage consumes the previous stage's output
    for a, b in zip(prof, prof[1:]):
        assert a["rows_out"] == b["rows_in"]
    fused = curate_corpus(docs, source_col="source", scrub=True,
                          shard_tokens=50_000).count()
    assert prof[-1]["rows_out"] == fused
