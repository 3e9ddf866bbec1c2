"""Multimodal plumbing + source parser tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from barberini_analytics_spark.multimodal import media as M
from barberini_analytics_spark.sources import jsonc as J
from barberini_analytics_spark.sources import logs as L
from barberini_analytics_spark.sources import sentiws as SW

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def test_decode_unknown_container_raises(spark):
    """Containers that need external codec libs raise — the honest
    boundary; known lib-free containers decode for real.  (JPEG moved
    to its own optional-Pillow guard in r12 — covered by
    tests/test_real_artifacts.py — so the unknown-magic case here uses
    a container nothing sniffs.)"""
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x00\x00\x18ftypmp42-ish"))],
        "media_id long, data binary")
    with pytest.raises(Exception, match="unsupported media container"):
        M.decode_media(df).collect()


def test_decode_media_header_roundtrip(spark):
    df = M.synth_media(spark, SF)
    out = M.decode_media(df)
    joined = out.join(df.select("media_id", "declared_width",
                                "declared_height"), "media_id")
    bad = joined.filter(
        (F.col("width") != F.col("declared_width"))
        | (F.col("height") != F.col("declared_height"))).count()
    assert bad == 0
    assert out.count() == df.count()


def test_extract_features_shape_and_determinism(spark):
    df = M.synth_media(spark, SF).limit(20)
    a = {r.media_id: r.features for r in
         M.extract_features(df, dim=8).collect()}
    b = {r.media_id: r.features for r in
         M.extract_features(df, dim=8).collect()}
    assert a == b
    assert all(len(v) == 8 and all(0 <= x < 1 for x in v)
               for v in a.values())


def test_sample_frames_fanout(spark):
    df = M.synth_media(spark, SF)
    frames = M.sample_frames(df, every_n=10)
    decoded = M.decode_media(df.filter("kind = 'video'"))
    expected = decoded.select(
        F.sum(F.ceil(F.col("n_frames") / 10))).first()[0]
    assert frames.count() == expected
    # only frame indices on the sampling grid
    assert frames.filter(F.col("frame_index") % 10 != 0).count() == 0


def test_blob_repartition_bytes_budget(spark):
    df = M.synth_media(spark, SF)
    out = M.blob_repartition(df, target_bytes=10_000)
    assert out.rdd.getNumPartitions() > 1


# ---------------------------------------------------------------------------
# SentiWS
# ---------------------------------------------------------------------------

@pytest.fixture()
def sentiws_file(tmp_path):
    p = tmp_path / "SentiWS_v2.0_Positive.txt"
    p.write_text(
        "Aufschwung|NN\t0.0040\tAufschwunges,Aufschwungs,Aufschwünge\n"
        "gut|ADJX\t0.3716\n"
        "schlecht|ADJX\t-0.7706\tschlechte,schlechter\n",
        encoding="utf-8")
    return str(p)


def test_parse_sentiws(spark, sentiws_file):
    rows = {r.word: r for r in
            SW.parse_sentiws(spark, sentiws_file).collect()}
    assert rows["Aufschwung"].pos_tag == "NN"
    assert rows["Aufschwung"].weight == pytest.approx(0.004)
    assert rows["Aufschwung"].inflections == [
        "Aufschwunges", "Aufschwungs", "Aufschwünge"]
    assert rows["gut"].inflections == []
    assert rows["schlecht"].weight == pytest.approx(-0.7706)


def test_sentiws_views(spark, sentiws_file):
    df = SW.parse_sentiws(spark, sentiws_file)
    pol = {r.word: r.polarity
           for r in SW.phrase_polarity_view(df).collect()}
    assert pol == {"Aufschwung": "positive", "gut": "positive",
                   "schlecht": "negative"}
    infl = SW.inflection_view(df)
    got = {(r.word, r.inflected) for r in infl.collect()}
    assert ("schlecht", "schlechte") in got
    assert ("gut", "gut") in got  # base form included


# ---------------------------------------------------------------------------
# logs
# ---------------------------------------------------------------------------

_LOG = """\
INFO: [pid 123] Worker worker_a (salt=1) running FetchThing(param=1)
some noise line
WARNING: request was throttled
ERROR: boom happened
INFO: Informed scheduler that task FetchThing_abc123 has status FAILED
INFO: [pid 123] Worker worker_a (salt=1) running OtherTask(param=2)
WARNING: minor issue
INFO: Informed scheduler that task OtherTask_def456 has status DONE
"""


def test_log_mining(spark, tmp_path):
    (tmp_path / "luigi.log").write_text(_LOG, encoding="utf-8")
    lines = L.read_logs(spark, str(tmp_path / "*.log"))
    events = L.extract_events(lines)
    assert events.filter("task_started IS NOT NULL").count() == 2
    assert events.filter("status = 'FAILED'").count() == 1

    summary = {r.current_task: (r.ERROR, r.WARNING)
               for r in L.error_summary(events).collect()}
    assert summary == {"FetchThing": (1, 1), "OtherTask": (0, 1)}


def test_log_truncation(spark, tmp_path):
    (tmp_path / "big.log").write_text(
        "\n".join(f"line {i}" for i in range(50)), encoding="utf-8")
    lines = L.read_logs(spark, str(tmp_path / "big.log"),
                        max_lines_per_file=10)
    assert lines.count() == 10


# ---------------------------------------------------------------------------
# JSONC
# ---------------------------------------------------------------------------

def test_strip_jsonc():
    src = """{
        // line comment
        "a": 1, /* block
                   comment */
        "url": "http://x//not-a-comment",
        "list": [1, 2, 3,],
    }"""
    import json

    parsed = json.loads(J.strip_jsonc(src))
    assert parsed == {"a": 1, "url": "http://x//not-a-comment",
                      "list": [1, 2, 3]}
