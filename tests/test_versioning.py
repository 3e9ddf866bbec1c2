"""Versioned snapshot tables: time travel, commit atomicity, change feed."""

from __future__ import annotations

import os

import pytest

from barberini_analytics_spark.core import versioning as V


def _write(spark, path, rows):
    df = spark.createDataFrame(rows, ["k", "val"])
    return V.write_version(df, str(path))


def test_time_travel_reads_each_committed_snapshot(spark, tmp_path):
    p = tmp_path / "t"
    p.mkdir()
    assert V.latest_version(str(p)) is None
    v1 = _write(spark, p, [(1, "a"), (2, "b")])
    v2 = _write(spark, p, [(1, "a2"), (3, "c")])
    assert (v1, v2) == (1, 2)
    assert V.latest_version(str(p)) == 2
    assert V.list_versions(str(p)) == [1, 2]
    old = {r.k: r.val for r in V.read_version(spark, str(p), 1).collect()}
    new = {r.k: r.val for r in V.read_version(spark, str(p)).collect()}
    assert old == {1: "a", 2: "b"}
    assert new == {1: "a2", 3: "c"}


def test_orphaned_snapshot_is_not_readable(spark, tmp_path):
    p = tmp_path / "t"
    p.mkdir()
    _write(spark, p, [(1, "a")])
    # simulate a crashed writer: snapshot dir exists, marker not swapped
    df = spark.createDataFrame([(9, "orphan")], ["k", "val"])
    df.write.parquet(os.path.join(str(p), "_versions", "v=000002"))
    assert V.latest_version(str(p)) == 1            # commit point unmoved
    with pytest.raises(ValueError):
        V.read_version(spark, str(p), 2)
    # the next commit SKIPS the orphan (it may be a live concurrent
    # writer's reservation, not a crash) and moves the marker past it
    v = _write(spark, p, [(1, "b")])
    assert v == 3
    assert V.latest_version(str(p)) == 3
    assert {r.val for r in V.read_version(spark, str(p)).collect()} == {"b"}


def test_change_feed_insert_update_delete_and_null_flip(spark, tmp_path):
    p = tmp_path / "t"
    p.mkdir()
    _write(spark, p, [(1, "same"), (2, "gone"), (3, "old"), (4, None)])
    _write(spark, p, [(1, "same"), (3, "new"), (4, "notnull"), (5, "born")])
    feed = {r.k: (r.change, r.val)
            for r in V.change_feed(spark, str(p), ["k"], 1, 2).collect()}
    assert feed == {
        2: ("delete", None),
        3: ("update", "new"),
        4: ("update", "notnull"),   # NULL -> value counts as update
        5: ("insert", "born"),
    }
    # unchanged key 1 is absent from the feed
    assert 1 not in feed


def test_write_version_skips_reserved_snapshot_dirs(spark, tmp_path):
    """A concurrently-reserved (or crashed-writer) v=N dir must not be
    reused: the next writer skips past it, and the marker still only
    advances to what was actually committed."""
    import os

    from barberini_analytics_spark.core import versioning as V

    p = str(tmp_path / "tbl")
    assert V.write_version(spark.range(3), p) == 1
    # simulate another writer that reserved v=2 but has not committed
    os.mkdir(os.path.join(p, "_versions", "v=000002"))
    v = V.write_version(spark.range(5), p)
    assert v == 3
    assert V.latest_version(p) == 3
    assert V.read_version(spark, p).count() == 5
    assert V.read_version(spark, p, 1).count() == 3
    # the skipped reservation now sits BELOW latest; time-traveling to it
    # must be refused (no _SUCCESS — it was never committed)
    with pytest.raises(ValueError, match="never committed"):
        V.read_version(spark, p, 2)


def test_snapshot_write_stages_then_renames(spark, tmp_path):
    """The reserved v=N dir is never deleted mid-write (the staging dir
    is renamed over it), and a failed write leaves no stray staging dir
    visible to the version listing."""
    p = str(tmp_path / "tbl")
    V.write_version(spark.range(3), p)
    vdir = os.path.join(p, "_versions")
    assert os.path.exists(os.path.join(vdir, "v=000001", "_SUCCESS"))
    # no leftover staging dirs after a successful commit
    assert [d for d in os.listdir(vdir) if d.startswith(".stage_")] == []
    # a failing write (unserializable plan) must clean its staging dir
    bad = spark.range(3).selectExpr("assert_true(id < 1) as x", "id")
    with pytest.raises(Exception):
        V.write_version(bad, p)
    assert [d for d in os.listdir(vdir) if d.startswith(".stage_")] == []
    assert V.latest_version(p) == 1
