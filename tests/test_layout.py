"""Z-order clustered layout: key correctness and measured data skipping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from barberini_analytics_spark.core import layout as L


def _morton2(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference_interleave(spark):
    df = spark.range(256).selectExpr("id AS a", "(255 - id) AS b")
    got = df.withColumn("z", L.zorder_key(df, ["a", "b"], bits=8)) \
        .orderBy("a").select("a", "b", "z").collect()
    # quantization maps [0,255] onto 8-bit cells: floor(v*256/255) clamped
    for r in got:
        qa = min(255, (r.a * 256) // 255)
        qb = min(255, (r.b * 256) // 255)
        assert r.z == _morton2(qa, qb, 8)


def test_zorder_key_is_single_stage(spark):
    # the key must be a per-row projection: no exchange, no window, no
    # join in the plan (the min/max fold happens driver-side, once)
    df = spark.range(1000).selectExpr("id AS a", "id % 37 AS b")
    plan = df.withColumn("z", L.zorder_key(df, ["a", "b"]))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_zorder_write_skipping(spark, tmp_path):
    # two independent dimensions; z-ordered layout must give BOTH
    # columns narrow per-row-group ranges, a linear sort only one
    n = 200_000
    df = spark.range(n).selectExpr(
        "CAST((id * 2654435761) % 65536 AS DOUBLE) AS x",
        "CAST((id * 40503) % 65536 AS DOUBLE) AS y")
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    L.write_zordered(df, zpath, ["x", "y"], n_files=8)
    (df.repartitionByRange(8, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(lpath))

    z = L.rowgroup_ranges(zpath, ["x", "y"])
    lin = L.rowgroup_ranges(lpath, ["x", "y"])
    # linear sort: x perfectly clustered, y unclustered (~full span)
    assert lin["x"] < 0.35
    assert lin["y"] > 0.8
    # z-order: BOTH columns substantially clustered.  Bound has headroom:
    # parquet row-group flush points shift with executor memory pressure
    # (observed 0.601 under a fully loaded parallel suite vs ~0.55 idle),
    # and the claim is "both dimensions cluster", not an exact ratio
    assert z["x"] < 0.68 and z["y"] < 0.68
    assert z["x"] + z["y"] < lin["x"] + lin["y"]


def test_zordered_read_roundtrip_and_pushdown(spark, tmp_path):
    df = spark.range(50_000).selectExpr(
        "id", "CAST(id % 1000 AS DOUBLE) AS x", "CAST(id % 777 AS DOUBLE) AS y")
    path = str(tmp_path / "z")
    L.write_zordered(df, path, ["x", "y"], n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 50_000
    assert sorted(c for c in back.columns) == ["id", "x", "y"]
    # predicate reaches the scan (skipping applies at the reader)
    plan = back.filter("x < 10.0")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(x,10.0)" in plan


def test_compact_files_reduces_count_and_preserves_rows(spark, tmp_path):
    from barberini_analytics_spark.core.layout import compact_files

    p = str(tmp_path / "frag")
    spark.range(10_000).selectExpr("id", "id % 7 AS g") \
        .repartition(16).write.parquet(p)
    import os

    def parts(d):
        return [f for f in os.listdir(d) if f.endswith(".parquet")]

    assert len(parts(p)) == 16
    before = spark.read.parquet(p)
    total = before.count()
    checksum = before.agg({"id": "sum"}).collect()[0][0]
    n_out = compact_files(spark, p, target_bytes=1 << 30)
    assert n_out == 1
    assert len(parts(p)) == 1
    after = spark.read.parquet(p)
    assert after.count() == total
    assert after.agg({"id": "sum"}).collect()[0][0] == checksum


def test_compact_files_preserves_hive_partition_layout(spark, tmp_path):
    """Compacting a hive-partitioned table ROOT must keep the key=value
    layout (and partition pruning) instead of flattening it."""
    import os

    from barberini_analytics_spark.core.layout import compact_files

    p = str(tmp_path / "part")
    spark.range(1_000).selectExpr("id", "id % 3 AS g") \
        .repartition(8).write.partitionBy("g").parquet(p)
    # a stray non-key=value dir that sorts FIRST must not derail
    # partition discovery (it used to: discovery descended subdirs[0])
    os.mkdir(os.path.join(p, ".stage_leftover"))
    before = spark.read.parquet(p)
    total, checksum = before.count(), \
        before.agg({"id": "sum"}).collect()[0][0]
    # capture BEFORE compaction: the `before` plan holds a file listing
    # that the rewrite invalidates
    before_g1 = before.filter("g = 1").count()
    n_out = compact_files(spark, p, target_bytes=1 << 30)
    assert n_out == 3   # actual files written, one per partition
    part_dirs = sorted(d for d in os.listdir(p) if d.startswith("g="))
    assert part_dirs == ["g=0", "g=1", "g=2"]
    # one file per partition at this size, not 8
    for d in part_dirs:
        files = [f for f in os.listdir(os.path.join(p, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1
    after = spark.read.parquet(p)
    assert after.count() == total
    assert after.agg({"id": "sum"}).collect()[0][0] == checksum
    # pruning still works: a partition filter reads one dir
    assert after.filter("g = 1").count() == before_g1
