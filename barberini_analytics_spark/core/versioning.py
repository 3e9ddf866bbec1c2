"""Versioned snapshot tables with time travel and change feeds —
lakehouse-lite on plain parquet.

A versioned table is a directory of immutable snapshot subdirs plus a
tiny commit log:

```
table/
  _versions/v=000001/   (parquet snapshot)
  _versions/v=000002/
  _LATEST               (text file: the committed version number)
```

Write protocol: materialize the new snapshot into its own ``v=N`` dir
FIRST, then atomically replace ``_LATEST`` (write temp + ``os.replace``).
A reader always resolves ``_LATEST`` before opening a snapshot, so a
crashed writer leaves at worst an orphaned (never-referenced) snapshot
dir — readers can never observe a half-written table.  This is the same
commit discipline Delta/Iceberg implement with manifest files; on a real
lake those formats replace this module, and the call signatures
(``write_version`` / ``read_version`` / ``change_feed``) are the stable
surface.

The change feed diffs two snapshots by primary key entirely in Spark
(full outer join on the PK, one shuffle): inserts, deletes, and updates
— with updates detected by any non-PK column difference (null-safe).
Reference analogue: the performance-history tables the reference
snapshots per cron run (SURVEY §1.1) — here the history is first-class
and any two versions are diffable after the fact.
"""

from __future__ import annotations

import os
import re
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

_VDIR = "_versions"
_LATEST = "_LATEST"


def _vpath(path: str, version: int) -> str:
    return os.path.join(path, _VDIR, f"v={version:06d}")


def latest_version(path: str) -> int | None:
    """The committed version number, or None for a fresh table."""
    marker = os.path.join(path, _LATEST)
    if not os.path.exists(marker):
        return None
    with open(marker, encoding="ascii") as fh:
        body = fh.read().strip()
    if not re.fullmatch(r"\d+", body):
        raise ValueError(f"corrupt {_LATEST} marker: {body!r}")
    return int(body)


def list_versions(path: str) -> list[int]:
    """All snapshot versions present on disk (committed or orphaned)."""
    vdir = os.path.join(path, _VDIR)
    if not os.path.isdir(vdir):
        return []
    out = []
    for name in os.listdir(vdir):
        m = re.fullmatch(r"v=(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def write_version(df: DataFrame, path: str) -> int:
    """Commit ``df`` as the table's next snapshot; returns the version.

    Snapshot-first, marker-last: the parquet write lands in the new
    ``v=N`` dir before ``_LATEST`` is atomically swapped, so concurrent
    readers keep resolving the previous committed snapshot until the
    commit point.

    Concurrent writers are safe on a POSIX filesystem: each writer
    RESERVES its snapshot dir with an atomic ``os.mkdir`` (two writers
    can never interleave files inside one ``v=N``), and the reservation
    stays alive through the Spark write — the snapshot is materialized
    into a private staging dir and ``os.rename``d over the (still-empty)
    reserved dir in one atomic step, so the reserved path never passes
    through a deleted state a competing ``mkdir`` could slip into.  The
    ``_LATEST`` swap is serialized by an ``flock`` and only ever
    advances — a slow writer committing an older version cannot move the
    marker backwards past a newer commit (its snapshot stays readable
    via time travel).  On object stores without atomic mkdir/rename/flock
    semantics this module must be fronted by an external lock (or
    replaced by Delta/Iceberg, as the module docstring notes).
    """
    vdir = os.path.join(path, _VDIR)
    os.makedirs(vdir, exist_ok=True)
    version = max([latest_version(path) or 0, *list_versions(path)]) + 1
    while True:
        try:
            os.mkdir(_vpath(path, version))
            break
        except FileExistsError:   # another writer reserved it — skip past
            version += 1
    # Never write INTO the reserved dir: mode('overwrite') deletes the
    # target first, which would momentarily un-reserve v=N and let a
    # concurrent writer's mkdir claim the same version.  Stage privately
    # (dotted prefix — invisible to the v=(\d+) listing), then atomically
    # rename over the still-empty reservation.
    staging = tempfile.mkdtemp(dir=vdir, prefix=".stage_")
    os.rmdir(staging)               # Spark wants to create the dir itself
    try:
        df.write.mode("error").parquet(staging)
        os.rename(staging, _vpath(path, version))
    except BaseException:
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        raise
    import fcntl

    with open(os.path.join(path, ".commit_lock"), "w",
              encoding="ascii") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if version > (latest_version(path) or 0):   # monotonic marker
            fd, tmp = tempfile.mkstemp(dir=path, prefix=".latest_")
            with os.fdopen(fd, "w", encoding="ascii") as fh:
                fh.write(str(version))
            os.replace(tmp, os.path.join(path, _LATEST))
    return version


def read_version(spark: SparkSession, path: str,
                 version: int | None = None) -> DataFrame:
    """Time travel: open a specific snapshot (default: the committed
    latest).  Uncommitted snapshots are refused in both directions:
    versions above ``_LATEST`` were never committed, and versions below
    it may be a crashed writer's empty reservation (skip-past version
    allocation can leave those behind), so the snapshot dir must also
    carry Spark's ``_SUCCESS`` marker before it is opened."""
    committed = latest_version(path)
    if committed is None:
        raise FileNotFoundError(f"no committed version at {path}")
    if version is None:
        version = committed
    if version > committed or version < 1:
        raise ValueError(
            f"version {version} not committed (latest is {committed})")
    vpath = _vpath(path, version)
    if not os.path.exists(os.path.join(vpath, "_SUCCESS")):
        raise ValueError(
            f"version {version} reserved but never committed "
            f"(no _SUCCESS in {vpath})")
    return spark.read.parquet(vpath)


def change_feed(spark: SparkSession, path: str, pk: Sequence[str],
                from_version: int, to_version: int) -> DataFrame:
    """Row-level diff between two committed snapshots, keyed by ``pk``:
    one row per changed key with ``change ∈ {insert, delete, update}``
    and the after-image columns (null for deletes).

    One full-outer shuffle join on the PK; update detection compares
    every non-PK column null-safely, so a column flipping to/from NULL
    counts as an update.  At 100 TB, diff partition-by-partition (the
    snapshots share partitioning) — the join shape is unchanged.
    """
    old = read_version(spark, path, from_version)
    new = read_version(spark, path, to_version)
    value_cols = [c for c in new.columns if c not in pk]
    o = old.select(*pk, F.lit(True).alias("__in_old"),
                   *[F.col(c).alias(f"__old_{c}") for c in value_cols])
    n = new.select(*pk, F.lit(True).alias("__in_new"), *value_cols)
    joined = o.join(n, list(pk), "full_outer")
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__old_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*pk, "change", *value_cols)
    )
