"""Pin the events.ts parquet-encoding contract of ``core.io.load_table``.

The testdata generator has shipped ``events.ts`` under multiple physical
parquet encodings across rounds — TIMESTAMP(NANOS) (which Spark's
vectorized reader rejects unless read as LONG via
``spark.sql.legacy.parquet.nanosAsLong``), TIMESTAMP(MICROS,
isAdjustedToUTC=false) (read by Spark as TIMESTAMP_NTZ), and plain
UTC-adjusted micros.  An encoding change between rounds 2 and 3 broke the
bench run before any local test caught it; these fixtures make every
branch of ``core/io.py``'s normalization locally enforced: the SAME
wall-clock rows must come back regardless of the on-disk encoding.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from barberini_analytics_spark.core.io import load_table

# ten wall-clock instants incl. microsecond-precision edges whose low bits
# a float round-trip would corrupt
_INSTANTS = [
    dt.datetime(2023, 1, 1, 0, 0, 0, 0),
    dt.datetime(2023, 1, 1, 0, 0, 0, 1),
    dt.datetime(2023, 6, 15, 12, 34, 56, 789123),
    dt.datetime(2023, 6, 15, 12, 34, 56, 789124),
    dt.datetime(2023, 12, 31, 23, 59, 59, 999999),
    dt.datetime(2024, 2, 29, 6, 7, 8, 123456),
    dt.datetime(2024, 7, 4, 18, 0, 0, 500000),
    dt.datetime(2025, 1, 1, 0, 0, 1, 1),
    dt.datetime(2025, 8, 14, 9, 30, 0, 42),
    dt.datetime(2025, 12, 31, 23, 0, 0, 999000),
]

_EPOCH = dt.datetime(1970, 1, 1)


def _micros(d: dt.datetime) -> int:
    return int((d - _EPOCH).total_seconds()) * 1_000_000 + d.microsecond


def _base_columns(n: int) -> dict[str, pa.Array]:
    return {
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
        "event_type": pa.array([f"t{i % 2}" for i in range(n)], pa.string()),
        "value": pa.array([i * 1.5 for i in range(n)], pa.float64()),
    }


def _write_events(dirname: str, ts_array: pa.Array) -> str:
    """Write an events.parquet with the given ts physical encoding and
    return the sf-dir-shaped parent directory."""
    os.makedirs(dirname, exist_ok=True)
    cols = _base_columns(len(ts_array))
    table = pa.table({**cols, "ts": ts_array})
    pq.write_table(table, os.path.join(dirname, "events.parquet"))
    return dirname


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory) -> dict[str, str]:
    root = tmp_path_factory.mktemp("ts_encodings")
    micros = [_micros(d) for d in _INSTANTS]
    dirs = {}
    # 1. TIMESTAMP(NANOS, isAdjustedToUTC=false): what the r3-breaking
    #    generator emitted; Spark reads it as LONG under nanosAsLong
    dirs["nanos"] = _write_events(
        str(root / "nanos"),
        pa.array([m * 1000 for m in micros], pa.timestamp("ns")))
    # 2. TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark TIMESTAMP_NTZ
    dirs["ntz_micros"] = _write_events(
        str(root / "ntz"), pa.array(micros, pa.timestamp("us")))
    # 3. TIMESTAMP(MICROS, isAdjustedToUTC=true) → plain session-tz
    #    TIMESTAMP (session tz pinned to UTC) — the no-op branch
    dirs["utc_micros"] = _write_events(
        str(root / "utc"), pa.array(micros, pa.timestamp("us", tz="UTC")))
    return dirs


def _collect_rows(spark, sf_dir: str):
    df = load_table(spark, sf_dir, "events")
    # the contract: ts comes back as a session-tz TIMESTAMP, micros exact
    assert df.schema["ts"].dataType.typeName() == "timestamp", (
        f"{sf_dir}: ts normalized to {df.schema['ts'].dataType}")
    return sorted(
        (r.event_id, r.ts.replace(tzinfo=None)) for r in
        df.select("event_id", "ts").collect())


def test_all_encodings_yield_identical_wallclock_rows(spark, encoded_dirs):
    expected = sorted(enumerate(_INSTANTS))
    results = {name: _collect_rows(spark, d)
               for name, d in encoded_dirs.items()}
    for name, rows in results.items():
        assert rows == expected, (
            f"encoding {name!r} diverged:\n{rows}\nvs\n{expected}")


def test_nanos_encoding_exercises_long_branch(spark, encoded_dirs):
    """The nanos fixture must actually hit the LONG branch (otherwise the
    fixture silently stopped covering the r3 regression)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(
        os.path.join(encoded_dirs["nanos"], "events.parquet"))
    assert raw.schema["ts"].dataType.typeName() == "long"


def test_ntz_encoding_exercises_cast_branch(spark, encoded_dirs):
    raw = spark.read.parquet(
        os.path.join(encoded_dirs["ntz_micros"], "events.parquet"))
    assert raw.schema["ts"].dataType.typeName() == "timestamp_ntz"


def test_streaming_source_matches_batch_normalization(spark, encoded_dirs):
    """``streaming.jobs.stream_events`` carries its own copy of the
    normalization; pin it to the same contract over the nanos encoding."""
    from barberini_analytics_spark.streaming.jobs import (
        run_available_now, stream_events)

    out = run_available_now(
        stream_events(spark, encoded_dirs["nanos"]), "io_enc_stream")
    assert out.schema["ts"].dataType.typeName() == "timestamp"
    rows = sorted((r.event_id, r.ts.replace(tzinfo=None))
                  for r in out.select("event_id", "ts").collect())
    assert rows == sorted(enumerate(_INSTANTS))
