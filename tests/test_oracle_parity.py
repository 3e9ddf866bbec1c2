"""Every registered query must hash-match its DuckDB oracle (driver mirror).

Runs at sf0.001 for speed; the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from barberini_analytics_spark.plans import ORACLES, QUERIES

from .oracle_utils import compare_frames, run_oracle

#: The driver records at most this many registry entries per round; a 51st
#: entry would silently push an operator past the recording window (this
#: exact failure shipped in round 6).  Adding a query means consolidating
#: another, on purpose.
_REGISTRY_CAP = 50


def test_registry_exactly_at_recording_cap():
    assert len(QUERIES) == _REGISTRY_CAP, (
        f"registry holds {len(QUERIES)} entries; the driver records exactly "
        f"{_REGISTRY_CAP} — consolidate, don't append"
    )
    assert set(ORACLES) == set(QUERIES), (
        "every registry entry must carry a SQL oracle: "
        f"missing={sorted(set(QUERIES) - set(ORACLES))} "
        f"orphaned={sorted(set(ORACLES) - set(QUERIES))}"
    )


def _assert_canonicalizer_safe(schema: T.StructType, name: str) -> None:
    """The driver's pandas canonicalizer sorts every output column; list/
    dict cells are unhashable there (the round-7 ``ivf_assignments``
    regression), so no registry output may expose a top-level complex type
    — digest arrays to strings (``concat_ws``) or scalar folds instead.
    """
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: complex-typed output columns {bad} would break the "
        "driver's pandas canonicalizer — digest them to strings/scalars"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    _assert_canonicalizer_safe(df.schema, name)
    spark_pdf = df.toPandas()
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    oracle_pdf = run_oracle(ORACLES[name], sf_dir)
    compare_frames(spark_pdf, oracle_pdf, name)
