"""Every registered query must hash-match its DuckDB oracle (driver mirror).

Runs at sf0.001 for speed; the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from barberini_analytics_spark.plans import ORACLES, QUERIES

from .oracle_utils import compare_frames, run_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    oracle_pdf = run_oracle(ORACLES[name], sf_dir)
    compare_frames(spark_pdf, oracle_pdf, name)
