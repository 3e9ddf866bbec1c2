"""Exact fixed-point arithmetic for quantized numeric columns.

Why this exists: the synthetic (and most real-world) monetary columns are
decimal-quantized doubles (2 fractional digits).  Aggregating them as doubles
and rounding the result is **engine-divergent**: averages of quantized values
land exactly on decimal ties (``x.xx5``), where Spark's ``round`` (half-up via
BigDecimal) and DuckDB/C-library rounding (half-even) systematically disagree
— a correctness-gate killer that has nothing to do with the query logic.

The portable policy used by every money-valued query in ``plans/``:

1. convert each quantized column to exact integer units
   (``cents = CAST(round(x * 100) AS BIGINT)`` — the value is within 1e-6 of
   an integer, so every engine lands on the same one),
2. aggregate integers (exact, associative, order-insensitive),
3. emit results as integer units or as a single floating division of the
   exact integer aggregates (identical operands → identical IEEE result on
   every engine).  No ``round()`` anywhere.

Overflow headroom: int64 holds ±9.2e18.  A 100 TB lineitem (~6e11 rows) of
~1e7-cent prices sums to ~6e18 — at that scale switch the sums to
``decimal(38,0)`` (same code, wider cast); the per-row cents conversion is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def cents(col: Column | str, digits: int = 2) -> Column:
    """Exact integer units for a decimal-quantized double column.

    ``digits=2`` → cents.  The double is within float error of a decimal
    grid point, so round-to-nearest-integer is unambiguous and
    engine-portable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10 ** digits)).cast("long")


def exact_ratio(numer: Column, denom: Column) -> Column:
    """Engine-portable double ratio of two exact integer aggregates."""
    return numer.cast("double") / denom.cast("double")
