"""Registry wiring SURVEY §2 operators to runnable, oracle-checked queries.

Every implemented operator registers a query ``(spark, sf_dir) -> DataFrame``
and (when SQL-expressible) the equivalent ANSI SQL for the DuckDB oracle.
The driver compares both at sf0.01 (row count + schema + value hash), so:

- every computed column is aliased identically on both sides,
- floating-point aggregates are rounded on both sides (double summation
  order differs between engines; rounding makes the hash stable),
- counts/sums of integers are cast to BIGINT on both sides (DuckDB sums
  integers into HUGEINT, Spark into LONG).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and its DuckDB oracle SQL, if expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
