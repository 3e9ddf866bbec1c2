"""Literal local tables as LocalRelations (``VALUES`` SQL), not RDDs.

``spark.createDataFrame(list)`` in PySpark always routes through
``parallelize`` and compiles to an RDD-backed ``LogicalRDD`` plan.  Two
costs follow for the tiny lexicon/dimension literals the query layer
broadcasts on every run:

- every materialization of the frame — including the broadcast-exchange
  build inside a join — runs a python-runner job over the default ~32
  parallelize slices: ~6–7 s of measured stage run-time at ~0.2 cpu-s
  (pure task-scheduling latency) per lexicon broadcast at bench scale;
- the plan prints as ``LogicalRDD [cols]`` for ANY data, so the
  statistics catalog must refuse to fingerprint it
  (``fingerprint_is_content_stable`` False) and advisor calls over it
  re-probe every execution.

A ``SELECT ... FROM VALUES ...`` inline table resolves to a
``LocalRelation``: zero jobs to broadcast (rows live in the plan), no
python workers, and a content-stable fingerprint (the rows are part of
the canonicalized plan string).  This module renders one safely with
EXPLICIT types — inline-table literals would otherwise infer
``1 → INT`` and ``1.5 → DECIMAL``, while ``createDataFrame`` inferred
``LongType``/``DoubleType``; the DDL cast list keeps schemas identical
to the frames these tables replace (the oracle hash covers schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        # repr round-trips IEEE doubles; the D suffix forces DoubleType
        # (a bare decimal literal would parse as DECIMAL)
        return repr(v) + "D"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_lit(x) for x in v) + ")"
    raise TypeError(f"unsupported literal type {type(v).__name__}")


def values_df(spark: SparkSession, rows, schema_ddl: str) -> DataFrame:
    """A LocalRelation with the given rows and EXACT schema.

    ``schema_ddl`` is a DDL column list (``"word string, w10 bigint"``);
    every column is cast to its declared type, so the result's schema is
    independent of literal inference rules.  ``rows`` is a sequence of
    tuples (or scalars for one-column tables) of
    str/int/float/bool/None/list values.
    """
    cols = [c.strip() for c in _split_top(schema_ddl)]
    parts = [c.split(None, 1) for c in cols]
    sel = ", ".join(
        f"CAST(col{i + 1} AS {typ}) AS {name}"
        for i, (name, typ) in enumerate(parts))
    rendered = []
    for r in rows:
        if not isinstance(r, (list, tuple)):
            r = (r,)
        rendered.append("(" + ", ".join(_lit(v) for v in r) + ")")
    return spark.sql(f"SELECT {sel} FROM VALUES {', '.join(rendered)}")


def _split_top(ddl: str) -> list[str]:
    """Split a DDL column list on commas OUTSIDE ``<...>`` generics."""
    out, depth, cur = [], 0, []
    for ch in ddl:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out
