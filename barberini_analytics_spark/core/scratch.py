"""Stable scratch root for persist-then-oracle round-trips.

Some model cores (GSDMM fit, DBSCAN, the iterative KNN forecast) are not
SQL-expressible, but everything downstream of them is.  Those queries
persist the fitted state to parquet here so the DuckDB oracle can read it
back and re-derive the deterministic post-fit half — the same pattern
``upsert_merge`` uses to hash-check the real sink round-trip.

The root is a FIXED path (overridable via ``BARBERINI_SCRATCH``), not a
per-process ``mkdtemp``: the oracle SQL strings embed the path at
module-import time, and a fixed path keeps them valid even if a harness
evaluates the SQL in a different process than the one that ran the Spark
queries.  Every write goes through Spark's ``overwrite`` mode, so
repeated runs replace state in place — the footprint is bounded (a few
small parquet tables per scale factor) and nothing accumulates.
"""

from __future__ import annotations

import os

_ROOT = os.environ.get("BARBERINI_SCRATCH", "/tmp/barberini_scratch")


def scratch_root() -> str:
    os.makedirs(_ROOT, exist_ok=True)
    return _ROOT


def scratch_path(*parts: str) -> str:
    """A path under the scratch root (parent directories created)."""
    path = os.path.join(scratch_root(), *parts)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path
