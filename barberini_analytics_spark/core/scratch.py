"""Per-process scratch root for persist-then-oracle round-trips.

Some model cores (GSDMM fit, DBSCAN, the iterative KNN forecast) are not
SQL-expressible, but everything downstream of them is.  Those queries
persist the fitted state to parquet here so the DuckDB oracle can read it
back and re-derive the deterministic post-fit half — the same pattern
``upsert_merge`` uses to hash-check the real sink round-trip.

One temp directory per process, created lazily and removed at interpreter
exit: the oracle SQL strings embed the path at module-import time, and the
driver runs query + oracle inside one process, so the path is stable
exactly as long as it needs to be.  Repeated bench/selfcheck invocations
never accumulate orphaned /tmp data (each process cleans up its own root).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def scratch_root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="barberini_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_path(*parts: str) -> str:
    """A path under the per-process scratch root (parents created)."""
    path = os.path.join(scratch_root(), *parts)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path
