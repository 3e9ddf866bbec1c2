from .registry import QUERIES, ORACLES, query

# import for registration side effects
from . import relational_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
