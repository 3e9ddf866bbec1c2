from .registry import QUERIES, ORACLES, query

# import for registration side effects
from . import relational_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import dedup_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import absa_queries  # noqa: E402,F401
from . import domain_queries  # noqa: E402,F401
from . import function_queries  # noqa: E402,F401
from . import interval_queries  # noqa: E402,F401
from . import ml_queries  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import media_queries  # noqa: E402,F401
from . import sink_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
