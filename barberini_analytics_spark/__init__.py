"""barberini_analytics_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
Museum-Barberini/Barberini-Analytics (reference: Luigi + pandas + Postgres),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
windows instead of self-joins, broadcast joins for small dimensions, and
Pandas UDFs only where built-in functions genuinely can't express the
semantics.

Layout
------
core/       session factory, table IO, sinks (upsert/snapshot/append), checks
operators/  relational + fuzzy + text + dedup + similarity + absa operators
functions/  scalar function library (trigram similarity, mmh3 parity, ...)
plans/      composed analytical queries (the SURVEY §2 inventory)
streaming/  Structured Streaming variants of the stateful operators
multimodal/ binary-column (image/audio) plumbing, decode stubs
domain/     the museum domain model: schema registry + view stack
"""

__version__ = "0.1.0"
