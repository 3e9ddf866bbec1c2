"""Instagram media ingest transforms (SURVEY §2.1 S5, §2.3 P3).

Reference: ``FetchIgPosts`` applies a typed column-adapter dict with a
``caption -> None`` default for media items missing a caption
(src/instagram.py:141-226); ``FetchIgPostPerformance`` excludes reel posts
before fetching insights (src/instagram.py:392).

Spark-first: the adapter dict is a typed ``select`` (one codegen
projection); missing JSON fields already surface as NULL from the scan, so
the default is a no-op; the reel filter is a pushed-down predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: column -> Spark cast type, mirroring FetchIgPosts.columns' adapters
IG_POST_COLUMNS: dict[str, str] = {
    "id": "string",
    "caption": "string",           # default None when absent (column_defaults)
    "timestamp": "timestamp",
    "media_type": "string",
    "like_count": "int",
    "comments_count": "int",
    "permalink": "string",
}


def extract_ig_posts(raw: DataFrame) -> DataFrame:
    """Typed adapter projection over raw media rows
    (src/instagram.py:144-152, 216-226).  Missing ``caption`` stays NULL —
    the scan already yields NULL for absent JSON fields, which is exactly
    ``column_defaults``."""
    cols = []
    for name, typ in IG_POST_COLUMNS.items():
        src = F.col(name) if name in raw.columns \
            else F.lit(None).cast("string")
        cols.append(src.cast(typ).alias(name))
    return raw.select(*cols)


def exclude_reels(posts: DataFrame) -> DataFrame:
    """P3 reel exclusion: ``~permalink.str.contains('/reel/')``
    (src/instagram.py:392)."""
    return posts.filter(~F.col("permalink").contains("/reel/"))
