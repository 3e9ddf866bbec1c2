"""gomus quota-page parse (SURVEY §2.1 S16).

Reference: ``ExtractQuotas.extract_quota`` XPath-extracts (quota_id, name,
creation_date, update_date) from each fetched quota admin page
(src/gomus/quotas.py:26-68; update_date is dd[1], creation_date dd[2]).

Spark-first: the page set is a DataFrame of HTML strings; each field is
one JVM ``regexp_extract`` — a single codegen projection over the scan,
one output row per page (no explode, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def parse_quota_pages(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Parse quota admin pages into (quota_id, name, creation_date,
    update_date).  German ``d.M.yyyy`` dates; a missing field yields NULL
    (the reference's parse_* helpers swallow lookup misses the same
    way)."""
    h = F.col(html_col)
    quota_id = F.regexp_extract(h, r"<span>(\d+)</span>", 1)
    name = F.regexp_extract(h, r"<h3>([^<]*)</h3>", 1)
    # the dl holds update_date first (dd[1]), creation_date second (dd[2])
    dd1 = F.regexp_extract(h, r"<dl>.*?<dd>([\d.]+)</dd>", 1)
    dd2 = F.regexp_extract(h, r"<dl>.*?<dd>[\d.]+</dd>\s*<dd>([\d.]+)</dd>", 1)

    def _date(c: Column) -> Column:
        return F.when(c != "", F.to_date(c, "d.M.yyyy"))

    return pages.select(
        F.when(quota_id != "", quota_id).cast("int").alias("quota_id"),
        F.trim(name).alias("name"),
        _date(dd2).alias("creation_date"),
        _date(dd1).alias("update_date"),
    )
