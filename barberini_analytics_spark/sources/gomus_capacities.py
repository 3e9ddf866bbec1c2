"""gomus capacities page parsing — the hovercard (popover) detail merge.

Reference: ``src/gomus/capacities.py:43-49,177-199`` extracts
``$("#info-<ts>").popover({...})`` blocks with a recursive regex and
evaluates each block with ``js2py.eval_js`` to get ``title`` and
``content``.  The evaluated "JS" is only ever an object literal whose
values are single-quoted string constants — there is no computation to
evaluate — so the whole step is a string grammar:

    block   := $("#info-" DIGITS ").popover({ (field ,)* field });
    field   := NAME : '(\\. | [^\\'])*'

This module reproduces ``js2py.eval_js`` for exactly that grammar with
codegen ``regexp_extract``/``regexp_replace`` (unescape ``\\'``,
``\\/``, ``\\n``), then parses the capacity integers out of the
``content`` HTML table the same way the reference's XPath does
(tbody rows 1-3 = max/sold/reserved, tfooter = available,
capacities.py:185-199) — one map-only stage per page, no Python UDF,
no JS engine.

Timestamps: the ``#info-<ts>`` element id is the slot's unix timestamp
(the same value the basic table carries as ``data-timestamp``);
``from_unixtime`` resolves it in the session timezone (this engine pins
UTC; the reference resolves in the museum's local zone via
``datetime.fromtimestamp``, capacities.py:167-168).  The German title
("26. Oktober, 09:00 Uhr") is parsed into cross-check components so a
test can pin title ↔ timestamp agreement without dateparser.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: one popover block, non-greedy across lines (group 0 = whole block)
_BLOCK_RE = r'\$\("#info-(\d+)"\)\.popover\(\{[\s\S]*?\}\);'

#: a single-quoted JS string constant with backslash escapes
_JS_STR = r"'((?:\\.|[^\\'])*)'"

#: German month names, as the reference's locale emits them
GERMAN_MONTHS = ("Januar", "Februar", "März", "April", "Mai", "Juni",
                 "Juli", "August", "September", "Oktober", "November",
                 "Dezember")


def _js_unescape(col: Column) -> Column:
    """Decode the JS single-quoted-string escapes this grammar uses:
    ``\\n`` → newline first (so the backslash-eating pass can't turn it
    into a stray ``n``), then ``\\<any>`` → ``<any>`` (covers ``\\'``
    and ``\\/``)."""
    return F.regexp_replace(
        F.regexp_replace(col, r"\\n", "\n"), r"\\(.)", "$1")


def parse_hovercards(df: DataFrame, html_col: str = "html") -> DataFrame:
    """One row per hovercard: ``slot_ts``/``date``/``time`` from the
    ``#info-<unix>`` id, the unescaped ``title``/``content`` strings,
    the four capacity integers, and the German-title components
    (``title_day``, ``title_month``, ``title_time``) for
    cross-validation.  All other input columns ride along.

    ``max``/``sold``/``reserved`` are the first three right-column
    integers of the content table (tbody order), ``available`` the last
    (tfooter) — the same cells the reference XPaths address
    (capacities.py:192-199).
    """
    keep = [c for c in df.columns if c != html_col]
    blocks = F.regexp_extract_all(F.col(html_col), F.lit(_BLOCK_RE), 0)
    out = df.select(*keep, F.explode(blocks).alias("__block"))
    ts = F.regexp_extract("__block", r'#info-(\d+)', 1).cast("long")
    title = _js_unescape(F.regexp_extract(
        "__block", r"title\s*:\s*" + _JS_STR, 1))
    content = _js_unescape(F.regexp_extract(
        "__block", r"content\s*:\s*" + _JS_STR, 1))
    nums = F.regexp_extract_all(
        F.col("content"),
        F.lit(r"<td[^>]*>\s*(?:<strong>\s*)?(-?\d+)\s*(?:</strong>\s*)?</td>"),
        1)
    title_text = F.trim(F.regexp_replace("title", r"<[^>]*>", ""))
    month_map = F.create_map(*[
        x for i, m in enumerate(GERMAN_MONTHS)
        for x in (F.lit(m), F.lit(i + 1))])
    slot_ts = F.to_timestamp(F.from_unixtime(ts))
    return (
        out.withColumn("slot_unix", ts)
        .withColumn("title", title)
        .withColumn("content", content)
        .withColumn("slot_ts", slot_ts)
        .withColumn("date", F.to_date(slot_ts))
        .withColumn("time", F.date_format(slot_ts, "HH:mm"))
        .withColumn("__nums", nums)
        # try_element_at: a malformed hovercard with no table numbers
        # yields NULL capacities, not an ANSI INVALID_ARRAY_INDEX error
        # (Spark 4 runs ANSI-on by default)
        .withColumn("max", F.try_element_at("__nums", F.lit(1)).cast("int"))
        .withColumn("sold", F.try_element_at("__nums", F.lit(2)).cast("int"))
        .withColumn("reserved",
                    F.try_element_at("__nums", F.lit(3)).cast("int"))
        .withColumn("available",
                    F.try_element_at("__nums", F.lit(-1)).cast("int"))
        .withColumn("title_day", F.regexp_extract(
            title_text, r"^(\d{1,2})\.", 1).try_cast("int"))
        # \S+, not \w+: Java's \w is ASCII-only and would never match
        # 'März' — the month name ends at the comma either way
        .withColumn("title_month", F.element_at(
            month_map, F.regexp_extract(title_text, r"\. (\S+),", 1)))
        .withColumn("title_time", F.regexp_extract(
            title_text, r"(\d{2}:\d{2}) Uhr", 1))
        .drop("__block", "__nums")
    )


def parse_basic_capacities(df: DataFrame, html_col: str = "html",
                           ignored_messages: tuple[str, ...] = (
                               "Betriebsferien",
                               "Zu Ihrer Suche wurden keine Kontingente "
                               "gefunden",
                           )) -> DataFrame:
    """The basic availability table: one row per
    ``<td data-timestamp="...">N</td>`` cell, with ``max = available``
    exactly as the reference records it (capacities.py:142-176 — this
    table is the only place defect NEGATIVE values appear, so it must be
    parsed even though the hovercards carry more detail).

    Pages whose text contains one of ``ignored_messages`` yield zero
    rows silently (the reference's ignored-error path,
    capacities.py:157-163); any other page with no cells also yields
    zero rows here — callers needing the reference's hard failure can
    assert on the count.
    """
    keep = [c for c in df.columns if c != html_col]
    ignored = F.lit(False)
    for m in ignored_messages:
        ignored = ignored | F.col(html_col).contains(m)
    cells = F.regexp_extract_all(
        F.col(html_col),
        F.lit(r'<td[^>]*data-timestamp="(\d+)"[^>]*>\s*(-?\d+)\s*</td>'),
        0)
    out = (df.filter(~ignored)
           .select(*keep, F.explode(cells).alias("__cell")))
    ts = F.regexp_extract("__cell", r'data-timestamp="(\d+)"', 1) \
        .cast("long")
    avail = F.regexp_extract("__cell", r">\s*(-?\d+)\s*</td>", 1) \
        .cast("int")
    slot_ts = F.to_timestamp(F.from_unixtime(ts))
    return (out.withColumn("slot_ts", slot_ts)
            .withColumn("date", F.to_date(slot_ts))
            .withColumn("time", F.date_format(slot_ts, "HH:mm"))
            .withColumn("available", avail)
            .withColumn("max", avail)
            .drop("__cell"))
