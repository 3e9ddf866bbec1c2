"""Unit tests for the library-level ingest sources (S5/S8/S11/S16) that
have no registry slot (the correctness driver caps at 50 entries)."""

from __future__ import annotations

import datetime as dt

from barberini_analytics_spark.sources.excel_report import (
    decode_excel_serial, parse_sheet)
from barberini_analytics_spark.sources.gomus_quota import parse_quota_pages
from barberini_analytics_spark.sources.instagram import (
    exclude_reels, extract_ig_posts)
from barberini_analytics_spark.sources.twitter import (
    extract_tweet_performance, extract_tweets)


def test_extract_ig_posts_types_and_caption_default(spark):
    raw = spark.createDataFrame(
        [("1", "2024-03-05T10:00:00", "IMAGE", "7", "2",
          "https://ig/p/1/"),
         ("2", "2024-03-06T11:00:00", "VIDEO", "9", "0",
          "https://ig/reel/2/")],
        ["id", "timestamp", "media_type", "like_count", "comments_count",
         "permalink"])  # no caption column -> column_defaults path
    out = extract_ig_posts(raw)
    assert [f.name for f in out.schema.fields] == [
        "id", "caption", "timestamp", "media_type", "like_count",
        "comments_count", "permalink"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows["1"]["caption"] is None
    assert rows["1"]["like_count"] == 7
    assert rows["1"]["timestamp"] == dt.datetime(2024, 3, 5, 10, 0)
    # P3 reel exclusion
    assert [r["id"] for r in exclude_reels(out).collect()] == ["1"]


def test_extract_tweets_renames_and_dedups(spark):
    raw = spark.createDataFrame(
        [(10, 100, "hello", None, "2024-01-01 08:00:00", 5, 1, 0),
         (10, 100, "hello", None, "2024-01-01 08:00:00", 5, 1, 0),
         (11, 101, "world", 100, "2024-01-02 09:00:00", 2, 0, 1)],
        ["user_id", "tweet_id", "text", "parent_tweet_id", "timestamp",
         "likes", "retweets", "replies"])
    tweets = extract_tweets(raw)
    assert tweets.columns == [
        "user_id", "tweet_id", "text", "response_to", "post_date"]
    assert tweets.count() == 2          # full-duplicate dropped
    perf = extract_tweet_performance(raw, "2024-06-01 12:00:00")
    assert perf.columns == [
        "tweet_id", "likes", "retweets", "replies", "timestamp"]
    assert perf.select("timestamp").distinct().first()[0] == \
        dt.datetime(2024, 6, 1, 12, 0)


def test_parse_sheet_and_excel_serial(spark):
    workbook = spark.createDataFrame(
        [(0, 0, "overview junk"),
         (1, 0, "order_id,order_date,total"),
         (1, 1, "7,45108,19.99"),
         (1, 2, "8,45109,5.00"),
         (2, 0, "other sheet")],
        ["sheet_index", "row_index", "line"])
    df = parse_sheet(workbook, sheet_index=1,
                     schema="order_id INT, order_date INT, total DOUBLE")
    assert df.count() == 2
    dated = decode_excel_serial(df, "order_date")
    rows = {r["order_id"]: r for r in dated.collect()}
    # 45108 days from the 1899-12-30 Excel epoch
    assert rows[7]["order_date"] == dt.date(2023, 7, 1)
    assert rows[8]["order_date"] == dt.date(2023, 7, 2)
    assert abs(rows[7]["total"] - 19.99) < 1e-9


def test_parse_quota_pages(spark):
    page = ("<ol><li></li><li><span>42</span></li></ol>"
            "<div><h3> Tageskontingent </h3></div>"
            "<small><dl><dt>u</dt><dd>5.3.2024</dd>"
            "<dd>28.12.2023</dd></dl></small>")
    broken = "<div><h3>NoDates</h3></div>"
    out = parse_quota_pages(
        spark.createDataFrame([(page,), (broken,)], ["html"]))
    rows = sorted(out.collect(), key=lambda r: (r["name"] or ""))
    assert rows[1]["quota_id"] == 42
    assert rows[1]["name"] == "Tageskontingent"
    assert rows[1]["creation_date"] == dt.date(2023, 12, 28)
    assert rows[1]["update_date"] == dt.date(2024, 3, 5)
    assert rows[0]["quota_id"] is None
    assert rows[0]["creation_date"] is None


def test_scrub_pii(spark):
    from barberini_analytics_spark.operators.text import scrub_pii

    raw = spark.createDataFrame(
        [(1, "mail me at jane.doe+x@example.org or call +49 (30) 123-4567"),
         (2, "server 10.0.42.7 answered"),
         (3, "clean text stays clean"),
         (4, "id 1234567 is a plain long number")],
        ["id", "text"])
    rows = {r["id"]: r["scrubbed"]
            for r in scrub_pii(raw, out_col="scrubbed").collect()}
    assert rows[1] == "mail me at <EMAIL> or call <PHONE>"
    assert rows[2] == "server <IP> answered"
    assert rows[3] == "clean text stays clean"
    assert rows[4] == "id <PHONE> is a plain long number"


def test_repetition_signals(spark):
    from barberini_analytics_spark.operators.text import repetition_signals

    raw = spark.createDataFrame(
        [(1, "spam spam spam spam"),               # one token dominates
         (2, "a b c d e f g h"),                   # no repetition
         (3, "x y x y x y x y")],                  # repeated bigram cycle
        ["id", "text"])
    rows = {r["id"]: r for r in repetition_signals(raw).collect()}
    assert rows[1]["top_unigram_frac"] == 1.0
    assert rows[1]["dup_trigram_frac"] == 0.5       # 2 occurrences, 1 distinct
    assert abs(rows[2]["top_unigram_frac"] - 1 / 8) < 1e-9
    assert rows[2]["dup_trigram_frac"] == 0.0
    # "x y" appears 4 of 7 bigrams
    assert abs(rows[3]["top_bigram_frac"] - 4 / 7) < 1e-9


# ---------------------------------------------------------------------------
# gomus capacities: js2py-free hovercard + basic-table parsing
# ---------------------------------------------------------------------------

def _capacities_page() -> str:
    """Synthetic capacities page mirroring the reference grammar
    (capacities.py:43-49): jQuery popover blocks whose title/content are
    single-quoted JS strings with \\', \\/ and \\n escapes, plus the
    basic table with data-timestamp cells."""
    content = (
        "<table class=\\'table\\'>\n".replace("\n", "\\n")
        + "<tbody class=\\'text-right\\'>\\n"
          "<tr>\\n<td style=\\'border: none;\\'>\\nmaximal:\\n<\\/td>\\n"
          "<td style=\\'border: none;\\'>\\n75\\n<\\/td>\\n<\\/tr>\\n"
          "<tr>\\n<td>\\nverkauft:\\n<\\/td>\\n<td>\\n30\\n<\\/td>\\n<\\/tr>\\n"
          "<tr>\\n<td>\\nreserviert:\\n<\\/td>\\n<td>\\n10\\n<\\/td>\\n<\\/tr>\\n"
          "<\\/tbody>\\n<tfooter>\\n<tr>\\n"
          "<td class=\\'text-success\\'>\\n<strong>\\nverfügbar:\\n<\\/strong>\\n<\\/td>\\n"
          "<td class=\\'text-success\\'>\\n<strong>\\n35\\n<\\/strong>\\n<\\/td>\\n"
          "<\\/tr>\\n<\\/tfooter>\\n<\\/table>\\n")
    block1 = (
        '<script>\n  $("#info-1603699200").popover({\n'
        "    placement : 'right',\n"
        "    title : '<strong><i class=\"fa\"></i> 26. Oktober, 08:00 Uhr</strong>',\n"
        "    html: 'true',\n"
        f"    content : '{content}'\n" + "  });\n</script>"
    )
    # second slot two days later, different numbers
    block2 = (block1
              .replace("1603699200", "1603872000")
              .replace("26. Oktober", "28. Oktober")
              .replace("75", "60").replace("30", "20")
              .replace("10", "15").replace("35", "25"))
    basic = (
        '<table><tbody><tr>'
        '<td class="x" data-timestamp="1603699200"> 75 </td>'
        '<td data-timestamp="1603872000">-3</td>'
        '</tr></tbody></table>')
    return f"<html><body>{basic}{block1}{block2}</body></html>"


def test_hovercard_parse_replaces_js2py(spark):
    from barberini_analytics_spark.sources.gomus_capacities import (
        parse_hovercards)

    df = spark.createDataFrame([(30, _capacities_page())],
                               ["quota_id", "html"])
    rows = {r.slot_unix: r for r in parse_hovercards(df).collect()}
    assert set(rows) == {1603699200, 1603872000}
    a = rows[1603699200]
    assert (a.max, a.sold, a.reserved, a.available) == (75, 30, 10, 35)
    assert a.quota_id == 30
    # JS unescape really happened: content carries real '/' and newlines
    assert "</td>" in a.content and "\\/" not in a.content
    assert "\n" in a.content and "\\n" not in a.content
    # German title components cross-check the unix timestamp (UTC)
    assert (a.title_day, a.title_month) == (26, 10)
    assert a.title_time == "08:00"
    assert a.date.isoformat() == "2020-10-26" and a.time == "08:00"
    b = rows[1603872000]
    assert (b.max, b.sold, b.reserved, b.available) == (60, 20, 15, 25)
    assert (b.title_day, b.title_month) == (28, 10)


def test_hovercard_title_month_matches_non_ascii_maerz(spark):
    """'März' is the one German month name outside ASCII; Java's \\w
    cannot match it, so the title regex must use a unicode-safe class —
    otherwise every March slot fails the title-vs-timestamp cross-check."""
    from barberini_analytics_spark.sources.gomus_capacities import (
        parse_hovercards)

    # 1615968000 = 2021-03-17T08:00:00Z
    page = (_capacities_page()
            .replace("1603699200", "1615968000")
            .replace("26. Oktober", "17. März"))
    df = spark.createDataFrame([(30, page)], ["quota_id", "html"])
    rows = {r.slot_unix: r for r in parse_hovercards(df).collect()}
    a = rows[1615968000]
    assert (a.title_day, a.title_month) == (17, 3)
    assert a.date.isoformat() == "2021-03-17"


def test_basic_capacities_and_ignored_pages(spark):
    from barberini_analytics_spark.sources.gomus_capacities import (
        parse_basic_capacities)

    pages = [
        (30, _capacities_page()),
        (31, "<html><body>Betriebsferien</body></html>"),   # ignored
        (32, "<html><body>nothing here</body></html>"),     # no cells
    ]
    df = spark.createDataFrame(pages, ["quota_id", "html"])
    rows = parse_basic_capacities(df).collect()
    got = {(r.quota_id, r.slot_ts.isoformat(), r.available, r.max)
           for r in rows}
    # the defect NEGATIVE value is recorded, max = available (reference
    # records the basic table precisely because hovercards omit defects)
    assert got == {
        (30, "2020-10-26T08:00:00", 75, 75),
        (30, "2020-10-28T08:00:00", -3, -3),
    }


def test_hovercard_without_numbers_yields_null_capacities(spark):
    """A grammar-matching popover whose content carries no table numbers
    must yield NULL capacity columns, not an ANSI INVALID_ARRAY_INDEX
    error (Spark 4 defaults ANSI on)."""
    from barberini_analytics_spark.sources.gomus_capacities import (
        parse_hovercards)

    html = ("<script>$(\"#info-77\").popover({ title : 't', "
            "content : 'no table here' });</script>")
    df = spark.createDataFrame([(1, html)], ["quota_id", "html"])
    [r] = parse_hovercards(df).collect()
    assert r.slot_unix == 77
    assert r.max is None and r.available is None
