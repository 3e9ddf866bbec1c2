"""Hand-labeled German fixture for the M7 POS cascade + opinion patterns.

Each fixture sentence is labeled with the (aspect, sentiment) pairs the
reference's pattern chain (spaCy POS → ADJ+NOUN / NOUN+ADJ subsequences,
src/absa/post_opinion_patterns.py:402-421 + opinion_patterns.jsonc) should
extract.  The labels were written from the grammar of the sentences, NOT
by running the tagger — so this pins the cascade's *fidelity*, unlike the
driver oracle (which necessarily encodes the same tagger on both sides).

Sentences are museum-review register (the reference's domain), including
telegram-style predicative forms ("Preise günstig") that exercise the
NOUN+ADJ pattern, sentence-initial capitalized adjectives (lexicon must
win over the capitalization rule), suffix-derived adjectives and nouns,
and pairless sentences as negatives.
"""

from __future__ import annotations

import re

import pytest

from barberini_analytics_spark.operators.pos import (
    extract_opinion_pairs, pos_tag)

# (sentence, [(aspect_word, opinion_word), ...])
FIXTURE: list[tuple[str, list[tuple[str, str]]]] = [
    # --- plain attributive ADJ+NOUN --------------------------------------
    ("Eine schöne Ausstellung", [("Ausstellung", "schöne")]),
    ("Ein toller Besuch", [("Besuch", "toller")]),
    ("Das ist moderne Kunst", [("Kunst", "moderne")]),
    ("Wir sahen wunderbare Gemälde", [("Gemälde", "wunderbare")]),
    ("Ein langweiliger Nachmittag", [("Nachmittag", "langweiliger")]),
    ("Die große Halle beeindruckt", [("Halle", "große")]),
    ("Eine kleine Sammlung", [("Sammlung", "kleine")]),
    ("Das alte Gebäude", [("Gebäude", "alte")]),
    ("Der neue Flügel", [("Flügel", "neue")]),
    ("Die teure Cafeteria", [("Cafeteria", "teure")]),
    ("Eine interessante Führung", [("Führung", "interessante")]),
    ("Die gute Beleuchtung", [("Beleuchtung", "gute")]),
    ("Ein schlechter Service", [("Service", "schlechter")]),
    ("Die laute Gruppe störte", [("Gruppe", "laute")]),
    ("Eine lange Schlange", [("Schlange", "lange")]),
    # --- sentence-initial capitalized adjectives (lexicon beats the
    #     capitalization rule) -------------------------------------------
    ("Schöne Bilder überall", [("Bilder", "Schöne")]),
    ("Tolle Atmosphäre", [("Atmosphäre", "Tolle")]),
    ("Moderne Architektur begeistert", [("Architektur", "Moderne")]),
    ("Große Räume", [("Räume", "Große")]),
    ("Gute Auswahl", [("Auswahl", "Gute")]),
    # --- suffix-derived adjectives (-lich/-ig/-isch/-end/-iv/-bar) ------
    ("Ein freundliches Personal", [("Personal", "freundliches")]),
    ("Die herrliche Aussicht", [("Aussicht", "herrliche")]),
    ("Ein ruhiges Ambiente", [("Ambiente", "ruhiges")]),
    ("Die künstlerische Qualität", [("Qualität", "künstlerische")]),
    ("Ein spannendes Erlebnis", [("Erlebnis", "spannendes")]),
    ("Die informative Broschüre", [("Broschüre", "informative")]),
    ("Ein wunderbares Museumscafe", [("Museumscafe", "wunderbares")]),
    ("Eine kostenlose Garderobe", [("Garderobe", "kostenlose")]),
    ("Die farbige Wand", [("Wand", "farbige")]),
    ("Ein historisches Haus", [("Haus", "historisches")]),
    # --- telegram-style predicative NOUN+ADJ ----------------------------
    ("Preise günstig", [("Preise", "günstig")]),
    ("Personal freundlich", [("Personal", "freundlich")]),
    ("Eintritt teuer", [("Eintritt", "teuer")]),
    ("Ausstellung großartig", [("Ausstellung", "großartig")]),
    ("Räume hell", [("Räume", "hell")]),
    ("Garten schön", [("Garten", "schön")]),
    ("Audioguide informativ", [("Audioguide", "informativ")]),
    ("Toiletten sauber", []),             # 'sauber' not derivable: no pair
    # --- multiple pairs per sentence ------------------------------------
    ("Schöne Räume und freundliches Personal",
     [("Räume", "Schöne"), ("Personal", "freundliches")]),
    ("Eine tolle Ausstellung mit moderner Kunst",
     [("Ausstellung", "tolle"), ("Kunst", "moderner")]),
    ("Gute Führung durch alte Säle",
     [("Führung", "Gute"), ("Säle", "alte")]),
    # --- negatives: no adjacency, or copula breaks the pair -------------
    ("Das Museum ist toll", []),
    ("Die Bilder sind wunderbar", []),
    ("Der Eintritt war teuer", []),
    ("Wir kommen gerne wieder", []),
    ("Ich habe nichts gesehen", []),
    ("Die Führung dauert zwei Stunden", []),
    ("Hier gibt es viel zu sehen", []),
    ("Leider hatten wir wenig Zeit", []),
    ("Am Eingang stehen viele Leute", []),
]


def _tokenize(sentence: str) -> list[str]:
    return [w for w in re.split(r"[^\wÄÖÜäöüß]+", sentence) if w]


@pytest.fixture(scope="module")
def fixture_pairs(spark):
    rows = []
    for doc_id, (sentence, _) in enumerate(FIXTURE):
        for idx, word in enumerate(_tokenize(sentence), start=1):
            rows.append((doc_id, idx, word))
    tokens = spark.createDataFrame(rows, ["doc_id", "word_index", "word"])
    tagged = pos_tag(tokens)  # German defaults
    out = extract_opinion_pairs(tagged).collect()
    pairs: dict[int, list[tuple[str, str]]] = {
        i: [] for i in range(len(FIXTURE))}
    for r in out:
        pairs[r.doc_id].append((r.aspect_word, r.opinion_word))
    return pairs


def test_fixture_is_substantial():
    assert len(FIXTURE) >= 45
    assert sum(len(p) for _, p in FIXTURE) >= 35


def test_opinion_pairs_match_hand_labels(fixture_pairs):
    errors = []
    for doc_id, (sentence, expected) in enumerate(FIXTURE):
        got = sorted(fixture_pairs[doc_id])
        if got != sorted(expected):
            errors.append(f"{sentence!r}: expected {expected}, got {got}")
    assert not errors, "\n".join(errors)


def test_case_sql_matches_duckdb(spark):
    """The identical CASE string must tag identically in both engines —
    the property the driver oracle relies on."""
    import duckdb

    from barberini_analytics_spark.operators.pos import pos_case_sql

    words = sorted({w for s, _ in FIXTURE for w in _tokenize(s)})
    case = pos_case_sql("word")
    sdf = spark.createDataFrame([(w,) for w in words], ["word"])
    spark_tags = {
        r.word: r.tag
        for r in sdf.selectExpr("word", f"{case} AS tag").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(word VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(w,) for w in words])
    duck_tags = dict(con.execute(f"SELECT word, {case} FROM t").fetchall())
    assert spark_tags == duck_tags
