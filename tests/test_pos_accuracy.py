"""Measured fidelity of the model-free German POS cascade (M7).

The reference tags with spaCy ``de_core_news_lg``
(``src/absa/post_opinion_patterns.py:277-463``); this runtime's cascade
(``operators/pos.py``) is a documented stand-in.  This fixture puts a
NUMBER on the divergence: 300+ tokens of museum-review-register German,
hand-labeled with UD-style coarse tags from the sentence grammar (NOT by
running any tagger), and the cascade's token accuracy is pinned against
stated floors.

Known, structural divergences (see README §POS fidelity): a handful of
function-word ambiguities a per-token cascade cannot disambiguate are
frozen lexicon-side (``zu`` → ADP even as the infinitive particle,
``viel`` → DET even substitutive, ``lange`` → ADJ even adverbial,
capitalized AUX/VERB homograph nouns like ``Muss`` → AUX).  VERBs are
recovered by word-shape rules (-t/-te/-en endings, emp- prefix) checked
after every stronger class; unknown lowercase non-verbs with those
endings mistag as VERB instead of X — a tag the ADJ/NOUN-consuming
opinion patterns never read.

What the opinion-pattern chain actually consumes is ADJ and NOUN
adjacency, so NOUN/ADJ recall carry their own (higher) floors.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from barberini_analytics_spark.operators.pos import pos_case_sql

# (sentence, space-separated hand labels aligned to tokenization)
LABELED: list[tuple[str, str]] = [
    ("Wir haben das Museum am Sonntag besucht",
     "PRON AUX DET NOUN ADP NOUN VERB"),
    ("Die Ausstellung war wirklich beeindruckend und sehr gut organisiert",
     "DET NOUN AUX ADV ADJ CCONJ ADV ADJ VERB"),
    ("Ein schönes Gebäude mit freundlichem Personal",
     "DET ADJ NOUN ADP ADJ NOUN"),
    ("Der Eintritt ist für Studenten günstig",
     "DET NOUN AUX ADP NOUN ADJ"),
    ("Leider waren die Räume ziemlich voll",
     "ADV AUX DET NOUN ADV ADJ"),
    ("Man kann hier moderne Kunst aus Frankreich sehen",
     "PRON AUX ADV ADJ NOUN ADP NOUN VERB"),
    ("Die Führung dauert ungefähr zwei Stunden",
     "DET NOUN VERB ADV NUM NOUN"),
    ("Ich empfehle einen Besuch am frühen Morgen",
     "PRON VERB DET NOUN ADP ADJ NOUN"),
    ("Das Personal an der Kasse war unfreundlich",
     "DET NOUN ADP DET NOUN AUX ADJ"),
    ("Die Bilder von Monet sind wunderbar",
     "DET NOUN ADP NOUN AUX ADJ"),
    ("Wir mussten lange an der Garderobe warten",
     "PRON AUX ADV ADP DET NOUN VERB"),
    ("Der Garten hinter dem Museum ist kostenlos",
     "DET NOUN ADP DET NOUN AUX ADJ"),
    ("Eine tolle Sammlung impressionistischer Malerei",
     "DET ADJ NOUN ADJ NOUN"),
    ("Die Ausstellung über niederländische Meister hat uns begeistert",
     "DET NOUN ADP ADJ NOUN AUX PRON VERB"),
    ("Das Café bietet leckeren Kuchen und guten Kaffee",
     "DET NOUN VERB ADJ NOUN CCONJ ADJ NOUN"),
    ("Wir kommen gerne wieder wenn die neue Ausstellung beginnt",
     "PRON VERB ADV ADV SCONJ DET ADJ NOUN VERB"),
    ("Die Tickets sollte man vorher online kaufen",
     "DET NOUN AUX PRON ADV ADV VERB"),
    ("Ein historisches Haus mit spannender Geschichte",
     "DET ADJ NOUN ADP ADJ NOUN"),
    ("Der Audioguide ist informativ aber etwas langatmig",
     "DET NOUN AUX ADJ CCONJ ADV ADJ"),
    ("Die Beleuchtung in den Sälen ist hervorragend",
     "DET NOUN ADP DET NOUN AUX ADJ"),
    ("Wir haben nichts von der Führung verstanden",
     "PRON AUX PRON ADP DET NOUN VERB"),
    ("Am Eingang stehen oft viele Leute",
     "ADP NOUN VERB ADV DET NOUN"),
    ("Das Museumscafe hat leider schon geschlossen",
     "DET NOUN AUX ADV ADV VERB"),
    ("Eine kleine aber feine Sammlung",
     "DET ADJ CCONJ ADJ NOUN"),
    ("Die Sonderausstellung lohnt sich wirklich",
     "DET NOUN VERB PRON ADV"),
    ("Schöne Räume und eine gute Auswahl an Gemälden",
     "ADJ NOUN CCONJ DET ADJ NOUN ADP NOUN"),
    ("Der Shop verkauft schöne Postkarten",
     "DET NOUN VERB ADJ NOUN"),
    ("Ich war gestern mit meiner Familie dort",
     "PRON AUX ADV ADP DET NOUN ADV"),
    ("Die Architektur des Hauses ist einzigartig",
     "DET NOUN DET NOUN AUX ADJ"),
    ("Man sollte mehr Zeit für die oberen Etagen einplanen",
     "PRON AUX DET NOUN ADP DET ADJ NOUN VERB"),
    ("Die Werke sind chronologisch geordnet",
     "DET NOUN AUX ADJ VERB"),
    ("Wir hatten einen wunderbaren Nachmittag im Museum",
     "PRON AUX DET ADJ NOUN ADP NOUN"),
    ("Die Schlange an der Kasse war sehr lang",
     "DET NOUN ADP DET NOUN AUX ADV ADJ"),
    ("Ein Besuch lohnt sich auch bei schlechtem Wetter",
     "DET NOUN VERB PRON ADV ADP ADJ NOUN"),
    ("Die Dauerausstellung zeigt Werke aus drei Jahrhunderten",
     "DET NOUN VERB NOUN ADP NUM NOUN"),
    ("Das Licht in diesem Saal ist dunkel",
     "DET NOUN ADP DET NOUN AUX ADJ"),
    ("Wir empfehlen die Führung am Nachmittag",
     "PRON VERB DET NOUN ADP NOUN"),
    ("Die Mitarbeiter waren hilfsbereit und kompetent",
     "DET NOUN AUX ADJ CCONJ ADJ"),
    ("Ein Muss für jeden Kunstliebhaber",
     "DET NOUN ADP DET NOUN"),
    ("Die Ausstellung war uns das Geld nicht wert",
     "DET NOUN AUX PRON DET NOUN ADV ADJ"),
    ("Hier gibt es viel zu sehen und zu lernen",
     "ADV VERB PRON PRON PART VERB CCONJ PART VERB"),
    ("Die Eintrittspreise sind im Vergleich fair",
     "DET NOUN AUX ADP NOUN ADJ"),
    ("Besonders die Werke von Munch haben uns gefallen",
     "ADV DET NOUN ADP NOUN AUX PRON VERB"),
    ("Der Rundgang beginnt im dritten Stock",
     "DET NOUN VERB ADP ADJ NOUN"),
    ("Eine gelungene Mischung aus alter und neuer Kunst",
     "DET ADJ NOUN ADP ADJ CCONJ ADJ NOUN"),
    # --- round-10 extension: written AFTER the verb word-shape rules
    # were frozen, deliberately using open-class words that appear in NO
    # lexicon list (malte, bestellten, spielten, erklärte, wirken,
    # spürte, probte, hängen, findet, gestohlen, zurückgebracht,
    # beschreibt, wartete, zeigten, loben, Wachmann, Orangerie, …) so
    # the cascade's morphology rules are measured on unseen vocabulary,
    # not on memorized entries ------------------------------------------
    ("Der Künstler malte dieses Porträt in Paris",
     "DET NOUN VERB DET NOUN ADP NOUN"),
    ("Wir bestellten zwei Karten im Voraus",
     "PRON VERB NUM NOUN ADP NOUN"),
    ("Die Kinder spielten im Innenhof des Palais",
     "DET NOUN VERB ADP NOUN DET NOUN"),
    ("Ein Wachmann erklärte uns den Weg zur Orangerie",
     "DET NOUN VERB PRON DET NOUN ADP NOUN"),
    ("Die Skulpturen wirken lebendig und kräftig",
     "DET NOUN VERB ADJ CCONJ ADJ"),
    ("Man spürte die Begeisterung der Besucher",
     "PRON VERB DET NOUN DET NOUN"),
    ("Das Orchester probte hinter der Bühne",
     "DET NOUN VERB ADP DET NOUN"),
    ("Seine Werke hängen seit Jahren in unserer Galerie",
     "DET NOUN VERB ADP NOUN ADP DET NOUN"),
    ("Die Renovierung dauerte fast vier Monate",
     "DET NOUN VERB ADV NUM NOUN"),
    ("Ihr findet die Garderobe neben dem Aufzug",
     "PRON VERB DET NOUN ADP DET NOUN"),
    ("Ein Gemälde wurde gestohlen und danach zurückgebracht",
     "DET NOUN AUX VERB CCONJ ADV VERB"),
    ("Die Broschüre beschreibt jede Epoche im Detail",
     "DET NOUN VERB DET NOUN ADP NOUN"),
    ("Man wartete kaum zehn Minuten",
     "PRON VERB ADV NUM NOUN"),
    ("Die Fotografien zeigten das alte Potsdam",
     "DET NOUN VERB DET ADJ NOUN"),
    ("Besucher loben den neuen Audioguide",
     "NOUN VERB DET ADJ NOUN"),
]


def _tokenize(sentence: str) -> list[str]:
    return [w for w in re.split(r"[^\wÄÖÜäöüß]+", sentence) if w]


def _tagged_tokens() -> list[tuple[str, str]]:
    out = []
    for sentence, labels in LABELED:
        toks = _tokenize(sentence)
        tags = labels.split()
        assert len(toks) == len(tags), sentence
        out.extend(zip(toks, tags))
    return out


def test_fixture_is_substantial():
    assert len(_tagged_tokens()) >= 300


def test_cascade_accuracy_floors():
    """Token accuracy of the cascade vs hand labels, via the SAME CASE
    SQL the Spark operator compiles (engine-equality with Spark is
    pinned separately in test_pos_fixture.py::test_case_sql_matches_duckdb
    — DuckDB here keeps this measurement JVM-free and fast)."""
    tokens = _tagged_tokens()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(idx INT, word VARCHAR, gold VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)",
                    [(i, w, g) for i, (w, g) in enumerate(tokens)])
    case = pos_case_sql("word")
    rows = con.execute(
        f"SELECT word, gold, {case} AS got FROM t ORDER BY idx").fetchall()

    n = len(rows)
    correct = sum(1 for _, gold, got in rows if gold == got)
    acc = correct / n

    def recall(tag):
        rel = [(w, gold, got) for w, gold, got in rows if gold == tag]
        return sum(1 for _, g, o in rel if g == o) / len(rel), len(rel)

    noun_rec, n_noun = recall("NOUN")
    adj_rec, n_adj = recall("ADJ")
    verb_rows = [(w, g, o) for w, g, o in rows if g == "VERB"]
    nonverb = [(w, g, o) for w, g, o in rows if g != "VERB"]
    nonverb_acc = sum(1 for _, g, o in nonverb if g == o) / len(nonverb)

    # the pinned floors — measured on this fixture (round 10, after the
    # verb word-shape rules + lexicon growth): 0.980 overall, NOUN 0.99,
    # ADJ 1.00, VERB 1.00, non-VERB 0.98 — at the level of
    # de_core_news_lg's ~0.98 German UPOS accuracy.  The residual misses
    # are per-token-undecidable function-word ambiguities (see module
    # docstring), not open-class gaps.
    assert n_noun >= 70 and n_adj >= 40   # the classes that matter most
    assert noun_rec >= 0.97, (noun_rec, [r for r in rows
                                         if r[1] == "NOUN" and r[1] != r[2]])
    assert adj_rec >= 0.95, (adj_rec, [r for r in rows
                                       if r[1] == "ADJ" and r[1] != r[2]])
    verb_rec = (sum(1 for _, g, o in verb_rows if g == o)
                / max(1, len(verb_rows)))
    assert verb_rec >= 0.90, (verb_rec,
                              [r for r in verb_rows if r[1] != r[2]])
    assert nonverb_acc >= 0.95, nonverb_acc
    assert acc >= 0.95, (acc, [r for r in rows if r[1] != r[2]][:20])
    # a VERB→NOUN mistag would inject false aspect candidates into the
    # opinion patterns — still pinned to zero
    mis_as_pair_input = [r for r in verb_rows if r[2] == "NOUN"]
    assert not mis_as_pair_input, mis_as_pair_input
