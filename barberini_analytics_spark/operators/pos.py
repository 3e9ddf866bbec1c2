"""Model-free POS tagging for the opinion-pattern chain (SURVEY §2.10 M7).

The reference tags posts with spaCy ``de_core_news_lg``
(src/absa/post_opinion_patterns.py:279-363) before searching the JSONC
opinion patterns (ADJ+NOUN / NOUN+ADJ, data/absa/opinion_patterns.jsonc).
That model is not in this runtime, so tagging is a deterministic cascade
built from public knowledge of German morphology:

1. a broadcast closed-class lexicon (articles, prepositions, pronouns,
   conjunctions, auxiliaries, common adverbs and adjectives — public word
   lists every German grammar ships);
2. the capitalization rule (German nouns are capitalized — the single
   strongest model-free signal in the language);
3. derivational suffix rules (-ung/-heit/-keit → NOUN, -lich/-ig/-isch/
   -bar/-end … → ADJ, with inflection endings expanded);
4. verb word-shape rules for what remains — lowercase (nouns were caught
   by rule 2) and not matching any earlier class, ending in the German
   finite/infinitive/participle endings -t/-te/-en (zeigt, dauerte,
   kaufen, gesehen, organisiert) or carrying the unambiguous verbal
   prefix emp- (empfehle);
5. a configurable default for the remainder.

Everything compiles to ONE ``CASE`` expression emitted by
:func:`pos_case_sql` — the identical SQL string runs as a Spark codegen
projection (``F.expr``) and as the DuckDB oracle, so both engines share a
single source of truth and the tag step adds no shuffle, no UDF, no
Python.  The fidelity of the cascade (not just its determinism) is pinned
by the hand-labeled fixture in ``tests/test_pos_fixture.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

# ---------------------------------------------------------------------------
# German tag cascade (public closed-class word lists + morphology)
# ---------------------------------------------------------------------------

#: tag → lowercase surface forms; evaluation order is the tuple order
GERMAN_POS_LEXICON: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("DET", ("der", "die", "das", "den", "dem", "des", "ein", "eine",
             "einen", "einem", "einer", "eines", "kein", "keine", "keinen",
             "keinem", "keiner", "dieser", "diese", "dieses", "diesen",
             "diesem", "jeder", "jede", "jedes", "jeden", "jedem", "alle",
             "allen", "viel", "viele", "vielen", "wenig", "wenige",
             "weniger", "mehr", "mehrere", "einige",
             # possessives, full case/gender paradigm (bare 'sein'/'ihr'
             # stay AUX/PRON — the possessive reading only surfaces
             # inflected)
             "mein", "meine", "meiner", "meinem", "meinen", "meines",
             "dein", "deine", "deiner", "deinem", "deinen", "deines",
             "seine", "seiner", "seinem", "seinen", "seines",
             "ihre", "ihrer", "ihrem", "ihren", "ihres",
             "unser", "unsere", "unserer", "unserem", "unseren", "unseres",
             "euer", "eure", "eurer", "eurem", "euren", "eures",
             "manche", "mancher", "manchen", "solche", "solcher",
             "solchen", "beide", "beiden", "beider")),
    ("ADP", ("in", "im", "an", "am", "auf", "mit", "von", "vom", "zu",
             "zum", "zur", "für", "bei", "beim", "nach", "über", "unter",
             "durch", "gegen", "ohne", "um", "aus", "hinter", "neben",
             "zwischen", "seit", "trotz", "während", "wegen")),
    ("PRON", ("ich", "du", "er", "sie", "es", "wir", "ihr", "mich", "dich",
              "ihn", "uns", "euch", "mir", "dir", "ihm", "ihnen", "man",
              "wer", "sich", "nichts", "etwas", "alles")),
    ("CCONJ", ("und", "oder", "aber", "denn", "sondern", "doch")),
    ("SCONJ", ("dass", "weil", "wenn", "obwohl", "als", "ob", "damit")),
    ("AUX", ("ist", "sind", "war", "waren", "bin", "bist", "seid", "sein",
             "hat", "haben", "habe", "hatte", "hatten", "wird", "werden",
             "wurde", "wurden", "würde", "würden", "kann", "können",
             "konnte", "konnten", "muss", "müssen", "musste", "mussten",
             "sollte", "sollten", "soll", "sollen", "wollte", "wollten",
             "will", "wollen", "darf", "dürfen", "durfte", "durften",
             "möchte", "möchten", "mögen", "mag", "könnte", "könnten",
             "müsste", "müssten", "hätte", "hätten", "wäre", "wären",
             "worden", "geworden")),
    ("ADV", ("sehr", "nicht", "auch", "nur", "noch", "schon", "immer",
             "wieder", "hier", "dort", "heute", "gestern", "leider",
             "wirklich", "absolut", "total", "ziemlich", "besonders",
             "dann", "jetzt", "oft", "nie", "mal", "so", "ganz",
             "ungefähr", "gern", "gerne", "vorher", "nachher", "online",
             "bald", "fast", "sofort", "manchmal", "meistens", "bereits",
             "eher", "sonst", "außerdem", "trotzdem", "deshalb",
             "deswegen", "dennoch", "ebenfalls", "kaum", "ebenso",
             "bisher", "danach", "davor", "dabei", "dazu", "daher",
             "darum", "vielleicht", "natürlich", "hoffentlich")),
    ("NUM", ("null", "eins", "zwei", "drei", "vier", "fünf", "sechs",
             "sieben", "acht", "neun", "zehn", "elf", "zwölf", "dreizehn",
             "vierzehn", "fünfzehn", "sechzehn", "siebzehn", "achtzehn",
             "neunzehn", "zwanzig", "dreißig", "vierzig", "fünfzig",
             "sechzig", "siebzig", "achtzig", "neunzig", "hundert",
             "tausend")),
    # common (museum-review domain) adjectives that no suffix rule can
    # recover — stems expanded through the full German strong/weak
    # inflection paradigm below (``_adj_forms``), so every case/gender
    # form (-e/-er/-es/-en/-em) is covered systematically instead of by
    # ad-hoc listing (an ad-hoc list missed e.g. dative 'schlechtem')
    ("ADJ", ()),   # filled right after _adj_forms is defined
)

#: adjective STEMS; 'teuer'/'dunkel' also list their e-elided variants
#: ('teur-', 'dunkl-') because German drops the schwa before endings
_ADJ_STEMS = (
    "schön", "gut", "toll", "super", "großartig", "wunderbar",
    "beeindruckend", "interessant", "langweilig", "schlecht", "teuer",
    "teur", "günstig", "modern", "alt", "neu", "klein", "groß", "voll",
    "laut", "leise", "leis", "hell", "dunkel", "dunkl", "lang", "kurz",
    "früh", "spät", "lecker", "ober", "fein", "gelungen", "kompetent",
    "fair", "wert", "hilfsbereit", "nett", "schnell", "einfach",
    "schwer", "leicht", "hoch", "hoh", "tief", "warm", "kalt", "heiß",
    "eng", "breit", "weit", "stark", "schwach", "jung", "reich", "arm",
    "müde", "echt", "letzt", "nächst",
    # ordinals (attributive: 'im dritten Stock')
    "erst", "zweit", "dritt", "viert", "fünft", "sechst", "siebt",
    "neunt", "zehnt",
)


def _adj_forms(stems) -> tuple[str, ...]:
    seen: dict[str, None] = {}
    for stem in stems:
        for infl in ("", "e", "er", "es", "en", "em"):
            form = stem + infl
            # skip doubled-vowel artifacts like 'leisee'
            if form not in seen and not (infl and stem.endswith("e")):
                seen[form] = None
        if stem.endswith("e") and stem not in seen:
            seen[stem] = None
    return tuple(seen)


GERMAN_POS_LEXICON = tuple(
    (tag, _adj_forms(_ADJ_STEMS) if tag == "ADJ" and not words else words)
    for tag, words in GERMAN_POS_LEXICON
)

#: suffix → tag, checked after the lexicon and capitalization rules;
#: each entry expands with the German inflection endings -e/-er/-es/-en/-em
GERMAN_SUFFIX_RULES: tuple[tuple[str, str], ...] = (
    ("ung", "NOUN"), ("heit", "NOUN"), ("keit", "NOUN"),
    ("schaft", "NOUN"), ("tät", "NOUN"), ("tion", "NOUN"),
    ("chen", "NOUN"), ("nis", "NOUN"),
    ("lich", "ADJ"), ("ig", "ADJ"), ("isch", "ADJ"), ("bar", "ADJ"),
    ("sam", "ADJ"), ("haft", "ADJ"), ("los", "ADJ"), ("end", "ADJ"),
    ("iv", "ADJ"),
)

_INFLECTIONS = ("", "e", "er", "es", "en", "em")

#: LIKE-pattern → tag, checked LAST before the default: verb word shapes.
#: Whatever reaches these rules is lowercase (capitalized words became
#: NOUN) and matched no closed-class/adjective/noun evidence, so the
#: finite/infinitive/participle endings are strong verb signals:
#: '%en' covers infinitives + plural presents + strong participles
#: (kaufen, gesehen, verstanden, -ieren), '%t' covers 2nd/3rd person +
#: weak participles (zeigt, besucht, organisiert), '%te' the weak
#: preterite (dauerte), 'emp%' the unambiguously verbal prefix
#: (empfehle).  Tokens that are none of these stay at the default.
GERMAN_VERB_SHAPES: tuple[tuple[str, str], ...] = (
    ("emp%", "VERB"),
    ("%en", "VERB"),
    ("%te", "VERB"),
    ("%t", "VERB"),
)

_UPPER = tuple("ABCDEFGHIJKLMNOPQRSTUVWXYZÄÖÜ")


def _quoted(words) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in words)


def pos_case_sql(word_col: str, lexicon=GERMAN_POS_LEXICON, *,
                 capitalized_noun: bool = True,
                 suffix_rules=GERMAN_SUFFIX_RULES,
                 verb_shapes=GERMAN_VERB_SHAPES,
                 default: str = "X") -> str:
    """One CASE expression implementing the lexicon → capitalization →
    suffix → verb-shape → default cascade.  Valid (and identical) in
    Spark SQL and DuckDB — the same string is both the query's tag
    projection and the oracle's."""
    whens = [
        f"WHEN lower({word_col}) IN ({_quoted(words)}) THEN '{tag}'"
        for tag, words in lexicon
    ]
    if capitalized_noun:
        whens.append(
            f"WHEN substring({word_col}, 1, 1) IN ({_quoted(_UPPER)}) "
            "THEN 'NOUN'")
    for suffix, tag in suffix_rules:
        likes = " OR ".join(
            f"lower({word_col}) LIKE '%{suffix}{infl}'"
            for infl in _INFLECTIONS)
        whens.append(f"WHEN {likes} THEN '{tag}'")
    for pattern, tag in verb_shapes:
        whens.append(
            f"WHEN lower({word_col}) LIKE '{pattern}' THEN '{tag}'")
    body = " ".join(whens)
    return f"CASE {body} ELSE '{default}' END"


def pos_tag(tokens: DataFrame, word_col: str = "word",
            lexicon=GERMAN_POS_LEXICON, *, capitalized_noun: bool = True,
            suffix_rules=GERMAN_SUFFIX_RULES,
            verb_shapes=GERMAN_VERB_SHAPES, default: str = "X",
            tag_col: str = "tag") -> DataFrame:
    """Add ``tag_col`` to a token frame.  Pure codegen projection — the
    cascade is one CASE expression over the scan, no join, no UDF, no
    shuffle; at 100 TB the tagger is free compared to the tokenize."""
    return tokens.withColumn(tag_col, F.expr(pos_case_sql(
        word_col, lexicon, capitalized_noun=capitalized_noun,
        suffix_rules=suffix_rules, verb_shapes=verb_shapes,
        default=default)))


# ---------------------------------------------------------------------------
# opinion-pattern extraction over a tagged token stream
# ---------------------------------------------------------------------------

def extract_opinion_pairs(tagged: DataFrame, doc_col: str = "doc_id",
                          index_col: str = "word_index",
                          word_col: str = "word",
                          tag_col: str = "tag") -> DataFrame:
    """ADJ+NOUN / NOUN+ADJ subsequence search as a ``lead()`` window —
    the JSONC pattern set of data/absa/opinion_patterns.jsonc applied the
    way src/absa/post_opinion_patterns.py:402-421 walks ``find_subseqs``,
    with the aspect/sentiment segments extracted per pattern definition.

    Adjacency comes from one sort within the document partition (J7 →
    window rewrite) — no self-join, no cross join; the result carries
    (doc, aspect_word, opinion_word, pattern).
    """
    w = W.partitionBy(doc_col).orderBy(index_col)
    bi = tagged.select(
        doc_col,
        F.col(word_col).alias("w1"), F.col(tag_col).alias("t1"),
        F.lead(word_col).over(w).alias("w2"),
        F.lead(tag_col).over(w).alias("t2"),
    )
    adj_noun = (F.col("t1") == "ADJ") & (F.col("t2") == "NOUN")
    noun_adj = (F.col("t1") == "NOUN") & (F.col("t2") == "ADJ")
    return (
        bi.filter(adj_noun | noun_adj)
        .select(
            doc_col,
            F.when(adj_noun, F.col("w2")).otherwise(F.col("w1"))
            .alias("aspect_word"),
            F.when(adj_noun, F.col("w1")).otherwise(F.col("w2"))
            .alias("opinion_word"),
            F.when(adj_noun, F.lit("ADJ_NOUN")).otherwise(F.lit("NOUN_ADJ"))
            .alias("pattern"),
        )
    )
