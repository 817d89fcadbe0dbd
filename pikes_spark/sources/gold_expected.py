"""Frozen golden fixtures for the gold mini-corpus (SURVEY.md §5:
golden-test strategy — expected outputs frozen after review, asserted
per component like the reference's gold-graph evaluator,
pikes-rdf/src/test/.../eval/Evaluation.java).

These lists are the REVIEWED expected outputs of the deterministic
NLP+distillation stack on sources.gold.GOLD_PAGES. The driver oracle
embeds them as SQL VALUES; pytest asserts them too. If pipeline
behavior changes, the drift is caught here and the fixtures must be
consciously re-reviewed and re-frozen.
"""

from __future__ import annotations

GOLD_URL = "http://example.org/gold/"

# (gold_id, timex_type, timeml_value)
EXPECTED_TIMEXES = [
    ("g9", "DATE", "2002-03"),
    ("g11", "DATE", "1998"),
    ("g12", "DURATION", "P3W"),
    ("g14", "DATE", "2002-03"),
]

# (gold_id, entity_type, surface) — named entities after NER
EXPECTED_ENTITIES = [
    ('g1', 'MISC', 'Syrian'),
    ('g1', 'ORG', 'Al Qaeda'),
    ('g1', 'LOC', 'United States'),
    ('g1', 'MISC', 'Islamic'),
    ('g2', 'ORG', 'Nusra Front'),
    ('g5', 'ORG', 'Al Qaeda'),
    ('g5', 'LOC', 'Iraq'),
    ('g5', 'MISC', 'Iraqi'),
    ('g5', 'MISC', 'Iraqi'),
    ('g6', 'MISC', 'Syrian'),
    ('g6', 'LOC', 'Iraq'),
    ('g6', 'ORG', 'Al Qaeda'),
    ('g6', 'LOC', 'Iraq'),
    ('g6', 'ORG', 'Nusra Front'),
    ('g6', 'LOC', 'Syria'),
    ('g7', 'LOC', 'United States'),
    ('g7', 'LOC', 'Syria'),
    ('g7', 'PER', 'Bashar al-Assad'),
    ('g7', 'LOC', 'Syria'),
    ('g8', 'LOC', 'United States'),
    ('g8', 'ORG', 'Syrian opposition'),
    ('g8', 'ORG', 'Nusra Front'),
    ('g8', 'MISC', 'Americans'),
    ('g8', 'LOC', 'Europe'),
    ('g9', 'PER', 'G.W. Bush'),
    ('g9', 'PER', 'Bono'),
    ('g9', 'MISC', 'HIV'),
    ('g9', 'LOC', 'Africa'),
    ('g11', 'PER', 'Blatter'),
    ('g11', 'ORG', 'FIFA'),
    ('g12', 'PER', 'Barack Obama'),
    ('g12', 'LOC', 'Paris'),
    ('g13', 'PER', 'John'),
    ('g13', 'PER', 'Mary'),
    ('g13', 'LOC', 'London'),
    ('g14', 'LOC', 'United States'),
    ('g14', 'LOC', 'Africa'),
    ('g15', 'PER', 'Bono'),
    ('g15', 'LOC', 'United States'),
    ('g15', 'PER', 'G.W. Bush'),
    ('g15', 'LOC', 'Paris'),
]

# (gold_id, dbpedia_uri) — entity-linking output
EXPECTED_LINKS = [
    ('g1', 'http://dbpedia.org/resource/Al-Qaeda'),
    ('g1', 'http://dbpedia.org/resource/United_States'),
    ('g2', 'http://dbpedia.org/resource/Al-Nusra_Front'),
    ('g5', 'http://dbpedia.org/resource/Al-Qaeda'),
    ('g5', 'http://dbpedia.org/resource/Iraq'),
    ('g6', 'http://dbpedia.org/resource/Al-Nusra_Front'),
    ('g6', 'http://dbpedia.org/resource/Al-Qaeda'),
    ('g6', 'http://dbpedia.org/resource/Iraq'),
    ('g6', 'http://dbpedia.org/resource/Iraq'),
    ('g6', 'http://dbpedia.org/resource/Syria'),
    ('g7', 'http://dbpedia.org/resource/Bashar_al-Assad'),
    ('g7', 'http://dbpedia.org/resource/Syria'),
    ('g7', 'http://dbpedia.org/resource/Syria'),
    ('g7', 'http://dbpedia.org/resource/United_States'),
    ('g8', 'http://dbpedia.org/resource/Al-Nusra_Front'),
    ('g8', 'http://dbpedia.org/resource/Americans'),
    ('g8', 'http://dbpedia.org/resource/Europe'),
    ('g8', 'http://dbpedia.org/resource/Syrian_opposition'),
    ('g8', 'http://dbpedia.org/resource/United_States'),
    ('g9', 'http://dbpedia.org/resource/Africa'),
    ('g9', 'http://dbpedia.org/resource/Bono'),
    ('g9', 'http://dbpedia.org/resource/George_W._Bush'),
    ('g9', 'http://dbpedia.org/resource/HIV'),
    ('g11', 'http://dbpedia.org/resource/FIFA'),
    ('g11', 'http://dbpedia.org/resource/Sepp_Blatter'),
    ('g12', 'http://dbpedia.org/resource/Barack_Obama'),
    ('g12', 'http://dbpedia.org/resource/Paris'),
    ('g13', 'http://dbpedia.org/resource/London'),
    ('g14', 'http://dbpedia.org/resource/Africa'),
    ('g14', 'http://dbpedia.org/resource/United_States'),
    ('g15', 'http://dbpedia.org/resource/Bono'),
    ('g15', 'http://dbpedia.org/resource/George_W._Bush'),
    ('g15', 'http://dbpedia.org/resource/Paris'),
    ('g15', 'http://dbpedia.org/resource/United_States'),
]

# (gold_id, propbank_or_nombank_roleset) — predicates after SRL
EXPECTED_ROLESETS: list = []  # frozen below once reviewed


def values_sql(rows, cols) -> str:
    parts = []
    for row in rows:
        lits = []
        for v in row:
            if isinstance(v, str):
                lits.append("'" + v.replace("'", "''") + "'")
            else:
                lits.append(str(v))
        parts.append("(" + ", ".join(lits) + ")")
    return ("SELECT * FROM (VALUES " + ", ".join(parts) + ") AS t("
            + ", ".join(cols) + ")")
