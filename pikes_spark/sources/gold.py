"""Deterministic gold mini-corpus unioned into the pages table.

Pages G1-G8 are the reference's 8-sentence gold-standard evaluation
set (src/site/markdown/eval-pm.md:34-97); G9 is the 2-sentence
overview example (src/site/markdown/overview.md:5); G10-G15 exercise
value normalization, copular be, appositives, coordination, dates and
cross-page surface repetition (FIXTURES.md §1 content mix).

Every text is an ASCII-stable literal so the DuckDB oracle can embed
the exact same rows (see gold_union_sql) and the byte-identical
extraction invariant covers them too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

GOLD_PAGES = [
    ("g1", "The lone Syrian rebel group with an explicit stamp of approval "
           "from Al Qaeda has become one of the uprising most effective "
           "fighting forces, posing a stark challenge to the United States "
           "and other countries that want to support the rebels but not "
           "Islamic extremists."),
    ("g2", "Money flows to the group, the Nusra Front, from like-minded "
           "donors abroad."),
    ("g3", "Its fighters, a small minority of the rebels, have the boldness "
           "and skill to storm fortified positions and lead other battalions "
           "to capture military bases and oil fields."),
    ("g4", "As their successes mount, they gather more weapons and attract "
           "more fighters."),
    ("g5", "The group is a direct offshoot of Al Qaeda in Iraq, Iraqi "
           "officials and former Iraqi insurgents say, which has contributed "
           "veteran fighters and weapons."),
    ("g6", "This is just a simple way of returning the favor to our Syrian "
           "brothers that fought with us on the lands of Iraq, said a "
           "veteran of Al Qaeda in Iraq, who said he helped lead the Nusra "
           "Front efforts in Syria."),
    ("g7", "The United States, sensing that time may be running out for "
           "Syria president Bashar al-Assad, hopes to isolate the group to "
           "prevent it from inheriting Syria."),
    ("g8", "As the United States pushes the Syrian opposition to organize a "
           "viable alternative government, it plans to blacklist the Nusra "
           "Front as a terrorist organization, making it illegal for "
           "Americans to have financial dealings with the group and "
           "prompting similar sanctions from Europe."),
    ("g9", "G.W. Bush and Bono are very strong supporters of the fight of "
           "HIV in Africa. Their March 2002 meeting resulted in a 5 billion "
           "dollar aid."),
    ("g10", "It cost $5 billion. The project reached twenty percent of the "
            "third quarter target."),
    ("g11", "Blatter became president of FIFA in 1998."),
    ("g12", "Barack Obama, the president, visited Paris for three weeks."),
    ("g13", "John and Mary met in London. They signed a new agreement."),
    ("g14", "The United States announced a new aid program for Africa in "
            "March 2002."),
    ("g15", "Bono visited the United States. He met G.W. Bush in Paris."),
]

GOLD_TS = "2026-01-01 00:00:00"


def gold_pages_df(spark: SparkSession) -> DataFrame:
    """Gold pages with the same 5-column pages contract (html built by
    the same Spark expression as documents-derived pages)."""
    from pyspark.sql import functions as F
    from .pages import html_col
    rows = [(f"http://example.org/gold/{gid}", text) for gid, text in GOLD_PAGES]
    df = spark.createDataFrame(rows, "url string, text string")
    return df.select(
        "url",
        F.to_timestamp(F.lit(GOLD_TS)).alias("warc_ts"),
        html_col(F.col("text")).alias("html"),
        "text",
        F.lit("en").alias("lang"))


def gold_union_sql() -> str:
    """DuckDB VALUES clause mirroring gold_pages_df (url, warc_ts, text,
    lang) — single-quote-escaped literals."""
    rows = []
    for gid, text in GOLD_PAGES:
        esc = text.replace("'", "''")
        rows.append(f"('http://example.org/gold/{gid}', "
                    f"TIMESTAMP '{GOLD_TS}', '{esc}', 'en')")
    return ("SELECT * FROM (VALUES " + ", ".join(rows) +
            ") AS g(url, warc_ts, text, lang)")
