"""SnowballPorterFilterFactory language registry.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
snowball/SnowballPorterFilterFactory.java:55-75 — `language="X"` loads
org.tartarus.snowball.ext.XStemmer. This maps the same language names to
the pure-Python stem functions and to the vocabulary-level term-map
builders (the porter_stem_map integration shape, analysis/stemmer.py:
one Arrow batch over |V| distinct terms, broadcast-joined into the
posting build — the corpus never passes through Python).
"""

from __future__ import annotations

import pandas as pd

from lucene_solr_spark.analysis.snowball import porter2_stem
from lucene_solr_spark.analysis.stemmer import porter_classic_stem
from lucene_solr_spark.analysis.snowball_de import (
    german2_snowball_stem,
    german_snowball_stem,
)
from lucene_solr_spark.analysis.snowball_es import spanish_snowball_stem
from lucene_solr_spark.analysis.snowball_fi import finnish_snowball_stem
from lucene_solr_spark.analysis.snowball_fr import french_snowball_stem
from lucene_solr_spark.analysis.snowball_hu import hungarian_snowball_stem
from lucene_solr_spark.analysis.snowball_it import italian_snowball_stem
from lucene_solr_spark.analysis.snowball_ca import catalan_stem
from lucene_solr_spark.analysis.snowball_eu import basque_stem
from lucene_solr_spark.analysis.snowball_ga import irish_stem
from lucene_solr_spark.analysis.snowball_hy import armenian_stem
from lucene_solr_spark.analysis.snowball_kp import kp_stem
from lucene_solr_spark.analysis.snowball_lovins import lovins_stem
from lucene_solr_spark.analysis.snowball_nl import dutch_snowball_stem
from lucene_solr_spark.analysis.snowball_nordic import (
    danish_snowball_stem,
    norwegian_snowball_stem,
    swedish_snowball_stem,
)
from lucene_solr_spark.analysis.snowball_pt import portuguese_snowball_stem
from lucene_solr_spark.analysis.snowball_ro import romanian_snowball_stem
from lucene_solr_spark.analysis.snowball_ru import russian_snowball_stem
from lucene_solr_spark.analysis.snowball_tr import turkish_snowball_stem

# language name (as SnowballPorterFilterFactory accepts) -> word stemmer
SNOWBALL_STEMMERS = {
    "English": porter2_stem,
    "Porter": porter_classic_stem,
    "German": german_snowball_stem,
    "German2": german2_snowball_stem,
    "Danish": danish_snowball_stem,
    "Norwegian": norwegian_snowball_stem,
    "Swedish": swedish_snowball_stem,
    "Russian": russian_snowball_stem,
    "Spanish": spanish_snowball_stem,
    "Italian": italian_snowball_stem,
    "Portuguese": portuguese_snowball_stem,
    "French": french_snowball_stem,
    "Dutch": dutch_snowball_stem,
    "Finnish": finnish_snowball_stem,
    "Hungarian": hungarian_snowball_stem,
    "Romanian": romanian_snowball_stem,
    "Turkish": turkish_snowball_stem,
    "Kp": kp_stem,
    "Lovins": lovins_stem,
    "Armenian": armenian_stem,
    "Basque": basque_stem,
    "Catalan": catalan_stem,
    "Irish": irish_stem,
}


def snowball_stem_map(vocab, language: str):
    """(term, new_term) dictionary over a distinct-term frame for the
    given Snowball language — the porter_stem_map shape."""
    from pyspark.sql import functions as F

    fn = SNOWBALL_STEMMERS[language]

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(fn)

    return vocab.select(
        F.col("term"), _stem(F.col("term")).alias("new_term")
    ).where(F.col("new_term") != F.col("term"))
