"""Double Metaphone: full golden corpus generated from the REAL
commons-codec encoder in the Spark JVM (tools/gen_dm_goldens.py — the exact
class PhoneticFilterFactory instantiates), plus the term-map frame."""

import gzip
import os

from lucene_solr_spark.analysis.metaphone import (
    double_metaphone,
    double_metaphone_map,
)

_GOLD = os.path.join(
    os.path.dirname(__file__), "data", "double_metaphone_goldens.txt.gz"
)


def test_commons_codec_goldens_all():
    n, bad = 0, []
    with gzip.open(_GOLD, "rt", encoding="utf-8") as fh:
        for line in fh:
            w, p, a = line.rstrip("\n").split("\t")
            n += 1
            gp, ga = double_metaphone(w)
            if gp != p or ga != a:
                bad.append((w, (gp, ga), (p, a)))
    assert n > 9000
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_classic_pairs():
    # the canonical primary/alternate splits from Philips' paper
    assert double_metaphone("smith") == ("SM0", "XMT")
    assert double_metaphone("schmidt") == ("XMT", "SMT")
    assert double_metaphone("jose") == ("HS", "HS")
    assert double_metaphone("cabrillo") == ("KPRL", "KPR")
    assert double_metaphone("xavier") == ("SF", "SFR")
    assert double_metaphone("knight") == ("NT", "NT")
    assert double_metaphone("thomas") == ("TMS", "TMS")
    assert double_metaphone("") == ("", "")
    assert double_metaphone("   ") == ("", "")


def test_term_map_frame(spark):
    vocab = spark.createDataFrame(
        [("merge",), ("smith",), ("12",)], "term string"
    )
    got = {r.term: r.new_term for r in double_metaphone_map(vocab).collect()}
    assert got == {"merge": "MRJ", "smith": "SM0"}  # '12' has no code
