"""Snowball English (Porter2): the reference's full vocabulary golden set
(TestSnowballVocabData.zip english/, 29,417 pairs) + the term-map frame."""

import gzip
import os

from lucene_solr_spark.analysis.snowball import porter2_stem, porter2_stem_map

_GOLD = os.path.join(
    os.path.dirname(__file__), "data", "snowball_english_goldens.txt.gz"
)


def test_reference_vocab_goldens_all():
    n, bad = 0, []
    with gzip.open(_GOLD, "rt", encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            a, b = line.split("\t")
            n += 1
            g = porter2_stem(a)
            if g != b:
                bad.append((a, g, b))
    assert n == 29417
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_spot_differences_vs_porter1():
    # the canonical Porter-vs-Porter2 splits
    assert porter2_stem("generously") == "generous"   # R1 prefix rule
    assert porter2_stem("communication") == "communic"
    assert porter2_stem("dying") == "die"             # exceptional form
    assert porter2_stem("news") == "news"             # invariant
    assert porter2_stem("conspicuously") == "conspicu"
    assert porter2_stem("cries") == "cri"
    assert porter2_stem("ties") == "tie"              # short -ies -> ie
    assert porter2_stem("ugly") == "ugli"


def test_term_map_frame(spark):
    vocab = spark.createDataFrame(
        [("running",), ("tables",), ("run",)], "term string"
    )
    got = {r.term: r.new_term for r in porter2_stem_map(vocab).collect()}
    assert got == {"running": "run", "tables": "tabl"}
