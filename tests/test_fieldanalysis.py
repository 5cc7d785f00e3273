"""/analysis/field handler analog (search/fieldanalysis.py)."""

from lucene_solr_spark.analysis.analyzer import analyze_text
from lucene_solr_spark.search.fieldanalysis import field_analysis


def test_stage_progression():
    out = field_analysis("The Quick FOXES are jumping")
    idx = out["index"]
    # tokenizer keeps raw case with offsets
    tok = idx["StandardTokenizer"]
    assert [t["text"] for t in tok] == [
        "The", "Quick", "FOXES", "are", "jumping"
    ]
    assert tok[0]["start"] == 0 and tok[0]["end"] == 3
    assert tok[2]["start"] == 10 and tok[2]["end"] == 15
    assert [t["position"] for t in tok] == [0, 1, 2, 3, 4]
    # lowercase preserves offsets/positions
    low = idx["LowerCaseFilter"]
    assert [t["text"] for t in low] == [
        "the", "quick", "foxes", "are", "jumping"
    ]
    # stop filter drops 'the'/'are' but keeps the position gaps
    stop = idx["StopFilter"]
    assert [t["text"] for t in stop] == ["quick", "foxes", "jumping"]
    assert [t["position"] for t in stop] == [1, 2, 4]


def test_final_stage_matches_engine_analyzer():
    text = "Tables ARE turning: the rows, the keys & the values!"
    out = field_analysis(text)
    final = [t["text"] for t in out["index"]["StopFilter"]]
    assert final == analyze_text(text)


def test_showmatch_against_query():
    out = field_analysis(
        "The quick foxes", query="foxes jumping", showmatch=True
    )
    stop = out["index"]["StopFilter"]
    assert {t["text"]: t["match"] for t in stop} == {
        "quick": False, "foxes": True
    }
    # query section analyzed through the same chain
    assert [t["text"] for t in out["query"]["StopFilter"]] == [
        "foxes", "jumping"
    ]


def test_overlong_token_advances_position():
    long_tok = "x" * 300
    out = field_analysis(f"alpha {long_tok} beta")
    stop = out["index"]["StopFilter"]
    assert [(t["text"], t["position"]) for t in stop] == [
        ("alpha", 0), ("beta", 2)
    ]
