"""One-time dev-side extraction of the KStem lexicon into a gzipped data file.

The Krovetz stemmer is dictionary-driven: its behavior depends on a ~30k-word
English lexicon plus five small conflation tables, shipped by the reference as
string-array data files (lucene/analysis/common/src/java/org/apache/lucene/
analysis/en/KStemData1-8.java and the tables at the top of KStemmer.java).
The word lists are DATA, not code — the public-domain lexicon from Bob
Krovetz's original kstem distribution (CIIR UMass Amherst, BSD-style license
reproduced in the reference headers).  This script parses them once and
writes lucene_solr_spark/analysis/data/kstem_lexicon.json.gz, which the
engine loads at runtime (the repo never reads /root/reference at runtime).

Run from the repo root:  python tools/extract_kstem_lexicon.py
"""

import gzip
import json
import re

REF = "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/en"

_STR = re.compile(r'"([^"]*)"')


def _java_array_strings(path: str, decl: str) -> list[str]:
    """All string literals inside `decl ... = { ... };` in a Java file."""
    src = open(path).read()
    start = src.index(decl)
    open_b = src.index("{", start)
    depth, i = 0, open_b
    while True:
        if src[i] == "{":
            depth += 1
        elif src[i] == "}":
            depth -= 1
            if depth == 0:
                break
        i += 1
    return _STR.findall(src[open_b : i + 1])


def main() -> None:
    lexicon: list[str] = []
    for n in range(1, 9):
        lexicon.extend(
            _java_array_strings(f"{REF}/KStemData{n}.java", "data = ")
        )
    kst = f"{REF}/KStemmer.java"
    exceptions = _java_array_strings(kst, "exceptionWords = ")
    direct = _java_array_strings(kst, "directConflations = ")
    country = _java_array_strings(kst, "countryNationality = ")
    supplement = _java_array_strings(kst, "supplementDict = ")
    proper = _java_array_strings(kst, "properNouns = ")
    assert len(direct) % 2 == 0 and len(country) % 2 == 0
    out = {
        "lexicon": lexicon,
        "exceptions": exceptions,
        "direct": [direct[i : i + 2] for i in range(0, len(direct), 2)],
        "country": [country[i : i + 2] for i in range(0, len(country), 2)],
        "supplement": supplement,
        "proper": proper,
    }
    dest = "lucene_solr_spark/analysis/data/kstem_lexicon.json.gz"
    with gzip.open(dest, "wt", encoding="utf-8", compresslevel=9) as fh:
        json.dump(out, fh)
    print(
        f"wrote {dest}: lexicon={len(lexicon)} exceptions={len(exceptions)} "
        f"direct={len(out['direct'])} country={len(out['country'])} "
        f"supplement={len(supplement)} proper={len(proper)}"
    )


if __name__ == "__main__":
    main()
