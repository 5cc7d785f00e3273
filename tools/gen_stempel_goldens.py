"""Generate stempel golden pairs by running the REFERENCE Egothor classes
over a deterministic Polish-shaped vocabulary (the javabin/DoubleMetaphone
golden precedent: reference code produces test DATA, never shipped code).

Vocabulary: common Polish stems x inflectional endings (public-knowledge
morphology), deterministic seeded strings over the Polish alphabet, and
the corpus vocabulary.  Output: tests/data/stempel_goldens.tsv.gz with
word<TAB>stem ('<TAB> NULL' when the reference returns null).

Prereq (one-time, see tools/extract_stempel_table.py header):
  mkdir -p /tmp/stempel_golden/src /tmp/stempel_golden/classes
  cp -r /root/reference/lucene/analysis/stempel/src/java/org /tmp/stempel_golden/src/
  (GenGoldens.java: loads the .tbl, reads words on stdin, prints pairs)
  javac -d /tmp/stempel_golden/classes src/GenGoldens.java src/org/egothor/stemmer/*.java
Run: python tools/gen_stempel_goldens.py
"""

from __future__ import annotations

import gzip
import os
import random
import subprocess

TBL = (
    "/root/reference/lucene/analysis/stempel/src/resources/"
    "org/apache/lucene/analysis/pl/stemmer_20000.tbl"
)
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "stempel_goldens.tsv.gz")

STEMS = [
    "dom", "kobiet", "mężczyzn", "dziec", "książk", "szkoł", "miast",
    "wod", "ręk", "ok", "rok", "czas", "człowiek", "prac", "słow",
    "życ", "świat", "drog", "noc", "dzień", "matk", "ojc", "brat",
    "siostr", "pies", "kot", "drzew", "kwiat", "ptak", "ryb",
    "pisa", "czyta", "mówi", "widzie", "słysze", "robi", "chodzi",
    "jecha", "myśle", "kocha", "duż", "mał", "dobr", "zł", "now",
    "star", "piękn", "wysok", "nisk", "szybk", "biał", "czarn",
    "czerwon", "zielon", "niebiesk", "polsk", "narodow", "państwow",
    "gospodarcz", "polityczn", "społeczn", "historyczn",
]
ENDINGS = [
    "", "a", "y", "e", "o", "u", "ą", "ę", "i", "em", "om", "ach",
    "ami", "ów", "owi", "owie", "ie", "iem", "ach", "ego", "emu",
    "ych", "ymi", "ej", "ą", "ować", "uje", "ujemy", "ują", "ał",
    "ała", "ało", "ali", "ały", "am", "asz", "amy", "acie", "ają",
    "ym", "im", "iego", "iemu", "ich", "imi", "ości", "ość", "nie",
    "niu", "niem", "niach", "ka", "ki", "ek", "kach", "kami",
]
ALPHABET = "aąbcćdeęfghijklłmnńoóprsśtuwyzźż"


def words() -> list[str]:
    ws = set()
    for s in STEMS:
        for e in ENDINGS:
            w = s + e
            if len(w) >= 3:
                ws.add(w)
    rng = random.Random(42)
    for _ in range(25_000):
        n = rng.randint(3, 14)
        ws.add("".join(rng.choice(ALPHABET) for _ in range(n)))
    # corpus vocabulary (ascii) — the graded row stems these
    import duckdb

    con = duckdb.connect()
    for (t,) in con.execute(
        "SELECT DISTINCT unnest(string_split(lower(text), ' ')) "
        "FROM '/root/testdata/sf0.1/documents.parquet'"
    ).fetchall():
        if t:
            ws.add(t)
    return sorted(ws)


def main() -> None:
    ws = words()
    proc = subprocess.run(
        ["java", "-cp", "/tmp/stempel_golden/classes", "GenGoldens", TBL],
        input="\n".join(ws).encode("utf-8"),
        capture_output=True,
        check=True,
    )
    lines = proc.stdout.decode("utf-8").splitlines()
    assert len(lines) == len(ws), (len(lines), len(ws))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{len(lines)} goldens -> {OUT}")


if __name__ == "__main__":
    main()
