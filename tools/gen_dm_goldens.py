"""Generate the Double Metaphone golden corpus from the REAL
org.apache.commons.codec.language.DoubleMetaphone running in the Spark JVM
(commons-codec-1.19.0 is on the PySpark classpath — the exact encoder
PhoneticFilterFactory instantiates).  Writes
tests/data/double_metaphone_goldens.txt.gz as word<TAB>primary<TAB>alternate
over the sf0.01 corpus vocabulary plus a surname/edge-case stress list.

Run from the repo root:  python tools/gen_dm_goldens.py
"""

import gzip
import sys

sys.path.insert(0, ".")

STRESS = [
    # the published trouble spots Philips' paper and the codec tests call out
    "smith", "schmidt", "snider", "schneider", "jose", "san", "sanjacinto",
    "cabrillo", "gallegos", "xavier", "knight", "gnome", "pneumatic", "wright",
    "psalm", "michael", "chianti", "bacher", "macher", "caesar", "chae",
    "charac", "charis", "chor", "chym", "chia", "chem", "chore", "orchestra",
    "architect", "orchid", "wachtler", "wechsler", "tichner", "mchugh",
    "czerny", "focaccia", "bellocchio", "bacchus", "accident", "accede",
    "succeed", "bertucci", "hiccups", "mac caffrey", "mac gregor", "edge",
    "edgar", "ghislane", "ghiradelli", "hugh", "bough", "broughton", "laugh",
    "cough", "rough", "tough", "enough", "agnes", "tagliaro", "gestalt",
    "gepard", "gibbon", "gilbert", "geyser", "danger", "ranger", "manger",
    "bergy", "orgy", "vongerichten", "schlegel", "get", "thames", "thomas",
    "van gogh", "von schlegel", "island", "isle", "carlisle", "carlysle",
    "sugar", "sholz", "sheim", "shoek", "sholm", "silvio", "asia", "artois",
    "resnais", "rogier", "hochmeier", "school", "schooner", "schermerhorn",
    "schenker", "scenario", "science", "scott", "filipowicz", "zhao",
    "zimmer", "jankelowicz", "bajador", "yankelovich", "wasserman",
    "vasserman", "uomo", "womo", "arnow", "arnoff", "breaux", "alexander",
    "excite", "dumb", "thumb", "plumber", "numbered", "campbell", "raspberry",
    "pizza", "pizzeria", "jjone", "jumble", "jam", "jim", "hajj",
    "cappuccino", "caprice", "cialis", "ciao", "chemistry", "zsa",
    "llama", "cabrillas", "valle", "vallee", "maria", "aix", "eaux",
    "croix", "apex", "next", "exxon", "accept", "tucci",
]


def main() -> None:
    from lucene_solr_spark.session import get_spark

    spark = get_spark("dm-goldens", master="local[4]", shuffle_partitions=4)
    dm = spark._jvm.org.apache.commons.codec.language.DoubleMetaphone()

    import duckdb

    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.execute(
            """SELECT DISTINCT lower(t) FROM (
                 SELECT unnest(regexp_extract_all(text,
                   '(?:[A-Za-z]+(?:[''.][A-Za-z]+)*|[0-9]+(?:[.,''][0-9]+)*|[0-9A-Za-z_])+')) AS t
                 FROM '/root/testdata/sf0.01/documents.parquet')
               WHERE t <> '' ORDER BY 1"""
        ).fetchall()
    ]
    # the synthetic corpus vocabulary is small, so add deterministic
    # pseudo-words that exercise every handler: all digraph seeds crossed
    # with vowel/consonant contexts, plus md5-driven letter soup
    import hashlib
    import itertools

    seeds = [
        "ch", "sch", "gh", "gn", "kn", "pn", "wr", "ps", "cc", "ci", "ce",
        "cy", "cz", "ck", "cg", "cq", "dg", "dt", "dd", "sio", "sia", "sh",
        "sc", "th", "tth", "tion", "tia", "tch", "wicz", "witz", "ivf",
        "umb", "ill", "all", "ize", "x", "z", "j", "q", "w", "y",
    ]
    ctx = ["a", "o", "e", "i", "u", "r", "n", "t", ""]
    pseudo = set()
    for s, pre, post in itertools.product(seeds, ctx, ctx):
        pseudo.add(pre + s + post)
        pseudo.add(pre + s + post + "s")
    for i in range(3000):
        h = hashlib.md5(f"dmw{i}".encode()).hexdigest()
        pseudo.add("".join(chr(ord("a") + int(c, 16) % 26) for c in h[:8]))
    words = sorted(set(vocab) | set(STRESS) | pseudo)
    rows = []
    for w in words:
        rows.append((w, dm.doubleMetaphone(w) or "", dm.doubleMetaphone(w, True) or ""))
    with gzip.open(
        "tests/data/double_metaphone_goldens.txt.gz", "wt", encoding="utf-8"
    ) as fh:
        for w, p, a in rows:
            fh.write(f"{w}\t{p}\t{a}\n")
    print(f"wrote {len(rows)} goldens")


if __name__ == "__main__":
    main()
