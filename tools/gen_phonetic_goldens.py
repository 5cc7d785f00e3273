"""Generate golden corpora for Metaphone / RefinedSoundex / Caverphone2 /
ColognePhonetic from the REAL commons-codec encoders running in the Spark
JVM (commons-codec is on the PySpark classpath — the exact classes
PhoneticFilterFactory instantiates), and differential-check the pure-Python
encoders in analysis/phonetic_more.py against them.

Writes tests/data/phonetic_more_goldens.txt.gz as
word<TAB>metaphone<TAB>refined<TAB>caverphone2<TAB>cologne over the sf0.01
corpus vocabulary plus a stress list.

Run from the repo root:  python tools/gen_phonetic_goldens.py
"""

import gzip
import sys

sys.path.insert(0, ".")

STRESS = [
    "smith", "schmidt", "snider", "schneider", "knight", "gnome", "wright",
    "psalm", "michael", "caesar", "orchestra", "architect", "orchid",
    "accident", "accede", "succeed", "hiccups", "edge", "edgar", "hugh",
    "bough", "laugh", "cough", "rough", "tough", "enough", "trough",
    "agnes", "gestalt", "gibbon", "gilbert", "geyser", "danger", "thames",
    "thomas", "island", "isle", "sugar", "school", "schooner", "scenario",
    "science", "scott", "dumb", "thumb", "plumber", "numbered", "campbell",
    "raspberry", "pizza", "jumble", "jam", "jim", "chemistry", "llama",
    "maria", "apex", "next", "exxon", "accept", "aexx", "ghost", "gnaw",
    "pneumonia", "wrack", "whale", "xavier", "aeon", "czar", "tsar",
    "lightning", "night", "tion", "nation", "motion", "ratio", "patio",
    "watch", "match", "catch", "pitch", "judge", "badge", "bridge",
    "sign", "signed", "design", "resign", "align", "benign", "champagne",
    "cologne", "muller", "mueller", "meyer", "maier", "mayr", "schmitt",
    "schulz", "schultz", "wachter", "bauer", "hoffmann", "hofmann",
    "zimmermann", "kuntz", "kunze", "heinrich", "heinz", "xylophone",
    "box", "fox", "axe", "taxi", "exist", "example", "breathe", "breath",
    "this", "that", "three", "through", "who", "whom", "why", "where",
    "yellow", "yes", "beyond", "say", "stay", "crying", "city", "cellar",
    "cycle", "ocean", "special", "social", "ancient", "cia", "gracias",
    "washington", "worcester", "leicester", "gloucester", "thorough",
    "aaa", "bb", "ccc", "kn", "gn", "pn", "ae", "wr", "wh", "x", "a", "i",
]


def main() -> None:
    from lucene_solr_spark.analysis.phonetic_more import (
        caverphone2,
        cologne_phonetic,
        metaphone,
        refined_soundex,
    )
    from lucene_solr_spark.session import get_spark

    spark = get_spark("ph-goldens", master="local[4]", shuffle_partitions=4)
    jvm = spark._jvm
    j_meta = jvm.org.apache.commons.codec.language.Metaphone()
    j_ref = jvm.org.apache.commons.codec.language.RefinedSoundex()
    j_cav = jvm.org.apache.commons.codec.language.Caverphone2()
    j_cgn = jvm.org.apache.commons.codec.language.ColognePhonetic()

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
    # pseudo-words that exercise every handler: digraph seeds crossed with
    # vowel/consonant contexts, plus md5-driven letter soup (the same
    # scheme the Double Metaphone goldens use)
    import hashlib
    import itertools

    seeds = [
        "ch", "sch", "gh", "gn", "kn", "pn", "wr", "ps", "cc", "ci", "ce",
        "cy", "cz", "ck", "cg", "cq", "dg", "dt", "dd", "sio", "sia", "sh",
        "sc", "th", "tth", "tion", "tia", "tch", "wicz", "witz", "ivf",
        "umb", "ill", "all", "ize", "x", "z", "j", "q", "w", "y",
        "mb", "ng", "gned", "ough", "augh", "eigh", "pph", "hw", "wh",
    ]
    ctx = ["a", "o", "e", "i", "u", "r", "n", "t", ""]
    pseudo = set()
    for s, pre, post in itertools.product(seeds, ctx, ctx):
        pseudo.add(pre + s + post)
        pseudo.add(pre + s + post + "s")
    for i in range(3000):
        h = hashlib.md5(f"phw{i}".encode()).hexdigest()
        pseudo.add("".join(chr(ord("a") + int(c, 16) % 26) for c in h[:8]))
    words = sorted(set(vocab) | set(STRESS) | pseudo)
    print(f"{len(words)} words")

    mism = {k: [] for k in ("meta", "ref", "cav", "cgn")}
    rows = []
    for w in words:
        jm = j_meta.metaphone(w)
        jr = j_ref.soundex(w)
        jc = j_cav.encode(w)
        jg = j_cgn.colognePhonetic(w)
        rows.append((w, jm, jr, jc, jg))
        if metaphone(w) != jm:
            mism["meta"].append((w, metaphone(w), jm))
        if refined_soundex(w) != jr:
            mism["ref"].append((w, refined_soundex(w), jr))
        if caverphone2(w) != jc:
            mism["cav"].append((w, caverphone2(w), jc))
        if cologne_phonetic(w) != jg:
            mism["cgn"].append((w, cologne_phonetic(w), jg))

    for k, v in mism.items():
        print(f"{k}: {len(v)} mismatches")
        for w, got, want in v[:15]:
            print(f"  {w!r}: py={got!r} jvm={want!r}")

    if not any(mism.values()):
        with gzip.open(
            "tests/data/phonetic_more_goldens.txt.gz", "wt"
        ) as f:
            for r in rows:
                f.write("\t".join(r) + "\n")
        print(f"WROTE {len(rows)} goldens")
    else:
        print("NOT WRITING — fix mismatches first")
    spark.stop()


if __name__ == "__main__":
    main()
