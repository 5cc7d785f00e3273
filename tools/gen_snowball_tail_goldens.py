"""Generate golden corpora for the four Snowball languages whose
vocabularies are NOT in the reference's TestSnowballVocabData.zip
(Armenian, Basque, Catalan, Irish) by running the reference's OWN
generated stemmer classes (lucene/analysis/common/src/java/org/tartarus/
snowball/ext/{Armenian,Basque,Catalan,Irish}Stemmer.java) in a
standalone JVM.

Vocabulary construction is deterministic (no RNG): for each language we
extract every string literal from the stemmer's among tables (the
complete suffix inventory the algorithm can ever match) and compose

  * each suffix alone,
  * each suffix behind deterministic stems of length 1..6 drawn from the
    language's alphabet (vowel/consonant alternation so R1/R2/RV regions
    land on every side of each condition),
  * suffix pairs behind a short stem (exercises the multi-step strips),
  * plain alphabet runs (no-match paths).

Setup (once):
  mkdir -p /tmp/snowjvm/org/tartarus/snowball/ext \
           /tmp/snowjvm/org/apache/lucene/util
  cp $REF/org/tartarus/snowball/{SnowballProgram,Among}.java \
     /tmp/snowjvm/org/tartarus/snowball/
  cp $REF/org/tartarus/snowball/ext/{Armenian,Basque,Catalan,Irish}Stemmer.java \
     /tmp/snowjvm/org/tartarus/snowball/ext/
  # two 10-line shims replace the lucene ArrayUtil.oversize /
  # RamUsageEstimator.NUM_BYTES_CHAR imports; StemTool.java reads words
  # on stdin and prints stems (see repo history)
  (cd /tmp/snowjvm && javac -encoding UTF-8 StemTool.java \
     org/tartarus/snowball/*.java org/tartarus/snowball/ext/*.java \
     org/apache/lucene/util/*.java)

Run from the repo root:  python tools/gen_snowball_tail_goldens.py
Writes tests/data/snowball_{armenian,basque,catalan,irish}_goldens.txt.gz
as word<TAB>stem.
"""

import gzip
import re
import subprocess

REF_EXT = (
    "/root/reference/lucene/analysis/common/src/java/org/tartarus/"
    "snowball/ext"
)
JVM_DIR = "/tmp/snowjvm"

# vowel-first alphabets; consonants second.  Drawn from each stemmer's
# g_v definition plus the among literals' character inventory.
LANGS = {
    "armenian": (
        "Armenian",
        "աեէիօու",  # a e ē i ō o w
        "բգդկմնտրսլ",
    ),
    "basque": ("Basque", "aeiou", "bdgklnrstz"),
    "catalan": ("Catalan", "aeiouéèíó", "bcdlmnrstç"),
    "irish": ("Irish", "aeiouáéíóú", "bcdfghlmnrst"),
}


def java_among_literals(path: str) -> list[str]:
    """All among-table string literals, Java escapes decoded."""
    src = open(path, encoding="utf-8").read()
    lits = re.findall(r'new Among\s*\(\s*"((?:[^"\\]|\\.)*)"', src)
    out = []
    for s in lits:
        out.append(
            re.sub(
                r"\\u([0-9a-fA-F]{4})",
                lambda m: chr(int(m.group(1), 16)),
                s,
            )
        )
    return sorted(set(x for x in out if x))


def stems_for(vowels: str, cons: str) -> list[str]:
    """Deterministic CV-alternating stems, lengths 1..6, both phases."""
    stems = []
    pool = [cons, vowels]
    for start in (0, 1):
        for ln in range(1, 7):
            for shift in range(3):
                w = ""
                for i in range(ln):
                    src = pool[(start + i) % 2]
                    w += src[(i * 7 + shift * 3 + ln) % len(src)]
                stems.append(w)
    return sorted(set(stems))


def build_vocab(lang_key: str) -> list[str]:
    java_name, vowels, cons = LANGS[lang_key]
    suffixes = java_among_literals(f"{REF_EXT}/{java_name}Stemmer.java")
    stems = stems_for(vowels, cons)
    vocab = set(suffixes)
    for s in stems:
        vocab.add(s)
        for suf in suffixes:
            vocab.add(s + suf)
    # suffix pairs behind a canonical 3-char stem — multi-step strips
    base = stems[len(stems) // 2]
    for i, a in enumerate(suffixes):
        b = suffixes[(i * 13 + 7) % len(suffixes)]
        vocab.add(base + b + a)
    return sorted(vocab)


def main() -> None:
    for key, (java_name, _v, _c) in LANGS.items():
        vocab = build_vocab(key)
        proc = subprocess.run(
            ["java", "StemTool", java_name],
            cwd=JVM_DIR,
            input="\n".join(vocab) + "\n",
            capture_output=True,
            text=True,
            check=True,
        )
        stems = proc.stdout.splitlines()
        assert len(stems) == len(vocab), (key, len(stems), len(vocab))
        out = f"tests/data/snowball_{key}_goldens.txt.gz"
        with gzip.open(out, "wt", encoding="utf-8") as fh:
            for w, s in zip(vocab, stems):
                fh.write(f"{w}\t{s}\n")
        print(key, len(vocab), "->", out)


if __name__ == "__main__":
    main()
