"""RSLP rule-table stemming: Portuguese (full + minimal) and Galician.

RSLP ("Removedor de Sufixos da Lingua Portuguesa", Orengo & Huyck,
"A Stemming Algorithm for the Portuguese Language", SPIRE 2001) is a
step/rule-table suffix stripper.  Lucene drives it from a declarative
rule resource:

- engine:    lucene/analysis/common/src/java/org/apache/lucene/analysis/
             pt/RSLPStemmerBase.java (Step/Rule semantics, rule-file grammar)
- stemmers:  pt/PortugueseStemmer.java (step composition), pt/
             PortugueseMinimalStemmer.java (Plural step only = RSLP-S),
             gl/GalicianStemmer.java, gl/GalicianMinimalStemmer.java
- rule data: pt/portuguese.rslp, gl/galician.rslp (shipped here gzipped
             under analysis/data/ — declarative rule tables, not code)

Rule-file grammar (RSLPStemmerBase.java:263-268):
  step header:  { "Name", minWordLen, exceptionsAreWholeWords(0|1),
                  {"cond-suffix", ...},
  rules:        {"suffix", minStemLen}                       (strip)
                {"suffix", minStemLen, "replacement"}        (replace)
                {"suffix", minStemLen, "repl", {"exc", ...}} (+exceptions)
  last rule of a step ends with ';'.  '#' starts a comment line.

Semantics re-implemented exactly:
- a step bypasses words shorter than its min (0 = derived from rules);
- a step with entry conditions requires one ends-with match to run;
- the FIRST matching rule fires and the step ends;
- a rule matches when len(word) - len(suffix) >= minStemLen and no
  exception matches (whole-word set, or ends-with when the step header
  flag is 0).

Spark integration is the porter_stem_map shape (analysis/stemmer.py:206):
stem once per DISTINCT vocabulary term in an Arrow batch, broadcast-join
the (term, new_term) map onto the token stream — Python cost scales with
vocabulary size, not corpus size.
"""

from __future__ import annotations

import gzip
import os
import re
from functools import lru_cache

import pandas as pd

_DATA = os.path.join(os.path.dirname(__file__), "data")

_HEADER = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
_STRIP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
_REP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
_EXC = re.compile(
    r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$'
)


class _Rule:
    __slots__ = ("suffix", "min", "replacement", "exc_words", "exc_suffixes")

    def __init__(self, suffix, min_, replacement, exc_words=None, exc_suffixes=None):
        self.suffix = suffix
        self.min = min_
        self.replacement = replacement
        self.exc_words = exc_words  # frozenset of whole words, or None
        self.exc_suffixes = exc_suffixes  # tuple of suffixes, or None

    def matches(self, w: str) -> bool:
        if len(w) - len(self.suffix) < self.min or not w.endswith(self.suffix):
            return False
        if self.exc_words is not None and w in self.exc_words:
            return False
        if self.exc_suffixes is not None and w.endswith(self.exc_suffixes):
            return False
        return True

    def replace(self, w: str) -> str:
        return w[: len(w) - len(self.suffix)] + self.replacement


class _Step:
    __slots__ = ("name", "rules", "min", "suffixes")

    def __init__(self, name, rules, min_, suffixes):
        self.name = name
        self.rules = rules
        if min_ == 0:
            min_ = min(r.min + len(r.suffix) for r in rules)
        self.min = min_
        self.suffixes = tuple(suffixes) if suffixes else None

    def apply(self, w: str) -> str:
        if len(w) < self.min:
            return w
        if self.suffixes is not None and not w.endswith(self.suffixes):
            return w
        for r in self.rules:
            if r.matches(w):
                return r.replace(w)
        return w


def _parse_list(s: str):
    if not s:
        return []
    return [item.strip()[1:-1] for item in s.split(",")]


@lru_cache(maxsize=None)
def load_steps(resource: str) -> dict[str, _Step]:
    """Parse a gzipped .rslp rule file from analysis/data/."""
    with gzip.open(os.path.join(_DATA, resource + ".gz"), "rt", encoding="utf-8") as fh:
        lines = [
            ln.strip()
            for ln in fh
            if ln.strip() and not ln.strip().startswith("#")
        ]
    steps: dict[str, _Step] = {}
    i = 0
    while i < len(lines):
        m = _HEADER.match(lines[i])
        if not m:
            raise ValueError(f"bad step header: {lines[i]!r}")
        name, min_, whole_word = m.group(1), int(m.group(2)), m.group(3) == "1"
        conds = _parse_list(m.group(4))
        i += 1
        rules: list[_Rule] = []
        while i < len(lines):
            line = lines[i]
            i += 1
            if (mm := _STRIP.match(line)) is not None:
                rules.append(_Rule(mm.group(1), int(mm.group(2)), ""))
            elif (mm := _REP.match(line)) is not None:
                rules.append(_Rule(mm.group(1), int(mm.group(2)), mm.group(3)))
            elif (mm := _EXC.match(line)) is not None:
                exc = _parse_list(mm.group(4))
                if whole_word:
                    rules.append(
                        _Rule(mm.group(1), int(mm.group(2)), mm.group(3),
                              exc_words=frozenset(exc))
                    )
                else:
                    rules.append(
                        _Rule(mm.group(1), int(mm.group(2)), mm.group(3),
                              exc_suffixes=tuple(exc))
                    )
            else:
                raise ValueError(f"bad rule line: {line!r}")
            if line.endswith(";"):
                break
        steps[name] = _Step(name, rules, min_, conds)
    return steps


# ---------------------------------------------------------------------------
# Portuguese (PortugueseStemmer.java / PortugueseMinimalStemmer.java)
# ---------------------------------------------------------------------------

_PT_ACCENTS = str.maketrans(
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ", "aaaaaaceeeeiiiinooooouuuuyy"
)


def portuguese_minimal_stem(w: str) -> str:
    """RSLP-S: plural-reduction step only (PortugueseMinimalStemmer.java)."""
    return load_steps("portuguese.rslp")["Plural"].apply(w)


def portuguese_rslp_stem(w: str) -> str:
    """Full RSLP (PortugueseStemmer.java step composition)."""
    steps = load_steps("portuguese.rslp")
    w = steps["Plural"].apply(w)
    w = steps["Adverb"].apply(w)
    w = steps["Feminine"].apply(w)
    w = steps["Augmentative"].apply(w)
    old = w
    w = steps["Noun"].apply(w)
    if w == old:
        old = w
        w = steps["Verb"].apply(w)
        if w == old:
            w = steps["Vowel"].apply(w)
    return w.translate(_PT_ACCENTS)


# ---------------------------------------------------------------------------
# Galician (GalicianStemmer.java / GalicianMinimalStemmer.java)
# ---------------------------------------------------------------------------

_GL_ACCENTS = str.maketrans("áéêíóú", "aeeiou")


def galician_minimal_stem(w: str) -> str:
    return load_steps("galician.rslp")["Plural"].apply(w)


def galician_stem(w: str) -> str:
    steps = load_steps("galician.rslp")
    w = steps["Plural"].apply(w)
    w = steps["Unification"].apply(w)
    w = steps["Adverb"].apply(w)
    while True:
        old = w
        w = steps["Augmentative"].apply(w)
        if w == old:
            break
    old = w
    w = steps["Noun"].apply(w)
    if w == old:
        w = steps["Verb"].apply(w)
    w = steps["Vowel"].apply(w)
    return w.translate(_GL_ACCENTS)


RSLP_STEMMERS = {
    "pt_minimal": portuguese_minimal_stem,
    "pt_rslp": portuguese_rslp_stem,
    "gl_minimal": galician_minimal_stem,
    "gl_rslp": galician_stem,
}


def rslp_stem_map(vocab, key: str):
    """(term, new_term) dictionary frame — the porter_stem_map shape."""
    from pyspark.sql import functions as F

    fn = RSLP_STEMMERS[key]

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(fn)

    return vocab.select(
        F.col("term"), _stem(F.col("term")).alias("new_term")
    ).where(F.col("new_term") != F.col("term"))
