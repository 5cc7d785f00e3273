"""Hyphenation-grammar compound splitting — Liang's TeX algorithm over
FOP hyphenation XML, feeding the compound token filter.

Reference:
- lucene/analysis/common/src/java/org/apache/lucene/analysis/compound/
  hyphenation/HyphenationTree.java (:hyphenate word normalization with
  leading/trailing non-letter handling, exception stoplist, the
  interletter-value max over every pattern matching at every position,
  odd-value = hyphen point, synthetic 0/len end points)
- .../hyphenation/PatternParser.java (:179-249 getPattern strips the
  digits, getInterletterValues aligns digit-before-letter values with a
  sentinel so len(values) == len(chars)+1; <classes> tokens map every
  member char to the token's first (canonical) char)
- .../compound/HyphenationCompoundWordTokenFilter.java (:decompose —
  parts between hyphenation points bounded by min/maxSubwordSize,
  optional dictionary filter with the partLength-1 genitive retry,
  onlyLongestMatch per start point; no-dictionary mode emits every
  sized part)

Reference test expectations (TestCompoundWordTokenFilter
testHyphenationCompoundWordsDA/DELongestMatch/testHyphenationOnly over
da_UTF8.xml) pass exactly in tests/test_hyphenation.py.

Scale shape: the grammar is parsed once on the driver (KB); splitting
integrates index-side through the positioned-expansion term machinery
or as a mapInPandas vocabulary pass — the corpus stays distributed.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET


class HyphenationTree:
    """Pattern store + hyphenate(), HyphenationTree.java semantics."""

    def __init__(self):
        self.classes: dict[str, str] = {}   # char -> canonical class char
        self.patterns: dict[str, tuple[int, ...]] = {}
        self.max_pattern_len = 0
        self.stoplist: dict[str, list[object]] = {}

    # --- construction (PatternParser.java) ---
    @classmethod
    def from_xml(cls, path: str) -> "HyphenationTree":
        text = open(path, "rb").read().decode("utf-8")
        # strip the DOCTYPE (references an external DTD)
        text = re.sub(r"<!DOCTYPE[^>]*>", "", text)
        root = ET.fromstring(text)
        tree = cls()
        for el in root:
            tag = el.tag
            body = (el.text or "") + "".join(
                (c.tail or "") for c in el
            )
            if tag == "classes":
                for token in body.split():
                    tree.add_class(token)
            elif tag == "patterns":
                for token in body.split():
                    tree.add_pattern(token)
            elif tag == "exceptions":
                for token in body.split():
                    tree.add_exception(token)
        return tree

    def add_class(self, chargroup: str) -> None:
        canonical = chargroup[0]
        for ch in chargroup:
            self.classes[ch] = canonical

    def add_pattern(self, token: str) -> None:
        chars = "".join(c for c in token if not c.isdigit())
        # digit-before-letter values with a trailing sentinel slot
        values = []
        probe = token + "a"
        i = 0
        while i < len(probe):
            c = probe[i]
            if c.isdigit():
                values.append(int(c))
                i += 2
            else:
                values.append(0)
                i += 1
        self.patterns[chars] = tuple(values)
        self.max_pattern_len = max(self.max_pattern_len, len(chars))

    def add_exception(self, hyphenated: str) -> None:
        parts = hyphenated.split("-")
        self.stoplist["".join(parts)] = parts

    # --- hyphenation (HyphenationTree.hyphenate) ---
    def hyphenate(self, w: str, remain: int = 1, push: int = 1):
        """Hyphenation points as indices into ``w`` (with synthetic 0 and
        len endpoints), or None when the word has none."""
        # normalize: classmap letters only; leading non-letters ignored,
        # any letter AFTER a non-letter kills hyphenation
        norm: list[str] = []
        ignore_at_beginning = 0
        end_of_letters = False
        for i, ch in enumerate(w):
            nc = self.classes.get(ch)
            if nc is None:
                if i == ignore_at_beginning:
                    ignore_at_beginning += 1
                else:
                    end_of_letters = True
            else:
                if end_of_letters:
                    return None
                norm.append(nc)
        n = len(norm)
        if n < remain + push:
            return None
        points: list[int] = []
        sw = "".join(norm)
        if sw in self.stoplist:
            j = 0
            for part in self.stoplist[sw]:
                j += len(part)
                if remain <= j < n - push:
                    points.append(j + ignore_at_beginning)
        else:
            word = "." + sw + "."
            il = [0] * (len(word) + 1)
            for i in range(0, n + 1):
                # every pattern matching word at position i
                lim = min(self.max_pattern_len, len(word) - i)
                for L in range(1, lim + 1):
                    vals = self.patterns.get(word[i : i + L])
                    if vals is None:
                        continue
                    for k, v in enumerate(vals):
                        if i + k < len(il) and v > il[i + k]:
                            il[i + k] = v
            # odd interletter value = hyphen point
            for i in range(0, n):
                if (il[i + 1] & 1) == 1 and remain <= i <= n - push:
                    points.append(i + ignore_at_beginning)
        if not points:
            return None
        return [0] + points + [n]


def hyphenation_compound_decompose(
    word: str,
    tree: HyphenationTree,
    dictionary: frozenset[str] | set[str] | None = None,
    min_word_size: int = 5,
    min_subword_size: int = 2,
    max_subword_size: int = 15,
    only_longest_match: bool = False,
) -> list[str]:
    """HyphenationCompoundWordTokenFilter over one token: original token
    first, then each hyphen-bounded part (dictionary-filtered when a
    dictionary is given, with the partLength-1 genitive-s retry)."""
    out = [word]
    if len(word) < min_word_size:
        return out
    hyp = tree.hyphenate(word, 1, 1)
    if hyp is None:
        return out
    low = word.lower()
    dict_has = (
        (lambda s: s in dictionary) if dictionary is not None else None
    )
    for i in range(len(hyp)):
        start = hyp[i]
        longest = None
        for j in range(1, len(hyp) - i):
            part_len = hyp[i + j] - start
            if part_len > max_subword_size:
                break
            if part_len < min_subword_size:
                continue
            if dict_has is None or dict_has(low[start : start + part_len]):
                if only_longest_match:
                    if longest is None or longest[1] < part_len:
                        longest = (start, part_len)
                else:
                    out.append(word[start : start + part_len])
            elif dict_has(low[start : start + part_len - 1]):
                if only_longest_match:
                    if longest is None or longest[1] < part_len - 1:
                        longest = (start, part_len - 1)
                else:
                    out.append(word[start : start + part_len - 1])
        if only_longest_match and longest is not None:
            out.append(word[longest[0] : longest[0] + longest[1]])
    return out
