"""KStem — Bob Krovetz's dictionary-based English stemmer.

Re-derivation of the published Krovetz algorithm (R. Krovetz, "Viewing
Morphology as an Inference Process", SIGIR 1993; public kstem C
distribution, CIIR UMass Amherst) as shipped by the reference
(lucene/analysis/common/src/java/org/apache/lucene/analysis/en/
KStemmer.java:478-1520, KStemFilter.java).  Unlike Porter, KStem checks a
~28k-word lexicon at every step, so inflectional variants conflate to real
words (``memorial`` stays, ``memorized`` -> ``memorize``).

The lexicon and conflation tables are DATA (the public-domain Krovetz word
lists, KStemData1-8.java + the tables at KStemmer.java:75-225), extracted
once by tools/extract_kstem_lexicon.py into data/kstem_lexicon.json.gz —
nothing reads the reference at runtime.

Fidelity notes (each matters for golden-exactness on the reference's
kstemTestData, 12,130 pairs):

- The reference mutates an ``OpenStringBuilder`` whose ``setLength`` only
  moves the logical end — truncated characters SURVIVE in the underlying
  array and several endings deliberately resurrect them by growing the
  length back (e.g. erAndOrEndings after a doubled-consonant attempt).
  ``_Buf`` reproduces exactly that.
- ``lookup()`` overwrites the match cache even with exception entries;
  ``wordInDict()`` consults the cache and never caches exceptions
  (KStemmer.java:467-482, 556-575).
- The cascade order and the bare ``wordInDict()`` between alEndings and
  iveEndings (KStemmer.java:1436-1465) are observable: if the current form
  is in the lexicon and iveEndings doesn't fire, the loop breaks there.

Spark integration is vocabulary-level, the same shape as porter_stem_map
(analysis/stemmer.py): stem the |V| DISTINCT terms once through one Arrow
batch and broadcast-join the term map back into the posting build — zero
per-token Python at scale.
"""

from __future__ import annotations

import gzip
import json
import os

import pandas as pd

_MAX_WORD_LEN = 50
_VOWELS = frozenset("aeiou")


class _DictEntry:
    __slots__ = ("root", "exception")

    def __init__(self, root: str | None, exception: bool):
        self.root = root
        self.exception = exception


def _load_dict() -> dict[str, _DictEntry]:
    path = os.path.join(
        os.path.dirname(__file__), "data", "kstem_lexicon.json.gz"
    )
    with gzip.open(path, "rt", encoding="utf-8") as fh:
        data = json.load(fh)
    d: dict[str, _DictEntry] = {}
    for w in data["exceptions"]:
        d[w] = _DictEntry(w, True)
    for variant, root in data["direct"]:
        d[variant] = _DictEntry(root, False)
    for nationality, country in data["country"]:
        d[nationality] = _DictEntry(country, False)
    default = _DictEntry(None, False)
    for key in ("lexicon", "supplement", "proper"):
        for w in data[key]:
            d.setdefault(w, default)
    return d


_DICT: dict[str, _DictEntry] | None = None


def _dict_ht() -> dict[str, _DictEntry]:
    global _DICT
    if _DICT is None:
        _DICT = _load_dict()
    return _DICT


class _Buf:
    """OpenStringBuilder semantics: setLength truncates logically but the
    underlying chars survive and can be resurrected by growing length."""

    __slots__ = ("a", "n")

    def __init__(self, s: str):
        self.a = list(s)
        self.n = len(s)

    def __len__(self) -> int:
        return self.n

    def char_at(self, i: int) -> str:
        return self.a[i]

    def set_char(self, i: int, c: str) -> None:
        self.a[i] = c

    def set_length(self, n: int) -> None:
        self.n = n

    def write(self, c: str) -> None:
        if self.n < len(self.a):
            self.a[self.n] = c
        else:
            self.a.append(c)
        self.n += 1

    def append(self, s: str) -> None:
        for c in s:
            self.write(c)

    def value(self) -> str:
        return "".join(self.a[: self.n])


class _KStemmer:
    """One stem() call; holds (word, j, k, matched_entry) like the
    reference's instance state.  j = index of the char before the matched
    suffix; k = index of the final letter."""

    def __init__(self, dict_ht: dict[str, _DictEntry]):
        self.d = dict_ht
        self.word: _Buf = _Buf("")
        self.j = 0
        self.k = 0
        self.matched: _DictEntry | None = None

    # --- primitives -----------------------------------------------------
    def _is_cons(self, i: int) -> bool:
        ch = self.word.char_at(i)
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self._is_cons(i - 1)

    def _is_vowel(self, i: int) -> bool:
        return not self._is_cons(i)

    def _vowel_in_stem(self) -> bool:
        return any(self._is_vowel(i) for i in range(self.j + 1))

    def _double_c(self, i: int) -> bool:
        if i < 1:
            return False
        w = self.word
        return w.char_at(i) == w.char_at(i - 1) and self._is_cons(i)

    def _lookup(self) -> bool:
        self.matched = self.d.get(self.word.value())
        return self.matched is not None

    def _word_in_dict(self) -> _DictEntry | None:
        if self.matched is not None:
            return self.matched
        e = self.d.get(self.word.value())
        if e is not None and not e.exception:
            self.matched = e
        return e

    def _ends_in(self, s: str) -> bool:
        """char[]-array endsIn: j=k even on mismatch (after the length
        gate), j=r-1 on match; compares from the buffer length."""
        if len(s) > self.k:
            return False
        w = self.word
        r = len(w) - len(s)
        self.j = self.k
        for i, c in enumerate(s):
            if c != w.char_at(r + i):
                return False
        self.j = r - 1
        return True

    def _ends_in_k(self, s: str) -> bool:
        """fixed-arity endsIn(a,b[,c[,d]]): k-relative compare, j set only
        on match."""
        n = len(s)
        if n > self.k:
            return False
        w, k = self.word, self.k
        for i, c in enumerate(s):
            if w.char_at(k - (n - 1) + i) != c:
                return False
        self.j = k - n
        return True

    def _set_suffix(self, s: str) -> None:
        self.word.set_length(self.j + 1)
        self.word.append(s)
        self.k = self.j + len(s)

    # --- the ending cascade (KStemmer.java order) -----------------------
    def _plural(self) -> None:
        w = self.word
        if w.char_at(self.k) != "s":
            return
        if self._ends_in_k("ies"):
            w.set_length(self.j + 3)
            self.k -= 1
            if self._lookup():  # calories -> calorie
                return
            self.k += 1
            w.write("s")
            self._set_suffix("y")
            self._lookup()
        elif self._ends_in_k("es"):
            w.set_length(self.j + 2)
            self.k -= 1
            # aides -> aide but aided -> aid; the double-s gate keeps
            # crosses from becoming crosse
            try_e = self.j > 0 and not (
                w.char_at(self.j) == "s" and w.char_at(self.j - 1) == "s"
            )
            if try_e and self._lookup():
                return
            w.set_length(self.j + 1)
            self.k -= 1
            if self._lookup():
                return
            w.write("e")
            self.k += 1
            if not try_e:
                self._lookup()
            return
        else:
            if (
                len(w) > 3
                and w.char_at(self.k - 1) != "s"
                and not self._ends_in_k("ous")
            ):
                w.set_length(self.k)
                self.k -= 1
                self._lookup()

    def _past_tense(self) -> None:
        w = self.word
        if len(w) <= 4:
            return
        if self._ends_in_k("ied"):
            w.set_length(self.j + 3)
            self.k -= 1
            if self._lookup():  # died -> die, not dy
                return
            self.k += 1
            w.write("d")
            self._set_suffix("y")
            self._lookup()
            return
        if self._ends_in_k("ed") and self._vowel_in_stem():
            w.set_length(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry.exception:
                return
            w.set_length(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            if self._double_c(self.k):
                w.set_length(self.k)
                self.k -= 1
                if self._lookup():
                    return
                w.write(w.char_at(self.k))
                self.k += 1
                self._lookup()
                return
            if w.char_at(0) == "u" and w.char_at(1) == "n":
                w.write("e")
                w.write("d")
                self.k += 2
                return
            w.set_length(self.j + 1)
            w.write("e")
            self.k = self.j + 1

    def _aspect(self) -> None:
        w = self.word
        if len(w) <= 5:
            return
        if self._ends_in_k("ing") and self._vowel_in_stem():
            w.set_char(self.j + 1, "e")
            w.set_length(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry.exception:
                return
            w.set_length(self.k)
            self.k -= 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self.k -= 1
                w.set_length(self.k + 1)
                if self._lookup():
                    return
                w.write(w.char_at(self.k))
                self.k += 1
                self._lookup()
                return
            if self.j > 0 and self._is_cons(self.j) and self._is_cons(self.j - 1):
                self.k = self.j
                w.set_length(self.k + 1)
                return
            w.set_length(self.j + 1)
            w.write("e")
            self.k = self.j + 1

    def _ity_endings(self) -> None:
        w = self.word
        old_k = self.k
        if self._ends_in_k("ity"):
            w.set_length(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w.write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_char(self.j + 1, "i")
            w.append("ty")
            self.k = old_k
            # -ability/-ibility -> -ble, unconditionally productive
            if self.j > 0 and w.char_at(self.j - 1) == "i" and w.char_at(self.j) == "l":
                w.set_length(self.j - 1)
                w.append("le")
                self.k = self.j
                self._lookup()
                return
            if self.j > 0 and w.char_at(self.j - 1) == "i" and w.char_at(self.j) == "v":
                w.set_length(self.j + 1)
                w.write("e")
                self.k = self.j + 1
                self._lookup()
                return
            if self.j > 0 and w.char_at(self.j - 1) == "a" and w.char_at(self.j) == "l":
                w.set_length(self.j + 1)
                self.k = self.j
                self._lookup()
                return
            if self._lookup():  # immunity -> immune, but capacity stays
                return
            w.set_length(self.j + 1)
            self.k = self.j

    def _ness_endings(self) -> None:
        w = self.word
        if self._ends_in_k("ness"):
            w.set_length(self.j + 1)
            self.k = self.j
            if w.char_at(self.j) == "i":
                w.set_char(self.j, "y")
            self._lookup()

    def _ion_endings(self) -> None:
        w = self.word
        old_k = self.k
        if not self._ends_in_k("ion"):
            return
        if self._ends_in("ization"):  # -ization -> -ize, always
            w.set_length(self.j + 3)
            w.write("e")
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends_in("ition"):
            w.set_length(self.j + 1)
            w.write("e")
            self.k = self.j + 1
            if self._lookup():  # definition -> define
                return
            w.set_length(self.j + 1)
            w.append("ition")
            self.k = old_k
        elif self._ends_in("ation"):
            w.set_length(self.j + 3)
            w.write("e")
            self.k = self.j + 3
            if self._lookup():  # elimination -> eliminate
                return
            w.set_length(self.j + 1)
            w.write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_length(self.j + 1)  # resignation -> resign
            self.k = self.j
            if self._lookup():
                return
            w.set_length(self.j + 1)
            w.append("ation")
            self.k = old_k
        # -ication after -ation: complication -> complicate, not comply
        if self._ends_in("ication"):
            w.set_length(self.j + 1)
            w.write("y")
            self.k = self.j + 1
            if self._lookup():  # amplification -> amplify
                return
            w.set_length(self.j + 1)
            w.append("ication")
            self.k = old_k
        # plain -ion (already matched): reset j explicitly
        self.j = self.k - 3
        w.set_length(self.j + 1)
        w.write("e")
        self.k = self.j + 1
        if self._lookup():
            return
        w.set_length(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        w.set_length(self.j + 1)
        w.append("ion")
        self.k = old_k

    def _er_and_or_endings(self) -> None:
        w = self.word
        old_k = self.k
        if w.char_at(self.k) != "r":
            return
        if self._ends_in_k("izer"):  # -izer -> -ize, always
            w.set_length(self.j + 4)
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends_in_k("er") or self._ends_in_k("or"):
            word_char = w.char_at(self.j + 1)
            if self._double_c(self.j):
                w.set_length(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.write(w.char_at(self.j - 1))
            if w.char_at(self.j) == "i":  # -ier -> -y
                w.set_char(self.j, "y")
                w.set_length(self.j + 1)
                self.k = self.j
                if self._lookup():
                    return
                w.set_char(self.j, "i")
                w.write("e")
            if w.char_at(self.j) == "e":  # -eer
                w.set_length(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.write("e")
            w.set_length(self.j + 2)
            self.k = self.j + 1
            if self._lookup():  # remove just the -r
                return
            w.set_length(self.j + 1)
            self.k = self.j
            if self._lookup():  # remove -er/-or
                return
            w.write("e")
            self.k = self.j + 1
            if self._lookup():  # -or -> -e
                return
            w.set_length(self.j + 1)
            w.write(word_char)
            w.write("r")
            self.k = old_k

    def _ly_endings(self) -> None:
        w = self.word
        old_k = self.k
        if self._ends_in_k("ly"):
            w.set_char(self.j + 2, "e")  # -ly -> -le
            if self._lookup():
                return
            w.set_char(self.j + 2, "y")
            w.set_length(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            # -ally -> -al, always (heuristically -> heuristical,
            # alEndings finishes it)
            if self.j > 0 and w.char_at(self.j - 1) == "a" and w.char_at(self.j) == "l":
                return
            w.append("ly")
            self.k = old_k
            if self.j > 0 and w.char_at(self.j - 1) == "a" and w.char_at(self.j) == "b":
                w.set_char(self.j + 2, "e")  # -ably -> -able, always
                self.k = self.j + 2
                return
            if w.char_at(self.j) == "i":  # militarily -> military
                w.set_length(self.j)
                w.write("y")
                self.k = self.j
                if self._lookup():
                    return
                w.set_length(self.j)
                w.append("ily")
                self.k = old_k
            w.set_length(self.j + 1)
            self.k = self.j

    def _al_endings(self) -> None:
        w = self.word
        old_k = self.k
        if len(w) < 4:
            return
        if self._ends_in_k("al"):
            w.set_length(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            if self._double_c(self.j):
                w.set_length(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.write(w.char_at(self.j - 1))
            w.set_length(self.j + 1)
            w.write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_length(self.j + 1)
            w.append("um")  # optimal -> optimum
            self.k = self.j + 2
            if self._lookup():
                return
            w.set_length(self.j + 1)
            w.append("al")
            self.k = old_k
            if self.j > 0 and w.char_at(self.j - 1) == "i" and w.char_at(self.j) == "c":
                w.set_length(self.j - 1)  # remove -ical
                self.k = self.j - 2
                if self._lookup():
                    return
                w.set_length(self.j - 1)
                w.write("y")  # bibliographical -> bibliography
                self.k = self.j - 1
                if self._lookup():
                    return
                w.set_length(self.j - 1)
                w.append("ic")  # default: -ical -> -ic
                self.k = self.j
                self._lookup()
                return
            if w.char_at(self.j) == "i":  # -ial removed sometimes
                w.set_length(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.append("ial")
                self.k = old_k
                self._lookup()

    def _ive_endings(self) -> None:
        w = self.word
        old_k = self.k
        if self._ends_in_k("ive"):
            w.set_length(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w.write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_length(self.j + 1)
            w.append("ive")
            if self.j > 0 and w.char_at(self.j - 1) == "a" and w.char_at(self.j) == "t":
                w.set_char(self.j - 1, "e")  # determinative -> determine
                w.set_length(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.set_length(self.j - 1)  # just remove -ative
                if self._lookup():
                    return
                w.append("ative")
                self.k = old_k
            # -ive -> -ion (injunctive -> injunction)
            w.set_char(self.j + 2, "o")
            w.set_char(self.j + 3, "n")
            if self._lookup():
                return
            w.set_char(self.j + 2, "v")
            w.set_char(self.j + 3, "e")
            self.k = old_k

    def _ize_endings(self) -> None:
        w = self.word
        old_k = self.k
        if self._ends_in_k("ize"):
            w.set_length(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w.write("i")
            if self._double_c(self.j):
                w.set_length(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.write(w.char_at(self.j - 1))
            w.set_length(self.j + 1)
            w.write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_length(self.j + 1)
            w.append("ize")
            self.k = old_k

    def _ment_endings(self) -> None:
        w = self.word
        old_k = self.k
        if self._ends_in_k("ment"):
            w.set_length(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w.append("ment")
            self.k = old_k

    def _ble_endings(self) -> None:
        w = self.word
        old_k = self.k
        if self._ends_in_k("ble"):
            if w.char_at(self.j) not in ("a", "i"):
                return
            word_char = w.char_at(self.j)
            w.set_length(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            if self._double_c(self.k):
                w.set_length(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self.k += 1
                w.write(w.char_at(self.k - 1))
            w.set_length(self.j)
            w.write("e")
            self.k = self.j
            if self._lookup():
                return
            w.set_length(self.j)
            w.append("ate")  # compensable -> compensate
            self.k = self.j + 2
            if self._lookup():
                return
            w.set_length(self.j)
            w.write(word_char)
            w.append("ble")
            self.k = old_k

    def _ism_endings(self) -> None:
        w = self.word
        if self._ends_in_k("ism"):
            w.set_length(self.j + 1)
            self.k = self.j
            self._lookup()

    def _ic_endings(self) -> None:
        w = self.word
        if self._ends_in_k("ic"):
            w.set_length(self.j + 3)
            w.append("al")  # canonic -> canonical
            self.k = self.j + 4
            if self._lookup():
                return
            w.set_char(self.j + 1, "y")  # -ic -> -y
            w.set_length(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_char(self.j + 1, "e")  # -ic -> -e
            if self._lookup():
                return
            w.set_length(self.j + 1)  # remove -ic
            self.k = self.j
            if self._lookup():
                return
            w.append("ic")
            self.k = self.j + 2

    def _ncy_endings(self) -> None:
        w = self.word
        if self._ends_in_k("ncy"):
            if w.char_at(self.j) not in ("e", "a"):
                return
            w.set_char(self.j + 2, "t")  # -ncy -> -nt
            w.set_length(self.j + 3)
            self.k = self.j + 2
            if self._lookup():
                return
            w.set_char(self.j + 2, "c")  # default: -ncy -> -nce
            w.write("e")
            self.k = self.j + 3
            self._lookup()

    def _nce_endings(self) -> None:
        w = self.word
        old_k = self.k
        if self._ends_in_k("nce"):
            word_char = w.char_at(self.j)
            if word_char not in ("e", "a"):
                return
            w.set_length(self.j)
            w.write("e")  # adherance -> adhere
            self.k = self.j
            if self._lookup():
                return
            w.set_length(self.j)  # disappearance -> disappear
            self.k = self.j - 1
            if self._lookup():
                return
            w.write(word_char)
            w.append("nce")
            self.k = old_k

    # --- driver ----------------------------------------------------------
    def stem(self, term: str) -> str:
        self.k = len(term) - 1
        if self.k <= 1 or self.k >= _MAX_WORD_LEN - 1:
            return term
        entry = self.d.get(term)
        if entry is not None:
            return entry.root if entry.root is not None else term
        for ch in term:
            if not ("a" <= ch <= "z"):
                return term  # lowercase filter must run first
        self.word = _Buf(term)
        self.matched = None
        while True:  # single pass; break = recognized
            self._plural()
            if self.matched is not None:
                break
            self._past_tense()
            if self.matched is not None:
                break
            self._aspect()
            if self.matched is not None:
                break
            self._ity_endings()
            if self.matched is not None:
                break
            self._ness_endings()
            if self.matched is not None:
                break
            self._ion_endings()
            if self.matched is not None:
                break
            self._er_and_or_endings()
            if self.matched is not None:
                break
            self._ly_endings()
            if self.matched is not None:
                break
            self._al_endings()
            if self.matched is not None:
                break
            # observable: if the current form is a lexicon word and
            # iveEndings doesn't override, the loop breaks right after
            self._word_in_dict()
            self._ive_endings()
            if self.matched is not None:
                break
            self._ize_endings()
            if self.matched is not None:
                break
            self._ment_endings()
            if self.matched is not None:
                break
            self._ble_endings()
            if self.matched is not None:
                break
            self._ism_endings()
            if self.matched is not None:
                break
            self._ic_endings()
            if self.matched is not None:
                break
            self._ncy_endings()
            if self.matched is not None:
                break
            self._nce_endings()
            break
        if self.matched is not None and self.matched.root is not None:
            return self.matched.root  # Italians -> Italy
        return self.word.value()


def kstem(term: str) -> str:
    """Stem one (lowercased) term.  Terms with non a-z chars, length < 3,
    or length >= 50 pass through unchanged, as in the reference."""
    return _KStemmer(_dict_ht()).stem(term)


def kstem_batch(terms) -> list[str]:
    """Arrow-batch kernel shape: stem an iterable of terms with one shared
    stemmer/dict (used by the vocabulary term map)."""
    st = _KStemmer(_dict_ht())
    return [st.stem(t) for t in terms]


def kstem_map(vocab):
    """(term, new_term) KStem dictionary over a distinct-term frame — only
    terms the stemmer CHANGES, the exact porter_stem_map shape
    (analysis/stemmer.py): one Arrow batch over |V| distinct terms, joined
    broadcast-style into the posting build, zero per-token Python.  The
    lexicon loads once per executor process (module-level cache)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        st = _KStemmer(_dict_ht())
        return s.map(st.stem)

    return vocab.select(
        F.col("term"), _stem(F.col("term")).alias("new_term")
    ).where(F.col("new_term") != F.col("term"))
