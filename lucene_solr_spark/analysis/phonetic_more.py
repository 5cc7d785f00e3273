"""The rest of PhoneticFilterFactory's encoder registry — classic
Metaphone, RefinedSoundex, Caverphone2, ColognePhonetic — commons-codec
semantics, pure Python.

Reference: lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilterFactory.java:76-85 registers six encoders
(DoubleMetaphone, Metaphone, Soundex, RefinedSoundex, Caverphone ->
Caverphone2, ColognePhonetic); PhoneticFilter.java:36-100 applies one per
token (inject=false replaces, inject=true adds a same-position synonym).
DoubleMetaphone lives in analysis/metaphone.py and Soundex in
analysis/phonetic.py; this module completes the registry.  Each encoder is
validated against the real commons-codec class running in the Spark JVM
(tests/data/phonetic_more_goldens.txt.gz, tools/gen_phonetic_goldens.py).

Scale shape: all four integrate as vocabulary-level term dictionaries
(``*_map``), the Porter-stem-map shape — the Arrow-batched pass runs over
|V| distinct terms, broadcast-joins back into the posting build, zero extra
shuffle on the token stream.
"""

from __future__ import annotations

import re

import pandas as pd

# ---------------------------------------------------------------------------
# Metaphone (Lawrence Philips 1990, as commons-codec Metaphone implements
# it: maxCodeLen=4, FRONTV="EIY", VARSON="CSPTG")
# ---------------------------------------------------------------------------

_FRONTV = "EIY"
_VARSON = "CSPTG"
_VOWELS = "AEIOU"


def metaphone(word: str, max_code_len: int = 4) -> str:
    """commons-codec ``Metaphone.metaphone``: the classic 1990 algorithm
    with the codec's exact branch order (initial-pair transforms, duplicate
    skip except C, per-letter switch)."""
    txt = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not txt:
        return ""
    if len(txt) == 1:
        return txt
    # initial-two-letter exceptions
    first, second = txt[0], txt[1]
    if first in "KGP" and second == "N":
        local = txt[1:]
    elif first == "A" and second == "E":
        local = txt[1:]
    elif first == "W" and second == "R":
        local = txt[1:]
    elif first == "W" and second == "H":
        local = "W" + txt[2:]
    elif first == "X":
        local = "S" + txt[1:]
    else:
        local = txt
    wdsz = len(local)
    code: list[str] = []
    n = 0

    def prev_is(i: int, ch: str) -> bool:
        return i > 0 and local[i - 1] == ch

    def next_is(i: int, ch: str) -> bool:
        return i + 1 < wdsz and local[i + 1] == ch

    def is_vowel(i: int) -> bool:
        return 0 <= i < wdsz and local[i] in _VOWELS

    def region(i: int, s: str) -> bool:
        return local[i : i + len(s)] == s and i + len(s) <= wdsz

    while len(code) < max_code_len and n < wdsz:
        symb = local[n]
        if symb != "C" and prev_is(n, symb):
            n += 1
            continue
        if symb in _VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            # silent in final -MB
            if not (n == wdsz - 1 and prev_is(n, "M")):
                code.append("B")
        elif symb == "C":
            if (
                prev_is(n, "S")
                and n + 1 < wdsz
                and local[n + 1] in _FRONTV
            ):
                pass  # SCE/SCI/SCY: dropped
            elif region(n, "CIA"):
                code.append("X")
            elif n + 1 < wdsz and local[n + 1] in _FRONTV:
                code.append("S")  # CE/CI/CY
            elif prev_is(n, "S") and next_is(n, "H"):
                code.append("K")  # SCH
            elif next_is(n, "H"):
                if n == 0 and wdsz >= 3 and is_vowel(2):
                    code.append("K")  # CH + vowel at word start (CHEmistry)
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if (
                n + 2 < wdsz
                and next_is(n, "G")
                and local[n + 2] in _FRONTV
            ):
                code.append("J")
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            silent = False
            # GH silent at end or before a consonant
            if n + 1 == wdsz - 1 and next_is(n, "H"):
                silent = True
            if (
                n + 1 < wdsz - 1
                and next_is(n, "H")
                and not is_vowel(n + 2)
            ):
                silent = True
            # silent G before N anywhere past the head (GN / GNED)
            if n > 0 and (region(n, "GN") or region(n, "GNED")):
                silent = True
            hard = prev_is(n, "G")
            if not silent:
                if (
                    n + 1 < wdsz
                    and local[n + 1] in _FRONTV
                    and not hard
                ):
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if n == wdsz - 1:
                pass  # terminal H
            elif n > 0 and local[n - 1] in _VARSON:
                pass
            elif is_vowel(n + 1):
                code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if n > 0:
                if not prev_is(n, "C"):
                    code.append("K")
            else:
                code.append("K")
        elif symb == "P":
            code.append("F" if next_is(n, "H") else "P")
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass  # silent in TCH
            elif region(n, "TH"):
                code.append("0")
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if is_vowel(n + 1):
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        n += 1
    return "".join(code[:max_code_len])


# ---------------------------------------------------------------------------
# RefinedSoundex (commons-codec US_ENGLISH mapping)
# ---------------------------------------------------------------------------

_REFINED_MAP = "01360240043788015936020505"  # A..Z


def refined_soundex(word: str) -> str:
    """commons-codec ``RefinedSoundex.soundex``: first letter verbatim,
    then the code of EVERY letter (zeros included), consecutive duplicate
    codes collapsed, no padding and no length cap."""
    s = [c for c in word.upper() if "A" <= c <= "Z"]
    if not s:
        return ""
    out = [s[0]]
    last = None
    for c in s:
        code = _REFINED_MAP[ord(c) - 65]
        if code != last:
            out.append(code)
        last = code
    return "".join(out)


# ---------------------------------------------------------------------------
# Caverphone 2.0 (David Hood 2004, as commons-codec Caverphone2 implements
# it: the fixed replacement cascade, padded with '1' to ten characters)
# ---------------------------------------------------------------------------

_CAVERPHONE2_STEPS: list[tuple[str, str]] = [
    (r"e$", ""),
    (r"^cough", "cou2f"),
    (r"^rough", "rou2f"),
    (r"^tough", "tou2f"),
    (r"^enough", "enou2f"),
    (r"^trough", "trou2f"),
    (r"^gn", "2n"),
    (r"mb$", "m2"),
    (r"cq", "2q"),
    (r"ci", "si"),
    (r"ce", "se"),
    (r"cy", "sy"),
    (r"tch", "2ch"),
    (r"c", "k"),
    (r"q", "k"),
    (r"x", "k"),
    (r"v", "f"),
    (r"dg", "2g"),
    (r"tio", "sio"),
    (r"tia", "sia"),
    (r"d", "t"),
    (r"ph", "fh"),
    (r"b", "p"),
    (r"sh", "s2"),
    (r"z", "s"),
    (r"^[aeiou]", "A"),
    (r"[aeiou]", "3"),
    (r"j", "y"),
    (r"^y3", "Y3"),
    (r"^y", "A"),
    (r"y", "3"),
    (r"3gh3", "3kh3"),
    (r"gh", "22"),
    (r"g", "k"),
    (r"s+", "S"),
    (r"t+", "T"),
    (r"p+", "P"),
    (r"k+", "K"),
    (r"f+", "F"),
    (r"m+", "M"),
    (r"n+", "N"),
    (r"w3", "W3"),
    (r"wh3", "Wh3"),
    (r"w$", "3"),
    (r"w", "2"),
    (r"^h", "A"),
    (r"h", "2"),
    (r"r3", "R3"),
    (r"r$", "3"),
    (r"r", "2"),
    (r"l3", "L3"),
    (r"l$", "3"),
    (r"l", "2"),
    (r"2", ""),
    (r"3$", "A"),
    (r"3", ""),
]
_CAVERPHONE2_COMPILED = [(re.compile(p), r) for p, r in _CAVERPHONE2_STEPS]


def caverphone2(word: str) -> str:
    """commons-codec ``Caverphone2.encode``: lowercase, strip non-letters,
    run the replacement cascade in order, pad with '1' to 10 chars."""
    txt = re.sub(r"[^a-z]", "", word.lower())
    for pat, rep in _CAVERPHONE2_COMPILED:
        txt = pat.sub(rep, txt)
    return (txt + "1111111111")[:10]


# ---------------------------------------------------------------------------
# ColognePhonetic (Koelner Phonetik, Postel 1969, as commons-codec
# implements it — German-tuned; umlauts fold, context-sensitive C/D/T/P/X)
# ---------------------------------------------------------------------------

_CGN_PREPROCESS = {"Ä": "A", "Ö": "O", "Ü": "U"}


def cologne_phonetic(word: str) -> str:
    """commons-codec ``ColognePhonetic.colognePhonetic``: letters map to
    digit codes with left/right context (X->48, C's onset/after-SZ rules,
    D/T->8 before C/S/Z, P->3 before H, ...), consecutive duplicate codes
    collapse, and '0' survives only at the head."""
    s = []
    for ch in word.upper():
        ch = _CGN_PREPROCESS.get(ch, ch)
        if ch == "ß":
            ch = "S"
        if "A" <= ch <= "Z":
            s.append(ch)
    if not s:
        return ""
    codes: list[str] = []
    n = len(s)
    for i, ch in enumerate(s):
        left = s[i - 1] if i > 0 else None
        right = s[i + 1] if i + 1 < n else None
        if ch in "AEIJOUY":
            code = "0"
        elif ch == "B":
            code = "1"
        elif ch == "P":
            code = "3" if right == "H" else "1"
        elif ch in "DT":
            code = "8" if right in ("C", "S", "Z") else "2"
        elif ch in "FVW":
            code = "3"
        elif ch in "GKQ":
            code = "4"
        elif ch == "C":
            if i == 0:
                code = "4" if right in tuple("AHKLOQRUX") else "8"
            elif left in ("S", "Z"):
                code = "8"
            elif right in tuple("AHKOQUX"):
                code = "4"
            else:
                code = "8"
        elif ch == "X":
            code = "8" if left in ("C", "K", "Q") else "48"
        elif ch == "L":
            code = "5"
        elif ch in "MN":
            code = "6"
        elif ch == "R":
            code = "7"
        elif ch in "SZ":
            code = "8"
        elif ch == "H":
            # H emits no code but SEPARATES: identical codes on either
            # side of an H do not collapse (commons-codec emits '-' and
            # strips it after dedup)
            code = "-"
        else:  # unmapped: no code
            code = ""
        codes.append(code)
    flat = "".join(codes)
    # collapse consecutive duplicates (the '-' separator participates,
    # then is dropped), then drop '0' except at the head
    out: list[str] = []
    for c in flat:
        if not out or out[-1] != c:
            out.append(c)
    dedup = [c for c in out if c != "-"]
    return "".join(c for j, c in enumerate(dedup) if c != "0" or j == 0)


# ---------------------------------------------------------------------------
# chain stages + vocabulary term maps (PhoneticFilter inject=false)
# ---------------------------------------------------------------------------

ENCODERS = {
    "Metaphone": metaphone,
    "RefinedSoundex": refined_soundex,
    "Caverphone": caverphone2,  # the factory maps "Caverphone" -> Caverphone2
    "ColognePhonetic": cologne_phonetic,
}


def _tokens(encoder):
    def stage(tokens: list[str]) -> list[str]:
        return [encoder(t) for t in tokens]

    return stage


metaphone_tokens = _tokens(metaphone)
refined_soundex_tokens = _tokens(refined_soundex)
caverphone2_tokens = _tokens(caverphone2)
cologne_phonetic_tokens = _tokens(cologne_phonetic)


def _term_map(encoder):
    def term_map(vocab):
        """(term, code) dictionary over a distinct-term frame — CHANGED
        terms only, for ``build_index(term_map=...)`` (the Porter-stem-map
        broadcast-join shape).  Codeless terms (encoder -> '') are
        excluded: PhoneticFilter.incrementToken only swaps the token when
        the code is non-empty and differs, else the original passes
        through."""
        from pyspark.sql import functions as F

        @F.pandas_udf("string")
        def _enc(col: pd.Series) -> pd.Series:
            return col.map(encoder)

        return vocab.select(
            F.col("term"), _enc(F.col("term")).alias("new_term")
        ).where(
            (F.col("new_term") != F.col("term")) & (F.col("new_term") != "")
        )

    return term_map


metaphone_map = _term_map(metaphone)
refined_soundex_map = _term_map(refined_soundex)
caverphone2_map = _term_map(caverphone2)
cologne_phonetic_map = _term_map(cologne_phonetic)
