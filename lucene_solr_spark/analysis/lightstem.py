"""Language-specific light/minimal stemmers (the Savoy / UniNE family).

Lucene ships a family of hand-crafted suffix-strippers for European
languages, each published in Jacques Savoy's CLEF papers ("Light Stemming
Approaches for the French, Portuguese, German and Hungarian Languages";
"Report on CLEF-2001/2003 Experiments"; Dolamic & Savoy "Indexing and
Searching Strategies for the Russian Language"):

- GermanLightStemmer.java / GermanMinimalStemmer.java
  (lucene/analysis/common/src/java/org/apache/lucene/analysis/de/)
- FrenchLightStemmer.java / FrenchMinimalStemmer.java (.../fr/)
- SpanishLightStemmer.java (.../es/)
- ItalianLightStemmer.java (.../it/)
- PortugueseLightStemmer.java (.../pt/)
- SwedishLightStemmer.java (.../sv/)
- FinnishLightStemmer.java (.../fi/)
- HungarianLightStemmer.java (.../hu/)
- RussianLightStemmer.java (.../ru/)
- NorwegianLightStemmer.java / NorwegianMinimalStemmer.java (.../no/)

Each is re-derived here from the published algorithm as a pure-Python
word -> stem function, validated against the reference's full golden
vocabularies (tests/data/*light*.txt.gz, ~400k pairs total; see
tests/test_lightstem.py).

Spark integration follows the porter_stem_map shape
(analysis/stemmer.py:206): the stemmer runs once per DISTINCT vocabulary
term inside an Arrow-batched pandas UDF, producing a (term, new_term)
frame that is broadcast-joined onto the token stream.  At 100-TB corpus
scale the vocabulary is millions of rows, not trillions, so the Python
cost is bounded by vocabulary size and the hot path stays JVM-side.
"""

from __future__ import annotations

import pandas as pd


# ---------------------------------------------------------------------------
# German (GermanLightStemmer.java — Savoy's UniNE German light stemmer)
# ---------------------------------------------------------------------------

_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_DE_ST_END = set("bdfghklmnt")


def german_light_stem(w: str) -> str:
    w = w.translate(_DE_FOLD)
    # step 1
    n = len(w)
    if n > 5 and w.endswith("ern"):
        w = w[:-3]
    elif n > 4 and len(w) >= 2 and w[-2] == "e" and w[-1] in "mnrs":
        w = w[:-2]
    elif n > 3 and w[-1] == "e":
        w = w[:-1]
    elif n > 3 and w[-1] == "s" and w[-2] in _DE_ST_END:
        w = w[:-1]
    # step 2
    n = len(w)
    if n > 5 and w.endswith("est"):
        w = w[:-3]
    elif n > 4 and w[-2] == "e" and w[-1] in "rn":
        w = w[:-2]
    elif n > 4 and w.endswith("st") and w[-3] in _DE_ST_END:
        w = w[:-2]
    return w


_DE_MIN_FOLD = str.maketrans("äöü", "aou")


def german_minimal_stem(w: str) -> str:
    """GermanMinimalStemmer.java — Savoy 'Morphologie et recherche
    d'information'."""
    n = len(w)
    if n < 5:
        return w
    w = w.translate(_DE_MIN_FOLD)
    if n > 6 and w.endswith("nen"):
        return w[:-3]
    if n > 5:
        if w.endswith(("en", "se", "es", "er")):
            return w[:-2]
    if w[-1] in "nesr":
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# French (FrenchLightStemmer.java / FrenchMinimalStemmer.java)
# ---------------------------------------------------------------------------

_FR_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _fr_norm(w: str) -> str:
    if len(w) > 4:
        w = w.translate(_FR_FOLD)
        # collapse runs of the same letter
        out = [w[0]]
        for ch in w[1:]:
            if not (ch == out[-1] and ch.isalpha()):
                out.append(ch)
        w = "".join(out)
    if len(w) > 4 and w.endswith("ie"):
        w = w[:-2]
    if len(w) > 4:
        if w[-1] == "r":
            w = w[:-1]
        if w[-1] == "e":
            w = w[:-1]
        if w[-1] == "e":
            w = w[:-1]
        if len(w) >= 2 and w[-1] == w[-2] and w[-1].isalpha():
            w = w[:-1]
    return w


def french_light_stem(w: str) -> str:
    if len(w) > 5 and w[-1] == "x":
        if w[-3] == "a" and w[-2] == "u" and w[-4] != "e":
            w = w[:-2] + "l" + w[-1]
        w = w[:-1]
    if len(w) > 3 and w[-1] == "x":
        w = w[:-1]
    if len(w) > 3 and w[-1] == "s":
        w = w[:-1]

    n = len(w)
    if n > 9 and w.endswith("issement"):
        return _fr_norm(w[:-7] + "r")
    if n > 8 and w.endswith("issant"):
        return _fr_norm(w[:-5] + "r")
    if n > 6 and w.endswith("ement"):
        w = w[:-4]
        if len(w) > 3 and w.endswith("ive"):
            w = w[:-2] + "f"
        return _fr_norm(w)
    if n > 11 and w.endswith("ficatrice"):
        # ...ficatrice -> ...fier
        return _fr_norm(w[:-7] + "er")
    if n > 10 and w.endswith("ficateur"):
        return _fr_norm(w[:-6] + "er")
    if n > 9 and w.endswith("catrice"):
        # ...catrice -> ...quer
        return _fr_norm(w[:-7] + "quer")
    if n > 8 and w.endswith("cateur"):
        return _fr_norm(w[:-6] + "quer")
    if n > 8 and w.endswith("atrice"):
        return _fr_norm(w[:-6] + "er")
    if n > 7 and w.endswith("ateur"):
        return _fr_norm(w[:-5] + "er")
    if n > 6 and w.endswith("trice"):
        w = w[:-4] + "eur"

    n = len(w)
    if n > 5 and w.endswith("ième"):
        return _fr_norm(w[:-4])
    if n > 7 and w.endswith("teuse"):
        return _fr_norm(w[:-3] + "r")
    if n > 6 and w.endswith("teur"):
        return _fr_norm(w[:-2] + "r")
    if n > 5 and w.endswith("euse"):
        return _fr_norm(w[:-2])
    if n > 8 and w.endswith("ère"):
        return _fr_norm(w[:-3] + "er")
    if n > 7 and w.endswith("ive"):
        return _fr_norm(w[:-2] + "f")
    if n > 4 and (w.endswith("folle") or w.endswith("molle")):
        return _fr_norm(w[:-3] + "u")
    if n > 9 and w.endswith("nnelle"):
        return _fr_norm(w[:-5])
    if n > 9 and w.endswith("nnel"):
        return _fr_norm(w[:-3])
    if n > 4 and w.endswith("ète"):
        w = w[:-3] + "et"
    if len(w) > 8 and w.endswith("ique"):
        w = w[:-4]
    n = len(w)
    if n > 8 and w.endswith("esse"):
        return _fr_norm(w[:-3])
    if n > 7 and w.endswith("inage"):
        return _fr_norm(w[:-3])
    if n > 9 and w.endswith("isation"):
        w = w[:-7]
        if len(w) > 5 and w.endswith("ual"):
            w = w[:-2] + "el"
        return _fr_norm(w)
    if n > 9 and w.endswith("isateur"):
        return _fr_norm(w[:-7])
    if n > 8 and w.endswith("ation"):
        return _fr_norm(w[:-5])
    if n > 8 and w.endswith("ition"):
        return _fr_norm(w[:-5])
    return _fr_norm(w)


def french_minimal_stem(w: str) -> str:
    if len(w) < 6:
        return w
    if w[-1] == "x":
        if w[-3] == "a" and w[-2] == "u":
            return w[:-2] + "l"
        return w[:-1]
    if w[-1] == "s":
        w = w[:-1]
    if w[-1] == "r":
        w = w[:-1]
    if w[-1] == "e":
        w = w[:-1]
    if w[-1] == "é":
        w = w[:-1]
    if len(w) >= 2 and w[-1] == w[-2]:
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Spanish (SpanishLightStemmer.java — Savoy CLEF-2001)
# ---------------------------------------------------------------------------

_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def spanish_light_stem(w: str) -> str:
    if len(w) < 5:
        return w
    w = w.translate(_ES_FOLD)
    c = w[-1]
    if c in "oae":
        return w[:-1]
    if c == "s":
        if w.endswith("eses"):
            return w[:-2]
        if w.endswith("ces"):
            return w[:-3] + "z"
        if len(w) >= 2 and w[-2] in "oae":
            return w[:-2]
    return w


# ---------------------------------------------------------------------------
# Italian (ItalianLightStemmer.java — Savoy CLEF-2001)
# ---------------------------------------------------------------------------

_IT_FOLD = _ES_FOLD  # same accent-fold table


def italian_light_stem(w: str) -> str:
    if len(w) < 6:
        return w
    w = w.translate(_IT_FOLD)
    c, p = w[-1], w[-2]
    if c == "e":
        return w[:-2] if p in "ih" else w[:-1]
    if c == "i":
        return w[:-2] if p in "hi" else w[:-1]
    if c == "a":
        return w[:-2] if p == "i" else w[:-1]
    if c == "o":
        return w[:-2] if p == "i" else w[:-1]
    return w


# ---------------------------------------------------------------------------
# Portuguese light (PortugueseLightStemmer.java — Savoy UniNE)
# ---------------------------------------------------------------------------

_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")


def _pt_remove_suffix(w: str) -> str:
    n = len(w)
    if n > 4 and w.endswith("es") and w[-3] in "rslz":
        return w[:-2]
    if n > 3 and w.endswith("ns"):
        return w[:-2] + "m"
    if n > 4 and (w.endswith("eis") or w.endswith("éis")):
        return w[:-3] + "el"
    if n > 4 and w.endswith("ais"):
        return w[:-2] + "l"
    if n > 4 and w.endswith("óis"):
        return w[:-3] + "ol"
    if n > 4 and w.endswith("is"):
        return w[:-1] + "l"
    if n > 3 and (w.endswith("ões") or w.endswith("ães")):
        return w[:-3] + "ão"
    if n > 6 and w.endswith("mente"):
        return w[:-5]
    if n > 3 and w[-1] == "s":
        return w[:-1]
    return w


def _pt_norm_feminine(w: str) -> str:
    n = len(w)
    if n > 7 and (w.endswith("inha") or w.endswith("iaca") or w.endswith("eira")):
        return w[:-1] + "o"
    if n > 6:
        if w.endswith(("osa", "ica", "ida", "ada", "iva", "ama")):
            return w[:-1] + "o"
        if w.endswith("ona"):
            return w[:-3] + "ão"
        if w.endswith("ora"):
            return w[:-1]
        if w.endswith("esa"):
            return w[:-3] + "ês"
        if w.endswith("na"):
            return w[:-1] + "o"
    return w


def portuguese_light_stem(w: str) -> str:
    if len(w) < 4:
        return w
    w = _pt_remove_suffix(w)
    if len(w) > 3 and w[-1] == "a":
        w = _pt_norm_feminine(w)
    if len(w) > 4 and w[-1] in "eao":
        w = w[:-1]
    return w.translate(_PT_FOLD)


# ---------------------------------------------------------------------------
# Swedish (SwedishLightStemmer.java — Savoy CLEF-2003)
# ---------------------------------------------------------------------------


def swedish_light_stem(w: str) -> str:
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 7 and (w.endswith("elser") or w.endswith("heten")):
        return w[:-5]
    if n > 6 and w.endswith(
        ("arne", "erna", "ande", "else", "aste", "orna", "aren")
    ):
        return w[:-4]
    if n > 5 and w.endswith(("are", "ast", "het")):
        return w[:-3]
    if n > 4 and w.endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return w[:-2]
    if n > 3 and w[-1] in "taen":
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Finnish (FinnishLightStemmer.java — Savoy CLEF-2003)
# ---------------------------------------------------------------------------

_FI_FOLD = str.maketrans("äåö", "aao")
_FI_VOWELS = set("aeiouy")


def _fi_step1(w: str) -> str:
    if len(w) > 8:
        if w.endswith("kin"):
            return _fi_step1(w[:-3])
        if w.endswith("ko"):
            return _fi_step1(w[:-2])
    if len(w) > 11:
        if w.endswith("dellinen"):
            return w[:-8]
        if w.endswith("dellisuus"):
            return w[:-9]
    return w


def _fi_step2(w: str) -> str:
    if len(w) > 5:
        if w.endswith(("lla", "tse", "sti")):
            return w[:-3]
        if w.endswith("ni"):
            return w[:-2]
        if w.endswith("aa"):
            return w[:-1]
    return w


def _fi_step3(w: str) -> str:
    n = len(w)
    if n > 8:
        if w.endswith("nnen"):
            return w[:-4] + "s"
        if w.endswith("ntena"):
            return w[:-5] + "s"
        if w.endswith("tten"):
            return w[:-4]
        if w.endswith("eiden"):
            return w[:-5]
    if n > 6:
        if w.endswith(("neen", "niin", "seen", "teen", "inen")):
            return w[:-4]
        if w[-3] == "h" and w[-2] in _FI_VOWELS and w[-1] == "n":
            return w[:-3]
        if w.endswith("den"):
            return w[:-3] + "s"
        if w.endswith("ksen"):
            return w[:-4] + "s"
        if w.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            return w[:-3]
    if n > 5:
        if w.endswith(("na", "ne")):
            return w[:-2]
        if w.endswith("nei"):
            return w[:-3]
    if n > 4:
        if w.endswith(("ja", "ta")):
            return w[:-2]
        if w[-1] == "a":
            return w[:-1]
        if w[-1] == "n" and w[-2] in _FI_VOWELS:
            return w[:-2]
        if w[-1] == "n":
            return w[:-1]
    return w


def _fi_norm1(w: str) -> str:
    if len(w) > 5 and w.endswith("hde"):
        w = w[:-3] + "ksi"
    if len(w) > 4 and (w.endswith("ei") or w.endswith("at")):
        return w[:-2]
    if len(w) > 3 and w[-1] in "tsjeai":
        return w[:-1]
    return w


def _fi_norm2(w: str) -> str:
    if len(w) > 8 and w[-1] in "eou":
        w = w[:-1]
    if len(w) > 4:
        if w[-1] == "i":
            w = w[:-1]
        if len(w) > 4:
            out = [w[0]]
            for ch in w[1:]:
                if not (ch == out[-1] and ch in "kpt"):
                    out.append(ch)
            w = "".join(out)
    return w


def finnish_light_stem(w: str) -> str:
    if len(w) < 4:
        return w
    w = w.translate(_FI_FOLD)
    w = _fi_step1(w)
    w = _fi_step2(w)
    w = _fi_step3(w)
    w = _fi_norm1(w)
    w = _fi_norm2(w)
    return w


# ---------------------------------------------------------------------------
# Hungarian (HungarianLightStemmer.java — Savoy CLEF-2003)
# ---------------------------------------------------------------------------

_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")
_HU_VOWELS = _FI_VOWELS  # a e i o u y


def _hu_remove_case(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("kent"):
        return w[:-4]
    if n > 5:
        if w.endswith(
            ("nak", "nek", "val", "vel", "ert", "rol", "ban", "ben",
             "bol", "nal", "nel", "hoz", "hez", "tol")
        ):
            return w[:-3]
        if w.endswith(("al", "el")):
            if w[-3] not in _HU_VOWELS and w[-3] == w[-4]:
                return w[:-3]
    if n > 4:
        if w.endswith(
            ("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be", "ul", "ig")
        ):
            return w[:-2]
        if (w.endswith("on") or w.endswith("en")) and w[-3] not in _HU_VOWELS:
            return w[:-2]
        c = w[-1]
        if c in "tn":
            return w[:-1]
        if c in "ae" and w[-2] == w[-3] and w[-2] not in _HU_VOWELS:
            return w[:-2]
    return w


def _hu_remove_possessive(w: str) -> str:
    n = len(w)
    if n > 6:
        if w[-5] not in _HU_VOWELS and w.endswith(("atok", "otok", "etek")):
            return w[:-4]
        if w.endswith(("itek", "itok")):
            return w[:-4]
    if n > 5:
        if w[-4] not in _HU_VOWELS and w.endswith(("unk", "tok", "tek")):
            return w[:-3]
        if w[-4] in _HU_VOWELS and w.endswith("juk"):
            return w[:-3]
        if w.endswith("ink"):
            return w[:-3]
    if n > 4:
        if w[-3] not in _HU_VOWELS and w.endswith(
            ("am", "em", "om", "ad", "ed", "od", "uk")
        ):
            return w[:-2]
        if w[-3] in _HU_VOWELS and w.endswith(("nk", "ja", "je")):
            return w[:-2]
        if w.endswith(("im", "id", "ik")):
            return w[:-2]
    if n > 3:
        c = w[-1]
        if c in "ae" and w[-2] not in _HU_VOWELS:
            return w[:-1]
        if c in "md" and w[-2] in _HU_VOWELS:
            return w[:-1]
        if c == "i":
            return w[:-1]
    return w


def _hu_remove_plural(w: str) -> str:
    n = len(w)
    if n > 3 and w[-1] == "k":
        if w[-2] in "aoe" and n > 4:
            return w[:-2]
        return w[:-1]
    return w


def hungarian_light_stem(w: str) -> str:
    w = w.translate(_HU_FOLD)
    w = _hu_remove_case(w)
    w = _hu_remove_possessive(w)
    w = _hu_remove_plural(w)
    if len(w) > 3 and w[-1] in "aeio":
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Russian (RussianLightStemmer.java — Dolamic & Savoy)
# ---------------------------------------------------------------------------

_RU_CASE4 = ("иями", "оями")
_RU_CASE3 = (
    "иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
    "ери", "ими", "ого", "ому", "ыми", "оев",
)
_RU_CASE2 = (
    "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв", "ою",
    "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им",
    "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми",
)
_RU_CASE1 = set("аеиоуйыяь")


def russian_light_stem(w: str) -> str:
    # removeCase
    n = len(w)
    if n > 6 and w.endswith(_RU_CASE4):
        w = w[:-4]
    elif n > 5 and w.endswith(_RU_CASE3):
        w = w[:-3]
    elif n > 4 and w.endswith(_RU_CASE2):
        w = w[:-2]
    elif n > 3 and w[-1] in _RU_CASE1:
        w = w[:-1]
    # normalize
    if len(w) > 3:
        if w[-1] in "ьи":
            w = w[:-1]
        elif w[-1] == "н" and w[-2] == "н":
            w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Norwegian (NorwegianLightStemmer.java / NorwegianMinimalStemmer.java)
# ---------------------------------------------------------------------------

BOKMAAL = 1
NYNORSK = 2


def norwegian_light_stem(w: str, flags: int = BOKMAAL) -> str:
    bm = bool(flags & BOKMAAL)
    nn = bool(flags & NYNORSK)
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 7 and (
        (w.endswith(("heter", "heten")) and bm)
        or (w.endswith("heita") and nn)
    ):
        return w[:-5]
    if n > 8 and nn and w.endswith(("heiter", "leiken", "leikar")):
        return w[:-6]
    if n > 5 and (w.endswith("dom") or (w.endswith("het") and bm)):
        return w[:-3]
    if n > 6 and nn and w.endswith(("heit", "semd", "leik")):
        return w[:-4]
    if n > 7 and w.endswith(("elser", "elsen")):
        return w[:-5]
    if n > 6 and (
        (w.endswith("ende") and bm)
        or (w.endswith("ande") and nn)
        or w.endswith("else")
        or (w.endswith("este") and bm)
        or (w.endswith("aste") and nn)
        or (w.endswith("eren") and bm)
        or (w.endswith("aren") and nn)
    ):
        return w[:-4]
    if n > 5 and (
        (w.endswith("ere") and bm)
        or (w.endswith("are") and nn)
        or (w.endswith("est") and bm)
        or (w.endswith("ast") and nn)
        or w.endswith("ene")
        or (w.endswith("ane") and nn)
    ):
        return w[:-3]
    if n > 4 and (
        w.endswith(("er", "en", "et"))
        or (w.endswith("ar") and nn)
        or (w.endswith("st") and bm)
        or w.endswith("te")
    ):
        return w[:-2]
    if n > 3 and w[-1] in "aen":
        return w[:-1]
    return w


def norwegian_minimal_stem(w: str, flags: int = BOKMAAL) -> str:
    nn = bool(flags & NYNORSK)
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 5 and (w.endswith("ene") or (w.endswith("ane") and nn)):
        return w[:-3]
    if n > 4 and (
        w.endswith(("er", "en", "et")) or (w.endswith("ar") and nn)
    ):
        return w[:-2]
    if n > 3 and w[-1] in "ae":
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Registry + Spark term-map integration
# ---------------------------------------------------------------------------

LIGHT_STEMMERS = {
    "de_light": german_light_stem,
    "de_minimal": german_minimal_stem,
    "fr_light": french_light_stem,
    "fr_minimal": french_minimal_stem,
    "es_light": spanish_light_stem,
    "it_light": italian_light_stem,
    "pt_light": portuguese_light_stem,
    "sv_light": swedish_light_stem,
    "fi_light": finnish_light_stem,
    "hu_light": hungarian_light_stem,
    "ru_light": russian_light_stem,
    "nb_light": lambda w: norwegian_light_stem(w, BOKMAAL),
    "nn_light": lambda w: norwegian_light_stem(w, NYNORSK),
    "nb_minimal": lambda w: norwegian_minimal_stem(w, BOKMAAL),
    "nn_minimal": lambda w: norwegian_minimal_stem(w, NYNORSK),
}


def light_stem_map(vocab, key: str):
    """(term, new_term) dictionary frame for one light stemmer over a
    distinct-term vocabulary — the porter_stem_map shape
    (analysis/stemmer.py:206): Python runs per distinct term in an
    Arrow batch, never per posting."""
    from pyspark.sql import functions as F

    fn = LIGHT_STEMMERS[key]

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(fn)

    return vocab.select(
        F.col("term"), _stem(F.col("term")).alias("new_term")
    ).where(F.col("new_term") != F.col("term"))
