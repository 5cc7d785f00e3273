"""Non-Latin-script analysis: Arabic, Sorani Kurdish, Persian, Hindi,
Indonesian, Bulgarian, Czech, Latvian normalizers and stemmers.

Re-derived from the published algorithms the reference implements:

- Arabic: Larkey, Ballesteros & Connell "Light Stemming for Arabic
  Information Retrieval" (light10) —
  lucene/analysis/common/src/java/org/apache/lucene/analysis/ar/
  ArabicNormalizer.java, ArabicStemmer.java
- Sorani: Esmaili et al. "Building a Test Collection for Sorani Kurdish" —
  .../ckb/SoraniNormalizer.java, SoraniStemmer.java (golden vocabulary
  ckbtestdata.zip, 8,272 pairs, full analyzer chain)
- Persian: .../fa/PersianNormalizer.java (composes after the Arabic
  normalizer, as PersianAnalyzer does)
- Hindi: Ljiljana Dolamic and Jacques Savoy "Indexing and Searching
  Strategies for the Russian Language" companion Hindi work —
  .../hi/HindiNormalizer.java, HindiStemmer.java
- Indonesian: Tala "A Study of Stemming Effects on Information Retrieval in
  Bahasa Indonesia" — .../id/IndonesianStemmer.java
- Bulgarian: Savoy "Searching strategies for the Bulgarian language" —
  .../bg/BulgarianStemmer.java
- Czech: Dolamic & Savoy "Indexing and stemming approaches for the Czech
  language" — .../cz/CzechStemmer.java
- Latvian: a light stemmer addressing palatalization —
  .../lv/LatvianStemmer.java

All are word -> word pure functions applied as vocabulary term maps
(the porter_stem_map shape, analysis/stemmer.py:206): Python cost scales
with DISTINCT vocabulary size, never corpus size.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

# ---------------------------------------------------------------------------
# Arabic (ArabicNormalizer.java, ArabicStemmer.java — light10)
# ---------------------------------------------------------------------------

_AR_ALEF = "ا"
_AR_HAREKAT = "ـًٌٍَُِّْ"
_AR_NORM = str.maketrans(
    {
        "آ": _AR_ALEF,  # alef madda
        "أ": _AR_ALEF,  # alef hamza above
        "إ": _AR_ALEF,  # alef hamza below
        "ى": "ي",  # dotless yeh -> yeh
        "ة": "ه",  # teh marbuta -> heh
        **{c: None for c in _AR_HAREKAT},  # tatweel + diacritics deleted
    }
)

# prefixes tried in order, first match wins (ArabicStemmer.prefixes)
_AR_PREFIXES = ("ال", "وال", "بال",
                "كال", "فال", "لل",
                "و")
# suffixes applied cumulatively in list order (ArabicStemmer.suffixes)
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_normalize(w: str) -> str:
    return w.translate(_AR_NORM)


def arabic_stem(w: str) -> str:
    """light10: strip one definite-article/conjunction prefix, then every
    matching suffix in list order (ArabicStemmer.java:stem)."""
    for p in _AR_PREFIXES:
        # wa- (single char) needs >=4 chars; others need >=2 after strip
        min_len = 4 if len(p) == 1 else len(p) + 2
        if len(w) >= min_len and w.startswith(p):
            w = w[len(p):]
            break
    for suf in _AR_SUFFIXES:
        if len(w) >= len(suf) + 2 and w.endswith(suf):
            w = w[: -len(suf)]
    return w


def arabic_light_stem(w: str) -> str:
    """ArabicAnalyzer order: normalize then stem."""
    return arabic_stem(arabic_normalize(w))


# ---------------------------------------------------------------------------
# Sorani Kurdish (SoraniNormalizer.java, SoraniStemmer.java)
# ---------------------------------------------------------------------------

_CKB_FARSI_YEH = "ی"
_CKB_AE = "ە"
_CKB_HEH = "ه"
_CKB_RREH = "ڕ"


def sorani_normalize(w: str) -> str:
    """Exact buffer simulation of SoraniNormalizer.java:normalize — the
    positional rules (initial reh, final heh, heh-before-ZWNJ) see the
    buffer AFTER earlier deletions, so this walks a mutable list the same
    way the reference walks its char array."""
    s = list(w)
    i = 0
    while i < len(s):
        ch = s[i]
        if ch in "يى":  # yeh, dotless yeh -> farsi yeh
            s[i] = _CKB_FARSI_YEH
        elif ch == "ك":  # kaf -> keheh
            s[i] = "ک"
        elif ch == "‌":  # ZWNJ: heh before it becomes ae; ZWNJ dropped
            if i > 0 and s[i - 1] == _CKB_HEH:
                s[i - 1] = _CKB_AE
            del s[i]
            continue
        elif ch == _CKB_HEH:
            if i == len(s) - 1:  # final heh -> ae
                s[i] = _CKB_AE
        elif ch == "ة":  # teh marbuta -> ae
            s[i] = _CKB_AE
        elif ch == "ھ":  # heh doachashmee -> heh
            s[i] = _CKB_HEH
        elif ch == "ر":  # initial reh -> rreh
            if i == 0:
                s[i] = _CKB_RREH
        elif ch == "ڒ":  # rreh-above -> rreh
            s[i] = _CKB_RREH
        elif ch in _AR_HAREKAT or unicodedata.category(ch) == "Cf":
            del s[i]  # tatweel, harakat, and any other format char
            continue
        i += 1
    return "".join(s)


def sorani_stem(w: str) -> str:
    """SoraniStemmer.java:stem — postposition, possessive, and
    definite/indefinite marker stripping."""
    n = len(w)
    if n > 5 and w.endswith("دا"):  # -da
        w = w[:-2]
    elif n > 4 and w.endswith("نا"):  # -na: drop final alef only
        w = w[:-1]
    elif n > 6 and w.endswith("ەوە"):  # -awa
        w = w[:-3]

    if len(w) > 6 and w.endswith(
        ("مان", "یان", "تان")
    ):  # -man/-yan/-tan possessives
        w = w[:-3]

    n = len(w)
    if n > 6 and w.endswith("ێکی"):  # -eki
        return w[:-3]
    if n > 7 and w.endswith("یەکی"):  # -yeki
        return w[:-4]
    if n > 5 and w.endswith("ێک"):  # -ek
        return w[:-2]
    if n > 6 and w.endswith("یەک"):  # -yek
        return w[:-3]
    if n > 6 and w.endswith("ەکە"):  # -aka
        return w[:-3]
    if n > 5 and w.endswith("کە"):  # -ka
        return w[:-2]
    if n > 7 and w.endswith("ەکان"):  # -akan
        return w[:-4]
    if n > 6 and w.endswith("کان"):  # -kan
        return w[:-3]
    if n > 7 and w.endswith("یانی"):  # -yani
        return w[:-4]
    if n > 6 and w.endswith("انی"):  # -ani
        return w[:-3]
    if n > 6 and w.endswith("یان"):  # -yan
        return w[:-3]
    if n > 5 and w.endswith("ان"):  # -an
        return w[:-2]
    if n > 7 and w.endswith("یانە"):  # -yana
        return w[:-4]
    if n > 6 and w.endswith("انە"):  # -ana
        return w[:-3]
    if n > 5 and (
        w.endswith("ایە") or w.endswith("ەیە")
    ):  # -aya / -eye: keep the stem-final vowel
        return w[:-2]
    if n > 4 and w.endswith("ە"):  # -a
        return w[:-1]
    if n > 4 and w.endswith("ی"):  # -i
        return w[:-1]
    return w


def sorani_analyze(w: str) -> str:
    """SoraniAnalyzer chain for a single token: normalize -> lowercase ->
    stem (SoraniAnalyzer.java:createComponents)."""
    return sorani_stem(sorani_normalize(w).lower())


# ---------------------------------------------------------------------------
# Persian (PersianNormalizer.java; PersianAnalyzer composes after Arabic)
# ---------------------------------------------------------------------------

_FA_NORM = str.maketrans(
    {
        "ی": "ي",  # farsi yeh -> yeh
        "ے": "ي",  # yeh barree -> yeh
        "ک": "ك",  # keheh -> kaf
        "ۀ": "ه",  # heh+yeh -> heh
        "ہ": "ه",  # heh goal -> heh
        "ٔ": None,      # hamza above deleted
    }
)


def persian_normalize(w: str) -> str:
    return w.translate(_FA_NORM)


def persian_analyze(w: str) -> str:
    """PersianAnalyzer order: Arabic normalization then Persian."""
    return persian_normalize(arabic_normalize(w))


# ---------------------------------------------------------------------------
# Hindi (HindiNormalizer.java, HindiStemmer.java)
# ---------------------------------------------------------------------------

_HI_NORM_1TO1 = str.maketrans(
    {
        "ँ": "ं",  # chandrabindu -> anusvara
        "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
        "क़": "क", "ख़": "ख", "ग़": "ग",
        "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
        "फ़": "फ", "य़": "य",
        "ॅ": "े", "ॆ": "े",
        "ॉ": "ो", "ॊ": "ो",
        "ऍ": "ए", "ऎ": "ए",
        "ऑ": "ओ", "ऒ": "ओ",
        "ॲ": "अ", "आ": "अ",
        "ई": "इ", "ऊ": "उ",
        "ॠ": "ऋ", "ॡ": "ऌ",
        "ऐ": "ए", "औ": "ओ",
        "ी": "ि", "ू": "ु",
        "ॄ": "ृ", "ॣ": "ॢ",
        "ै": "े", "ौ": "ो",
        "़": None,      # nukta deleted
        "‌": None, "‍": None,  # ZWNJ/ZWJ deleted
    }
)


def hindi_normalize(w: str) -> str:
    # na + virama -> anusvara (the one two-char rule), then the 1:1 table
    # (which also deletes any remaining viramas, as the Java switch does)
    w = w.replace("न्", "ं")
    w = w.replace("्", "")
    return w.translate(_HI_NORM_1TO1)


_HI_SUF_5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_SUF_4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
             "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
             "ियों", "ियां")
_HI_SUF_3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
             "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
             "ुआं")
_HI_SUF_2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
             "ती", "ता", "ाँ", "ां", "ों", "ें")
_HI_SUF_1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def hindi_stem(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith(_HI_SUF_5):
        return w[:-5]
    if n > 5 and w.endswith(_HI_SUF_4):
        return w[:-4]
    if n > 4 and w.endswith(_HI_SUF_3):
        return w[:-3]
    if n > 3 and w.endswith(_HI_SUF_2):
        return w[:-2]
    if n > 2 and w.endswith(_HI_SUF_1):
        return w[:-1]
    return w


def hindi_analyze(w: str) -> str:
    """HindiAnalyzer order (after lowercase/indic-normalize): normalize
    then stem."""
    return hindi_stem(hindi_normalize(w))


# ---------------------------------------------------------------------------
# Indonesian (IndonesianStemmer.java — Tala's algorithm)
# ---------------------------------------------------------------------------

_ID_VOWELS = set("aeiou")


def indonesian_stem(w: str, stem_derivational: bool = True) -> str:
    syllables = sum(1 for c in w if c in _ID_VOWELS)
    flags = 0
    REMOVED_KE, REMOVED_PENG, REMOVED_DI = 1, 2, 4
    REMOVED_MENG, REMOVED_TER, REMOVED_BER, REMOVED_PE = 8, 16, 32, 64

    def remove_particle(w):
        nonlocal syllables
        if w.endswith(("kah", "lah", "pun")):
            syllables -= 1
            return w[:-3]
        return w

    def remove_possessive(w):
        nonlocal syllables
        if w.endswith(("ku", "mu")):
            syllables -= 1
            return w[:-2]
        if w.endswith("nya"):
            syllables -= 1
            return w[:-3]
        return w

    def first_order_prefix(w):
        nonlocal syllables, flags
        if w.startswith("meng"):
            flags |= REMOVED_MENG; syllables -= 1
            return w[4:]
        if w.startswith("meny") and len(w) > 4 and w[4] in _ID_VOWELS:
            flags |= REMOVED_MENG; syllables -= 1
            return "s" + w[4:]
        if w.startswith(("men", "mem")):
            flags |= REMOVED_MENG; syllables -= 1
            return w[3:]
        if w.startswith("me"):
            flags |= REMOVED_MENG; syllables -= 1
            return w[2:]
        if w.startswith("peng"):
            flags |= REMOVED_PENG; syllables -= 1
            return w[4:]
        if w.startswith("peny") and len(w) > 4 and w[4] in _ID_VOWELS:
            flags |= REMOVED_PENG; syllables -= 1
            return "s" + w[4:]
        if w.startswith("peny"):
            flags |= REMOVED_PENG; syllables -= 1
            return w[4:]
        if w.startswith("pen") and len(w) > 3 and w[3] in _ID_VOWELS:
            flags |= REMOVED_PENG; syllables -= 1
            return "t" + w[3:]
        if w.startswith(("pen", "pem")):
            flags |= REMOVED_PENG; syllables -= 1
            return w[3:]
        if w.startswith("di"):
            flags |= REMOVED_DI; syllables -= 1
            return w[2:]
        if w.startswith("ter"):
            flags |= REMOVED_TER; syllables -= 1
            return w[3:]
        if w.startswith("ke"):
            flags |= REMOVED_KE; syllables -= 1
            return w[2:]
        return w

    def second_order_prefix(w):
        nonlocal syllables, flags
        if w.startswith("ber"):
            flags |= REMOVED_BER; syllables -= 1
            return w[3:]
        if w == "belajar":
            flags |= REMOVED_BER; syllables -= 1
            return w[3:]
        if (w.startswith("be") and len(w) > 4
                and w[2] not in _ID_VOWELS and w[3] == "e" and w[4] == "r"):
            flags |= REMOVED_BER; syllables -= 1
            return w[2:]
        if w.startswith("per"):
            syllables -= 1
            return w[3:]
        if w == "pelajar":
            syllables -= 1
            return w[3:]
        if w.startswith("pe"):
            flags |= REMOVED_PE; syllables -= 1
            return w[2:]
        return w

    def remove_suffix(w):
        nonlocal syllables
        if (w.endswith("kan") and not flags & (REMOVED_KE | REMOVED_PENG
                                               | REMOVED_PE)):
            syllables -= 1
            return w[:-3]
        if (w.endswith("an") and not flags & (REMOVED_DI | REMOVED_MENG
                                              | REMOVED_TER)):
            syllables -= 1
            return w[:-2]
        if (w.endswith("i") and not w.endswith("si")
                and not flags & (REMOVED_BER | REMOVED_KE | REMOVED_PENG)):
            syllables -= 1
            return w[:-1]
        return w

    if syllables > 2:
        w = remove_particle(w)
    if syllables > 2:
        w = remove_possessive(w)
    if stem_derivational:
        old = w
        if syllables > 2:
            w = first_order_prefix(w)
        if w != old:
            old = w
            if syllables > 2:
                w = remove_suffix(w)
            if w != old:
                if syllables > 2:
                    w = second_order_prefix(w)
        else:
            if syllables > 2:
                w = second_order_prefix(w)
            if syllables > 2:
                w = remove_suffix(w)
    return w


# ---------------------------------------------------------------------------
# Bulgarian (BulgarianStemmer.java — Savoy)
# ---------------------------------------------------------------------------


def bulgarian_stem(w: str) -> str:
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]

    # removeArticle
    n = len(w)
    if n > 6 and w.endswith("ият"):
        w = w[:-3]
    elif n > 5 and w.endswith(("ът", "то", "те", "та", "ия")):
        w = w[:-2]
    elif n > 4 and w.endswith("ят"):
        w = w[:-2]

    # removePlural
    n = len(w)
    if n > 6 and w.endswith("овци"):
        w = w[:-3]
    elif n > 6 and w.endswith("ове"):
        w = w[:-3]
    elif n > 6 and w.endswith("еве"):
        w = w[:-3] + "й"
    elif n > 5 and w.endswith("ища"):
        w = w[:-3]
    elif n > 5 and w.endswith("та"):
        w = w[:-2]
    elif n > 5 and w.endswith("ци"):
        w = w[:-2] + "к"
    elif n > 5 and w.endswith("зи"):
        w = w[:-2] + "г"
    elif n > 5 and w[-3] == "е" and w[-1] == "и":
        w = w[:-3] + "я" + w[-2]
    elif n > 4 and w.endswith("си"):
        w = w[:-2] + "х"
    elif n > 4 and w.endswith("и"):
        w = w[:-1]

    if len(w) > 3:
        if w.endswith("я"):
            w = w[:-1]
        if w.endswith(("а", "о", "е")):
            w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


# ---------------------------------------------------------------------------
# Czech (CzechStemmer.java — Dolamic & Savoy light stemmer)
# ---------------------------------------------------------------------------

_CZ_CASE_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
              "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
              "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_CASE_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
              "mi", "ou")
_CZ_CASE_1 = set("aeiouůyáéíýě")


def czech_stem(w: str) -> str:
    # removeCase
    n = len(w)
    if n > 7 and w.endswith("atech"):
        w = w[:-5]
    elif n > 6 and w.endswith(("ětem", "etem", "atům")):
        w = w[:-4]
    elif n > 5 and w.endswith(_CZ_CASE_3):
        w = w[:-3]
    elif n > 4 and w.endswith(_CZ_CASE_2):
        w = w[:-2]
    elif n > 3 and w[-1] in _CZ_CASE_1:
        w = w[:-1]

    # removePossessives
    if len(w) > 5 and w.endswith(("ov", "in", "ův")):
        w = w[:-2]

    # normalize
    if not w:
        return w
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in "cč":
        return w[:-1] + "k"
    if w[-1] in "zž":
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]
    return w


# ---------------------------------------------------------------------------
# Latvian (LatvianStemmer.java)
# ---------------------------------------------------------------------------

# (affix, vowel-count threshold, palatalizes) — tried in order
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False), ("ai", 2, False),
    ("ei", 2, False), ("ām", 1, False), ("am", 1, False), ("ēm", 1, False),
    ("īm", 1, False), ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False), ("os", 1, True),
    ("ij", 1, False), ("īs", 1, False), ("ēs", 1, False), ("is", 1, False),
    ("ie", 1, False), ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False), ("ī", 1, False),
    ("ū", 1, False), ("o", 1, False), ("s", 0, False), ("š", 0, False),
)
_LV_VOWELS = set("aeiouāīēū")


def _lv_unpalatalize(stem: str, removed_first: str) -> str:
    # removed_first is the first char of the stripped affix (Java s[len])
    if removed_first == "u":
        if stem.endswith("kš"):
            return stem[:-1] + "st"  # kš + u -> kst (buffer grows by one)
        if stem.endswith("ņņ"):
            return stem[:-2] + "nn"
    if stem.endswith(("pj", "bj", "mj", "vj")):
        return stem[:-1]
    if stem.endswith("šņ"):
        return stem[:-2] + "sn"
    if stem.endswith("žņ"):
        return stem[:-2] + "zn"
    if stem.endswith("šļ"):
        return stem[:-2] + "sl"
    if stem.endswith("žļ"):
        return stem[:-2] + "zl"
    if stem.endswith("ļņ"):
        return stem[:-2] + "ln"
    if stem.endswith("ļļ"):
        return stem[:-2] + "ll"
    if stem.endswith("č"):
        return stem[:-1] + "c"
    if stem.endswith("ļ"):
        return stem[:-1] + "l"
    if stem.endswith("ņ"):
        return stem[:-1] + "n"
    return stem


def latvian_stem(w: str) -> str:
    num_vowels = sum(1 for c in w if c in _LV_VOWELS)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if num_vowels > vc and len(w) >= len(affix) + 3 and w.endswith(affix):
            stem = w[: -len(affix)]
            return _lv_unpalatalize(stem, affix[0]) if palatalizes else stem
    return w


# ---------------------------------------------------------------------------
# Registry + Spark term-map integration
# ---------------------------------------------------------------------------

INTL_STEMMERS = {
    "ar": arabic_light_stem,
    "ckb": sorani_analyze,
    "fa_norm": persian_analyze,
    "hi": hindi_analyze,
    "id": indonesian_stem,
    "bg": bulgarian_stem,
    "cz": czech_stem,
    "lv": latvian_stem,
}


def intl_stem_map(vocab, key: str):
    """(term, new_term) dictionary frame — the porter_stem_map shape."""
    from pyspark.sql import functions as F

    fn = INTL_STEMMERS[key]

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(fn)

    return vocab.select(
        F.col("term"), _stem(F.col("term")).alias("new_term")
    ).where(F.col("new_term") != F.col("term"))
