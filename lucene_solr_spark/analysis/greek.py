"""Greek analysis: GreekLowerCaseFilter + GreekStemmer.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/el/
GreekLowerCaseFilter.java (final-sigma fold + tonos/dialytika removal) and
GreekStemmer.java:48-854 — Ntais' "Development of a Stemmer for the Greek
Language" algorithm (22 numbered rule groups with exception sets; the
short rules run first, the long suffix list only when none fired).

Two Java precedence quirks in the reference are preserved bit-for-bit:
rule8's `len > N && endsWith(A) || endsWith(B) || ...` chains guard ONLY
the first alternative with the length check, so the later alternatives
fire on whole-word matches one character shorter (e.g. "ηθηκανε" itself,
len 7, strips to empty via the ηθηκανε alternative).

Validated against the reference's 343-case TestGreekStemmer suite
(tests/test_greek.py).  Spark integration is the vocabulary term-map
shape (analysis/stemmer.py:206).
"""

from __future__ import annotations

import pandas as pd

_GREEK_FOLD = str.maketrans(
    {
        "ς": "σ",
        "ά": "α", "Ά": "α",
        "έ": "ε", "Έ": "ε",
        "ή": "η", "Ή": "η",
        "ί": "ι", "ΐ": "ι", "ϊ": "ι", "Ί": "ι", "Ϊ": "ι",
        "ύ": "υ", "ΰ": "υ", "ϋ": "υ", "Ύ": "υ", "Ϋ": "υ",
        "ό": "ο", "Ό": "ο",
        "ώ": "ω", "Ώ": "ω",
    }
)


def greek_lowercase(w: str) -> str:
    """GreekLowerCaseFilter: lowercase, standardize final sigma, strip
    tonos/dialytika to the base vowel."""
    return w.lower().translate(_GREEK_FOLD)


_VOWELS = set("αεηιουω")
_VOWELS_NO_Y = set("αεηιοω")  # endsWithVowelNoY: υ excluded

_EXC4 = {"θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"}
_EXC6 = {"αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
         "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
         "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
         "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
         "υποδ", "φιλον", "φυλοδ", "χασ"}
_EXC7 = {"αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ",
         "πικρ", "ποτ", "σιχ", "χ"}
_EXC8A = {"τρ", "τσ"}
_EXC8B = {"βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ",
          "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ",
          "π", "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ",
          "τσαρλατ", "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ",
          "γαλ", "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ",
          "σ", "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ",
          "σιγ", "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ",
          "αμηχ", "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ",
          "βαθυγαλ", "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ",
          "καπνοβιομηχ", "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ",
          "μεγλοβιομηχ", "μικροβιομηχ", "νταβ", "ξηροκλιβ", "ολιγοδαμ",
          "ολογαλ", "πενταρφ", "περηφ", "περιτρ", "πλατ", "πολυδαπ",
          "πολυμηχ", "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ",
          "ψηλοταβ"}
_EXC9 = {"αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον",
         "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ",
         "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ"}
_EXC12A = {"π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"}
_EXC12B = {"αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ"}
_EXC13 = {"διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"}
_EXC14 = {"φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ",
          "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ",
          "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
          "τσα"}
_EXC15A = {"αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
           "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
           "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
           "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ",
           "αποτ", "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ",
           "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ"}
_EXC15B = {"ψοφ", "ναυλοχ"}
_EXC16 = {"ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν"}
_EXC17 = {"ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ",
          "κοινοχρ", "παλιμψ"}
_EXC18 = {"ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"}
_EXC19 = {"παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ"}


def _ends_vowel(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS


def _ends_vowel_no_y(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS_NO_Y


def greek_stem(w: str) -> str:
    """GreekStemmer.java:stem — operates on GreekLowerCaseFilter output."""
    if len(w) < 4:
        return w
    orig_len = len(w)
    w = _rule0(w)
    w = _rule1(w)
    w = _rule2(w)
    w = _rule3(w)
    w = _rule4(w)
    w = _rule5(w)
    w = _rule6(w)
    w = _rule7(w)
    w = _rule8(w)
    w = _rule9(w)
    w = _rule10(w)
    w = _rule11(w)
    w = _rule12(w)
    w = _rule13(w)
    w = _rule14(w)
    w = _rule15(w)
    w = _rule16(w)
    w = _rule17(w)
    w = _rule18(w)
    w = _rule19(w)
    w = _rule20(w)
    if len(w) == orig_len:
        w = _rule21(w)
    return _rule22(w)


def _rule0(w: str) -> str:
    n = len(w)
    if n > 9 and w.endswith(("καθεστωτοσ", "καθεστωτων")):
        return w[:-4]
    if n > 8 and w.endswith(("γεγονοτοσ", "γεγονοτων")):
        return w[:-4]
    if n > 8 and w.endswith("καθεστωτα"):
        return w[:-3]
    if n > 7 and w.endswith(("τατογιου", "τατογιων")):
        return w[:-4]
    if n > 7 and w.endswith("γεγονοτα"):
        return w[:-3]
    if n > 7 and w.endswith("καθεστωσ"):
        return w[:-2]
    if n > 6 and w.endswith(
        ("σκαγιου", "σκαγιων", "ολογιου", "ολογιων", "κρεατοσ", "κρεατων",
         "περατοσ", "περατων", "τερατοσ", "τερατων")
    ):
        return w[:-4]
    if n > 6 and w.endswith("τατογια"):
        return w[:-3]
    if n > 6 and w.endswith("γεγονοσ"):
        return w[:-2]
    if n > 5 and w.endswith(("φαγιου", "φαγιων", "σογιου", "σογιων")):
        return w[:-4]
    if n > 5 and w.endswith(("σκαγια", "ολογια", "κρεατα", "περατα", "τερατα")):
        return w[:-3]
    if n > 4 and w.endswith(("φαγια", "σογια", "φωτοσ", "φωτων")):
        return w[:-3]
    if n > 4 and w.endswith(("κρεασ", "περασ", "τερασ")):
        return w[:-2]
    if n > 3 and w.endswith("φωτα"):
        return w[:-2]
    if n > 2 and w.endswith("φωσ"):
        return w[:-1]
    return w


def _rule1(w: str) -> str:
    if len(w) > 4 and w.endswith(("αδεσ", "αδων")):
        w = w[:-4]
        if not w.endswith(
            ("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι", "νταντ", "κυρ",
             "θει", "πεθερ")
        ):
            w += "αδ"
    return w


def _rule2(w: str) -> str:
    if len(w) > 4 and w.endswith(("εδεσ", "εδων")):
        w = w[:-4]
        if w.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ", "μιλ")):
            w += "εδ"
    return w


def _rule3(w: str) -> str:
    if len(w) > 5 and w.endswith(("ουδεσ", "ουδων")):
        w = w[:-5]
        if w.endswith(
            ("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ", "φλ", "φρ",
             "βελ", "λουλ", "χν", "σπ", "τραγ", "φε")
        ):
            w += "ουδ"
    return w


def _rule4(w: str) -> str:
    if len(w) > 3 and w.endswith(("εωσ", "εων")):
        w = w[:-3]
        if w in _EXC4:
            w += "ε"
    return w


def _rule5(w: str) -> str:
    if len(w) > 2 and w.endswith("ια"):
        w = w[:-2]
        if _ends_vowel(w):
            w += "ι"
    elif len(w) > 3 and w.endswith(("ιου", "ιων")):
        w = w[:-3]
        if _ends_vowel(w):
            w += "ι"
    return w


def _rule6(w: str) -> str:
    removed = False
    if len(w) > 3 and w.endswith(("ικα", "ικο")):
        w = w[:-3]
        removed = True
    elif len(w) > 4 and w.endswith(("ικου", "ικων")):
        w = w[:-4]
        removed = True
    if removed and (_ends_vowel(w) or w in _EXC6):
        w += "ικ"
    return w


def _rule7(w: str) -> str:
    if len(w) == 5 and w.endswith("αγαμε"):
        return w[:-1]
    if len(w) > 7 and w.endswith("ηθηκαμε"):
        w = w[:-7]
    elif len(w) > 6 and w.endswith("ουσαμε"):
        w = w[:-6]
    elif len(w) > 5 and w.endswith(("αγαμε", "ησαμε", "ηκαμε")):
        w = w[:-5]
    if len(w) > 3 and w.endswith("αμε"):
        w = w[:-3]
        if w in _EXC7:
            w += "αμ"
    return w


def _rule8(w: str) -> str:
    removed = False
    n = len(w)
    # Java precedence quirk preserved: only the FIRST alternative of each
    # group is guarded by the length check; the remaining alternatives can
    # fire on whole-word matches (GreekStemmer.java rule8).
    if n > 8 and w.endswith("ιουντανε"):
        w = w[:-8]
        removed = True
    elif (n > 7 and w.endswith("ιοντανε")) or w.endswith(("ουντανε", "ηθηκανε")):
        w = w[:-7]
        removed = True
    elif (n > 6 and w.endswith("ιοτανε")) or w.endswith(("οντανε", "ουσανε")):
        w = w[:-6]
        removed = True
    elif (n > 5 and w.endswith("αγανε")) or w.endswith(("ησανε", "οτανε", "ηκανε")):
        w = w[:-5]
        removed = True
    if removed and w in _EXC8A:
        w += "αγαν"
    if len(w) > 3 and w.endswith("ανε"):
        w = w[:-3]
        if _ends_vowel_no_y(w) or w in _EXC8B:
            w += "αν"
    return w


def _rule9(w: str) -> str:
    if len(w) > 5 and w.endswith("ησετε"):
        w = w[:-5]
    if len(w) > 3 and w.endswith("ετε"):
        w = w[:-3]
        if (
            w in _EXC9
            or _ends_vowel_no_y(w)
            or w.endswith(
                ("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ",
                 "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν",
                 "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
                 "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ", "ωφελ")
            )
        ):
            w += "ετ"
    return w


def _rule10(w: str) -> str:
    if len(w) > 5 and w.endswith(("οντασ", "ωντασ")):
        w = w[:-5]
        if len(w) == 3 and w.endswith("αρχ"):
            w += "οντ"
        if w.endswith("κρε"):
            w += "ωντ"
    return w


def _rule11(w: str) -> str:
    if len(w) > 6 and w.endswith("ομαστε"):
        w = w[:-6]
        if len(w) == 2 and w.endswith("ον"):
            w += "ομαστ"
    elif len(w) > 7 and w.endswith("ιομαστε"):
        w = w[:-7]
        if len(w) == 2 and w.endswith("ον"):
            w += "ομαστ"
    return w


def _rule12(w: str) -> str:
    if len(w) > 5 and w.endswith("ιεστε"):
        w = w[:-5]
        if w in _EXC12A:
            w += "ιεστ"
    if len(w) > 4 and w.endswith("εστε"):
        w = w[:-4]
        if w in _EXC12B:
            w += "εστ"
    return w


def _rule13(w: str) -> str:
    if len(w) > 6 and w.endswith("ηθηκεσ"):
        w = w[:-6]
    elif len(w) > 5 and w.endswith(("ηθηκα", "ηθηκε")):
        w = w[:-5]
    removed = False
    if len(w) > 4 and w.endswith("ηκεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("ηκα", "ηκε")):
        w = w[:-3]
        removed = True
    if removed and (
        w in _EXC13
        or w.endswith(("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ"))
    ):
        w += "ηκ"
    return w


def _rule14(w: str) -> str:
    removed = False
    if len(w) > 5 and w.endswith("ουσεσ"):
        w = w[:-5]
        removed = True
    elif len(w) > 4 and w.endswith(("ουσα", "ουσε")):
        w = w[:-4]
        removed = True
    if removed and (
        w in _EXC14
        or _ends_vowel(w)
        or w.endswith(
            ("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ", "κυματ",
             "λαχ", "ληγ", "φαγ", "ομ", "πρωτ")
        )
    ):
        w += "ουσ"
    return w


def _rule15(w: str) -> str:
    removed = False
    if len(w) > 4 and w.endswith("αγεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("αγα", "αγε")):
        w = w[:-3]
        removed = True
    if removed:
        cond1 = w in _EXC15A or w.endswith(
            ("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ", "λοχ", "σμην")
        )
        cond2 = w in _EXC15B or w.endswith("κολλ")
        if cond1 and not cond2:
            w += "αγ"
    return w


def _rule16(w: str) -> str:
    removed = False
    if len(w) > 4 and w.endswith("ησου"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("ησε", "ησα")):
        w = w[:-3]
        removed = True
    if removed and w in _EXC16:
        w += "ησ"
    return w


def _rule17(w: str) -> str:
    if len(w) > 4 and w.endswith("ηστε"):
        w = w[:-4]
        if w in _EXC17:
            w += "ηστ"
    return w


def _rule18(w: str) -> str:
    removed = False
    if len(w) > 6 and w.endswith(("ησουνε", "ηθουνε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουνε"):
        w = w[:-4]
        removed = True
    if removed and w in _EXC18:
        w += "ουν"
    return w


def _rule19(w: str) -> str:
    removed = False
    if len(w) > 6 and w.endswith(("ησουμε", "ηθουμε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουμε"):
        w = w[:-4]
        removed = True
    if removed and w in _EXC19:
        w += "ουμ"
    return w


def _rule20(w: str) -> str:
    if len(w) > 5 and w.endswith(("ματων", "ματοσ")):
        return w[:-3]
    if len(w) > 4 and w.endswith("ματα"):
        return w[:-2]
    return w


_R21_9 = ("ιοντουσαν",)
_R21_8 = ("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν")
_R21_7 = ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα", "ιουνται",
          "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν", "ουμαστε")
_R21_6 = ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν", "ομουνα",
          "οσαστε", "οσουνα", "ουνται", "ουνταν", "ουσατε")
_R21_5 = ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα", "ηθεισ",
          "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν", "ονται", "ονταν",
          "οσουν", "ουμαι", "ουσαν")
_R21_4 = ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται", "ηδεσ",
          "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι", "οταν")
_R21_3 = ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ")
_R21_2 = ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου", "υσ", "ων")


def _rule21(w: str) -> str:
    n = len(w)
    if n > 9 and w.endswith(_R21_9):
        return w[:-9]
    if n > 8 and w.endswith(_R21_8):
        return w[:-8]
    if n > 7 and w.endswith(_R21_7):
        return w[:-7]
    if n > 6 and w.endswith(_R21_6):
        return w[:-6]
    if n > 5 and w.endswith(_R21_5):
        return w[:-5]
    if n > 4 and w.endswith(_R21_4):
        return w[:-4]
    if n > 3 and w.endswith(_R21_3):
        return w[:-3]
    if n > 2 and w.endswith(_R21_2):
        return w[:-2]
    if n > 1 and _ends_vowel(w):
        return w[:-1]
    return w


def _rule22(w: str) -> str:
    if w.endswith(("εστερ", "εστατ")):
        return w[:-5]
    if w.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        return w[:-4]
    return w


def greek_analyze(w: str) -> str:
    """GreekAnalyzer chain for a single non-stopword token:
    GreekLowerCaseFilter -> GreekStemFilter."""
    return greek_stem(greek_lowercase(w))


def greek_stem_map(vocab):
    """(term, new_term) dictionary frame — the porter_stem_map shape.
    Index terms are already lowercased by the standard chain; the Greek
    fold runs here so accented vocabulary still conflates."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(greek_analyze)

    return vocab.select(
        F.col("term"), _stem(F.col("term")).alias("new_term")
    ).where(F.col("new_term") != F.col("term"))
