"""Snowball Lovins stemmer — the published algorithm from
snowballstem.org ("The Lovins stemming algorithm", after J.B. Lovins,
"Development of a stemming algorithm", Mech. Trans. 11:1-2, 1968),
shipped by the reference as generated code
(lucene/analysis/common/src/java/org/tartarus/snowball/ext/
LovinsStemmer.java, selected via SnowballPorterFilterFactory
language="Lovins").

Golden-tested against the reference's full Snowball vocabulary
(TestSnowballVocabData.zip lovins/, 29,417 pairs) in
tests/test_snowball_tail.py.

Structure (backwards mode): one pass of three `do` steps —
1. endings: remove the longest of 294 endings whose context condition
   (Lovins' A..Z, AA, BB, CC) holds for the remaining stem; on a
   condition failure the among falls back through progressively
   shorter suffix entries (SnowballProgram.find_among_b substring_i
   chain — equivalent to longest-first scan since suffixes of one
   word form a chain).
2. undouble: if the result ends in bb/dd/gg/ll/mm/nn/pp/rr/ss/tt,
   drop one letter.
3. respell: apply the single longest-matching of 34 partial-match
   recoding rules (iev->ief ... yz->ys); the gated rules (ul, end,
   her, ent, et) check the character before the match and have no
   shorter table suffix, so a failed gate means no respell.

Conditions are evaluated with the cursor at the left edge of the
matched ending (find_among_b invokes the gate after
`cursor = c - w.s_size`), i.e. they are predicates over the stem.

Spark integration is the porter_stem_map shape (analysis/stemmer.py)
via snowball_registry.SNOWBALL_STEMMERS["Lovins"].
"""

from __future__ import annotations


# --- Lovins context conditions (paper section 2; sbl lines 6-40).
# Each takes the candidate stem (word minus ending); "hop k" in
# backwards mode = stem length >= k.

def _A(s):
    return len(s) >= 2


def _B(s):
    return len(s) >= 3


def _C(s):
    return len(s) >= 4


def _D(s):
    return len(s) >= 5


def _E(s):
    return len(s) >= 2 and not s.endswith("e")


def _F(s):
    return len(s) >= 3 and not s.endswith("e")


def _G(s):
    return len(s) >= 3 and s.endswith("f")


def _H(s):
    return len(s) >= 2 and (s.endswith("t") or s.endswith("ll"))


def _I(s):
    return len(s) >= 2 and s[-1] not in "oe"


def _J(s):
    return len(s) >= 2 and s[-1] not in "ae"


def _K(s):
    return len(s) >= 3 and (
        s[-1] in "li" or (s.endswith("e") and s[-3] == "u")
    )


def _L(s):
    if len(s) < 2 or s[-1] in "ux":
        return False
    return not (s.endswith("s") and s[-2] != "o")


def _M(s):
    return len(s) >= 2 and s[-1] not in "acem"


def _N(s):
    # min stem 3; if the 3rd-last char is 's', min stem 4
    return len(s) >= 3 and (s[-3] != "s" or len(s) >= 4)


def _O(s):
    return len(s) >= 2 and s[-1] in "li"


def _P(s):
    return len(s) >= 2 and not s.endswith("c")


def _Q(s):
    return len(s) >= 3 and s[-1] not in "ln"


def _R(s):
    return len(s) >= 2 and s[-1] in "nr"


def _S(s):
    return len(s) >= 2 and (
        s.endswith("dr") or (s.endswith("t") and s[-2] != "t")
    )


def _T(s):
    return len(s) >= 2 and (
        s.endswith("s") or (s.endswith("t") and s[-2] != "o")
    )


def _U(s):
    return len(s) >= 2 and s[-1] in "lmnr"


def _V(s):
    return len(s) >= 2 and s.endswith("c")


def _W(s):
    return len(s) >= 2 and s[-1] not in "su"


def _X(s):
    return len(s) >= 2 and (
        s[-1] in "li" or (len(s) >= 3 and s.endswith("e") and s[-3] == "u")
    )


def _Y(s):
    return len(s) >= 2 and s.endswith("in")


def _Z(s):
    return len(s) >= 2 and not s.endswith("f")


_AA_SET = ("ph", "th", "er", "or", "es", "d", "f", "l", "t")


def _AA(s):
    return len(s) >= 2 and any(s.endswith(e) for e in _AA_SET)


def _BB(s):
    return (
        len(s) >= 3
        and not s.endswith("met")
        and not s.endswith("ryst")
    )


def _CC(s):
    return len(s) >= 2 and s.endswith("l")


# --- 294 endings (Lovins appendix A), longest first.  Data extracted
# from the reference generated among table (LovinsStemmer.java a_1).
_ENDINGS = (
    ("alistically", _B), ("arizability", _A), ("izationally", _B),
    ("antialness", _A), ("arisations", _A), ("arizations", _A),
    ("entialness", _A), ("allically", _C), ("antaneous", _A),
    ("antiality", _A), ("arisation", _A), ("arization", _A),
    ("ationally", _B), ("ativeness", _A), ("eableness", _E),
    ("entations", _A), ("entiality", _A), ("entialize", _A),
    ("entiation", _A), ("ionalness", _A), ("istically", _A),
    ("itousness", _A), ("izability", _A), ("izational", _A),
    ("ableness", _A), ("arizable", _A), ("entation", _A), ("entially", _A),
    ("eousness", _A), ("ibleness", _A), ("icalness", _A), ("ionalism", _A),
    ("ionality", _A), ("ionalize", _A), ("iousness", _A), ("izations", _A),
    ("lessness", _A), ("ability", _A), ("aically", _A), ("alistic", _B),
    ("alities", _A), ("ariness", _E), ("aristic", _A), ("arizing", _A),
    ("ateness", _A), ("atingly", _A), ("ational", _B), ("atively", _A),
    ("ativism", _A), ("elihood", _E), ("encible", _A), ("entally", _A),
    ("entials", _A), ("entiate", _A), ("entness", _A), ("fulness", _A),
    ("ibility", _A), ("icalism", _A), ("icalist", _A), ("icality", _A),
    ("icalize", _A), ("ication", _G), ("icianry", _A), ("ination", _A),
    ("ingness", _A), ("ionally", _A), ("isation", _A), ("ishness", _A),
    ("istical", _A), ("iteness", _A), ("iveness", _A), ("ivistic", _A),
    ("ivities", _A), ("ization", _F), ("izement", _A), ("oidally", _A),
    ("ousness", _A), ("aceous", _A), ("acious", _B), ("action", _G),
    ("alness", _A), ("ancial", _A), ("ancies", _A), ("ancing", _B),
    ("ariser", _A), ("arized", _A), ("arizer", _A), ("atable", _A),
    ("ations", _B), ("atives", _A), ("eature", _Z), ("efully", _A),
    ("encies", _A), ("encing", _A), ("ential", _A), ("enting", _C),
    ("entist", _A), ("eously", _A), ("ialist", _A), ("iality", _A),
    ("ialize", _A), ("ically", _A), ("icance", _A), ("icians", _A),
    ("icists", _A), ("ifully", _A), ("ionals", _A), ("ionate", _D),
    ("ioning", _A), ("ionist", _A), ("iously", _A), ("istics", _A),
    ("izable", _E), ("lessly", _A), ("nesses", _A), ("oidism", _A),
    ("acies", _A), ("acity", _A), ("aging", _B), ("aical", _A),
    ("alism", _B), ("alist", _A), ("ality", _A), ("alize", _A),
    ("allic", _BB), ("anced", _B), ("ances", _B), ("antic", _C),
    ("arial", _A), ("aries", _A), ("arily", _A), ("arity", _B),
    ("arize", _A), ("aroid", _A), ("ately", _A), ("ating", _I),
    ("ation", _B), ("ative", _A), ("ators", _A), ("atory", _A),
    ("ature", _E), ("early", _Y), ("ehood", _A), ("eless", _A),
    ("elity", _A), ("ement", _A), ("enced", _A), ("ences", _A),
    ("eness", _E), ("ening", _E), ("ental", _A), ("ented", _C),
    ("ently", _A), ("fully", _A), ("ially", _A), ("icant", _A),
    ("ician", _A), ("icide", _A), ("icism", _A), ("icist", _A),
    ("icity", _A), ("idine", _I), ("iedly", _A), ("ihood", _A),
    ("inate", _A), ("iness", _A), ("ingly", _B), ("inism", _J),
    ("inity", _CC), ("ional", _A), ("ioned", _A), ("ished", _A),
    ("istic", _A), ("ities", _A), ("itous", _A), ("ively", _A),
    ("ivity", _A), ("izers", _F), ("izing", _F), ("oidal", _A),
    ("oides", _A), ("otide", _A), ("ously", _A), ("able", _A), ("ably", _A),
    ("ages", _B), ("ally", _B), ("ance", _B), ("ancy", _B), ("ants", _B),
    ("aric", _A), ("arly", _K), ("ated", _I), ("ates", _A), ("atic", _B),
    ("ator", _A), ("ealy", _Y), ("edly", _E), ("eful", _A), ("eity", _A),
    ("ence", _A), ("ency", _A), ("ened", _E), ("enly", _E), ("eous", _A),
    ("hood", _A), ("ials", _A), ("ians", _A), ("ible", _A), ("ibly", _A),
    ("ical", _A), ("ides", _L), ("iers", _A), ("iful", _A), ("ines", _M),
    ("ings", _N), ("ions", _B), ("ious", _A), ("isms", _B), ("ists", _A),
    ("itic", _H), ("ized", _F), ("izer", _F), ("less", _A), ("lily", _A),
    ("ness", _A), ("ogen", _A), ("ward", _A), ("wise", _A), ("ying", _B),
    ("yish", _A), ("acy", _A), ("age", _B), ("aic", _A), ("als", _BB),
    ("ant", _B), ("ars", _O), ("ary", _F), ("ata", _A), ("ate", _A),
    ("eal", _Y), ("ear", _Y), ("ely", _E), ("ene", _E), ("ent", _C),
    ("ery", _E), ("ese", _A), ("ful", _A), ("ial", _A), ("ian", _A),
    ("ics", _A), ("ide", _L), ("ied", _A), ("ier", _A), ("ies", _P),
    ("ily", _A), ("ine", _M), ("ing", _N), ("ion", _Q), ("ish", _C),
    ("ism", _B), ("ist", _A), ("ite", _AA), ("ity", _A), ("ium", _A),
    ("ive", _A), ("ize", _F), ("oid", _A), ("one", _R), ("ous", _A),
    ("'s", _A), ("ae", _A), ("al", _BB), ("ar", _X), ("as", _B), ("ed", _E),
    ("en", _F), ("es", _E), ("ia", _A), ("ic", _A), ("is", _A), ("ly", _B),
    ("on", _S), ("or", _T), ("s'", _A), ("um", _U), ("us", _V), ("yl", _R),
    ("a", _A), ("e", _A), ("i", _A), ("o", _A), ("s", _W), ("y", _B),
)

# --- respell recodings (Lovins appendix C / sbl respell), longest
# first.  Gate = required absent character immediately before the
# match (None = ungated).
_RESPELL = (
    ("istr", "ister", None),
    ("metr", "meter", None),
    ("erid", "eris", None),
    ("pand", "pans", None),
    ("umpt", "um", None),
    ("uad", "uas", None),
    ("vad", "vas", None),
    ("cid", "cis", None),
    ("lid", "lis", None),
    ("end", "ens", "s"),
    ("ond", "ons", None),
    ("lud", "lus", None),
    ("rud", "rus", None),
    ("her", "hes", "pt"),
    ("urs", "ur", None),
    ("uct", "uc", None),
    ("mit", "mis", None),
    ("ent", "ens", "m"),
    ("rpt", "rb", None),
    ("ert", "ers", None),
    ("iev", "ief", None),
    ("olv", "olut", None),
    ("bex", "bic", None),
    ("dex", "dic", None),
    ("pex", "pic", None),
    ("tex", "tic", None),
    ("lux", "luc", None),
    ("ul", "l", "aio"),
    ("et", "es", "n"),
    ("ax", "ac", None),
    ("ex", "ec", None),
    ("ix", "ic", None),
    ("yt", "ys", None),
    ("yz", "ys", None),
)

_DOUBLES = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")


def lovins_stem(word: str) -> str:
    """Stem one (lowercased) word with the Snowball Lovins algorithm."""
    # step 1: endings — longest suffix whose condition passes
    for ending, cond in _ENDINGS:
        if word.endswith(ending):
            stem = word[: len(word) - len(ending)]
            if cond(stem):
                word = stem
                break
    # step 2: undouble
    if word[-2:] in _DOUBLES:
        word = word[:-1]
    # step 3: respell — longest partial-match recode, gate on the
    # character before the match
    for pat, rep, gate in _RESPELL:
        if word.endswith(pat):
            if gate is not None:
                pre = word[: len(word) - len(pat)]
                if pre and pre[-1] in gate:
                    break  # gate failed; no shorter table suffix exists
            word = word[: len(word) - len(pat)] + rep
            break
    return word
