"""Snowball Catalan stemmer — the published algorithm from
snowballstem.org (catalan.sbl, Israel Olalla & Reyes Perez, iSOCO),
shipped by the reference as generated code (lucene/analysis/common/src/
java/org/tartarus/snowball/ext/CatalanStemmer.java, selected via
SnowballPorterFilterFactory language="Catalan").

Golden-tested in tests/test_snowball_ext_tail.py against 20,070 pairs
produced by the reference's own compiled CatalanStemmer
(tools/gen_snowball_tail_goldens.py).

Structure: mark p1/p2 (standard Snowball regions; vowels
aeiou + aeiou-grave/acute + i/u-diaeresis), then backwards
  do attached_pronoun  (R1-gated delete)
  do (standard_suffix or verb_suffix)
  do residual_suffix
each scanning from the current word end (every `do` restores the
cursor by distance-from-end, which is 0), then a final forward
`cleaning` pass folds the accented vowels and the middle-dot.
A failed region gate fails the whole step — Snowball among actions do
not fall back to shorter entries.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou\u00e0\u00e1\u00e8\u00e9\u00ed\u00ef\u00f2\u00f3\u00fa\u00fc")

_PRONOUN = (
    ('selas', 1), ('selos', 1), ('sela', 1), ('selo', 1), ('-les', 1),
    ('-nos', 1), ('-la', 1), ('-me', 1), ('-te', 1), ("'hi", 1),
    ('-li', 1), ("'ho", 1), ('las', 1), ('les', 1), ("'ls", 1), ('-ls', 1),
    ("'ns", 1), ('-ns', 1), ('ens', 1), ('los', 1), ('nos', 1), ('vos', 1),
    ('-us', 1), ('la', 1), ('le', 1), ('me', 1), ('se', 1), ('hi', 1),
    ('li', 1), ("'l", 1), ("'m", 1), ('-m', 1), ("'n", 1), ('-n', 1),
    ('ho', 1), ('lo', 1), ("'s", 1), ('us', 1), ("'t", 1),
)

_STANDARD = (
    ('quíssimes', 5), ('allengües', 1), ('ativitats', 1), ('quíssima', 5),
    ('ialismes', 1), ('ialistes', 1), ('ionistes', 1), ('lógiques', 3),
    ('quíssims', 5), ('bilitats', 1), ('ativitat', 1), ('ialista', 1),
    ('ionista', 1), ('ialisme', 1), ('ionisme', 1), ('quíssim', 5),
    ('atòries', 1), ('íssimes', 1), ('ivitats', 1), ('bilitat', 1),
    ('isament', 1), ('lógica', 3), ('atòria', 1), ('íssima', 1),
    ('ivisme', 1), ('ificar', 1), ('lógics', 3), ('ancies', 1),
    ('encies', 1), ('ències', 1), ('logies', 3), ('formes', 1),
    ('idores', 1), ('atives', 1), ('logíes', 3), ('íssims', 1),
    ('acions', 2), ('aments', 1), ('ivitat', 1), ('ancia', 1),
    ('encia', 1), ('ència', 1), ('logia', 3), ('íinia', 1), ('ívola', 1),
    ('sfera', 1), ('adora', 1), ('adura', 1), ('ativa', 1), ('logía', 3),
    ('ístic', 1), ('issem', 1), ('ìssem', 1), ('íssem', 1), ('íssim', 1),
    ('ìssin', 1), ('itzar', 1), ('doras', 1), ('ícies', 1), ('inies', 1),
    ('ínies', 1), ('eries', 1), ('àries', 1), ('ables', 1), ('ibles', 1),
    ('ismes', 1), ('dores', 1), ('dures', 1), ('asses', 1), ('ictes', 1),
    ('istes', 1), ('iques', 4), ('logis', 3), ('toris', 1), ('cions', 1),
    ('assos', 1), ('issos', 1), ('adors', 1), ('idors', 1), ('itats', 1),
    ('ïtats', 1), ('ments', 1), ('trius', 1), ('atius', 1), ('ament', 1),
    ('isseu', 1), ('ìsseu', 1), ('ísseu', 1), ('íssiu', 1), ('enca', 1),
    ('ícia', 1), ('inia', 1), ('eria', 1), ('ària', 1), ('alla', 1),
    ('ella', 1), ('dora', 1), ('assa', 1), ('essa', 1), ('issa', 1),
    ('ista', 1), ('atge', 1), ('able', 1), ('ible', 1), ('isme', 1),
    ('aire', 1), ('icte', 1), ('iste', 1), ('logi', 3), ('tori', 1),
    ('ívol', 1), ('isam', 1), ('amen', 1), ('egar', 1), ('ejar', 1),
    ('itar', 1), ('nces', 1), ('ades', 2), ('bles', 1), ('imes', 1),
    ('ines', 1), ('eres', 1), ('ores', 1), ('eses', 1), ('oses', 1),
    ('ites', 1), ('otes', 1), ('ives', 1), ('icis', 1), ('ícis', 1),
    ('aris', 1), ('ells', 1), ('ions', 1), ('esos', 1), ('osos', 1),
    ('dors', 1), ('ants', 1), ('ents', 1), ('itat', 1), ('ïtat', 1),
    ('ient', 1), ('ment', 1), ('triu', 1), ('atiu', 1), ('ació', 1),
    ('ica', 4), ('ada', 2), ('ima', 1), ('ana', 1), ('ina', 1), ('era', 1),
    ('ora', 1), ('esa', 1), ('osa', 1), ('eta', 1), ('ita', 1), ('ota', 1),
    ('iva', 1), ('nça', 1), ('enc', 1), ('esc', 1), ('ble', 1), ('ici', 1),
    ('íci', 1), ('ari', 1), ('all', 1), ('ell', 1), ('fer', 1), ('dor', 1),
    ('dur', 1), ('ics', 4), ('uds', 1), ('als', 1), ('ims', 1), ('ers', 1),
    ('ors', 1), ('ats', 1), ('ets', 1), ('ots', 1), ('uts', 1), ('ius', 1),
    ('dís', 1), ('ant', 1), ('ent', 1), ('ció', 1), ('ic', 4), ('ud', 1),
    ('al', 1), ('il', 1), ('ar', 1), ('or', 1), ('ls', 1), ('ès', 1),
    ('és', 1), ('ís', 1), ('ós', 1), ('et', 1), ('ot', 1), ('ió', 1),
    ('ó', 1),
)

_VERB = (
    ('iéramos', 1), ('aríamos', 1), ('eríamos', 1), ('iríamos', 1),
    ('iésemos', 1), ('eresseu', 1), ('esquen', 1), ('isquen', 1),
    ('ïsquen', 1), ('esquin', 1), ('adores', 1), ('esques', 1),
    ('ïsques', 1), ('ierais', 1), ('aríais', 1), ('eríais', 1),
    ('iríais', 1), ('ieseis', 1), ('asteis', 1), ('isteis', 1),
    ('esquis', 1), ('ábamos', 1), ('áramos', 1), ('aremos', 1),
    ('eremos', 1), ('iremos', 1), ('ásemos', 1), ('adora', 1),
    ('esqui', 1), ('àssem', 1), ('éssem', 1), ('iguem', 1), ('ïguem', 1),
    ('irìem', 1), ('aríem', 1), ('iríem', 1), ('assim', 1), ('essim', 1),
    ('issim', 1), ('àssim', 1), ('èssim', 1), ('éssim', 1), ('íssim', 1),
    ('arian', 1), ('ieran', 1), ('arían', 1), ('erían', 1), ('irían', 1),
    ('arien', 1), ('irien', 1), ('iesen', 1), ('assen', 1), ('essen', 1),
    ('issen', 1), ('éssen', 1), ('ïssen', 1), ('eixen', 1), ('assin', 1),
    ('essin', 1), ('issin', 1), ('ïssin', 1), ('eixin', 1), ('ieron', 1),
    ('iendo', 1), ('eixer', 1), ('ieras', 1), ('arías', 1), ('erías', 1),
    ('irías', 1), ('atges', 1), ('aries', 1), ('iries', 1), ('ieses', 1),
    ('asses', 1), ('esses', 1), ('isses', 1), ('ïsses', 1), ('eixes', 1),
    ('abais', 1), ('arais', 1), ('aseis', 1), ('assis', 1), ('essis', 1),
    ('issis', 1), ('ïssis', 1), ('eixis', 1), ('itzis', 1), ('aréis', 1),
    ('eréis', 1), ('iréis', 1), ('íamos', 1), ('adors', 1), ('erass', 1),
    ('asseu', 1), ('esseu', 1), ('àsseu', 1), ('ésseu', 1), ('igueu', 1),
    ('ïgueu', 1), ('itzeu', 1), ('irìeu', 1), ('aríeu', 1), ('iríeu', 1),
    ('assiu', 1), ('issiu', 1), ('àssiu', 1), ('èssiu', 1), ('éssiu', 1),
    ('íssiu', 1), ('esca', 1), ('isca', 1), ('ïsca', 1), ('aria', 1),
    ('iria', 1), ('iera', 1), ('itza', 1), ('aría', 1), ('ería', 1),
    ('iría', 1), ('iese', 1), ('aste', 1), ('iste', 1), ('eixi', 1),
    ('itzi', 1), ('arem', 1), ('irem', 1), ('àrem', 1), ('írem', 1),
    ('avem', 1), ('àvem', 1), ('ávem', 1), ('aban', 1), ('aran', 1),
    ('iran', 1), ('aren', 1), ('eren', 1), ('iren', 1), ('àren', 1),
    ('ïren', 1), ('asen', 1), ('aven', 1), ('ixen', 1), ('ïxen', 1),
    ('inin', 1), ('isin', 1), ('aron', 1), ('arán', 1), ('erán', 1),
    ('irán', 1), ('ando', 2), ('eixo', 1), ('itzo', 1), ('tzar', 1),
    ('ador', 1), ('abas', 1), ('adas', 1), ('idas', 1), ('aras', 1),
    ('ades', 1), ('ides', 1), ('udes', 1), ('ïdes', 1), ('ares', 1),
    ('ires', 1), ('ïres', 1), ('ases', 1), ('ques', 1), ('aves', 1),
    ('ixes', 1), ('ïxes', 1), ('íais', 1), ('inis', 1), ('isis', 1),
    ('ados', 1), ('idos', 1), ('amos', 1), ('imos', 1), ('ents', 1),
    ('aràs', 1), ('iràs', 1), ('arás', 1), ('erás', 1), ('irás', 1),
    ('arés', 1), ('erau', 1), ('ineu', 1), ('areu', 1), ('ireu', 1),
    ('àreu', 1), ('íreu', 1), ('àveu', 1), ('áveu', 1), ('itzà', 1),
    ('aba', 1), ('ada', 1), ('ida', 1), ('uda', 1), ('ïda', 1), ('ara', 1),
    ('ira', 1), ('ïra', 1), ('ava', 1), ('ixa', 1), ('isc', 1), ('ïsc', 1),
    ('dre', 1), ('ase', 1), ('ini', 1), ('íem', 1), ('ían', 1), ('ien', 1),
    ('ïen', 1), ('sin', 1), ('iïn', 1), ('ado', 1), ('ido', 1), ('ixo', 1),
    ('ïxo', 1), ('ías', 1), ('ids', 1), ('ies', 1), ('ïes', 1), ('sis', 1),
    ('áis', 1), ('ams', 1), ('ass', 1), ('ess', 1), ('ats', 1), ('its', 1),
    ('iïs', 1), ('ant', 1), ('ent', 1), ('int', 1), ('ieu', 1), ('ìeu', 1),
    ('íeu', 1), ('eix', 1), ('itz', 1), ('arà', 1), ('irà', 1), ('ará', 1),
    ('erá', 1), ('irá', 1), ('irè', 1), ('aré', 1), ('eré', 1), ('iré', 1),
    ('ia', 1), ('ía', 1), ('ïa', 1), ('ad', 1), ('ed', 1), ('id', 1),
    ('ie', 1), ('re', 1), ('ii', 1), ('am', 1), ('em', 1), ('ïm', 1),
    ('an', 1), ('en', 1), ('in', 1), ('io', 1), ('ar', 1), ('er', 1),
    ('ir', 1), ('as', 1), ('es', 1), ('às', 1), ('és', 1), ('ís', 1),
    ('at', 1), ('it', 1), ('ut', 1), ('ït', 1), ('au', 1), ('ïu', 1),
    ('ix', 1), ('ïx', 1), ('ià', 1), ('iï', 1), ('ió', 1), ('í', 1),
)

_RESIDUAL = (
    ('iqu', 2), ('itz', 1), ('ïn', 1), ('ir', 1), ('is', 1), ('os', 1),
    ('ïs', 1), ('it', 1), ('eu', 1), ('iu', 1), ('a', 1), ('e', 1),
    ('i', 1), ('o', 1), ('s', 1), ('à', 1), ('á', 1), ('é', 1), ('ì', 1),
    ('í', 1), ('ï', 1), ('ó', 1),
)


_PRONOUN_CASES = {1: ("R1", "")}
_STANDARD_CASES = {
    1: ("R1", ""),
    2: ("R2", ""),
    3: ("R2", "log"),
    4: ("R2", "ic"),
    5: ("R1", "c"),
}
_VERB_CASES = {1: ("R1", ""), 2: ("R2", "")}
_RESIDUAL_CASES = {1: ("R1", ""), 2: ("R1", "ic")}

_CLEANING = str.maketrans(
    "\u00e1\u00e0\u00e9\u00e8\u00ed\u00ec\u00f3\u00f2\u00fa\u00fc\u00ef\u00b7",
    "aaeeiioouui.",
)


def _r1r2(w: str) -> tuple[int, int]:
    n = len(w)

    def _pair(start: int) -> int:
        i = start
        while i < n and w[i] not in _VOWELS:
            i += 1
        if i >= n:
            return n
        i += 1
        while i < n and w[i] in _VOWELS:
            i += 1
        return i + 1 if i < n else n

    p1 = _pair(0)
    p2 = _pair(p1) if p1 < n else n
    return p1, p2


def _apply(w: str, table, cases, p1: int, p2: int):
    """One find_among_b round from the word end; returns (word, matched)."""
    for suf, case in table:
        if w.endswith(suf):
            gate, rep = cases[case]
            start = len(w) - len(suf)
            if gate == "R1" and start < p1:
                return w, False
            if gate == "R2" and start < p2:
                return w, False
            return w[:start] + rep, True
    return w, False


def catalan_stem(word: str) -> str:
    """Stem one (lowercased) word with the Snowball Catalan algorithm."""
    w = word
    p1, p2 = _r1r2(w)
    w, _ = _apply(w, _PRONOUN, _PRONOUN_CASES, p1, p2)
    w2, ok = _apply(w, _STANDARD, _STANDARD_CASES, p1, p2)
    if ok:
        w = w2
    else:
        w, _ = _apply(w, _VERB, _VERB_CASES, p1, p2)
    w, _ = _apply(w, _RESIDUAL, _RESIDUAL_CASES, p1, p2)
    return w.translate(_CLEANING)
