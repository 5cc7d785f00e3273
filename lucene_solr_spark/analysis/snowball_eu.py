"""Snowball Basque stemmer — the published algorithm from
snowballstem.org (basque.sbl, Olatz Perez de Vinaspre & Maite Oronoz),
shipped by the reference as generated code (lucene/analysis/common/src/
java/org/tartarus/snowball/ext/BasqueStemmer.java, selected via
SnowballPorterFilterFactory language="Basque").

Golden-tested in tests/test_snowball_ext_tail.py against 14,309 pairs
produced by the reference's own compiled BasqueStemmer
(tools/gen_snowball_tail_goldens.py).

Structure: standard Romance-style regions (RV with the
vowel/consonant-start cases, R1/R2; vowels aeiou), then backwards
  repeat aditzak   (verb endings: RV- or R2-gated deletes + recodes)
  repeat izenak    (noun/case endings: RV/R2/R1 deletes + recodes)
  do adjetiboak    (adjective endings: RV delete, ki -> z recode)
Regions are marked ONCE on the input; the repeats re-match on the
shrinking word against those absolute marks.  A failed region gate ends
the repeat (Snowball among actions do not fall back to shorter
entries).

Each table row is (suffix, case); case maps to (gate, replacement) in
the step driver below, exactly the generated switch arms.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

_ADITZAK = (
    ('tzailea', 1), ('arabera', 4), ('atseden', 3), ('kundea', 1),
    ('tailea', 1), ('taldia', 1), ('garria', 2), ('karria', 1),
    ('tezina', 1), ('kizuna', 1), ('gailua', 1), ('erreza', 1),
    ('gaitza', 1), ('kaitza', 1), ('kuntza', 1), ('tzaile', 1),
    ('tarazi', 1), ('aldatu', 1), ('baditu', 5), ('bidea', 1),
    ('kidea', 1), ('pidea', 1), ('galea', 1), ('gunea', 1), ('kunea', 1),
    ('tzaga', 1), ('aldia', 1), ('karia', 1), ('tzaka', 1), ('ezina', 1),
    ('korra', 1), ('kunde', 1), ('tzake', 1), ('tzeke', 1), ('taile', 1),
    ('taldi', 1), ('etari', 1), ('garri', 2), ('karri', 1), ('arazi', 1),
    ('rekin', 1), ('tezin', 1), ('kizun', 1), ('gailu', 1), ('errez', 1),
    ('gaitz', 1), ('kaitz', 1), ('idea', 1), ('gaia', 1), ('mena', 1),
    ('pena', 1), ('kina', 1), ('kuna', 1), ('tuna', 1), ('bera', 1),
    ('kera', 1), ('pera', 1), ('orra', 1), ('dura', 1), ('gura', 1),
    ('kura', 1), ('tura', 1), ('keta', 1), ('bide', 1), ('kide', 1),
    ('pide', 1), ('gale', 1), ('gune', 1), ('kune', 1), ('atze', 1),
    ('aldi', 1), ('kari', 1), ('lari', 1), ('tari', 1), ('rean', 1),
    ('etan', 1), ('ezin', 1), ('dako', 1), ('tzat', 1), ('tatu', 1),
    ('tzez', 1), ('era', 1), ('eta', 1), ('eza', 1), ('tza', 2),
    ('ide', 1), ('tze', 1), ('gai', 1), ('ari', 1), ('ean', 1), ('kan', 1),
    ('men', 1), ('pen', 1), ('kin', 1), ('tun', 1), ('ago', 1), ('tio', 1),
    ('kor', 1), ('atu', 1), ('ka', 1), ('la', 1), ('le', 1), ('ki', 1),
    ('an', 1), ('go', 1), ('or', 1), ('du', 1), ('tu', 1), ('ez', 1),
)

_IZENAK = (
    ('minutuko', 6), ('garrena', 1), ('gerrena', 1), ('kaldea', 1),
    ('taldea', 1), ('tzalea', 1), ('zionea', 1), ('aurrea', 1),
    ('taldia', 1), ('handia', 1), ('mendia', 1), ('garria', 2),
    ('larria', 1), ('kirria', 1), ('ontzia', 1), ('gibela', 1),
    ('urrena', 1), ('tzaina', 1), ('tasuna', 1), ('kondoa', 1),
    ('tzarra', 1), ('mendua', 1), ('mentua', 1), ('koitza', 1),
    ('gintza', 1), ('kintza', 1), ('kuntza', 1), ('garren', 1),
    ('gerren', 1), ('tariko', 1), ('gintzo', 1), ('gintzu', 1),
    ('denda', 1), ('gabea', 1), ('kabea', 1), ('aldea', 1), ('ordea', 1),
    ('zalea', 1), ('gilea', 1), ('kumea', 1), ('gunea', 1), ('kotea', 1),
    ('artea', 1), ('ostea', 1), ('etxea', 1), ('aldia', 1), ('degia', 1),
    ('tegia', 1), ('nahia', 1), ('tokia', 1), ('karia', 1), ('laria', 1),
    ('taria', 1), ('keria', 1), ('teria', 1), ('duria', 1), ('bizia', 1),
    ('aurka', 10), ('kaila', 1), ('skila', 1), ('zaina', 1), ('garna', 1),
    ('asuna', 1), ('ondoa', 1), ('takoa', 1), ('zinoa', 1), ('taroa', 1),
    ('zaroa', 1), ('liara', 1), ('tiara', 1), ('etara', 1), ('tzara', 1),
    ('korra', 1), ('ordua', 1), ('lekua', 1), ('burua', 1), ('durua', 1),
    ('estua', 1), ('eroza', 1), ('antza', 1), ('kalde', 1), ('talde', 1),
    ('tzale', 1), ('zione', 1), ('aurre', 1), ('taldi', 1), ('geldi', 8),
    ('handi', 1), ('mendi', 1), ('garri', 2), ('larri', 1), ('kirri', 1),
    ('ontzi', 1), ('tarik', 1), ('gibel', 1), ('urren', 1), ('tzain', 1),
    ('tasun', 1), ('aizun', 1), ('kondo', 1), ('trako', 5), ('etako', 1),
    ('igaro', 9), ('behar', 1), ('zehar', 7), ('mendu', 1), ('mentu', 1),
    ('koitz', 1), ('kada', 1), ('anda', 1), ('emea', 1), ('enea', 1),
    ('unea', 1), ('anga', 1), ('gaia', 1), ('geia', 1), ('egia', 1),
    ('ohia', 1), ('koia', 1), ('aria', 1), ('eria', 1), ('asia', 1),
    ('ezia', 1), ('joka', 3), ('gela', 1), ('tila', 1), ('kana', 1),
    ('kina', 1), ('mina', 1), ('duna', 1), ('ngoa', 1), ('zioa', 1),
    ('zkoa', 1), ('aroa', 1), ('eroa', 1), ('oroa', 1), ('osoa', 1),
    ('ttoa', 1), ('ztoa', 1), ('txoa', 1), ('tzoa', 1), ('dara', 1),
    ('tara', 1), ('bera', 1), ('kera', 1), ('pera', 1), ('keta', 1),
    ('tsua', 1), ('txua', 1), ('tzua', 1), ('gabe', 1), ('kabe', 1),
    ('kide', 1), ('alde', 1), ('orde', 1), ('zale', 1), ('gile', 1),
    ('kume', 1), ('gune', 1), ('kote', 1), ('arte', 1), ('oste', 1),
    ('etxe', 1), ('aldi', 1), ('degi', 1), ('tegi', 1), ('nahi', 1),
    ('toki', 1), ('kari', 1), ('lari', 1), ('tari', 1), ('duri', 1),
    ('kail', 1), ('etan', 1), ('tzen', 4), ('zain', 1), ('asun', 1),
    ('ondo', 1), ('tako', 1), ('tuko', 1), ('zino', 1), ('taro', 1),
    ('zaro', 1), ('giro', 1), ('liar', 1), ('tiar', 1), ('tzar', 1),
    ('ordu', 1), ('leku', 1), ('buru', 2), ('duru', 1), ('tatu', 4),
    ('estu', 1), ('eroz', 1), ('ada', 1), ('nea', 1), ('pea', 1),
    ('tea', 1), ('kia', 1), ('oia', 1), ('tia', 1), ('ska', 1), ('xka', 1),
    ('zka', 1), ('ola', 1), ('ena', 1), ('una', 1), ('koa', 1), ('noa', 1),
    ('toa', 1), ('ñoa', 1), ('ara', 1), ('ora', 2), ('tra', 1), ('osa', 1),
    ('eta', 1), ('sta', 1), ('dua', 1), ('tua', 1), ('zua', 1), ('eza', 1),
    ('tza', 2), ('eme', 1), ('une', 1), ('gai', 1), ('gei', 1), ('egi', 1),
    ('ohi', 1), ('goi', 1), ('koi', 1), ('ari', 1), ('asi', 1), ('ail', 1),
    ('kan', 1), ('tan', 1), ('ren', 2), ('ten', 4), ('kin', 1), ('min', 1),
    ('dun', 1), ('ngo', 1), ('zio', 1), ('eko', 1), ('sko', 1), ('zko', 1),
    ('aro', 1), ('ero', 1), ('oro', 1), ('oso', 1), ('tto', 1), ('zto', 1),
    ('txo', 1), ('tzo', 1), ('dar', 1), ('tar', 1), ('kor', 1), ('ket', 1),
    ('tsu', 1), ('txu', 1), ('tzu', 1), ('ga', 1), ('ka', 1), ('na', 1),
    ('ra', 1), ('sa', 1), ('ta', 1), ('za', 1), ('ge', 1), ('ne', 1),
    ('pe', 1), ('te', 1), ('di', 1), ('ki', 1), ('oi', 1), ('ti', 1),
    ('ñi', 1), ('ak', 1), ('ek', 1), ('en', 4), ('go', 1), ('ko', 1),
    ('no', 1), ('ro', 1), ('to', 1), ('ño', 1), ('zp', 1), ('ar', 1),
    ('or', 2), ('os', 1), ('du', 1), ('tu', 1), ('zu', 1), ('ez', 1),
    ('tz', 1), ('z', 1),
)

_ADJETIBOAK = (
    ('keria', 1), ('lanik', 1), ('larik', 1), ('zlea', 2), ('dade', 1),
    ('tade', 1), ('date', 1), ('tate', 1), ('ztik', 1), ('era', 1),
    ('rik', 1), ('ero', 1), ('la', 1), ('gi', 1), ('ki', 1), ('ik', 1),
    ('go', 1), ('ro', 1), ('to', 1),
)


# case -> (gate, replacement); gate None = unconditional
_ADITZAK_CASES = {
    1: ("RV", ""),
    2: ("R2", ""),
    3: (None, "atseden"),
    4: (None, "arabera"),
    5: (None, "baditu"),
}
_IZENAK_CASES = {
    1: ("RV", ""),
    2: ("R2", ""),
    3: (None, "jok"),
    4: ("R1", ""),
    5: (None, "tra"),
    6: (None, "minutu"),
    7: (None, "zehar"),
    8: (None, "geldi"),
    9: (None, "igaro"),
    10: (None, "aurka"),
}
_ADJETIBOAK_CASES = {1: ("RV", ""), 2: (None, "z")}


def _rv(w: str) -> int:
    n = len(w)
    if n < 2:
        return n
    if w[1] not in _VOWELS:
        i = 2
        while i < n and w[i] not in _VOWELS:
            i += 1
        return i + 1 if i < n else n
    if w[0] in _VOWELS:
        i = 2
        while i < n and w[i] in _VOWELS:
            i += 1
        return i + 1 if i < n else n
    return 3 if n > 2 else n


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


def _apply(w: str, end: int, table, cases, pV: int, p1: int, p2: int):
    """One find_among_b round at cursor `end`: matches the longest table
    suffix of w[:end].  Returns (new_word, new_end, matched); matched is
    False when nothing matched OR the longest match's gate failed (among
    actions do not fall back to shorter entries).  On success the cursor
    lands at the match start — Snowball's slice leaves cursor at bra, so
    later matches never rescan replacement text."""
    head = w[:end]
    for suf, case in table:
        if head.endswith(suf):
            gate, rep = cases[case]
            start = end - len(suf)
            if gate == "RV" and start < pV:
                return w, end, False
            if gate == "R1" and start < p1:
                return w, end, False
            if gate == "R2" and start < p2:
                return w, end, False
            return w[:start] + rep + w[end:], start, True
    return w, end, False


def basque_stem(word: str) -> str:
    """Stem one (lowercased) word with the Snowball Basque algorithm."""
    w = word
    pV = _rv(w)
    p1, p2 = _r1r2(w)
    # ONE shared backward cursor across all three steps: each `repeat`
    # iteration (and the final `do`) resumes where the previous success
    # left off (stem() restores cursor by distance-from-end, which a
    # failed call leaves unchanged).
    end = len(w)
    while True:
        w, end, ok = _apply(w, end, _ADITZAK, _ADITZAK_CASES, pV, p1, p2)
        if not ok:
            break
    while True:
        w, end, ok = _apply(w, end, _IZENAK, _IZENAK_CASES, pV, p1, p2)
        if not ok:
            break
    w, end, _ok = _apply(w, end, _ADJETIBOAK, _ADJETIBOAK_CASES, pV, p1, p2)
    return w
