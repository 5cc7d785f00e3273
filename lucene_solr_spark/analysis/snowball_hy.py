"""Snowball Armenian stemmer — the published algorithm from
snowballstem.org (armenian.sbl, Astghik Mkrtchyan), shipped by the
reference as generated code (lucene/analysis/common/src/java/org/
tartarus/snowball/ext/ArmenianStemmer.java, selected via
SnowballPorterFilterFactory language="Armenian").

Golden-tested in tests/test_snowball_ext_tail.py against 7,071 pairs
produced by the reference's own compiled ArmenianStemmer
(tools/gen_snowball_tail_goldens.py).

Structure:
1. mark_regions: pV = after the first vowel; p2 = the standard second
   vowel+non-vowel region boundary (vowels: ա ե է ը ի ո ւ օ —
   g_v {209,4,128,0,18} over U+0561..U+0585).
2. `backwards setlimit tomark pV` bounds every suffix match to start at
   or after pV — a longest table entry that would cross pV is skipped
   in favor of the longest one that fits (find_among_b's limit check).
3. Four independent backward `do` steps, each deleting its longest
   fitting suffix: ending (gated on R2), verb, adjective, noun.
"""

from __future__ import annotations

_VOWELS = frozenset("\u0561\u0565\u0567\u0568\u056b\u0578\u0582\u0585")

_ADJECTIVE = (
    'երորդ', 'րորդ', 'որակ', 'ական', 'արան', 'եկեն', 'երեն', 'որէն',
    'ովին', 'լայն', 'վուն', 'ավետ', 'ալի', 'ակի', 'գին', 'պես', 'կոտ',
    'բար', 'եղ', 'են', 'ին', 'իվ', 'ատ',
)

_VERB = (
    'ացրինք', 'վեցինք', 'ացնալ', 'եցնել', 'ացվել', 'եցվել', 'կոտել',
    'ացրին', 'վեցին', 'ացրիր', 'վեցիր', 'ացրեց', 'ալուց', 'ելուց', 'ացրիք',
    'վեցիք', 'ացանք', 'ացինք', 'եցինք', 'ացրի', 'վեցի', 'անալ', 'ենալ',
    'ցնել', 'ատել', 'ոտել', 'վում', 'ացան', 'ացին', 'եցին', 'ալիս', 'ելիս',
    'ացավ', 'եցավ', 'ալով', 'ելով', 'ացար', 'եցար', 'ացիր', 'եցիր', 'ալու',
    'ելու', 'ացաք', 'ացիք', 'եցիք', 'ցանք', 'ացա', 'եցա', 'ացի', 'եցի',
    'ըալ', 'ըել', 'նել', 'չել', 'վել', 'տել', 'ված', 'ում', 'ցան', 'ցաք',
    'անք', 'վե', 'ալ', 'ել', 'ան', 'ավ', 'ար', 'աց', 'եց', 'աք', 'ա',
)

_NOUN = (
    'ություն', 'մունք', 'ույթ', 'ուհի', 'անակ', 'ստան', 'արան', 'եղէն',
    'յուն', 'ուստ', 'ավոր', 'անօց', 'ալիք', 'անիք', 'վածք', 'ույք', 'ունք',
    'որդ', 'յակ', 'ուկ', 'պան', 'ածո', 'ուս', 'գար', 'վոր', 'չեք', 'ենք',
    'ոնք', 'իչք', 'արք', 'ցի', 'իլ', 'ակ', 'իկ', 'ան', 'իչ', 'ոց', 'ու',
    'իք', 'ք',
)

_ENDING = (
    'ությանդ', 'ությանը', 'ությանն', 'ությանս', 'ներում', 'ության',
    'անում', 'երում', 'ներին', 'ներով', 'վանից', 'ներից', 'վանդ', 'ներդ',
    'վանը', 'ները', 'ների', 'երին', 'ներն', 'վանս', 'անով', 'երով', 'ոջից',
    'երից', 'ամբ', 'անդ', 'ոջդ', 'երդ', 'ուդ', 'անը', 'ոջը', 'երը', 'երի',
    'վան', 'երն', 'ուն', 'ոջս', 'վով', 'ներ', 'վից', 'ցից', 'ուց', 'սա',
    'վա', 'վի', 'ան', 'ին', 'ոջ', 'ով', 'եր', 'ից', 'ոց', 'դ', 'ը', 'ի',
    'ն', 'ց',
)


def _mark_regions(w: str) -> tuple[int, int]:
    n = len(w)
    pV = p2 = n
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    if i >= n:
        return pV, p2
    pV = i + 1
    i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    if i >= n:
        return pV, p2
    i += 1
    while i < n and w[i] not in _VOWELS:
        i += 1
    if i >= n:
        return pV, p2
    i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    if i >= n:
        return pV, p2
    p2 = i + 1
    return pV, p2


def _longest_fit(w: str, table, lb: int) -> int:
    """Length of the longest table suffix of w starting at or after lb
    (find_among_b under limit_backward = lb); 0 if none."""
    room = len(w) - lb
    for suf in table:
        if len(suf) <= room and w.endswith(suf):
            return len(suf)
    return 0


def armenian_stem(word: str) -> str:
    """Stem one (lowercased) word with the Snowball Armenian algorithm."""
    w = word
    pV, p2 = _mark_regions(w)
    # ending: delete if the suffix also sits in R2
    m = _longest_fit(w, _ENDING, pV)
    if m and len(w) - m >= p2:
        w = w[: len(w) - m]
    for table in (_VERB, _ADJECTIVE, _NOUN):
        m = _longest_fit(w, table, pV)
        if m:
            w = w[: len(w) - m]
    return w
