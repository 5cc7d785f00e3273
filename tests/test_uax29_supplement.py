"""UAX#29 multi-script + supplementary-plane tokenizer coverage.

Two gates:
1. The machine-generated ALetter/Extend/Num supplement ranges in
   analysis/analyzer.py regenerate exactly from unicodedata + the
   cross-engine lowercase validation (no silent drift, no hand-typed
   lookalike characters).
2. Tri-engine agreement (BaseTokenStreamTestCase style): Python re, DuckDB
   RE2, and Spark's java.util.regex tokenize + lowercase a multilingual
   golden corpus IDENTICALLY — the property every scored row's hash
   depends on.
"""

import unicodedata

import duckdb
import pytest

from lucene_solr_spark.analysis.analyzer import (
    _ALETTER,
    _EXTEND,
    _NUMCLS,
    TOKEN_PATTERN,
    analyze_text,
    sql_quoted_pattern,
)

LETTER_BLOCKS = [
    (0x00C0, 0x024F), (0x0250, 0x02AF), (0x0370, 0x03FF), (0x1F00, 0x1FFF),
    (0x0400, 0x052F), (0x0531, 0x058F), (0x05D0, 0x05EA), (0x0620, 0x064A),
    (0x0671, 0x06D3), (0x0750, 0x077F), (0x0904, 0x0939), (0x0958, 0x0961),
    (0x0971, 0x0977), (0x10330, 0x1034A), (0x10400, 0x1044F),
    (0x10450, 0x1047F), (0xFF21, 0xFF3A), (0xFF41, 0xFF5A),
]
EXCLUDE = {0x0130, 0x03A3}  # Turkish İ, capital sigma: engine-divergent lower
EXT_BLOCKS = [
    (0x0300, 0x036F), (0x0483, 0x0489), (0x0591, 0x05BD), (0x05BF, 0x05BF),
    (0x05C1, 0x05C2), (0x05C4, 0x05C5), (0x05C7, 0x05C7), (0x064B, 0x065F),
    (0x0670, 0x0670), (0x06D6, 0x06DC), (0x06DF, 0x06E4), (0x06E7, 0x06E8),
    (0x06EA, 0x06ED), (0x0900, 0x0903), (0x093A, 0x093C), (0x093E, 0x094F),
    (0x0951, 0x0957), (0x0962, 0x0963),
]
NUM_BLOCKS = [(0x0660, 0x0669), (0x06F0, 0x06F9), (0x0966, 0x096F),
              (0xFF10, 0xFF19)]


def _fmt(cps):
    out, start, prev = [], None, None
    for cp in sorted(cps):
        if start is None:
            start = prev = cp
        elif cp == prev + 1:
            prev = cp
        else:
            out.append((start, prev))
            start = prev = cp
    if start is not None:
        out.append((start, prev))
    return "".join(
        chr(a) if a == b else chr(a) + "-" + chr(b) for a, b in out
    )


def test_ranges_regenerate_exactly():
    con = duckdb.connect()

    def agree(c):
        lo = c.lower()
        if len(lo) != 1:
            return False
        if con.execute("SELECT lower(?)", [c]).fetchone()[0] != lo:
            return False
        return con.execute("SELECT lower(?)", ["x" + c]).fetchone()[0] == (
            "x" + c
        ).lower()

    letters = [
        cp
        for lo, hi in LETTER_BLOCKS
        for cp in range(lo, hi + 1)
        if cp not in EXCLUDE
        and unicodedata.category(chr(cp)).startswith("L")
        and agree(chr(cp))
    ]
    assert _ALETTER == "A-Za-z" + _fmt(letters)
    marks = [
        cp
        for lo, hi in EXT_BLOCKS
        for cp in range(lo, hi + 1)
        if unicodedata.category(chr(cp)) in ("Mn", "Mc", "Me") and agree(chr(cp))
    ]
    assert _EXTEND == _fmt(marks)
    digits = [cp for lo, hi in NUM_BLOCKS for cp in range(lo, hi + 1)]
    assert _NUMCLS == "0-9" + _fmt(digits)


GOLDEN = [
    # (text, expected analyzed terms) — BaseTokenStreamTestCase style
    ("hello WORLD", ["hello", "world"]),
    ("can't a.b.c 3.14 foo_bar", ["can't", "a.b.c", "3.14", "foo_bar"]),
    ("Привет МИР", ["привет", "мир"]),
    ("Ελληνικά Κείμενο", ["ελληνικά", "κείμενο"]),
    ("ΑΣ", ["α"]),  # capital sigma excluded (engine-divergent): breaks token
    ("İstanbul", ["stanbul"]),  # U+0130 excluded likewise
    ("שָׁלוֹם עוֹלָם", ["שָׁלוֹם", "עוֹלָם"]),  # pointed Hebrew: Extend joins
    ("مَرحَبا بالعالم", ["مَرحَبا", "بالعالم"]),  # harakat join
    ("नमस्ते दुनिया", ["नमस्ते", "दुनिया"]),  # matras join
    ("𐐔𐐯𐑅𐐨𐑉𐐯𐐻 text", ["𐐼𐐯𐑅𐐨𐑉𐐯𐐻", "text"]),  # Deseret lowers astrally
    ("漢字 and 𠀋𪜀", ["漢", "字", "𠀋", "𪜀"]),  # Han ext B/C one-char; 'and' stops
    ("カタカナ ｶﾀｶﾅ", ["カタカナ", "ｶﾀｶﾅ"]),
    ("한국어 ㄱㄴ", ["한국어", "ㄱㄴ"]),
    ("emoji 😀🎉 zwj 👩‍💻 dropped", ["emoji", "zwj", "dropped"]),
    ("١٢٣ ４２ ४५", ["١٢٣", "４２", "४५"]),
    ("café CAFÉ naïve", ["café", "café", "naïve"]),
]


@pytest.mark.parametrize("text,want", GOLDEN, ids=[str(i) for i in range(len(GOLDEN))])
def test_python_chain_goldens(text, want):
    assert analyze_text(text) == want


def test_tri_engine_agreement(spark):
    """Python re == DuckDB RE2 == Spark java.util.regex on the golden corpus
    (tokenize + lowercase, the full hash-critical path)."""
    from pyspark.sql import functions as F

    texts = [t for t, _ in GOLDEN]
    py = [[m.lower() for m in __import__("re").findall(TOKEN_PATTERN, t) if m]
          for t in texts]

    con = duckdb.connect()
    duck = []
    for t in texts:
        rows = con.execute(
            f"SELECT coalesce(list(lower(x)), []) FROM ("
            f"SELECT unnest(regexp_extract_all(?, {sql_quoted_pattern()})) AS x"
            f") WHERE x <> ''",
            [t],
        ).fetchone()[0]
        duck.append(list(rows))

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r.i: list(r.v)
        for r in df.select(
            "i",
            F.transform(
                F.filter(
                    F.regexp_extract_all("t", F.lit(TOKEN_PATTERN), 0),
                    lambda x: x != "",
                ),
                F.lower,
            ).alias("v"),
        ).collect()
    }
    sp = [got[i] for i in range(len(texts))]

    for t, a, b, c in zip(texts, py, duck, sp):
        assert a == b == c, f"{t!r}:\n  py={a}\n  duck={b}\n  spark={c}"


def test_ascii_fast_path_equivalence(spark):
    """raw_tokens_expr dispatches ASCII-only rows to the small ASCII pattern;
    the result must be IDENTICAL to always running the full pattern."""
    import random
    import re as _re

    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.analyzer import (
        _ASCII_TOKEN_PATTERN,
        raw_tokens_expr,
    )

    rng = random.Random(42)
    alphabet = "abc XYZ 019 _'.,-!? \t\n"
    ascii_rows = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ]
    for s in ascii_rows:  # python-re property: FULL == ASCII on ascii input
        assert [m for m in _re.findall(TOKEN_PATTERN, s) if m] == [
            m for m in _re.findall(_ASCII_TOKEN_PATTERN, s) if m
        ], repr(s)

    mixed = ascii_rows[:50] + [t for t, _ in GOLDEN]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(mixed)], "i long, t string")
    full = F.regexp_extract_all("t", F.lit(TOKEN_PATTERN), 0)
    got = df.select("i", raw_tokens_expr(F.col("t")).alias("a"), full.alias("b")).collect()
    for r in got:
        assert list(r.a) == list(r.b), mixed[r.i]
