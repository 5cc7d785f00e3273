"""Stempel — the Egothor algorithmic stemmer with the Polish table.

Reference: lucene/analysis/stempel (StempelStemmer.java:40-100,
StempelFilter.java:33-83, org/egothor/stemmer/Trie.java:274-295,
MultiTrie2.java:139-304, Diff.java:106-151).  The algorithm is the
published Egothor project stemmer (Galambos, "Lemmatizer for Document
Information Retrieval Systems in JAVA"): a multi-level trie maps a word
(walked right-to-left) to a sequence of patch commands ('-' skip, 'R'
replace, 'D' delete, 'I' insert, each with a one-char parameter), and
applying the patch to the word yields the stem.  This is a clean-room
re-implementation of that published algorithm; the TABLE is the
reference's pure-data stemmer_20000.tbl decoded by
tools/extract_stempel_table.py (the KStem-lexicon extraction precedent).

Filter semantics (StempelFilter.java:71-82): only terms LONGER than
min_length (default 3) are stemmed; a null/empty stem keeps the term
unchanged.

Scale shape: like every stemmer in the engine this runs as a vocabulary
term map — one Arrow batch over |V| distinct terms, broadcast-joined into
the posting build; zero per-token Python in the hot path.
"""

from __future__ import annotations

import gzip
import json
import os

import pandas as pd

_TABLE = None

_EOM = "*"


def _load_table():
    global _TABLE
    if _TABLE is None:
        path = os.path.join(
            os.path.dirname(__file__), "data", "stempel_pl.json.gz"
        )
        with gzip.open(path, "rt", encoding="utf-8") as f:
            raw = json.load(f)
        tries = []
        for t in raw["tries"]:
            rows = [
                {c[0]: (c[1], c[2]) for c in row} for row in t["rows"]
            ]
            tries.append((t["forward"], t["root"], t["cmds"], rows))
        # MultiTrie.skip() uses the MULTI-trie's forward flag
        # (MultiTrie.java:85, MultiTrie2.java:298-304), not the sub-tries'
        _TABLE = (bool(raw.get("forward", False)), tries)
    return _TABLE


def _trie_last_on_path(trie, key: str) -> str | None:
    """Trie.getLastOnPath (Trie.java:274-295): walk the key (right-to-left
    when forward=False), remembering the last command seen on the path."""
    forward, root, cmds, rows = trie
    if not key:
        return None
    now = rows[root]
    last = None
    seq = key if forward else key[::-1]
    for i in range(len(key) - 1):
        ch = seq[i]
        cell = now.get(ch)
        if cell is not None and cell[0] >= 0:
            last = cmds[cell[0]]
        if cell is not None and cell[1] >= 0:
            if not (0 <= cell[1] < len(rows)):
                return last
            now = rows[cell[1]]
        else:
            return last
    cell = now.get(seq[len(key) - 1])
    if cell is not None and cell[0] >= 0:
        return cmds[cell[0]]
    return last


def _length_pp(cmd: str) -> int:
    """MultiTrie2.lengthPP (MultiTrie2.java:318-334): how many key chars a
    patch-command sequence consumes ('-'/'D' skip n, 'R' one, 'I' zero)."""
    ln = 0
    i = 0
    while i < len(cmd):
        c = cmd[i]
        i += 1
        if c in ("-", "D"):
            ln += ord(cmd[i]) - ord("a") + 1
        elif c == "R":
            ln += 1
        i += 1
    return ln


def _multi_last_on_path(table, key: str) -> str:
    """MultiTrie2.getLastOnPath (MultiTrie2.java:139-173): concatenate the
    per-level patch commands, adjusting the key by the consumed length when
    a level starts with '-' (skip() direction = the MULTI-trie's forward
    flag); stop at EOM, a cannotFollow pair, or any index underflow (the
    reference swallows IndexOutOfBounds)."""
    forward, tries = table
    result = []
    lastkey = key
    prev = None
    lastch = " "
    for trie in tries:
        r = _trie_last_on_path(trie, lastkey)
        if r is None or (len(r) == 1 and r[0] == _EOM):
            break
        # cannotFollow (MultiTrie2.java:289-296)
        if lastch in ("-", "D") and lastch == r[0]:
            break
        if len(r) < 2:  # r.charAt(r.length()-2) would throw -> caught
            break
        lastch = r[-2]
        if r[0] == "-":
            if prev is not None:
                n = _length_pp(prev)
                if n > len(key):  # subSequence would throw -> caught
                    break
                key = key[n:] if forward else key[: len(key) - n]
            n = _length_pp(r)
            if n > len(key):
                break
            key = key[n:] if forward else key[: len(key) - n]
        prev = r
        result.append(r)
        if len(key) != 0:
            lastkey = key
    return "".join(result)


def _diff_apply(word: str, diff: str) -> str:
    """Diff.apply (Diff.java:106-151), including the reference's
    exception-swallowing: an out-of-range patch aborts mid-way and KEEPS
    the partial mutation."""
    if not diff:
        return word
    dest = list(word)
    pos = len(dest) - 1
    if pos < 0:
        return word
    try:
        for i in range(len(diff) // 2):
            cmd = diff[2 * i]
            param = diff[2 * i + 1]
            par_num = ord(param) - ord("a") + 1
            if cmd == "-":
                pos = pos - par_num + 1
            elif cmd == "R":
                if pos < 0 or pos >= len(dest):
                    raise IndexError
                dest[pos] = param
            elif cmd == "D":
                o = pos
                pos -= par_num - 1
                # StringBuilder.delete(start, end): start<0 / start>len /
                # start>end throw; end past length clamps
                if pos < 0 or pos > len(dest) or pos > o + 1:
                    raise IndexError
                del dest[pos : o + 1]
            elif cmd == "I":
                pos += 1
                if pos < 0 or pos > len(dest):
                    raise IndexError
                dest.insert(pos, param)
            pos -= 1
    except IndexError:
        pass
    return "".join(dest)


def stempel_stem(word: str) -> str | None:
    """StempelStemmer.stem (StempelStemmer.java:85-100): the patched word,
    or None when no patch path exists or patching empties the word."""
    cmd = _multi_last_on_path(_load_table(), word)
    if cmd is None:
        return None
    out = _diff_apply(word, cmd)
    return out if out else None


def stempel_filter_term(term: str, min_length: int = 3) -> str:
    """StempelFilter.incrementToken (StempelFilter.java:71-82): stem only
    terms LONGER than min_length; unstemmable terms pass unchanged."""
    if len(term) <= min_length:
        return term
    out = stempel_stem(term)
    return out if out is not None else term


def stempel_map(vocab):
    """(term, new_term) stempel dictionary over a distinct-term frame —
    the shared vocabulary term-map shape (analysis/stemmer.py
    porter_stem_map): changed terms only, one Arrow batch over |V|."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        _load_table()
        return s.map(stempel_filter_term)

    return vocab.select(
        F.col("term"), _stem(F.col("term")).alias("new_term")
    ).where(F.col("new_term") != F.col("term"))
