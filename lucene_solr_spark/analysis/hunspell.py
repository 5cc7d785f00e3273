"""Hunspell dictionary stemmer — the reference's bounded Hunspell
support (affix stripping, no compounding), re-derived in Python.

Reference:
- lucene/analysis/common/src/java/org/apache/lucene/analysis/hunspell/
  Dictionary.java — affix-file parsing (:293-417 options, :448-580
  PFX/SFX rules with condition regexes "%s.*"/".*%s", strip/append,
  continuation classes, crossProduct bit; :583-607 ICONV/OCONV
  longest-match conversion tables :1193-1229; :661-706 FLAG
  num/long/UTF-8 strategies :1073-1141; :700-760 dic-entry escaping and
  morph boundary; :880-935 homonym forms + " st:" stem exceptions
  :1016-1040; :1144-1190 input cleaning + tr/az caseFold)
- .../hunspell/Stemmer.java — the affix-removal search (:90-121
  upper→exact/title/lower and title→exact/lower case-variant union;
  :174-204 doStem dictionary-form gates KEEPCASE/NEEDAFFIX/
  ONLYINCOMPOUND; :295-468 prefix/suffix enumeration incl. the
  zero-affix entries and the fullStrip limits, with the affix skipped
  when it equals the previously removed one; :472-493 checkCondition
  over stem+strip; :505-595 applyAffix — dictionary-form flag check,
  prefix/suffix cross-check through continuation classes, circumfix
  pairing, and the recursion table: prefix→(suffix | second prefix
  when COMPLEXPREFIXES), suffix→second suffix when the dictionary is
  two-stage; :600-603 cross-check helper with the
  empty-matches-previous-prefix rule)
- .../hunspell/HunspellStemFilter.java — longest-only or all-stems
  emission; dedup via uniqueStems.

Every hunspell test fixture scenario from the reference test suite
(zero affix, optional/complex conditions, two suffixes, twofold,
circumfix, complex prefixes, keepcase, needaffix, onlyincompound,
ignore, ICONV/OCONV, FLAG long/num, morph st: exceptions + aliases,
escaped slashes, homonyms, dependencies, case sensitivity, Turkish
alternate casing, fullstrip) is exercised in tests/test_hunspell.py
against the reference's own .aff/.dic test data.

Scale shape: stemming integrates index-side as a vocabulary term map
(analysis/stemmer.py shape) — the dictionary is driver-parsed (KB-MB),
broadcast implicitly inside the Arrow batch kernel over |V| distinct
terms; the corpus never routes through Python.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd  # module-level so pandas_udf type hints resolve


def _parse_flags_simple(raw: str) -> str:
    return raw


def _parse_flags_num(raw: str) -> str:
    out = []
    for part in raw.strip().split(","):
        digits = re.sub(r"[^0-9]", "", part)
        if digits:
            out.append(chr(int(digits)))
    return "".join(out)


def _parse_flags_long(raw: str) -> str:
    if not raw:
        return ""
    if len(raw) % 2 == 1:
        raise ValueError(f"Invalid LONG flags: {raw!r}")
    out = []
    for i in range(0, len(raw), 2):
        f1, f2 = ord(raw[i]), ord(raw[i + 1])
        if f1 >= 256 or f2 >= 256:
            raise ValueError(f"Invalid LONG flags: {raw!r}")
        out.append(chr(f1 << 8 | f2))
    return "".join(out)


def _escape_dash(s: str) -> str:
    # Dictionary.escapeDash: '-' is literal in hunspell conditions
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append(c)
            out.append(s[i + 1])
            i += 2
            continue
        if c == "-":
            out.append("\\-")
        else:
            out.append(c)
        i += 1
    return "".join(out)


@dataclass
class _Affix:
    flag: str           # one char
    strip: str
    condition: str | None  # python regex (fullmatch) or None for ".*"
    cross: bool
    append_flags: str   # sorted continuation classes


class HunspellDictionary:
    """Parsed .aff + .dic content (Dictionary.java)."""

    def __init__(self, aff_text: str, dic_texts: list[str],
                 ignore_case: bool = False):
        self.ignore_case = ignore_case
        self.prefixes: dict[str, list[int]] = {}
        self.suffixes: dict[str, list[int]] = {}
        self.affixes: list[_Affix] = []
        self.words: dict[str, list[tuple[str, str | None]]] = {}
        self.keepcase: str | None = None
        self.needaffix: str | None = None
        self.onlyincompound: str | None = None
        self.circumfix: str | None = None
        self.complex_prefixes = False
        self.two_stage_affix = False
        self.full_strip = False
        self.ignore: set[str] = set()
        self.iconv: dict[str, str] | None = None
        self.oconv: dict[str, str] | None = None
        self.alternate_casing = False
        self.has_stem_exceptions = False
        self._flag_parse = _parse_flags_simple
        self._aliases: list[str] = []
        self._morph_aliases: list[str] = []
        self._read_aff(aff_text)
        for t in dic_texts:
            self._read_dic(t)

    # --- affix file ---
    def _read_aff(self, text: str) -> None:
        lines = text.splitlines()
        i = 0
        while i < len(lines):
            line = lines[i]
            if i == 0 and line.startswith("﻿"):
                line = line[1:]
            i += 1
            if line.startswith("AF"):
                self._parse_alias(line)
            elif line.startswith("AM"):
                self._parse_morph_alias(line)
            elif line.startswith("PFX"):
                i = self._parse_affix_block(lines, i - 1, prefix=True)
            elif line.startswith("SFX"):
                i = self._parse_affix_block(lines, i - 1, prefix=False)
            elif line.startswith("FLAG"):
                kind = line.split()[1]
                self._flag_parse = {
                    "num": _parse_flags_num,
                    "UTF-8": _parse_flags_simple,
                    "long": _parse_flags_long,
                }[kind]
            elif line.strip() == "COMPLEXPREFIXES":
                self.complex_prefixes = True
            elif line.startswith("CIRCUMFIX"):
                self.circumfix = self._one_flag(line)
            elif line.startswith("KEEPCASE"):
                self.keepcase = self._one_flag(line)
            elif line.startswith("NEEDAFFIX") or line.startswith("PSEUDOROOT"):
                self.needaffix = self._one_flag(line)
            elif line.startswith("ONLYINCOMPOUND"):
                self.onlyincompound = self._one_flag(line)
            elif line.startswith("IGNORE"):
                self.ignore = set(line.split()[1])
            elif line.startswith(("ICONV", "OCONV")) and len(line.split()) == 2:
                kind, num = line.split()
                table: dict[str, str] = {}
                for _ in range(int(num)):
                    parts = lines[i].split()
                    i += 1
                    table[parts[1]] = parts[2]
                if kind == "ICONV":
                    self.iconv = table
                else:
                    self.oconv = table
            elif line.startswith("FULLSTRIP"):
                self.full_strip = True
            elif line.startswith("LANG"):
                lang = line[len("LANG"):].strip()
                self.alternate_casing = lang in ("tr_TR", "az_AZ")

    def _one_flag(self, line: str) -> str:
        parts = line.split()
        if len(parts) != 2:
            raise ValueError(f"Illegal declaration: {line!r}")
        flags = self._flag_parse(parts[1])
        if len(flags) != 1:
            raise ValueError(f"expected one flag: {line!r}")
        return flags

    def _parse_alias(self, line: str) -> None:
        if not self._aliases and re.match(r"AF\s+\d+$", line.strip()):
            self._aliases_pending = int(line.split()[1])
            self._aliases = []
            if self._aliases_pending == 0:
                self._aliases = [""]  # non-empty marks header seen
            return
        if hasattr(self, "_aliases_pending"):
            self._aliases.append(line.split()[1])
        # (first AF line is the count; subsequent carry values)

    def _parse_morph_alias(self, line: str) -> None:
        if not self._morph_aliases and re.match(r"AM\s+\d+$", line.strip()):
            self._morph_pending = int(line.split()[1])
            return
        self._morph_aliases.append(line[3:])

    @property
    def _alias_count(self) -> int:
        return len(self._aliases)

    def _parse_affix_block(self, lines: list[str], hdr: int,
                           prefix: bool) -> int:
        header = lines[hdr].split()
        cross = header[2] == "Y"
        num = int(header[3])
        table = self.prefixes if prefix else self.suffixes
        for k in range(num):
            rule = lines[hdr + 1 + k].split()
            if len(rule) < 4:
                raise ValueError(f"bad affix rule: {lines[hdr + 1 + k]!r}")
            flag = self._flag_parse(rule[1])
            if len(flag) != 1:
                raise ValueError(f"expected one flag: {rule[1]!r}")
            strip = "" if rule[2] == "0" else rule[2]
            affix_arg = rule[3]
            append_flags = ""
            slash = affix_arg.rfind("/")
            if slash != -1:
                flag_part = affix_arg[slash + 1:]
                affix_arg = affix_arg[:slash]
                if self._alias_count > 0:
                    flag_part = self._aliases[int(flag_part) - 1]
                append_flags = "".join(sorted(self._flag_parse(flag_part)))
                self.two_stage_affix = True
            if affix_arg == "0":
                affix_arg = ""
            condition = rule[4] if len(rule) > 4 else "."
            if condition.startswith("[") and "]" not in condition:
                condition += "]"
            if "-" in condition:
                condition = _escape_dash(condition)
            if condition == "." or condition == strip:
                cond_re = None
            elif prefix:
                cond_re = condition + ".*"
            else:
                cond_re = ".*" + condition
            if self._needs_input_cleaning:
                affix_arg = self.clean_input(affix_arg)
            aid = len(self.affixes)
            self.affixes.append(
                _Affix(flag, strip, cond_re, cross, append_flags)
            )
            table.setdefault(affix_arg, []).append(aid)
        return hdr + 1 + num

    # --- dic file ---
    def _read_dic(self, text: str) -> None:
        lines = text.splitlines()
        for line in lines[1:]:  # first line = entry count
            if not line or line[0] in ("/", "#", "\t"):
                continue
            entry, flag_part, morph = self._split_entry(line)
            if self._alias_count > 0 and flag_part:
                flag_part = self._aliases[int(flag_part) - 1]
            flags = (
                "".join(sorted(self._flag_parse(flag_part)))
                if flag_part
                else ""
            )
            stem_exc = self._parse_stem_exception(morph) if morph else None
            if stem_exc is not None:
                self.has_stem_exceptions = True
            if self._needs_input_cleaning:
                entry = self.clean_input(entry)
            self.words.setdefault(entry, []).append((flags, stem_exc))

    @staticmethod
    def _morph_boundary(line: str) -> int:
        # Dictionary.morphBoundary: first space/tab that starts a tab or
        # a "xx:" morph field
        def idx_st(s, start):
            p1, p2 = s.find("\t", start), s.find(" ", start)
            if p1 >= 0 and p2 >= 0:
                return min(p1, p2)
            return max(p1, p2)

        end = idx_st(line, 0)
        if end == -1:
            return len(line)
        while 0 <= end < len(line):
            if line[end] == "\t" or (
                end + 3 < len(line)
                and line[end + 1].isalpha()
                and line[end + 2].isalpha()
                and line[end + 3] == ":"
            ):
                break
            end = idx_st(line, end + 1)
        return len(line) if end == -1 else end

    def _split_entry(self, line: str) -> tuple[str, str, str]:
        """word, flag-part, morph-part (unescapeEntry: backslash escapes
        survive; an unescaped '/' separates the flags)."""
        end = self._morph_boundary(line)
        word_area, morph = line[:end], line[end:].lstrip(" \t")
        entry_chars: list[str] = []
        flag_chars: list[str] = []
        target = entry_chars
        i = 0
        while i < len(word_area):
            ch = word_area[i]
            if ch == "\\" and i + 1 < len(word_area):
                target.append(word_area[i + 1])
                i += 2
                continue
            if ch == "/" and target is entry_chars:
                target = flag_chars
                i += 1
                continue
            target.append(ch)
            i += 1
        return "".join(entry_chars), "".join(flag_chars), morph

    def _parse_stem_exception(self, morph: str) -> str | None:
        if self._morph_aliases:
            try:
                morph = self._morph_aliases[int(morph.strip()) - 1]
            except ValueError:
                pass
        m = re.search(r"[ \t]?st:", morph)
        if morph.startswith("st:"):
            rest = morph[3:]
        elif m and morph[m.start()] in " \t":
            rest = morph[m.start() + 4:]
        else:
            return None
        cut = re.search(r"[ \t]", rest)
        return rest[: cut.start()] if cut else rest

    # --- input/output cleaning ---
    @property
    def _needs_input_cleaning(self) -> bool:
        return bool(self.ignore_case or self.ignore or self.iconv)

    @property
    def _needs_output_cleaning(self) -> bool:
        return bool(self.oconv)

    def case_fold(self, c: str) -> str:
        if self.alternate_casing:
            if c == "I":
                return "ı"
            if c == "İ":
                return "i"
        low = c.lower()
        return low if len(low) == 1 else c

    def clean_input(self, s: str) -> str:
        out = []
        for ch in s:
            if ch in self.ignore:
                continue
            if self.ignore_case and self.iconv is None:
                ch = self.case_fold(ch)
            out.append(ch)
        res = "".join(out)
        if self.iconv is not None:
            res = _apply_mappings(self.iconv, res)
            if self.ignore_case:
                res = "".join(self.case_fold(c) for c in res)
        return res

    def clean_output(self, s: str) -> str:
        if self.oconv is not None:
            return _apply_mappings(self.oconv, s)
        return s


def _apply_mappings(table: dict[str, str], s: str) -> str:
    """Dictionary.applyMappings: greedy longest match at each position,
    continue after the replacement."""
    out = []
    i = 0
    while i < len(s):
        best = None
        for pat, rep in table.items():
            if s.startswith(pat, i) and (
                best is None or len(pat) > len(best[0])
            ):
                best = (pat, rep)
        if best is not None:
            out.append(best[1])
            i += len(best[0])
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


class HunspellStemmer:
    """Stemmer.java: the affix-removal search over a dictionary."""

    def __init__(self, dictionary: HunspellDictionary):
        self.d = dictionary

    # --- public API ---
    def stem(self, word: str) -> list[str]:
        d = self.d
        if d._needs_input_cleaning:
            word = d.clean_input(word)
        case = self._case_of(word)
        if case == "upper":
            title = word[:1] + "".join(d.case_fold(c) for c in word[1:])
            lower = d.case_fold(word[:1]) + title[1:] if word else word
            return (
                self._do_stem(word, False)
                + self._do_stem(title, True)
                + self._do_stem(lower, True)
            )
        if case == "title":
            lower = d.case_fold(word[:1]) + word[1:]
            return self._do_stem(word, False) + self._do_stem(lower, True)
        return self._do_stem(word, False)

    def unique_stems(self, word: str) -> list[str]:
        seen = set()
        out = []
        for s in self.stem(word):
            key = s.lower() if self.d.ignore_case else s
            if key not in seen:
                seen.add(key)
                out.append(s)
        return out

    # --- internals ---
    def _case_of(self, word: str) -> str:
        if self.d.ignore_case or not word or not word[0].isupper():
            return "exact"
        rest = word[1:]
        if rest and all(c.isupper() for c in rest):
            return "upper"
        if any(c.isupper() for c in rest):
            return "exact"
        if not rest:
            return "upper"  # single capital: no lowercase seen
        return "title"

    def _forms(self, word: str):
        return self.d.words.get(word)

    def _do_stem(self, word: str, case_variant: bool) -> list[str]:
        d = self.d
        stems: list[str] = []
        forms = self._forms(word)
        if forms:
            for flags, exc in forms:
                if case_variant and d.keepcase is not None \
                        and d.keepcase in flags:
                    continue
                if d.needaffix is not None and d.needaffix in flags:
                    continue
                if d.onlyincompound is not None \
                        and d.onlyincompound in flags:
                    continue
                stems.append(self._new_stem(word, exc))
        stems.extend(
            self._stem(word, -1, -1, -1, 0, True, True, False, False,
                       case_variant)
        )
        return stems

    def _new_stem(self, word: str, exc: str | None) -> str:
        base = exc if exc is not None else word
        if self.d._needs_output_cleaning:
            return self.d.clean_output(base)
        return base

    def _check_condition(self, cond: str | None, c1: str, c2: str) -> bool:
        if cond is None:
            return True
        return re.fullmatch(cond, c1 + c2) is not None

    def _stem(self, word: str, previous: int, prev_flag: str | int,
              prefix_flag: str | int, depth: int, do_prefix: bool,
              do_suffix: bool, previous_was_prefix: bool, circumfix: bool,
              case_variant: bool) -> list[str]:
        d = self.d
        stems: list[str] = []

        if do_prefix and d.prefixes:
            limit = len(word) if d.full_strip else len(word) - 1
            for i in range(0, max(limit, 0)):
                cand = word[:i]
                if i > 0 and not any(
                    k.startswith(cand) for k in d.prefixes
                ):
                    break
                for pid in d.prefixes.get(cand, ()):
                    if pid == previous:
                        continue
                    aff = d.affixes[pid]
                    ok = self._compatible(
                        aff, depth, prev_flag, previous_was_prefix=False
                    )
                    if not ok:
                        continue
                    de_affixed = word[i:]
                    if not self._check_condition(
                        aff.condition, aff.strip, de_affixed
                    ):
                        continue
                    stripped = aff.strip + de_affixed
                    stems.extend(
                        self._apply_affix(
                            stripped, pid, -1, depth, True, circumfix,
                            case_variant,
                        )
                    )

        if do_suffix and d.suffixes:
            limit = 0 if d.full_strip else 1
            for i in range(len(word), limit - 1, -1):
                cand = word[i:]
                if i < len(word) and not any(
                    k.endswith(cand) for k in d.suffixes
                ):
                    break
                for sid in d.suffixes.get(cand, ()):
                    if sid == previous:
                        continue
                    aff = d.affixes[sid]
                    ok = self._compatible(
                        aff, depth, prev_flag,
                        previous_was_prefix=previous_was_prefix,
                    )
                    if not ok:
                        continue
                    de_affixed = word[:i]
                    if not self._check_condition(
                        aff.condition, de_affixed, aff.strip
                    ):
                        continue
                    stripped = de_affixed + aff.strip
                    stems.extend(
                        self._apply_affix(
                            stripped, sid, prefix_flag, depth, False,
                            circumfix, case_variant,
                        )
                    )

        return stems

    def _compatible(self, aff: _Affix, depth: int, prev_flag,
                    previous_was_prefix: bool) -> bool:
        d = self.d
        if depth == 0:
            if d.onlyincompound is None:
                return True
            return d.onlyincompound not in aff.append_flags
        if aff.cross:
            allowed = (
                d.onlyincompound is None
                or d.onlyincompound not in aff.append_flags
            )
            return allowed and self._cross_checked(
                prev_flag, aff.append_flags, previous_was_prefix
            )
        return False

    @staticmethod
    def _cross_checked(flag, flags: str, match_empty: bool) -> bool:
        return (len(flags) == 0 and match_empty) or (
            isinstance(flag, str) and flag in flags
        )

    def _apply_affix(self, stripped: str, affix_id: int, prefix_flag,
                     depth: int, is_prefix: bool, circumfix: bool,
                     case_variant: bool) -> list[str]:
        d = self.d
        aff = d.affixes[affix_id]
        stems: list[str] = []

        forms = self._forms(stripped)
        if forms:
            for flags, exc in forms:
                if aff.flag not in flags:
                    continue
                chained_prefix = (
                    d.complex_prefixes and depth == 1 and is_prefix
                )
                if (
                    not chained_prefix
                    and isinstance(prefix_flag, str)
                    and prefix_flag not in flags
                ):
                    # chain the prefix through the suffix continuations
                    if not self._cross_checked(
                        prefix_flag, aff.append_flags, False
                    ):
                        continue
                if d.circumfix is not None:
                    suffix_circumfix = d.circumfix in aff.append_flags
                    if circumfix != suffix_circumfix:
                        continue
                if case_variant and d.keepcase is not None \
                        and d.keepcase in flags:
                    continue
                if d.onlyincompound is not None \
                        and d.onlyincompound in flags:
                    continue
                stems.append(self._new_stem(stripped, exc))

        if d.circumfix is not None and not circumfix and is_prefix:
            circumfix = d.circumfix in aff.append_flags

        if aff.cross:
            if depth == 0:
                if is_prefix:
                    stems.extend(
                        self._stem(
                            stripped, affix_id, aff.flag, aff.flag, 1,
                            d.complex_prefixes and d.two_stage_affix,
                            True, True, circumfix, case_variant,
                        )
                    )
                elif not d.complex_prefixes and d.two_stage_affix:
                    stems.extend(
                        self._stem(
                            stripped, affix_id, aff.flag, prefix_flag, 1,
                            False, True, False, circumfix, case_variant,
                        )
                    )
            elif depth == 1:
                if is_prefix and d.complex_prefixes:
                    stems.extend(
                        self._stem(
                            stripped, affix_id, aff.flag, aff.flag, 2,
                            False, True, True, circumfix, case_variant,
                        )
                    )
                elif not is_prefix and not d.complex_prefixes \
                        and d.two_stage_affix:
                    stems.extend(
                        self._stem(
                            stripped, affix_id, aff.flag, prefix_flag, 2,
                            False, True, False, circumfix, case_variant,
                        )
                    )

        return stems


def load_dictionary(aff_path: str, dic_paths: list[str],
                    ignore_case: bool = False) -> HunspellDictionary:
    """Read .aff/.dic files honoring the SET encoding header
    (Dictionary.getDictionaryEncoding)."""
    raw = open(aff_path, "rb").read()
    enc = "UTF-8"
    for line in raw.split(b"\n"):
        txt = line.decode("latin-1").strip().lstrip("﻿")
        if not txt or txt.startswith("#"):
            continue
        if txt.startswith("SET"):
            enc = txt[3:].strip()
        break
    enc = {"ISO8859-14": "iso8859-14", "microsoft-cp1251": "windows-1251",
           "TIS620-2533": "tis-620"}.get(enc, enc)
    aff_text = raw.decode(enc, errors="replace")
    dic_texts = [
        open(p, "rb").read().decode(enc, errors="replace")
        for p in dic_paths
    ]
    return HunspellDictionary(aff_text, dic_texts, ignore_case=ignore_case)


def hunspell_stem_map(vocab, dictionary: HunspellDictionary,
                      longest_only: bool = True):
    """(term, new_term) map for build_index(term_map=...): each distinct
    term maps to its hunspell stem (HunspellStemFilter longestOnly
    semantics: the single longest stem; ties keep the first)."""
    from pyspark.sql import functions as F

    stemmer = HunspellStemmer(dictionary)

    def one(term: str) -> str:
        stems = stemmer.unique_stems(term)
        if not stems:
            return term
        if longest_only:
            return max(stems, key=len)
        return stems[0]

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(one)

    return vocab.select(
        F.col("term"), _stem(F.col("term")).alias("new_term")
    ).where(F.col("new_term") != F.col("term"))
