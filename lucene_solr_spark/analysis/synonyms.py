"""Multi-word synonyms — the classic SynonymFilter's graph semantics.

Reference parity: SynonymFilter (lucene/analysis/common/src/java/org/apache/
lucene/analysis/synonym/SynonymFilter.java) matches the LONGEST input token
sequence left-to-right against the SynonymMap and distributes output tokens
across the matched block's position slots (``futureInputs[upto]`` in
addOutput, :461-507): output token j stacks at the position of input token j
(posInc 0 against the original when keepOrig), outputs longer than the input
extend the block by new positions, and shorter replacements contract it —
including the classic filter's documented flat-graph behavior for
multi-token cases (positions after the block shift by n-m on replacement;
SynonymGraphFilter, which fixes it, postdates the reference).

Rule syntax (SolrSynonymParser, solr ``synonyms.txt``):
- ``a b => x``       explicit mapping, originals replaced (keepOrig=false)
- ``a, b c``         equivalence class: with expand=true every input maps to
                     every member (originals kept via the identity output)

Chain order matches the common text_en schema: tokenizer -> lowercase ->
**synonyms** -> stop/length, so stop position gaps appear AFTER graph
expansion and never break a multi-word match.

Spark shape: the synonym automaton is inherently sequential per document, so
the positioned chain runs as an Arrow-batched pandas UDF (the module's
documented Python-boundary justification) producing the same
array<struct<pos,term>> the JVM chain produces — every downstream stage
(inversion, positions codec, phrase/span kernels) is unchanged.  The rule
set broadcasts with the serialized UDF; at 100 TB the stage is map-side
only, no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd  # module-top: pandas_udf resolves annotations here

from lucene_solr_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    _PY_RE,
)

_STOP = frozenset(ENGLISH_STOP_WORDS)


@dataclass(frozen=True)
class SynonymRule:
    inputs: tuple[str, ...]
    outputs: tuple[tuple[str, ...], ...]  # each output is a token sequence
    keep_orig: bool


def parse_rules(lines: list[str]) -> tuple[SynonymRule, ...]:
    """SolrSynonymParser subset: ``=>`` mappings and expanded equivalences."""
    rules: list[SynonymRule] = []
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            outs = tuple(
                tuple(p.split()) for p in (s.strip() for s in rhs.split(",")) if p
            )
            for inp in (s.strip() for s in lhs.split(",")):
                if inp:
                    rules.append(SynonymRule(tuple(inp.split()), outs, False))
        else:
            members = [
                tuple(p.split()) for p in (s.strip() for s in line.split(",")) if p
            ]
            for inp in members:
                others = tuple(m for m in members if m != inp)
                if others:
                    # expand=true: originals survive via keep_orig
                    rules.append(SynonymRule(inp, others, True))
    return tuple(rules)


def apply_synonyms(
    tokens: list[str], rules: tuple[SynonymRule, ...]
) -> list[tuple[int, str]]:
    """Longest-match-left-to-right over a gap-free token list -> stacked
    (position, term) slots per the classic filter's addOutput distribution.
    The filter never re-scans its own output (matching advances past the
    consumed block)."""
    by_first: dict[str, list[SynonymRule]] = {}
    for r in rules:
        by_first.setdefault(r.inputs[0], []).append(r)
    out: list[tuple[int, str]] = []
    i, pos = 0, 0
    n_toks = len(tokens)
    while i < n_toks:
        best: SynonymRule | None = None
        for r in by_first.get(tokens[i], ()):
            m = len(r.inputs)
            if i + m <= n_toks and tuple(tokens[i : i + m]) == r.inputs:
                if best is None or m > len(best.inputs):
                    best = r
        if best is None:
            out.append((pos, tokens[i]))
            i += 1
            pos += 1
            continue
        m = len(best.inputs)
        out_seqs = best.outputs
        width = max(len(s) for s in out_seqs)
        slots = max(m, width) if best.keep_orig else width
        for j in range(slots):
            if best.keep_orig and j < m:
                out.append((pos + j, tokens[i + j]))
            for seq in out_seqs:
                if j < len(seq):
                    out.append((pos + j, seq[j]))
        i += m
        pos += slots
    return out


def synonym_chain_positions(
    text: str | None, rules: tuple[SynonymRule, ...]
) -> list[tuple[int, str]]:
    """Full positioned chain: tokenize -> lowercase -> synonyms -> stop +
    length cap (survivors keep their slot positions — stop gaps land after
    graph expansion).  Pure-Python oracle and the UDF kernel."""
    if not text:
        return []
    raw = [t.lower() for t in _PY_RE.findall(text) if t]
    return [
        (p, t)
        for p, t in apply_synonyms(raw, rules)
        if len(t) <= MAX_TOKEN_LENGTH and t not in _STOP
    ]


def synonym_positioned_tokens_udf(rules: tuple[SynonymRule, ...]):
    """array<struct<pos:int,term:string>> pandas UDF over a text column —
    drop-in for build_index(positioned_tokens_col=...)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("array<struct<pos:int,term:string>>")
    def _chain(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: [
                {"pos": p, "term": w} for p, w in synonym_chain_positions(t, rules)
            ]
        )

    return _chain
