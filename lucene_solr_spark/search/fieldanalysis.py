"""/analysis/field — the FieldAnalysisRequestHandler analog: per-stage
token streams with offsets, positions, and query-match flags, for
debugging the analyzer chain.

Reference:
- solr/core/src/java/org/apache/solr/handler/
  FieldAnalysisRequestHandler.java (:analysis.fieldvalue /
  analysis.query / analysis.showmatch parameters; the response nests
  index/query sections of per-stage token lists)
- solr/core/src/java/org/apache/solr/handler/
  AnalysisRequestHandlerBase.java (:94-133 each stage re-runs the chain
  so far and emits its token list; :218-260 convertTokensToNamedLists —
  text, start/end offsets, position, and "match" against the analyzed
  query terms when showmatch is set)

This is a debugging handler over ONE request-supplied value — driver-
side Python is the correct cost model (the corpus is never touched).
The stages mirror the engine's standard chain exactly
(analysis/analyzer.py): StandardTokenizer (UAX#29 + 255-char cap) →
LowerCaseFilter → StopFilter (position gaps preserved).
"""

from __future__ import annotations

import re

from lucene_solr_spark.analysis.analyzer import (
    MAX_TOKEN_LENGTH,
    TOKEN_PATTERN,
    _STOP_SET,
    analyze_text,
)

_RE = re.compile(TOKEN_PATTERN)


def _tokenizer_stage(value: str) -> list[dict]:
    """StandardTokenizer output: raw tokens with offsets (the 255-char
    cap drops the token but still advances the position, like
    skippedPositions in the reference tokenizer)."""
    out = []
    pos = 0
    for m in _RE.finditer(value):
        t = m.group(0)
        if not t:
            continue
        if len(t) > MAX_TOKEN_LENGTH:
            pos += 1
            continue
        out.append(
            {"text": t, "start": m.start(), "end": m.end(),
             "position": pos}
        )
        pos += 1
    return out


def field_analysis(
    field_value: str,
    query: str | None = None,
    showmatch: bool = False,
) -> dict:
    """The /analysis/field response body for one field value: a dict of
    stage name -> token list; each token carries text/start/end/position
    (+match when showmatch and a query is given)."""
    qterms = set(analyze_text(query)) if query else set()

    tok = _tokenizer_stage(field_value)
    lower = [dict(t, text=t["text"].lower()) for t in tok]
    stopped = [t for t in lower if t["text"] not in _STOP_SET]

    stages = {
        "StandardTokenizer": tok,
        "LowerCaseFilter": lower,
        "StopFilter": stopped,
    }
    if showmatch and qterms:
        for toks in stages.values():
            for t in toks:
                t["match"] = t["text"].lower() in qterms
    result: dict = {"index": stages}
    if query is not None:
        qtok = _tokenizer_stage(query)
        qlower = [dict(t, text=t["text"].lower()) for t in qtok]
        qstopped = [t for t in qlower if t["text"] not in _STOP_SET]
        result["query"] = {
            "StandardTokenizer": qtok,
            "LowerCaseFilter": qlower,
            "StopFilter": qstopped,
        }
    return result
