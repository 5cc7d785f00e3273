"""Pure-Python brute-force BM25 oracle (differential-testing partner).

Mirrors the reference test strategy of cross-implementation comparison
(solr/core/src/test/org/apache/solr/TestRandomDVFaceting.java pattern):
independent implementation of the exact same semantics — analyzer chain,
norm quantization, BM25 math, tie-breaks — against which the Spark engine's
results must match.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from lucene_solr_spark.analysis.analyzer import analyze_text
from lucene_solr_spark.smallfloat import NORM_TABLE, encode_norm

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self, rows: list[tuple[int, str]]):
        self.tf: dict[int, Counter] = {}
        self.dl_approx: dict[int, float] = {}
        self.df: Counter = Counter()
        self.cf: Counter = Counter()
        self.docids: list[int] = []
        total = 0
        for docid, text in rows:
            toks = analyze_text(text)
            c = Counter(toks)
            self.tf[docid] = c
            self.docids.append(docid)
            nb = int(encode_norm(len(toks))[0])
            self.dl_approx[docid] = float(NORM_TABLE[nb])
            for t, n in c.items():
                self.df[t] += 1
                self.cf[t] += n
            total += len(toks)
        self.max_doc = len(rows)
        import numpy as np

        self.avgdl = float(np.float32(total / self.max_doc)) if self.max_doc else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.max_doc - df + 0.5) / (df + 0.5))

    def term_score(self, docid: int, term: str) -> float | None:
        tf = self.tf[docid].get(term)
        if not tf:
            return None
        dl = self.dl_approx[docid]
        return (
            self.idf(term) * 2.2 * tf
            / (tf + 1.2 * (0.25 + 0.75 * dl / self.avgdl))
        )

    def topk(
        self,
        must: list[str] = (),
        should: list[str] = (),
        must_not: list[str] = (),
        mm: int = 0,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        terms = list(dict.fromkeys([*must, *should]))
        out = []
        for d in self.docids:
            scores = {t: self.term_score(d, t) for t in terms}
            if any(scores[t] is None for t in must):
                continue
            if should and mm > 0:
                if sum(scores[t] is not None for t in should) < mm:
                    continue
            if not must and should and mm == 0:
                if all(scores[t] is None for t in should):
                    continue
            if any(self.tf[d].get(t) for t in must_not):
                continue
            s = 0.0
            for t in terms:  # fixed order, same as engine
                if scores[t] is not None:
                    s = s + scores[t]
            out.append((d, s))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def phrase_topk(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        from lucene_solr_spark.analysis.analyzer import analyze_text_positions

        idf_sum = sum(self.idf(t) for t in terms)
        out = []
        for d, text in self._texts:
            pos = analyze_text_positions(text)
            index = defaultdict(set)
            for p, t in pos:
                index[t].add(p)
            tf = sum(
                1
                for p in index.get(terms[0], ())
                if all(p + i in index.get(t, ()) for i, t in enumerate(terms))
            )
            if tf:
                dl = self.dl_approx[d]
                s = idf_sum * 2.2 * tf / (tf + 1.2 * (0.25 + 0.75 * dl / self.avgdl))
                out.append((d, s))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]


def make_oracle(rows: list[tuple[int, str]]) -> OracleIndex:
    o = OracleIndex(rows)
    o._texts = rows
    return o


def sloppy_phrase_topk(oracle: OracleIndex, terms: list[str], slop: int, k: int = 10):
    """Brute-force anchor-based sloppy phrase (independent of the engine):
    per-anchor matchLength = max over terms of min |(q_i - i) - p|; tf =
    fixed-order sum of per-matchLength counts weighted 1/(1+ml)."""
    from lucene_solr_spark.analysis.analyzer import analyze_text_positions

    idf_sum = sum(oracle.idf(t) for t in terms)
    out = []
    for d, text in oracle._texts:
        pos = analyze_text_positions(text)
        index = defaultdict(set)
        for p, t in pos:
            index[t].add(p)
        counts = Counter()
        for p in index.get(terms[0], ()):
            devs = []
            ok = True
            for i, t in enumerate(terms[1:], start=1):
                qs = index.get(t, ())
                if not qs:
                    ok = False
                    break
                dev = min(abs((q - i) - p) for q in qs)
                if dev > slop:
                    ok = False
                    break
                devs.append(dev)
            if ok:
                counts[max(devs) if devs else 0] += 1
        tf = 0.0
        for m in range(slop + 1):
            tf = tf + counts.get(m, 0) * (1.0 / (1 + m))
        if tf > 0:
            dl = oracle.dl_approx[d]
            s = idf_sum * 2.2 * tf / (tf + 1.2 * (0.25 + 0.75 * dl / oracle.avgdl))
            out.append((d, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def lucene_sloppy_freq_reference(pos_lists, slop):
    """Independently-written port of SloppyPhraseScorer.phraseFreq (no heap:
    plain argmin rescans; ties by stream index like PhraseQueue.lessThan's
    position-then-offset ordering).  Differential partner for
    bm25.lucene_sloppy_freq."""
    k = len(pos_lists)
    cur = [int(pl[0]) for pl in pos_lists]
    nxt = [1] * k
    end = max(cur)
    inq = set(range(k))
    pp = min(inq, key=lambda i: (cur[i], i))
    inq.discard(pp)
    match_length = end - cur[pp]
    freq = 0.0
    while nxt[pp] < len(pos_lists[pp]):
        cur[pp] = int(pos_lists[pp][nxt[pp]])
        nxt[pp] += 1
        end = max(end, cur[pp])
        next_pos = min(cur[i] for i in inq)
        if cur[pp] > next_pos:
            if match_length <= slop:
                freq += 1.0 / (1 + match_length)
            inq.add(pp)
            pp = min(inq, key=lambda i: (cur[i], i))
            inq.discard(pp)
            match_length = end - cur[pp]
        else:
            match_length = min(match_length, end - cur[pp])
    if match_length <= slop:
        freq += 1.0 / (1 + match_length)
    return freq


def lucene_sloppy_topk(oracle: OracleIndex, terms: list[str], slop: int, k: int = 10):
    """Corpus-level oracle for the exact greedy semantics: tokenizes each doc
    in pure Python, builds adjusted position streams, runs the reference
    freq loop."""
    from lucene_solr_spark.analysis.analyzer import analyze_text_positions

    idf_sum = sum(oracle.idf(t) for t in terms)
    out = []
    for d, text in oracle._texts:
        index = defaultdict(list)
        for p, t in analyze_text_positions(text):
            index[t].append(p)
        streams = []
        ok = True
        for i, t in enumerate(terms):
            ps = [p - i for p in index.get(t, ())]
            if not ps:
                ok = False
                break
            streams.append(sorted(ps))
        if not ok:
            continue
        tf = lucene_sloppy_freq_reference(streams, slop)
        if tf > 0:
            dl = oracle.dl_approx[d]
            s = idf_sum * 2.2 * tf / (tf + 1.2 * (0.25 + 0.75 * dl / oracle.avgdl))
            out.append((d, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]
