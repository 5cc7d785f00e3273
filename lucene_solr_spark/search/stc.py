"""Suffix Tree Clustering (STC) — a real Carrot2-family clustering engine
for the ClusteringComponent, upgrading the dominant-term engine
(`search/clustering.py`) to one of the two algorithms the reference ships.

Reference surface: solr/contrib/clustering/src/java/org/apache/solr/handler/
clustering/carrot2/CarrotClusteringEngine.java:95-210 — the engine receives
the RESULT WINDOW's stored title/snippet text (never the corpus;
ClusteringComponent.java:170-190) and returns (label, docs, score) clusters.
One of the two shipped Carrot2 algorithms is STC
(org.carrot2.clustering.stc.STCClusteringAlgorithm); the algorithm itself is
published: Zamir & Etzioni, "Web Document Clustering: A Feasibility
Demonstration" (SIGIR 1998) —

  1. base clusters = internal nodes of the generalized suffix tree over the
     window's sentences: (phrase, set of docs containing it), scored
     s(B) = |B| * f(|P|) with f penalizing single words and capping long
     phrases (paper §4.1);
  2. base clusters merge when their doc sets overlap > threshold in BOTH
     directions (paper §4.2 uses 0.5; Carrot2's default mergeThreshold is
     0.6) — final clusters are the connected components.

Implementation notes (documented deviations, all deterministic):

  - Suffix-tree node equivalence: instead of building the tree, phrases up
    to ``max_phrase_len`` are enumerated per sentence and kept iff they are
    RIGHT-MAXIMAL under unique-terminator semantics — >=2 occurrences whose
    continuation tokens are not all the same (every sentence end is its own
    unique terminator).  For a generalized suffix tree with per-sentence
    terminators this is exactly the internal-node set, truncated at
    max_phrase_len (Carrot2 likewise caps label length).
  - No stemming for phrase identity (Carrot2 stems for matching and
    displays original forms; the engine's graded stemmer integration lives
    in the index term maps, not here).
  - Leading/trailing stopwords are TRIMMED from the node's phrase for
    labeling (Carrot2's label post-processing); bases collapsing to the
    same (trimmed phrase, doc set) dedupe keeping one.  Stopwords inside a
    phrase are kept but do not count toward the effective length |P|.

Scale shape: identical to the reference — the clustered set is the
k-bounded result window, so the suffix machinery runs on <= ``rows``
documents driver-side after a bounded collect.  The distributed part is the
BM25 top-k and the semi-join fetching the window's stored text; at 10^12
docs nothing here ever touches more than the page.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from lucene_solr_spark.analysis.analyzer import _PY_RE, _STOP_SET
from lucene_solr_spark.index.builder import IndexTables

_SENT_SPLIT = re.compile(r"[.!?;:\n\r]+")

# Paper §4.1: f(|P|) — "penalizes single words, is linear for phrases of
# two to six words, and constant for longer" (|P| counts non-stop words).
_SINGLE_WORD_PENALTY = 0.5
_PHRASE_LEN_CAP = 6


def _sentences(text: str) -> list[list[str]]:
    """Lowercased token lists per sentence (shared engine token pattern)."""
    out = []
    for chunk in _SENT_SPLIT.split(text or ""):
        toks = [t.lower() for t in _PY_RE.findall(chunk)]
        if toks:
            out.append(toks)
    return out


@dataclass(frozen=True)
class BaseCluster:
    phrase: tuple[str, ...]
    docids: frozenset
    score: float


def stc_base_clusters(
    doc_sents: dict,
    max_phrase_len: int = _PHRASE_LEN_CAP,
    min_base_size: int = 2,
    min_base_score: float = 2.0,
    max_base_clusters: int = 300,
) -> list[BaseCluster]:
    """Base clusters from ``{docid: [[token, ...], ...]}`` (paper §4.1).

    Returns at most ``max_base_clusters``, ordered (score desc, phrase asc).
    """
    occs: dict[tuple, int] = {}
    docs: dict[tuple, set] = {}
    conts: dict[tuple, set] = {}
    for docid, sents in doc_sents.items():
        for si, s in enumerate(sents):
            n = len(s)
            for i in range(n):
                top = min(max_phrase_len, n - i)
                for length in range(1, top + 1):
                    p = tuple(s[i : i + length])
                    occs[p] = occs.get(p, 0) + 1
                    docs.setdefault(p, set()).add(docid)
                    # unique terminator per (doc, sentence) occurrence end
                    end = i + length
                    cont = s[end] if end < n else ("$", docid, si, i)
                    conts.setdefault(p, set()).add(cont)

    bases = []
    seen: set = set()
    for p, ds in docs.items():
        if len(ds) < min_base_size:
            continue
        if occs[p] < 2 or len(conts[p]) < 2:
            continue  # not a suffix-tree internal node (right-maximality)
        # trim edge stopwords for the label (Carrot2 label post-processing)
        lo, hi = 0, len(p)
        while lo < hi and p[lo] in _STOP_SET:
            lo += 1
        while hi > lo and p[hi - 1] in _STOP_SET:
            hi -= 1
        p = p[lo:hi]
        if not p:
            continue
        eff = sum(1 for t in p if t not in _STOP_SET)
        f = _SINGLE_WORD_PENALTY if eff == 1 else float(min(eff, _PHRASE_LEN_CAP))
        score = len(ds) * f
        if score < min_base_score:
            continue
        key = (p, frozenset(ds))
        if key in seen:
            continue
        seen.add(key)
        bases.append(BaseCluster(p, frozenset(ds), score))

    bases.sort(key=lambda b: (-b.score, b.phrase))
    return bases[:max_base_clusters]


def _merge_components(bases: list[BaseCluster], threshold: float) -> list[list[int]]:
    """Connected components of the base-cluster graph (paper §4.2): an edge
    iff |B1 ∩ B2|/|B1| > threshold AND |B1 ∩ B2|/|B2| > threshold."""
    parent = list(range(len(bases)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(bases)):
        for j in range(i + 1, len(bases)):
            bi, bj = bases[i].docids, bases[j].docids
            inter = len(bi & bj)
            if inter and inter / len(bi) > threshold and inter / len(bj) > threshold:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)

    comps: dict[int, list[int]] = {}
    for i in range(len(bases)):
        comps.setdefault(find(i), []).append(i)
    return list(comps.values())


def stc(
    doc_texts: list,
    max_phrase_len: int = _PHRASE_LEN_CAP,
    min_base_size: int = 2,
    min_base_score: float = 2.0,
    max_base_clusters: int = 300,
    merge_threshold: float = 0.6,
    max_clusters: int = 15,
    other_topics: bool = True,
) -> list[dict]:
    """Full STC over ``[(docid, text), ...]`` (the result window).

    Returns [{label, size, docids, score}, ...] ordered (score desc,
    label asc), capped at ``max_clusters``; docs in no cluster land in a
    trailing "Other Topics" row (score 0.0) when ``other_topics``.
    """
    doc_sents = {d: _sentences(t) for d, t in doc_texts}
    bases = stc_base_clusters(
        doc_sents, max_phrase_len, min_base_size, min_base_score, max_base_clusters
    )
    out = []
    for comp in _merge_components(bases, merge_threshold):
        members = [bases[i] for i in comp]
        docids: set = set()
        for b in members:
            docids |= b.docids
        # label = phrase of the best member (score desc, shorter, lex asc)
        label_b = min(members, key=lambda b: (-b.score, len(b.phrase), b.phrase))
        out.append(
            {
                "label": " ".join(label_b.phrase),
                "size": len(docids),
                "docids": sorted(docids),
                "score": float(sum(b.score for b in members)),
            }
        )
    out.sort(key=lambda c: (-c["score"], c["label"]))
    out = out[:max_clusters]
    if other_topics:
        covered: set = set()
        for c in out:
            covered.update(c["docids"])
        rest = sorted(d for d, _ in doc_texts if d not in covered)
        if rest:
            out.append(
                {"label": "Other Topics", "size": len(rest), "docids": rest,
                 "score": 0.0}
            )
    return out


def cluster_results_stc(
    index: IndexTables,
    text_source: DataFrame,
    query_terms: list[str],
    rows: int = 30,
    id_col: str = "docid",
    text_col: str = "text",
    **params,
) -> DataFrame:
    """Cluster the top-``rows`` BM25 results of an OR query with STC.

    ``text_source`` is the stored-text table carrying (id_col, text_col) —
    the analog of the stored snippet/title fields CarrotClusteringEngine
    reads (CarrotClusteringEngine.java:150-180).  Returns a DataFrame
    (label, size, docids, score) in deterministic cluster order.
    """
    from pyspark.sql import functions as F

    from lucene_solr_spark.search.bm25 import search
    from lucene_solr_spark.search.query import BooleanQuery

    window = search(index, BooleanQuery.of(should=query_terms), k=rows).select(
        "docid"
    )
    page = (
        text_source.select(
            F.col(id_col).cast("long").alias("docid"), F.col(text_col).alias("text")
        )
        .join(window, "docid")  # window is k-bounded: this collect is bounded
        .collect()
    )
    clusters = stc([(r["docid"], r["text"]) for r in page], **params)
    spark = text_source.sparkSession
    schema = "label string, size long, docids array<long>, score double"
    return spark.createDataFrame(
        [(c["label"], c["size"], c["docids"], c["score"]) for c in clusters], schema
    )
