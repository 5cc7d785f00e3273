"""Highlighting: query-term snippets over stored text for top-k results.

The reference's classic Highlighter (``lucene/highlighter/src/java/org/
apache/lucene/search/highlight/Highlighter.java:54-110``) re-analyzes the
stored field, scores fragments by the query terms they contain
(``QueryTermScorer``), cuts a fixed-size fragment (``SimpleFragmenter.java:
30-62``: fragmentSize chars, default 100) and wraps matches with
``SimpleHTMLFormatter.java:31-47`` (``<em>``/``</em>``).

Re-expressed Spark-first as a pure-Catalyst post-processing stage over the
top-k join with stored fields — the analog of fetching stored fields for one
page of hits, NOT a corpus scan:

* fragment anchor = first case-insensitive occurrence of the term in the
  stored text (``QueryTermScorer`` starts at the first scoring token),
  pulled back ``context`` chars so the match sits inside the fragment;
* fragment = fixed ``frag_size`` chars from that anchor (SimpleFragmenter
  semantics — fragment bounds may split words, exactly as the reference's
  fixed-size fragmenter does);
* every in-fragment occurrence is wrapped pre/post (SimpleHTMLFormatter).

Scale shape: top-k (docid, score) is a tiny frame; the stored-field join is
a broadcast-able k-row join against the pages/documents table, and the
string work is whole-stage-codegen expressions (instr/substr/
regexp_replace) — zero Python, zero extra shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.search.bm25 import search


def highlight_fragment(
    text_col: F.Column,
    term: str,
    frag_size: int = 120,
    context: int = 30,
    pre: str = "<em>",
    post: str = "</em>",
) -> F.Column:
    """Snippet expression over a stored-text column (pure Catalyst)."""
    q = term.lower()
    pos = F.instr(F.lower(text_col), q)
    start = F.greatest(pos - F.lit(context), F.lit(1))
    frag = text_col.substr(start, F.lit(frag_size))
    return F.regexp_replace(
        frag, "(?i)(" + re.escape(q) + ")", pre + "$1" + post
    )


_NOT_FOUND = 1 << 30  # instr sentinel: "term absent" sorts after any real hit


def highlight_fragment_multi(
    text_col: F.Column,
    terms: list[str],
    frag_size: int = 120,
    context: int = 30,
    pre: str = "<em>",
    post: str = "</em>",
) -> F.Column:
    """Multi-term snippet: the fragment anchors at the FIRST occurrence of
    ANY query term (QueryTermScorer scores every query term, Highlighter.java
    :54-110), and every in-fragment occurrence of every term wraps pre/post."""
    if not terms:
        raise ValueError("highlighting needs >= 1 term")
    lowered = [t.lower() for t in terms]
    positions = [
        F.when(
            F.instr(F.lower(text_col), t) > 0, F.instr(F.lower(text_col), t)
        ).otherwise(F.lit(_NOT_FOUND))
        for t in lowered
    ]
    pos = F.least(*positions) if len(positions) > 1 else positions[0]
    start = F.greatest(pos - F.lit(context), F.lit(1))
    frag = text_col.substr(start, F.lit(frag_size))
    pattern = "(?i)(" + "|".join(re.escape(t) for t in lowered) + ")"
    return F.regexp_replace(frag, pattern, pre + "$1" + post)


def highlight_topk(
    index: IndexTables,
    stored: DataFrame,
    term: str | list[str],
    k: int = 10,
    frag_size: int = 120,
    context: int = 30,
) -> DataFrame:
    """Top-k search for ``term`` (one term or a term-OR list) + snippet ->
    (docid, score, snippet).

    ``stored`` must carry (docid, text) — the stored-fields source (the
    pages/documents table itself; see SURVEY §1.1 stored-fields row).
    """
    if isinstance(term, str):
        # fold case like the query analyzer would — the term dictionary only
        # holds lowercased terms, so a capitalized user term must not turn
        # the MUST clause into a miss while the fragmenter still matches
        term = term.lower()
        top = search(index, term, k=k)
        snip = highlight_fragment(
            F.col("text"), term, frag_size=frag_size, context=context
        )
    else:
        from lucene_solr_spark.search.query import BooleanQuery

        if not term:
            raise ValueError("highlighting needs >= 1 term")
        terms = [t.lower() for t in term]
        top = search(index, BooleanQuery.of(should=terms), k=k)
        snip = highlight_fragment_multi(
            F.col("text"), terms, frag_size=frag_size, context=context
        )
    # broadcast the k-row hit list into the stored-fields scan: the docid
    # filter reaches the Parquet scan via the broadcast join, so this reads
    # one page of hits, never the corpus
    return (
        stored.select("docid", "text")
        .join(F.broadcast(top), "docid")
        .select("docid", "score", snip.alias("snippet"))
        .orderBy(F.col("score").desc(), F.col("docid").asc())
    )


def highlight_positions(
    index: IndexTables,
    term: str | list[str],
    k: int = 10,
    window: int = 5,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """Positions-layer highlighter — the FastVectorHighlighter /
    PostingsHighlighter analog (lucene/highlighter/.../vectorhighlight/
    FieldPhraseList+SimpleFragListBuilder, postingshighlight/
    PostingsHighlighter.java): fragments come from the PERSISTED positions
    index, never from re-analyzing stored text.

    Mechanics (FieldFragList's hit-density fragment selection in token
    space): among the query-term hit positions of each top-k doc, the
    anchor maximizing in-window hits (ties -> smallest position) wins; the
    fragment is the analyzed-token window [anchor, anchor+window) rendered
    from the positions layer with matches wrapped pre/post.  Like the
    reference's term-vector path, no tokenizer runs at query time — and no
    stored-field fetch happens at all (the snippet is the analyzed token
    stream: lowercased, stop positions absent).  Char-exact snippets over
    raw stored text remain highlight_topk's (classic Highlighter) job.

    Scale shape: the top-k docid set broadcasts into the positions table
    (scan prune), anchor scoring self-joins only the per-doc QUERY-TERM
    hits (<= tf rows per doc), and the fragment render aggregates <= window
    tokens per doc — all Catalyst, no Python, no corpus scan."""
    if index.positions is None:
        raise ValueError("index built without positions")
    terms = [term.lower()] if isinstance(term, str) else [t.lower() for t in term]
    if not terms:
        raise ValueError("highlighting needs >= 1 term")
    from lucene_solr_spark.search.query import BooleanQuery

    top = search(index, BooleanQuery.of(should=terms), k=k)
    kpos = index.positions.select("docid", "term", "pos").join(
        F.broadcast(top.select("docid")), "docid"
    )
    hits = kpos.filter(F.col("term").isin(terms)).select("docid", "pos")
    h2 = hits.select(F.col("docid").alias("_d"), F.col("pos").alias("_p"))
    anchors = (
        hits.join(
            h2,
            (F.col("_d") == F.col("docid"))
            & (F.col("_p") >= F.col("pos"))
            & (F.col("_p") < F.col("pos") + window),
        )
        .groupBy("docid", "pos")
        .agg(F.count(F.lit(1)).alias("inwin"))
    )
    w = Window.partitionBy("docid").orderBy(
        F.col("inwin").desc(), F.col("pos").asc()
    )
    best = (
        anchors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("docid", F.col("pos").alias("anchor"))
    )
    frag_toks = kpos.join(best, "docid").filter(
        (F.col("pos") >= F.col("anchor"))
        & (F.col("pos") < F.col("anchor") + window)
    )
    rendered = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "term"))),
            lambda s: F.when(
                s["term"].isin(terms), F.concat(F.lit(pre), s["term"], F.lit(post))
            ).otherwise(s["term"]),
        ),
    )
    frags = frag_toks.groupBy("docid").agg(rendered.alias("snippet"))
    return (
        top.join(frags, "docid")
        .select("docid", "score", "snippet")
        .orderBy(F.col("score").desc(), F.col("docid").asc())
    )


def highlight_snippets(
    index: IndexTables,
    stored: DataFrame,
    term: str,
    k: int = 10,
    n_frags: int = 3,
    frag_size: int = 80,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """hl.snippets=N: the best N fragments per top-k doc
    (Highlighter.getBestFragments, Highlighter.java:166-223: fragments
    ranked by score — here the literal match count — best first).

    Distributed shape: the stored text tiles into fixed windows via
    ``sequence`` + ``explode`` (SimpleFragmenter's fixed-size cut), each
    window counts its matches with codegen string ops, and a per-doc window
    rank keeps the best N — all Catalyst, the explode fans out only k docs'
    windows, never the corpus.  Returns (docid, frag_start, matches,
    snippet) ordered (docid, rank)."""
    q = term.lower()
    top = search(index, q, k=k)
    joined = stored.select("docid", "text").join(F.broadcast(top), "docid")
    tiled = joined.select(
        "docid",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(frag_size))
        ).alias("frag_start"),
        "text",
    ).withColumn("frag", F.col("text").substr(F.col("frag_start"), F.lit(frag_size)))
    # non-overlapping literal count via the replace trick — the identical
    # expression runs in the DuckDB oracle
    lower_frag = F.lower(F.col("frag"))
    matches = (
        (F.length(lower_frag) - F.length(F.replace(lower_frag, F.lit(q), F.lit(""))))
        / F.lit(len(q))
    ).cast("int")
    w = Window.partitionBy("docid").orderBy(
        F.col("matches").desc(), F.col("frag_start").asc()
    )
    snip = F.regexp_replace(
        F.col("frag"), "(?i)(" + re.escape(q) + ")", pre + "$1" + post
    )
    return (
        tiled.withColumn("matches", matches)
        .filter(F.col("matches") > 0)
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n_frags)
        .select("docid", "frag_start", "matches", snip.alias("snippet"))
        .orderBy("docid", F.col("matches").desc(), "frag_start")
    )
