"""Spellcheck + suggester analogs over the live term dictionary.

DirectSpellChecker (reference:
``lucene/suggest/src/java/org/apache/lucene/search/spell/DirectSpellChecker.java:40-129``)
draws candidate corrections from the index's own term dictionary within
``maxEdits`` of the query term (LevenshteinAutomata intersect) and ranks them
by similarity then docFreq (``SuggestWordFrequencyComparator.java:28-40``).
Re-expressed Spark-first: the dictionary IS the ``term_stats()`` frame, the
automaton intersect becomes a length-window prefilter (|len(t) - len(q)| <=
maxEdits — the same bound the automaton enforces) plus a JVM-side
``levenshtein`` filter, and ranking is (distance asc, df desc, term asc).
No driver materialization: the whole lookup is one Catalyst plan over the
dictionary, and at 100 TB the dictionary is orders of magnitude smaller than
postings (distinct terms only), so a columnar scan with the length window
pushed down is the right shape — exactly why Lucene keeps the FST in RAM.

The suggester mirrors the weight-ordered prefix lookup of AnalyzingSuggester
(``lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/
AnalyzingSuggester.java:77-96``: "the weight associated with an input ...
top N by weight"): prefix filter over the dictionary, ranked by collection
frequency as the weight, term-asc tie-break.  A ``LIKE 'p%'`` prefix
predicate pushes down to Parquet min/max stats on a term-sorted dictionary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables


def spellcheck(
    index: IndexTables,
    term: str,
    max_edits: int = 2,
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-k corrections -> (suggestion, distance, df).

    Ordering: distance asc (closer first), df desc (popular first), then
    suggestion asc — DirectSpellChecker's comparator chain with the term
    itself excluded (``DirectSpellChecker.java:425-431`` skips the exact
    match unless the term is absent from the dictionary).
    """
    q = term.lower()
    return (
        index.term_stats()
        .filter(F.col("term") != q)
        .filter(F.abs(F.length("term") - F.lit(len(q))) <= max_edits)
        .filter(F.col("df") >= min_df)
        .withColumn("distance", F.levenshtein(F.col("term"), F.lit(q)))
        .filter(F.col("distance") <= max_edits)
        .select(
            F.col("term").alias("suggestion"),
            F.col("distance").cast("int").alias("distance"),
            F.col("df").cast("long").alias("df"),
        )
        .orderBy(
            F.col("distance").asc(),
            F.col("df").desc(),
            F.col("suggestion").asc(),
        )
        .limit(k)
    )


def suggest_prefix(index: IndexTables, prefix: str, k: int = 10) -> DataFrame:
    """Top-k completions -> (suggestion, weight): dictionary terms starting
    with ``prefix``, ranked by collection frequency (the suggester weight),
    term-asc tie-break."""
    return (
        index.term_stats()
        .filter(F.col("term").startswith(prefix.lower()))
        .select(
            F.col("term").alias("suggestion"),
            F.col("cf").cast("long").alias("weight"),
        )
        .orderBy(F.col("weight").desc(), F.col("suggestion").asc())
        .limit(k)
    )


def suggest_infix(
    index: IndexTables,
    fragment: str,
    k: int = 10,
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """AnalyzingInfixSuggester analog (lucene/suggest/.../analyzing/
    AnalyzingInfixSuggester.java:77-104: matches anywhere in the suggestion
    surface, results returned with the matched fragment highlighted):
    dictionary terms CONTAINING the fragment, ranked by weight (cf) desc,
    term-asc tie-break, with every occurrence wrapped pre/post.  One
    Catalyst contains-filter over the dictionary — the infix index Lucene
    builds is unnecessary when the dictionary is a columnar scan."""
    q = fragment.lower()
    if not q:
        raise ValueError("suggest_infix needs a non-empty fragment")
    return (
        index.term_stats()
        .filter(F.col("term").contains(q))
        .select(
            F.col("term").alias("suggestion"),
            F.col("cf").cast("long").alias("weight"),
            F.replace(F.col("term"), F.lit(q), F.lit(pre + q + post)).alias(
                "highlighted"
            ),
        )
        .orderBy(F.col("weight").desc(), F.col("suggestion").asc())
        .limit(k)
    )


def suggest_fuzzy(
    index: IndexTables,
    typed: str,
    k: int = 10,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
) -> DataFrame:
    """FuzzySuggester analog (lucene/suggest/.../analyzing/
    FuzzySuggester.java:47-96: completions whose ANALYZED FORM is within
    ``maxEdits`` of the typed input, with the FuzzySuggester defaults —
    DEFAULT_NON_FUZZY_PREFIX=1 chars must match exactly,
    DEFAULT_MIN_FUZZY_LENGTH=3 below which matching is exact).

    The Levenshtein-automaton x FST intersection becomes: dictionary terms
    whose length-(n±e) prefix is within ``max_edits`` of the typed string —
    the same acceptance set — ranked by weight (cf) desc.  The per-length
    ``levenshtein`` probes are a fixed (2e+1)-column JVM projection over
    the dictionary scan with the non-fuzzy-prefix predicate pushed down."""
    q = typed.lower()
    if len(q) < min_fuzzy_length:
        out = suggest_prefix(index, q, k)
        return out.select(
            "suggestion", F.lit(0).cast("int").alias("distance"), "weight"
        )
    n = len(q)
    t = F.col("term")
    probes = [
        F.when(
            F.length(t) >= L, F.levenshtein(F.substring(t, 1, L), F.lit(q))
        )
        for L in range(max(n - max_edits, 1), n + max_edits + 1)
    ]
    dist = F.least(*probes) if len(probes) > 1 else probes[0]
    return (
        index.term_stats()
        .filter(t.startswith(q[:non_fuzzy_prefix]))
        .withColumn("distance", dist)
        .filter(F.col("distance") <= max_edits)
        .select(
            F.col("term").alias("suggestion"),
            F.col("distance").cast("int").alias("distance"),
            F.col("cf").cast("long").alias("weight"),
        )
        .orderBy(F.col("weight").desc(), F.col("suggestion").asc())
        .limit(k)
    )


def collate(
    index: IndexTables,
    misspelled: str,
    context_terms: list[str],
    max_edits: int = 2,
    tries: int = 3,
    max_collations: int = 3,
) -> DataFrame:
    """SpellCheckCollator (solr/core/src/java/org/apache/solr/spelling/
    SpellCheckCollator.java:51-180): substitute top spellcheck suggestions
    for the misspelled term, RE-RUN the corrected query against the index,
    and keep only collations that return hits (:89-169: the try loop bounded
    by maxTries/maxCollations, ``collation.setHits``).  Returns
    (collation_query, hits) ordered hits desc, collation asc
    (the column is Solr's ``collationQuery``; COLLATION is a SQL keyword).

    The per-term generalization (several misspelled terms per query) is a
    loop over this; one misspelled term + context is the verified unit.

    Shape: candidate corrections are a bounded dictionary lookup (``tries``
    rows collected — the same boundary as Solr's in-RAM spellcheck
    dictionary); verification is ONE distributed pass — a presence pivot
    over postings filtered to candidates+context, with every candidate's hit
    count taken as conditional sums in a single aggregate (not one re-query
    per collation)."""
    cands = [
        r.suggestion
        for r in spellcheck(index, misspelled, max_edits=max_edits, k=tries).collect()
    ]
    spark = index.postings.sparkSession
    if not cands:
        return spark.createDataFrame([], "collation_query string, hits long")
    context = [t.lower() for t in context_terms]
    all_terms = list(dict.fromkeys(cands + context))
    p = index.postings.filter(F.col("term").isin(all_terms))
    pres = p.groupBy("docid").agg(
        *[
            F.max(F.when(F.col("term") == t, F.lit(1))).alias(f"_t{i}")
            for i, t in enumerate(all_terms)
        ]
    )
    ctx_ok = F.lit(True)
    for t in context:
        ctx_ok = ctx_ok & F.col(f"_t{all_terms.index(t)}").isNotNull()
    counts = pres.agg(
        *[
            F.sum(
                F.when(
                    F.col(f"_t{all_terms.index(c)}").isNotNull() & ctx_ok, 1
                ).otherwise(0)
            ).alias(f"_h{i}")
            for i, c in enumerate(cands)
        ]
    ).collect()[0]
    rows = [
        (" ".join([c, *context]), int(counts[f"_h{i}"]))
        for i, c in enumerate(cands)
        if counts[f"_h{i}"] > 0  # :165 — only collations that return hits
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        rows[:max_collations], "collation_query string, hits long"
    )
