"""lucene/facet analog: DrillDownQuery subtree/OR semantics, DrillSideways
one-pass counts vs a brute-force per-dimension re-query oracle, and
hierarchical taxonomy rollup counts — all differentially checked against
pure-Python recomputation from the raw parquet rows (independent of the
Spark path machinery AND of the registered DuckDB oracle)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.facets.taxonomy import (
    drill_down,
    drill_sideways_counts,
    facet_path,
    taxonomy_top_children,
    with_document_taxonomy,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return with_document_taxonomy(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").collect()


def _size_path(n_chars):
    return ("%d" % (n_chars // 100 * 100), "%d" % (n_chars // 10 * 10))


def _doc_paths(r):
    return [
        ("lang", r.lang),
        ("source", r.source),
        ("size", *_size_path(r.n_chars)),
    ]


def _passes(r, dim, paths):
    """Python drill predicate: any drill path is a prefix of a doc path."""
    for p in _doc_paths(r):
        if p[0] != dim:
            continue
        for drill in paths:
            if tuple(p[1 : 1 + len(drill)]) == tuple(drill):
                return True
    return False


DRILLS = {"lang": [("en",)], "size": [("200",), ("300",)]}


def test_drill_down_subtree_and_or(docs, rows):
    """Drill-down = AND across dims, OR within a dim, subtree matches."""
    got = sorted(
        r.doc_id for r in drill_down(docs, DRILLS, paths_col="facets").collect()
    )
    want = sorted(
        r.doc_id
        for r in rows
        if _passes(r, "lang", DRILLS["lang"]) and _passes(r, "size", DRILLS["size"])
    )
    assert got == want
    assert want  # non-degenerate at every sf


def test_drill_down_path_prefix_matches_subtree(docs, rows):
    """Drilling on size/200 matches every size/200/2x0 leaf."""
    got = sorted(
        r.doc_id
        for r in drill_down(docs, {"size": [("200",)]}, paths_col="facets").collect()
    )
    want = sorted(r.doc_id for r in rows if 200 <= r.n_chars < 300)
    assert got == want


def test_drill_sideways_vs_requery_oracle(docs, rows):
    """The one-pass sideways counts equal the brute-force definition:
    drilled dim -> counts with that dim's clause removed; undrilled dim ->
    counts with every clause applied (DrillSideways.java:133-175)."""
    dims = ["lang", "source", "size"]
    out = drill_sideways_counts(
        docs, DRILLS, dims, paths_col="facets", top_n=1000
    ).collect()
    got = {(r.dim, r.label): r["count"] for r in out}

    want: dict[tuple, int] = {}
    for dim in dims:
        # drilled dim: that dim's clause removed; undrilled: all clauses
        applied = {d: p for d, p in DRILLS.items() if d != dim}
        eligible = [
            r for r in rows if all(_passes(r, d, p) for d, p in applied.items())
        ]
        c: Counter = Counter()
        for r in eligible:
            labels = {p[1] for p in _doc_paths(r) if p[0] == dim}
            for lb in labels:
                c[lb] += 1
        for lb, n in c.items():
            want[(dim, lb)] = n
    assert got == want


def test_drill_sideways_ordering_and_topn(docs):
    out = drill_sideways_counts(
        docs, DRILLS, ["lang", "source", "size"], paths_col="facets", top_n=3
    ).collect()
    per_dim: dict[str, list] = {}
    for r in out:
        per_dim.setdefault(r.dim, []).append((-r["count"], r.label))
    for dim, keys in per_dim.items():
        assert len(keys) <= 3
        assert keys == sorted(keys), dim
    assert [r.dim for r in out] == sorted(r.dim for r in out)


def test_sideways_equals_drilldown_for_undrilled_dim(docs):
    """An undrilled dim's sideways counts are exactly the facet counts of
    the plain drill-down result (the degenerate case)."""
    hits = drill_down(docs, DRILLS, paths_col="facets")
    plain = {
        (r.source, r["count"])
        for r in hits.groupBy(F.col("source").alias("source"))
        .agg(F.count(F.lit(1)).alias("count"))
        .collect()
    }
    side = {
        (r.label, r["count"])
        for r in drill_sideways_counts(
            docs, DRILLS, ["source"], paths_col="facets", top_n=1000
        ).collect()
    }
    assert side == plain


def test_taxonomy_top_children_rollup(docs, rows):
    """Children of the size root roll up the whole subtree, once per doc."""
    got = {
        r.label: r["count"]
        for r in taxonomy_top_children(docs, "size", top_n=1000).collect()
    }
    c: Counter = Counter()
    for r in rows:
        c["%d" % (r.n_chars // 100 * 100)] += 1
    assert got == dict(c)


def test_taxonomy_children_under_path(docs, rows):
    got = {
        r.label: r["count"]
        for r in taxonomy_top_children(docs, "size", ("200",), top_n=1000).collect()
    }
    c: Counter = Counter()
    for r in rows:
        if 200 <= r.n_chars < 300:
            c["%d" % (r.n_chars // 10 * 10)] += 1
    assert got == dict(c)


def test_facet_path_builder():
    assert facet_path("size", "200", "240") == "size/200/240"


def test_multivalued_dim_counts_doc_once(spark):
    """A doc with two paths under the same child counts once (per-doc
    ordinal-set semantics, TaxonomyFacetCounts.java:70-80)."""
    df = spark.createDataFrame(
        [
            (1, ["tag/a/x", "tag/a/y", "tag/b/z"]),
            (2, ["tag/a/x"]),
        ],
        "doc_id long, facets array<string>",
    )
    got = {
        r.label: r["count"]
        for r in taxonomy_top_children(df, "tag", top_n=10).collect()
    }
    assert got == {"a": 2, "b": 1}

    side = drill_sideways_counts(
        df, {"tag": [("a",)]}, ["tag"], paths_col="facets", top_n=10
    ).collect()
    assert {(r.label): r["count"] for r in side} == {"a": 2, "b": 1}


def test_taxonomy_sum_value_vs_python(docs, rows):
    """SumValueSource semantics: each matching doc adds value(doc) to each
    of its children under the dim, once per child subtree."""
    from collections import defaultdict

    from lucene_solr_spark.facets.taxonomy import taxonomy_sum_value

    got = {
        r.label: r.total
        for r in taxonomy_sum_value(
            docs, "size", value_col="n_chars", top_n=1000
        ).collect()
    }
    want: dict = defaultdict(float)
    for r in rows:
        want["%d" % (r.n_chars // 100 * 100)] += float(r.n_chars)
    assert got == dict(want)


def test_sampled_counts_amortize_exact(docs, rows):
    """Amortized sampled facets: candidate labels come from the sample,
    reported counts are EXACT (equal to the full-count oracle), order is
    the sampled ranking."""
    from lucene_solr_spark.facets.taxonomy import (
        sampled_top_children,
        taxonomy_top_children,
    )

    out = sampled_top_children(
        docs, "size", top_n=5, sample_permille=500, seed="s0"
    ).collect()
    assert out
    exact = {
        r.label: r["count"]
        for r in taxonomy_top_children(docs, "size", top_n=1000).collect()
    }
    for r in out:
        assert r["count"] == exact[r.label], r.label
    keys = [(-r.sampled_count, r.label) for r in out]
    assert keys == sorted(keys)


def test_sampled_counts_deterministic(docs):
    from lucene_solr_spark.facets.taxonomy import sampled_top_children

    a = sampled_top_children(docs, "size", top_n=5, seed="s0").collect()
    b = sampled_top_children(docs, "size", top_n=5, seed="s0").collect()
    assert a == b
    # a different seed samples a different subset (counts may coincide,
    # sampled_count rarely all equal)
    c = sampled_top_children(docs, "size", top_n=5, seed="s1").collect()
    assert {r.label for r in c}  # runs and returns rows


def test_drill_down_scored_base_query(spark, sf_dir, docs, rows):
    """DrillDownQuery with a scored base: hits = base top-k restricted to
    the drill-down set, ranked by the BASE scores alone."""
    from lucene_solr_spark.facets.taxonomy import drill_down_scored
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.bm25 import search
    from lucene_solr_spark.search.query import BooleanQuery

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index = build_index(
        spark, raw, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )
    out = drill_down_scored(
        index, ["table", "merge"], docs, DRILLS, k=10
    ).collect()
    allowed = {
        r.doc_id
        for r in rows
        if _passes(r, "lang", DRILLS["lang"]) and _passes(r, "size", DRILLS["size"])
    }
    full = search(
        index, BooleanQuery.of(should=["table", "merge"]), k=10_000
    ).collect()
    want = [
        (r.docid, r.score) for r in full if r.docid in allowed
    ][:10]
    assert [(r.docid, r.score) for r in out] == want
    assert out  # non-degenerate


def test_drill_sideways_with_scored_base_docset(spark, sf_dir, docs, rows):
    """DrillSideways over a real base query (DrillSideways.search's
    baseQuery): counts restrict to the base's matching DocSet via a
    semi-join; per-dim semantics unchanged."""
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.bm25 import search
    from lucene_solr_spark.search.query import BooleanQuery

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index = build_index(
        spark, raw, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )
    hits = search(
        index, BooleanQuery.of(should=["table", "merge"]), k=10_000
    ).select("docid")
    hit_ids = {r.docid for r in hits.collect()}

    out = drill_sideways_counts(
        docs, DRILLS, ["lang", "source", "size"],
        base_docids=hits, top_n=1000,
    ).collect()
    got = {(r.dim, r.label): r["count"] for r in out}

    want: dict[tuple, int] = {}
    for dim in ["lang", "source", "size"]:
        applied = {d: p for d, p in DRILLS.items() if d != dim}
        eligible = [
            r for r in rows
            if r.doc_id in hit_ids
            and all(_passes(r, d, p) for d, p in applied.items())
        ]
        c: Counter = Counter()
        for r in eligible:
            for lb in {p[1] for p in _doc_paths(r) if p[0] == dim}:
                c[lb] += 1
        for lb, n in c.items():
            want[(dim, lb)] = n
    assert got == want
    assert want


def test_drill_sideways_property_random_taxonomies(spark):
    """Property test: for random multi-dim taxonomies and random drills,
    the one-pass sideways counts equal the brute-force per-dimension
    re-query definition (and hits = docs passing every drill)."""
    import random

    from lucene_solr_spark.facets.taxonomy import (
        drill_down,
        drill_sideways_counts,
    )

    rng = random.Random(1234)
    dims_pool = ["a", "b", "c"]
    for case in range(6):
        n_docs = rng.randint(6, 24)
        rows_py = []
        for i in range(n_docs):
            paths = []
            for dim in dims_pool:
                for _ in range(rng.randint(1, 2)):  # multiValued dims
                    depth = rng.randint(1, 2)
                    comps = [str(rng.randint(0, 2)) for _ in range(depth)]
                    paths.append(dim + "/" + "/".join(comps))
            rows_py.append((i, sorted(set(paths))))
        df = spark.createDataFrame(rows_py, "doc_id long, facets array<string>")

        n_drilled = rng.randint(1, 2)
        drills = {}
        for dim in rng.sample(dims_pool, n_drilled):
            drills[dim] = [
                tuple(str(rng.randint(0, 2)) for _ in range(rng.randint(1, 2)))
                for _ in range(rng.randint(1, 2))
            ]

        def passes(paths, dim, dpaths):
            for p in paths:
                segs = p.split("/")
                if segs[0] != dim:
                    continue
                for dp in dpaths:
                    if tuple(segs[1 : 1 + len(dp)]) == tuple(dp):
                        return True
            return False

        # hits
        got_hits = sorted(
            r.doc_id for r in drill_down(df, drills, paths_col="facets").collect()
        )
        want_hits = sorted(
            i for i, paths in rows_py
            if all(passes(paths, d, p) for d, p in drills.items())
        )
        assert got_hits == want_hits, (case, drills)

        # sideways
        out = drill_sideways_counts(
            df, drills, dims_pool, paths_col="facets", top_n=1000
        ).collect()
        got = {(r.dim, r.label): r["count"] for r in out}
        want = {}
        for dim in dims_pool:
            applied = {d: p for d, p in drills.items() if d != dim}
            elig = [
                (i, paths) for i, paths in rows_py
                if all(passes(paths, d, p) for d, p in applied.items())
            ]
            cnt = {}
            for _, paths in elig:
                for lb in {p.split("/")[1] for p in paths if p.split("/")[0] == dim}:
                    cnt[lb] = cnt.get(lb, 0) + 1
            for lb, n in cnt.items():
                want[(dim, lb)] = n
        assert got == want, (case, drills)
