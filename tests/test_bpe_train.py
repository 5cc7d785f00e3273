"""BPE vocabulary induction: the published Sennrich worked example, the
train/apply round-trip invariant, and the distributed word-count path."""

import pytest

from lucene_solr_spark.textops.bpe import (
    END,
    _encode_word,
    bpe_apply,
    bpe_train,
    bpe_train_from_counts,
    word_counts,
)


def test_sennrich_worked_example():
    """The ACL-2016 paper's running example: {'low','lower','newest',
    'widest'} — 'es' then 'est' fuse first (freq 9), and after enough
    merges 'newest' becomes one symbol while unseen 'lowest' decomposes
    into learned subwords."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train_from_counts(counts, 10)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_word("newest", ranks) == ["newest" + END]
    assert _encode_word("lowest", ranks) == ["low", "est" + END]


def test_encode_roundtrip_and_monotonicity():
    counts = [("abab", 4), ("abc", 3), ("banana", 2)]
    merges = bpe_train_from_counts(counts, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in counts + [("ababab", 0), ("cabana", 0)]:
        enc = _encode_word(w, ranks)
        assert "".join(enc) == w + END  # lossless
        assert 1 <= len(enc) <= len(w) + 1
    # more merges never increase any word's subword count
    fewer = {p: i for i, p in enumerate(merges[:2])}
    for w, _ in counts:
        assert len(_encode_word(w, ranks)) <= len(_encode_word(w, fewer))


def test_deterministic_tie_break():
    """Equal-count pairs fuse lexicographically-smallest first."""
    merges = bpe_train_from_counts([("ab", 2), ("cd", 2)], 1)
    assert merges == [("a", "b")]


def test_corpus_train_and_apply(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train(docs, num_merges=50)
    assert 1 <= len(merges) <= 50
    # the corpus vocabulary is tiny and repetitive: top merges must fuse
    # real character pairs of real words
    wc = {r.word: r.n for r in word_counts(docs).collect()}
    assert all(len(a) >= 1 and len(b) >= 1 for a, b in merges)

    out = bpe_apply(docs, merges)
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        # every doc's subword count lies in [n_tokens, total chars + marks]
        assert r.n_subwords >= r.n_tokens
    # with this many merges over a 31-word vocab, frequent words fuse to
    # near-single tokens: the ratio must be well below characters/token
    import statistics

    ratio = statistics.mean(
        r.n_subwords / r.n_tokens for r in rows if r.n_tokens
    )
    assert ratio < 3.0, ratio


def test_train_consistency_spark_vs_local(spark, sf_dir):
    """bpe_train == bpe_train_from_counts over the collected table (the
    distributed step only produces the counts)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wc = [(r.word, r.n) for r in word_counts(docs).collect()]
    assert bpe_train(docs, num_merges=30) == bpe_train_from_counts(wc, 30)
