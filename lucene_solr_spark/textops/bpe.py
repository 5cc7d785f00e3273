"""BPE vocabulary induction — tokenizer training over a web corpus.

The published byte-pair-encoding training algorithm (Sennrich, Haddow &
Birch, "Neural Machine Translation of Rare Words with Subword Units", ACL
2016 — public method, and the way sentencepiece/GPT-2-style tokenizers are
actually trained): merges are learned over the WORD-FREQUENCY TABLE, not
the raw corpus — each round picks the most frequent adjacent symbol pair
(ties broken deterministically) and fuses it everywhere.

Spark-first split of the work:

1. ``word_counts`` — ONE distributed pass: tokenize (the engine's JVM
   analyzer expression), explode, hash-aggregate (term, count).  This is
   the only corpus-scale step; at 100 TB it is exactly the scan+agg the
   cluster is for.  Real tokenizer training then samples or truncates the
   tail (``min_count`` / ``max_words`` knobs) — the vocabulary is Zipfian,
   so the kept table is bounded and driver-sized BY CONSTRUCTION, the same
   bounded-model discipline as the IVF/PQ codebooks.
2. ``bpe_train`` — merge learning over that bounded table, driver-side
   (the classic algorithm is inherently sequential: merge i+1 depends on
   the counts AFTER merge i; every practical trainer runs this phase on
   one machine over the word-count dict).
3. ``bpe_apply`` — encode the corpus with the learned merge ranks: one
   Arrow-batched UDF applying lowest-rank-first pair fusion per word (the
   GPT-2 ``get_pairs``/min-rank loop, public), vectorized per batch.

Determinism: pair ties break on (left symbol, right symbol) ascending;
word-count ties don't matter (counts sum over the full table).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import raw_tokens_expr

END = "</w>"  # end-of-word marker (Sennrich §3.2)


def _bpe_tokens(text):
    """Lowercased analyzer tokens WITHOUT the stopword filter — tokenizer
    training must see function words (they dominate the merge counts);
    the index chain's stop removal is a search concern, not a tokenizer
    one.  Same shared regex, so training and apply tokenize identically."""
    return F.coalesce(
        F.transform(raw_tokens_expr(text), F.lower), F.array()
    )


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_words: int | None = None,
) -> DataFrame:
    """(word, n): the corpus word-frequency table — one scan, one hash
    aggregate; ``min_count``/``max_words`` bound the driver-side model."""
    wc = (
        df.select(
            F.explode(_bpe_tokens(F.col(text_col))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )
    if max_words is not None:
        wc = wc.orderBy(F.desc("n"), F.asc("word")).limit(max_words)
    return wc


def bpe_train_from_counts(
    counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """The Sennrich merge loop over a (word, count) table: each round
    fuses the globally most frequent adjacent symbol pair (ties to the
    lexicographically smallest pair).  Returns the ordered merge list."""
    words = {
        tuple(list(w) + [END]): int(n) for w, n in counts if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for symbols, n in words.items():
            for a, b in zip(symbols, symbols[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing left worth fusing
        merges.append(best)
        fused = best[0] + best[1]
        new_words = {}
        for symbols, n in words.items():
            out = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    out.append(fused)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


def bpe_train(
    df: DataFrame,
    num_merges: int = 100,
    text_col: str = "text",
    min_count: int = 1,
    max_words: int | None = 100_000,
) -> list[tuple[str, str]]:
    """Corpus pass + driver-side merge learning.  The collected table is
    bounded by ``max_words`` (Zipfian vocabularies make this the standard
    trainer shape; at 100 TB pair it with ``min_count`` pruning)."""
    rows = word_counts(df, text_col, min_count, max_words).collect()
    return bpe_train_from_counts([(r.word, r.n) for r in rows], num_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Lowest-rank-first pair fusion (the GPT-2 encode loop, public)."""
    symbols = list(word) + [END]
    while len(symbols) > 1:
        pairs = [
            (ranks[p], i)
            for i, p in enumerate(zip(symbols, symbols[1:]))
            if p in ranks
        ]
        if not pairs:
            break
        _, i = min(pairs)
        symbols = symbols[:i] + [symbols[i] + symbols[i + 1]] + symbols[i + 2 :]
    return symbols


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(docid, n_tokens, n_subwords): encode every doc with the learned
    merges — one Arrow batch per partition, the merge-rank dict shipped in
    the closure (bounded: num_merges entries)."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf("int")
    def _n_subwords(tok_arrays: pd.Series) -> pd.Series:
        out = []
        cache: dict[str, int] = {}
        for toks in tok_arrays:
            n = 0
            for w in (toks if toks is not None else []):
                if w not in cache:
                    cache[w] = len(_encode_word(w, ranks))
                n += cache[w]
            out.append(n)
        return pd.Series(out, dtype="int32")

    toks = _bpe_tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("docid"),
        F.size(toks).alias("n_tokens"),
        _n_subwords(toks).alias("n_subwords"),
    )
