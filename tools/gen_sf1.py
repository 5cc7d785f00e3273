"""Deterministic sf1-scale synthetic tables for the second bench point.

The driver ships sf{0.001,0.01,0.1}; sf0.1's query latencies sit on Spark's
0.1-0.5s local job floor, so round-over-round kernel wins are invisible
(VERDICT r3 "Next round" #7).  This generates a 10x point — 50,000
documents / 20,000 embeddings — with the SAME shape as the driver tables
(31-word vocabulary extracted from sf0.1, uniform 10-100 token lengths,
5 langs, 20 sources, 64-dim embeddings in the same value range), seeded and
derived from nothing external (north rule: synthesize deterministically).

Output: /root/repo/.bench_sf1/{documents,embeddings}.parquet (gitignored).
Run: python tools/gen_sf1.py
"""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", ".bench_sf1")
N_DOCS = 50_000
N_VECS = 20_000
DIMS = 64


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    vocab = sorted(
        r[0]
        for r in con.execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) "
            "FROM '/root/testdata/sf0.1/documents.parquet'"
        ).fetchall()
        if r[0]
    )
    rng = np.random.RandomState(42)
    lengths = rng.randint(10, 101, size=N_DOCS)
    langs = np.array(["en", "fr", "es", "de", "zh"])
    lang_col = langs[rng.randint(0, 5, size=N_DOCS)]
    src_col = np.array([f"src{i}" for i in rng.randint(0, 20, size=N_DOCS)])
    texts = []
    vocab_arr = np.array(vocab)
    for n in lengths:
        texts.append(" ".join(vocab_arr[rng.randint(0, len(vocab), size=n)]))
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(lang_col),
            "source": pa.array(src_col),
            "n_chars": pa.array(n_chars),
        }
    )
    pq.write_table(docs, os.path.join(OUT, "documents.parquet"))

    vecs = rng.uniform(-0.34, 0.34, size=(N_VECS, DIMS)).astype(np.float32)
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECS, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        }
    )
    pq.write_table(emb, os.path.join(OUT, "embeddings.parquet"))
    print(f"wrote {OUT}: {N_DOCS} docs, {N_VECS} embeddings, vocab={len(vocab)}")


if __name__ == "__main__":
    main()
