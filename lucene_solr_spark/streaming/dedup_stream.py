"""Streaming cross-batch exact dedup — a custom stateful operator via
``applyInPandasWithState``.

The training-pipeline shape: an unbounded page stream where the same
content re-arrives across micro-batches (recrawls, mirrors); only the FIRST
occurrence of each content hash may pass to the indexer.  The reference's
analog is SignatureUpdateProcessorFactory (solr/core/src/java/org/apache/
solr/update/processor/SignatureUpdateProcessorFactory.java — the URP chain
computes a content signature and overwrites on it), which is per-request;
the streaming form needs state that outlives a batch, which is exactly
Spark's arbitrary stateful operator.

Shape:
- key the stream by the content hash (md5 of the dedup column set) —
  ``groupBy(chash)`` partitions state across executors by hash, the same
  key discipline as the batch dedup's groupBy;
- per group, state is ONE boolean ("seen") carried in the state store
  (checkpointed — replay-safe like everything else in the tlog analog);
- within a batch the group's rows arrive as Arrow/pandas chunks; the first
  row (smallest url for determinism) is emitted iff the group was never
  seen, everything else is dropped.

At corpus scale state is |distinct hashes| booleans in the state store —
RocksDB-backed in production Spark; the state row is ~tens of bytes.
GroupStateTimeout can bound it to a recrawl horizon (not enabled here:
exactness over the sandbox-scale corpus beats eviction).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_DDL = "chash string, url string, text string"
STATE_DDL = "seen boolean"


def _dedup_group(
    key: Any,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit the first-ever row of this content-hash group; drop the rest."""
    if state.exists and state.get[0]:
        return
    best: pd.DataFrame | None = None
    for pdf in pdfs:
        if pdf.empty:
            continue
        cand = pdf.sort_values("url").head(1)
        if best is None or cand.iloc[0]["url"] < best.iloc[0]["url"]:
            best = cand
    if best is None:
        return
    state.update((True,))
    yield best[["chash", "url", "text"]]


def dedup_stream(
    pages: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """(chash, url, text) with exactly one row per distinct content hash
    across the WHOLE stream (first occurrence wins; within a batch the
    smallest url wins, deterministically).

    ``pages`` must be a streaming DataFrame; compose before the indexing
    ``foreachBatch`` sink so recrawled bodies never re-enter the index."""
    keyed = pages.select(
        F.md5(F.col(text_col).cast("binary")).alias("chash"),
        F.col(url_col).alias("url"),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("chash").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
