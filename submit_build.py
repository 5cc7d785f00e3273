"""spark-submit entry point: build the inverted-index store from a pages table.

The north rule's deployment surface — the whole pipeline runs as a plain
spark-submit job with the engine shipped via --py-files, exactly how it
would land on a real multi-executor cluster:

    python -m zipfile -c /tmp/lucene_solr_spark.zip lucene_solr_spark
    spark-submit --master <cluster> \
        --py-files /tmp/lucene_solr_spark.zip \
        submit_build.py --pages-sf-dir /root/testdata/sf0.001 \
        --store /tmp/lss_submit_store --partitions 8

No master/parallelism is hardcoded here: spark-submit's --master /
--num-executors / --executor-cores decide the cluster size (the N vs 4N
scaling protocol in bench_scaling.py launches the same build at two sizes).
Prints ONE JSON line with the committed snapshot's stats.

Query smoke (--query TERM) runs a BM25 top-10 against the store after the
build, proving the persisted segment tables serve reads in the same job.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-sf-dir", required=True,
                    help="testdata sf dir; pages synthesize from documents.parquet")
    ap.add_argument("--store", required=True, help="store root directory")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--query", default="table", help="post-build smoke query term")
    args = ap.parse_args()

    # Import AFTER spark-submit has placed the --py-files zip on the path.
    from pyspark.sql import SparkSession

    from lucene_solr_spark.pages import pages_from_documents
    from lucene_solr_spark.search import search
    from lucene_solr_spark.store import build_pages_to_store, load_index

    spark = SparkSession.builder.appName("lss-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.perf_counter()
    pages = pages_from_documents(spark, args.pages_sf_dir)
    snap = build_pages_to_store(
        spark, pages, args.store,
        num_index_partitions=args.partitions,
        batch_size=args.batch_size,
    )
    build_s = time.perf_counter() - t0

    idx = load_index(spark, args.store)
    top = [
        (r.docid, r.score) for r in search(idx, args.query, k=10).collect()
    ]
    print(json.dumps({
        "metric": "spark_submit_index_build",
        "store": args.store,
        "max_doc": snap.max_doc,
        "sum_total_term_freq": snap.sum_total_term_freq,
        "build_sec": round(build_s, 3),
        "docs_per_sec": round(snap.max_doc / build_s, 1) if build_s else None,
        "query": args.query,
        "top1": top[0] if top else None,
        "n_hits": len(top),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
