#!/usr/bin/env python
"""One parallelism level of the scaling experiment (north rule: same
job at N and 4N parallelism; sandbox stand-in for two cluster sizes —
driver instruction).

Runs in its OWN process (one local[N] JVM per level):
  1. build the full compressed segment index over the given pages
     parquet (ingest-to-index: tokenize -> postings -> segments),
  2. run the 20-query reference set (bm25 top-10, strategy=auto),
and prints one JSON line with build wall seconds (excluding JVM/session
startup — on a real cluster job runtime >> startup), docs/sec, and
query latency percentiles.

Invoked by BENCH/run_scaling.py; can be run standalone:
    python BENCH/scale_worker.py --cpus 8 --input /tmp/pages.parquet \
        --index-dir /tmp/idx8
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--segment-groups", type=int, default=1)
    ap.add_argument("--skip-queries", action="store_true")
    args = ap.parse_args()

    from ir_spark.fixtures import REFERENCE_QUERIES
    from ir_spark.operators.segment_query import SegmentIndex, search_segments
    from ir_spark.operators.segments import build_segment_index
    from ir_spark.session import get_spark

    if os.path.exists(args.index_dir):
        shutil.rmtree(args.index_dir)

    spark = get_spark(f"ir_spark_scale_{args.cpus}", cpus=args.cpus)
    pages = spark.read.parquet(args.input).select("url", "text")
    n_docs = pages.count()

    # JVM/Python steady-state warm-up, excluded from timing: the first
    # job of a fresh JVM pays executor+Python-worker launch, codegen
    # compilation and classloading (~10s measured) — a per-process
    # constant that is noise for throughput-scaling purposes (a real
    # cluster's executors are long-lived).
    from pyspark.sql import functions as F

    from ir_spark.operators.build import assign_doc_ids, token_counts

    warm = pages.limit(2000)
    token_counts(
        warm.withColumn("doc_id", F.monotonically_increasing_id())
    ).groupBy("term").count().count()
    assign_doc_ids(warm.select("url", "text")).count()

    t0 = time.time()
    build_segment_index(
        spark, pages, args.index_dir, source=args.input,
        segment_groups=args.segment_groups,
    )
    build_sec = time.time() - t0

    out = {
        "cpus": args.cpus,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 3),
        "docs_per_sec": round(n_docs / build_sec, 2),
    }

    if not args.skip_queries:
        sidx = SegmentIndex.load(spark, args.index_dir)
        # warm-up (plan + python worker pool), not timed
        search_segments(spark, sidx, REFERENCE_QUERIES[0], k=10,
                        mode="bm25", strategy="auto").collect()
        lat = []
        for q in REFERENCE_QUERIES:
            tq = time.time()
            search_segments(spark, sidx, q, k=10, mode="bm25",
                            strategy="auto").collect()
            lat.append(time.time() - tq)
        lat_sorted = sorted(lat)
        out.update({
            "query_p50_sec": round(statistics.median(lat), 4),
            "query_p95_sec": round(lat_sorted[int(0.95 * (len(lat) - 1))], 4),
            "query_mean_sec": round(sum(lat) / len(lat), 4),
        })
        # batched workload throughput (all 20 queries, one job) —
        # best of 3 (single shared-box trials swing +/-20%)
        from ir_spark.operators.segment_query import search_segments_batch

        batch_secs = []
        for _ in range(3):
            tb = time.time()
            search_segments_batch(spark, sidx, list(REFERENCE_QUERIES),
                                  k=10, mode="bm25").collect()
            batch_secs.append(time.time() - tb)
        out["batch_qps"] = round(len(REFERENCE_QUERIES) / min(batch_secs), 2)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
