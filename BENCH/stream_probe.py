#!/usr/bin/env python
"""Streamed-ingest throughput probe: the incremental index path.

The batch build's docs/sec is measured by bench.py and the scaling
harness; this probe measures the INCREMENTAL path a live crawl runs —
`streaming/incremental.py::update_segment_index` per micro-batch
(exactly what `jobs/stream_index.py` invokes from foreachBatch) — and
reports:

  - streamed_docs_per_sec: total docs / total ingest wall over
    ``--batches`` sequential appends to one index;
  - batch_docs_per_sec: the same corpus as ONE batch build (the
    upper bound — no per-batch fixed costs, no snapshot bookkeeping);
  - stream_over_batch: the ratio — how much per-batch overhead the
    incremental machinery (per-batch doc_map, dictionary deltas,
    snapshot manifests) costs at this batch size.  Larger batches
    amortize toward 1.0; the probe documents the trade, it does not
    tune it.

Also asserts the streamed index answers the flagship query
rank-identically to the batch-built one (streamed == batch results,
the invariant the stream gates pin at smaller scale).

Usage::

    python BENCH/stream_probe.py [--n-docs 30000] [--batches 6] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=30000)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ir_spark.fixtures import REFERENCE_QUERIES, generate_pages, \
        pages_to_parquet
    from ir_spark.operators.segment_query import SegmentIndex, \
        search_segments
    from ir_spark.operators.segments import build_segment_index
    from ir_spark.session import get_spark
    from ir_spark.streaming.incremental import update_segment_index

    spark = get_spark("stream_probe", cpus=args.cpus)
    work = tempfile.mkdtemp()
    src = os.path.join(work, "pages.parquet")
    pages_to_parquet(generate_pages(args.n_docs, seed=42), src)
    pages = spark.read.parquet(src).select("url", "text")

    # warm-up
    warm = os.path.join(work, "warm")
    build_segment_index(spark, pages.limit(2000), warm)
    shutil.rmtree(warm, ignore_errors=True)

    out: dict = {"n_docs": args.n_docs, "batches": args.batches,
                 "cpus": args.cpus}

    # batch reference build
    bidx = os.path.join(work, "batch_idx")
    t0 = time.time()
    build_segment_index(spark, pages, bidx)
    batch_sec = time.time() - t0
    out["batch_sec"] = round(batch_sec, 2)
    out["batch_docs_per_sec"] = round(args.n_docs / batch_sec)

    # streamed ingest: sequential micro-batches (url-range split)
    sidx_dir = os.path.join(work, "stream_idx")
    splits = pages.withColumn(
        "_b", F.pmod(F.xxhash64("url"), F.lit(args.batches)))
    t0 = time.time()
    for b in range(args.batches):
        update_segment_index(
            spark, splits.where(F.col("_b") == b).drop("_b"),
            sidx_dir, batch_tag=f"b{b}")
    stream_sec = time.time() - t0
    out["stream_sec"] = round(stream_sec, 2)
    out["streamed_docs_per_sec"] = round(args.n_docs / stream_sec)
    out["stream_over_batch"] = round(stream_sec / batch_sec, 3)

    # streamed == batch on the flagship query (rank-identical)
    q = REFERENCE_QUERIES[0]
    a = [(int(r["doc_id"]), round(float(r["score"]), 9)) for r in
         search_segments(spark, SegmentIndex.load(spark, bidx), q,
                         k=10, mode="bm25").collect()]
    # doc ids differ between the two indexes (per-batch id spaces) —
    # compare by URL
    def _urls(idx_dir, rows):
        from ir_spark.operators.segments import index_paths

        dm = spark.read.parquet(index_paths(idx_dir)["doc_map"])
        m = {int(r["doc_id"]): r["url"] for r in dm.filter(
            F.col("doc_id").isin([d for d, _ in rows])).collect()}
        return [(m[d], s) for d, s in rows]

    b_rows = _urls(bidx, a)
    s_raw = [(int(r["doc_id"]), round(float(r["score"]), 9)) for r in
             search_segments(spark, SegmentIndex.load(spark, sidx_dir), q,
                             k=10, mode="bm25").collect()]
    s_rows = _urls(sidx_dir, s_raw)
    out["streamed_equals_batch"] = int(b_rows == s_rows)

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
