#!/usr/bin/env python
"""Federated-serving probe: query cost of S shards vs one monolithic
index on the same corpus.

`operators/shards.py::search_sharded` is the scale-out serving path —
S document-partitioned shard indexes, a per-query global-statistics
exchange, k-per-shard gather.  This probe measures what federation
costs at query time on one box (worst case for the protocol: every
shard's Spark jobs share the same cores, so the S per-shard subplans
serialize far more than they would on S real executor groups):

  - mono_query_mean_sec: per-query mean over the reference query set
    against the single full-corpus index;
  - sharded_query_mean_sec: the same queries via search_sharded over
    S shards (fresh SegmentIndex handles; the per-shard dictionary
    memo warms on the first query exactly as a long-lived serving
    process would);
  - sharded_over_mono: the ratio — the federation overhead (S stats
    probes + S bucket-pruned subplans + the S*k gather vs 1 of each);
  - rank_identical: 1 iff every query's (url, micro-score) ranking is
    identical between the two paths — the lossless-gather invariant
    at probe scale.

Usage::

    python BENCH/shard_probe.py [--n-docs 40000] [--shards 4]
                                [--cpus 32] [--queries 10] [--k 10]
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
    ap.add_argument("--n-docs", type=int, default=40000)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--queries", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ir_spark.fixtures import REFERENCE_QUERIES, generate_pages, \
        pages_to_parquet
    from ir_spark.operators.segment_query import SegmentIndex, \
        search_segments
    from ir_spark.operators.segments import build_segment_index, index_paths
    from ir_spark.operators.shards import search_sharded
    from ir_spark.session import get_spark

    spark = get_spark("shard_probe", cpus=args.cpus)
    work = tempfile.mkdtemp()
    src = os.path.join(work, "pages.parquet")
    pages_to_parquet(generate_pages(args.n_docs, seed=42), src)
    pages = spark.read.parquet(src).select("url", "text")
    qset = REFERENCE_QUERIES[: args.queries]

    out: dict = {"n_docs": args.n_docs, "n_shards": args.shards,
                 "cpus": args.cpus, "n_queries": len(qset), "k": args.k}

    # one monolithic build + S shard builds over a url-hash split
    mono_dir = os.path.join(work, "mono")
    build_segment_index(spark, pages, mono_dir, norms=False)
    split = pages.withColumn(
        "_s", F.pmod(F.xxhash64("url"), F.lit(args.shards)))
    shard_dirs = []
    for i in range(args.shards):
        d = os.path.join(work, f"shard{i}")
        build_segment_index(
            spark, split.where(F.col("_s") == i).drop("_s"), d,
            source=f"s{i}", segment_groups=1, norms=False)
        shard_dirs.append(d)

    mono = SegmentIndex.load(spark, mono_dir)
    shards = [SegmentIndex.load(spark, d) for d in shard_dirs]
    mono_map = spark.read.parquet(index_paths(mono_dir)["doc_map"])

    def mono_urls(q):
        res = search_segments(spark, mono, q, k=args.k, mode="bm25")
        return [(r["url"], round(r["score"] * 1e6)) for r in
                res.join(mono_map, "doc_id").select("url", "score")
                .orderBy(F.desc("score"), F.asc("url")).collect()]

    # warm both paths once (dictionary memos + Python workers), untimed
    mono_urls(qset[0])
    search_sharded(spark, shards, qset[0], k=args.k).collect()

    t0 = time.time()
    mono_res = [mono_urls(q) for q in qset]
    mono_sec = time.time() - t0
    out["mono_query_mean_sec"] = round(mono_sec / len(qset), 4)

    t0 = time.time()
    sh_res = [
        [(r["url"], round(r["score"] * 1e6)) for r in
         search_sharded(spark, shards, q, k=args.k).collect()]
        for q in qset]
    sh_sec = time.time() - t0
    out["sharded_query_mean_sec"] = round(sh_sec / len(qset), 4)
    out["sharded_over_mono"] = round(sh_sec / mono_sec, 3)
    out["rank_identical"] = int(mono_res == sh_res)

    # --- pruned arm (search_sharded_pruned): same shards PLUS one
    # disjoint-vocabulary shard (the "other-language crawl batch") —
    # uniform url-hash shards give the bounds nothing to separate
    # (honest negative: expect ~all original shards searched), but the
    # disjoint batch must be skipped on every query without touching
    # its postings.  Results must stay rank-identical throughout.
    from ir_spark.operators.shards import search_sharded_pruned

    xen_rows = [(f"https://xen.example/d{i}",
                 " ".join(f"xq{(i * 7 + j) % 97}" for j in range(40)))
                for i in range(max(100, args.n_docs // args.shards))]
    xen_src = spark.createDataFrame(xen_rows, "url string, text string")
    xen_dir = os.path.join(work, "shard_xen")
    build_segment_index(spark, xen_src, xen_dir, source="xen",
                        segment_groups=1, norms=False)
    shards_x = shards + [SegmentIndex.load(spark, xen_dir)]
    search_sharded_pruned(spark, shards_x, qset[0], k=args.k).collect()

    # the pruning invariant is identity to the UNpruned federation over
    # the SAME shard set (adding the xen shard changes global N, hence
    # every idf and micro-score, so comparing against the 4-shard mono
    # results would fail on stats, not on pruning)
    t0 = time.time()
    shx_res = [
        [(r["url"], round(r["score"] * 1e6)) for r in
         search_sharded(spark, shards_x, q, k=args.k).collect()]
        for q in qset]
    shx_sec = time.time() - t0

    t0 = time.time()
    pr_res, searched_counts, xen_skips = [], [], 0
    for q in qset:
        info: dict = {}
        pr_res.append(
            [(r["url"], round(r["score"] * 1e6)) for r in
             search_sharded_pruned(spark, shards_x, q, k=args.k,
                                   info=info).collect()])
        searched_counts.append(len(info["searched"]))
        xen_skips += int(len(shards_x) - 1 in info["skipped"])
    pr_sec = time.time() - t0
    out["unpruned5_query_mean_sec"] = round(shx_sec / len(qset), 4)
    out["pruned_query_mean_sec"] = round(pr_sec / len(qset), 4)
    out["pruned_over_unpruned"] = round(pr_sec / shx_sec, 3)
    out["pruned_shards_searched_mean"] = round(
        sum(searched_counts) / len(qset), 2)
    out["pruned_n_shards_total"] = len(shards_x)
    out["pruned_disjoint_shard_skipped"] = f"{xen_skips}/{len(qset)}"
    out["pruned_rank_identical"] = int(shx_res == pr_res)

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
