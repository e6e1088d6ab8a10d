#!/usr/bin/env python
"""Head-term skew probe (north rule: "salted repartitionByRange on
term to defuse head-term skew" / skew handled explicitly).

This engine defuses Zipf-head skew STRUCTURALLY: postings group on
(term, run) with run = floor(doc_id / range_width), so a term that
appears in EVERY document still lands on ceil(n_docs / range_width)
different reducer keys — no single task ever owns a head term's full
posting list, before AQE even looks at it (PLANS.md §1).

The probe measures that claim: build the segment index over

  (a) the normal synthetic corpus, and
  (b) the same corpus with a pathological head term injected as every
      3rd token of every document (~33% of the whole token stream —
      far worse than any real Zipf head),

at the same parallelism, and report throughput in TOKENS/sec (the
skewed corpus is ~1.5x larger, so docs/sec alone would under-credit
it).  A structural-skew failure would show up as the skewed build
collapsing to single-task time; holding throughput within a small
factor is the pass.

Usage::

    python BENCH/skew_probe.py [--n-docs 30000] [--cpus 32]

Prints one JSON line and (with --write-baseline) appends nothing —
numbers are quoted manually in BENCH/BASELINE.md.
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
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ir_spark.fixtures import generate_pages, pages_to_parquet
    from ir_spark.operators.segments import build_segment_index
    from ir_spark.session import get_spark

    spark = get_spark("skew_probe", cpus=args.cpus)
    src = os.path.join(tempfile.mkdtemp(), "pages.parquet")
    pages_to_parquet(generate_pages(args.n_docs, seed=42), src)
    base = spark.read.parquet(src).select("url", "text")
    # every 3rd token becomes the head term -> ~33% of the stream
    skewed = base.withColumn(
        "text",
        F.expr("array_join(transform(split(text, ' '), (w, i) -> "
               "CASE WHEN i % 3 = 2 THEN 'zipfhead' ELSE w END), ' ')"))

    # warm-up build (JVM JIT + codegen caches) so the first timed
    # level isn't penalized — same policy as BENCH/run_scaling.py
    warm = tempfile.mkdtemp()
    build_segment_index(spark, base.limit(2000), warm)
    shutil.rmtree(warm, ignore_errors=True)

    out: dict = {"n_docs": args.n_docs, "cpus": args.cpus}
    for tag, df in (("uniform", base), ("skewed", skewed)):
        n_tokens = int(df.select(
            F.sum(F.size(F.split("text", " ")))).collect()[0][0])
        idx = tempfile.mkdtemp()
        t0 = time.time()
        build_segment_index(spark, df, idx)
        sec = time.time() - t0
        out[f"{tag}_sec"] = round(sec, 2)
        out[f"{tag}_tokens"] = n_tokens
        out[f"{tag}_tokens_per_sec"] = round(n_tokens / sec)
        if tag == "skewed":
            # query-side skew: the head term's posting list spans EVERY
            # run — top-k over it must stay interactive (strategy=auto)
            from ir_spark.operators.segment_query import (SegmentIndex,
                                                          search_segments)

            sidx = SegmentIndex.load(spark, idx)
            t0 = time.time()
            rows = search_segments(spark, sidx, "zipfhead", k=10,
                                   mode="bm25").collect()
            out["head_term_query_sec"] = round(time.time() - t0, 3)
            out["head_term_hits"] = len(rows)
        shutil.rmtree(idx, ignore_errors=True)
    out["skew_throughput_ratio"] = round(
        out["skewed_tokens_per_sec"] / out["uniform_tokens_per_sec"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
