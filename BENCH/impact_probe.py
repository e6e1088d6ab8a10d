#!/usr/bin/env python
"""Impact-ordered SAAT probe (operators/impact.py, Anh & Moffat 2006).

Measures the three evaluation strategies over the SAME corpus and the
20-query reference set at equal parallelism:

  (a) exact BM25 over the DataFrame index (float scoring joins),
  (b) unpruned impact SAAT (integer impact sums — the quantized
      ranking the gates verify),
  (c) certified-pruned impact SAAT (candidates from impact >= cutoff
      postings, full-list rescore, lossless-acceptance certificate),

and reports per-strategy mean query seconds, the accepted cutoffs
(pruning effectiveness), and top-10 overlap of the quantized ranking
vs exact BM25 (the fidelity the levels knob buys).  Build-side cost of
the quantization pass is reported separately — it is a one-time index
cost, not a per-query one.

Usage::

    python BENCH/impact_probe.py [--n-docs 20000] [--cpus 32]
                                 [--levels 64]

Prints one JSON line; numbers are quoted manually in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=20000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--levels", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from ir_spark.fixtures import REFERENCE_QUERIES, generate_pages
    from ir_spark.operators.build import build_dataframe_index
    from ir_spark.operators.impact import (
        build_impact_index,
        search_impacts,
        search_impacts_pruned,
    )
    from ir_spark.operators.query import search
    from ir_spark.session import get_spark

    spark = get_spark("impact_probe", cpus=args.cpus)
    pages = generate_pages(args.n_docs, seed=42)
    docs = spark.createDataFrame(
        [(i, p.text) for i, p in enumerate(pages)],
        "doc_id long, text string")
    idx = build_dataframe_index(docs)

    t0 = time.time()
    imp = build_impact_index(idx, levels=args.levels)
    imp.impacts.persist().count()
    if imp.hist is not None:
        imp.hist.persist().count()
    build_quantize_sec = time.time() - t0

    queries = REFERENCE_QUERIES[:20]

    def timed(fn):
        per = []
        for q in queries:
            t = time.time()
            fn(q)
            per.append(time.time() - t)
        return sum(per) / len(per)

    exact_rank: dict[str, list[int]] = {}
    saat_rank: dict[str, list[int]] = {}

    exact_sec = timed(lambda q: exact_rank.__setitem__(
        q, [r.doc_id for r in search(spark, idx, q, k=args.k).collect()]))
    saat_sec = timed(lambda q: saat_rank.__setitem__(
        q, [r.doc_id
            for r in search_impacts(spark, imp, idx, q, k=args.k).collect()]))

    cutoffs = []

    def run_pruned(q):
        df, c = search_impacts_pruned(spark, imp, idx, q, k=args.k)
        rows = df.collect()
        cutoffs.append(c)
        assert [r.doc_id for r in rows] == saat_rank[q], \
            f"pruned ranking diverged on {q!r}"
        return rows

    pruned_sec = timed(run_pruned)

    overlaps = [len(set(saat_rank[q]) & set(exact_rank[q])) / args.k
                for q in queries]

    out = {
        "probe": "impact_saat",
        "n_docs": args.n_docs,
        "cpus": args.cpus,
        "levels": args.levels,
        "build_quantize_sec": round(build_quantize_sec, 3),
        "exact_bm25_mean_sec": round(exact_sec, 4),
        "impact_saat_mean_sec": round(saat_sec, 4),
        "impact_pruned_mean_sec": round(pruned_sec, 4),
        "pruned_rank_identical": 1,
        "accepted_cutoffs": sorted(cutoffs, reverse=True),
        "mean_overlap_at_k_vs_exact": round(sum(overlaps) / len(overlaps), 4),
    }
    imp.impacts.unpersist()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
