#!/usr/bin/env python
"""Connected-components stress at DIAMETER: the judge-requested
evidence that the star algorithm's round count stays ~log n where
min-label propagation needs O(diameter) rounds.

Graphs (deterministic, no external data):
  - path-100k: nodes 0..n-1, edges (i, i+1) — diameter n-1, the
    worst case for label propagation and the shape long transitive
    near-dup chains (A~B~C~...) degenerate into at web scale;
  - powerlaw-100k: random-recursive-tree attachment, node i>0 joins
    xxhash-chosen earlier node — power-law-ish in-degree, O(log n)
    diameter, the shape real near-dup clusters usually take.

Measured per (graph, algorithm): rounds + wall seconds, plus the
correctness assertion that every node lands in ONE component with
cluster_id = min node id.  Min-label runs on path prefixes (2k / 8k)
to show the O(diameter) round growth directly instead of burning
100k rounds.

Usage::

    python BENCH/cc_probe.py [--n 100000] [--cpus 32]
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
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ir_spark.operators.dedup import connected_components
    from ir_spark.session import get_spark

    spark = get_spark("cc_probe", cpus=args.cpus)
    n = args.n
    out: dict = {"n": n, "cpus": args.cpus, "runs": []}

    def path_edges(m: int):
        return spark.range(m - 1).select(
            F.col("id").alias("a"), (F.col("id") + 1).alias("b"))

    def powerlaw_edges(m: int):
        # node i attaches to a deterministic pseudo-random earlier
        # node: random recursive tree (power-law-ish degrees, ~log n
        # diameter)
        return spark.range(1, m).select(
            F.col("id").alias("a"),
            F.pmod(F.abs(F.xxhash64(F.col("id"))), F.col("id"))
            .alias("b"))

    def run(name: str, edges, algorithm: str, max_iter: int,
            expect_nodes: int) -> None:
        stats: dict = {}
        t0 = time.time()
        cc = connected_components(edges, max_iter=max_iter,
                                  algorithm=algorithm, stats=stats)
        agg = cc.agg(
            F.count(F.lit(1)).alias("nodes"),
            F.countDistinct("cluster_id").alias("comps"),
            F.min("cluster_id").alias("mincid"),
            F.sum("is_canonical").alias("ncanon")).collect()[0]
        wall = round(time.time() - t0, 2)
        rec = {"graph": name, "algorithm": algorithm,
               "rounds": stats.get("rounds"), "wall_sec": wall,
               "nodes": int(agg["nodes"]),
               "components": int(agg["comps"]),
               "correct": int(agg["nodes"] == expect_nodes
                              and agg["comps"] == 1
                              and agg["mincid"] == 0
                              and agg["ncanon"] == 1)}
        out["runs"].append(rec)
        print(json.dumps(rec), flush=True)

    # star at full size on both shapes — the scale path
    run(f"path-{n}", path_edges(n), "star", 60, n)
    run(f"powerlaw-{n}", powerlaw_edges(n), "star", 60, n)
    # minlabel: O(log n) on the low-diameter graph...
    run(f"powerlaw-{n}", powerlaw_edges(n), "minlabel", 60, n)
    # ...but O(diameter) on paths — shown on growing prefixes (kept
    # small: rounds == path length, so 800 nodes already costs 800
    # sequential Spark rounds; the 4x node growth -> 4x rounds/wall
    # is the linear law the star rows above escape)
    for m in (200, 800):
        run(f"path-{m}", path_edges(m), "minlabel", m + 2, m)

    dest = os.path.join(REPO, "BENCH", "cc_probe.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"wrote": dest}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
