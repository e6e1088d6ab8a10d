"""IVF cells x replicas frontier on a CLUSTERED fixture (r4 verdict #3).

The per-round bench measures IVF recall on the sf0.1 synthetic
embeddings, which are uniform random — the worst case for any
partition-pruned ANN (no cluster structure to exploit), where r4's
n_cells=16 / replicas=5 operating point read 88% of rows for its 0.97
recall.  Real web/document embeddings are strongly clustered; this
probe measures the SAME machinery (`build_ivf_index` /
`ivf_index_topk`, unchanged) on a seeded Gaussian-mixture fixture to
show where the cells/replicas knobs land when there is structure to
find, and that n_cells must scale with N (16 cells over 20k vectors is
a toy; 64-256 is the sqrt(N)-ish range).

Fixture: 20,000 vectors, dim 32, drawn from 64 isotropic Gaussian
components (seeded center draw on the unit sphere scaled x4, unit
component std), queries = 20 HELD-OUT draws from the same mixture
(different seed).  Everything is deterministic.

Sweep: n_cells in {64, 256} x replicas in {1, 2, 3} at fixed
n_probe=8.  Per point: recall@10 vs exact brute-force cosine,
rows_read_frac (rows scanned in the probed partitions, BEFORE the
multi-assignment dedupe — the honest I/O cost, counting replication),
distinct_frac (unique vectors the exact scorer scores, after dedupe),
and build wall.  Output appends to BENCH/ann_frontier.json keyed by
the fixture shape; bench.py merges the artifact into detail.json.

Run:  python BENCH/ann_frontier.py [--n 20000] [--out BENCH/ann_frontier.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

N_COMPONENTS = 64
DIM = 32
N_QUERIES = 20
K = 10
N_PROBE = 8


def make_fixture(n: int, seed: int = 7):
    """Seeded Gaussian mixture: centers on a radius-4 sphere, unit
    component std — separated enough to be clustered, overlapping
    enough that cell boundaries matter (the regime replicas exist
    for)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((N_COMPONENTS, DIM))
    centers *= 4.0 / np.linalg.norm(centers, axis=1, keepdims=True)
    comp = rng.integers(0, N_COMPONENTS, size=n)
    vecs = centers[comp] + rng.standard_normal((n, DIM))
    qrng = np.random.default_rng(seed + 1)
    qcomp = qrng.integers(0, N_COMPONENTS, size=N_QUERIES)
    qvecs = centers[qcomp] + qrng.standard_normal((N_QUERIES, DIM))
    return vecs.astype(np.float32), qvecs.astype(np.float64)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--out", default=os.path.join(HERE, "ann_frontier.json"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ir_spark.operators.similarity import (build_ivf_index, cosine_topk,
                                               ivf_index_topk,
                                               ivf_probe_cells)

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("ann_frontier")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    vecs, qvecs = make_fixture(args.n)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).repartition(args.cpus).persist()
    n_vec = emb.count()

    # exact ground truth once per query (brute-force cosine)
    truths = [
        {r.vec_id for r in cosine_topk(emb, [float(x) for x in q], k=K)
         .collect()}
        for q in qvecs
    ]

    points = []
    # (n_cells, replicas, n_probe) sweep: the {64,256}x{1,2,3} grid at
    # fixed n_probe=8, plus the equal-rows-fraction comparison point
    # (256 cells probed 32-wide reads ~the same fraction as 64 probed
    # 8-wide — finer cells should win at matched I/O, the n_cells
    # ~ sqrt(N) argument)
    grid = [(c, r, N_PROBE) for c in (64, 256) for r in (1, 2, 3)]
    grid.append((256, 1, 32))
    for n_cells, replicas, n_probe in grid:
        d = tempfile.mkdtemp(prefix="ann_frontier_")
        t0 = time.time()
        build_ivf_index(emb, d, n_cells=n_cells, max_iter=10,
                        seed=42, replicas=replicas)
        build_sec = time.time() - t0
        store = spark.read.parquet(os.path.join(d, "vectors"))
        cents = (spark.read.parquet(os.path.join(d, "centroids"))
                 .orderBy("cell").collect())
        tot_recall = 0.0
        tot_rows = 0.0
        tot_distinct = 0.0
        for q, truth in zip(qvecs, truths):
            got = {r.vec_id for r in ivf_index_topk(
                spark, d, [float(x) for x in q], k=K,
                n_probe=n_probe).collect()}
            tot_recall += len(truth & got) / K
            # the SAME selection the query path uses — measured cost
            # and measured recall stay coupled by sharing it
            probes = ivf_probe_cells(cents, [float(x) for x in q],
                                     n_probe)
            sl = store.filter(F.col("cell").isin(probes))
            counts = sl.agg(
                F.count(F.lit(1)).alias("rows"),
                F.countDistinct("vec_id").alias("uniq")).head()
            tot_rows += counts["rows"] / n_vec
            tot_distinct += counts["uniq"] / n_vec
        points.append({
            "n_cells": n_cells,
            "replicas": replicas,
            "n_probe": n_probe,
            "recall_at10": round(tot_recall / len(qvecs), 4),
            "rows_read_frac": round(tot_rows / len(qvecs), 4),
            "distinct_frac": round(tot_distinct / len(qvecs), 4),
            "build_sec": round(build_sec, 2),
            "storage_x": replicas,
        })
        print(json.dumps(points[-1]))
        shutil.rmtree(d, ignore_errors=True)

    out = {
        "fixture": {"n_vectors": int(n_vec), "dim": DIM,
                    "n_components": N_COMPONENTS, "n_queries": N_QUERIES,
                    "seed": 7, "kind": "gaussian_mixture"},
        "points": points,
    }
    # append-not-overwrite: keyed by fixture size, newest wins per key
    existing = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as fh:
                existing = json.load(fh)
            if "points" in existing:  # legacy single-run shape
                existing = {str(existing.get("fixture", {})
                                .get("n_vectors", "run")): existing}
        except (OSError, json.JSONDecodeError):
            existing = {}
    existing[str(int(n_vec))] = out
    with open(args.out, "w") as fh:
        json.dump(existing, fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
