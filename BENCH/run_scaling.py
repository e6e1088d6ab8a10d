#!/usr/bin/env python
"""Two-parallelism scaling experiment (north rule: throughput scaling
efficiency >= 0.8 from N to 4N).

The sandbox has no multi-node cluster, so — per the driver instruction —
the two "cluster sizes" are two parallelism levels of the SAME job on
the SAME input: local[8] vs local[32] on the 32-core box.  Each level
runs in its own subprocess (fresh JVM) via BENCH/scale_worker.py.

Efficiency = (docs_per_sec_4N / docs_per_sec_N) / (4N / N).

Usage::

    python BENCH/run_scaling.py [--n-docs 60000] [--low 8] [--high 32] \
        [--out BENCH/scaling.json]

Writes the JSON result and refreshes the measured table inside
BENCH/BASELINE.md between the AUTOGEN markers.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK_BEGIN = "<!-- AUTOGEN:scaling:begin -->"
MARK_END = "<!-- AUTOGEN:scaling:end -->"


def ensure_corpus(n_docs: int) -> str:
    path = f"/tmp/ir_spark_scale/pages_{n_docs}.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    sys.path.insert(0, REPO)
    from ir_spark.fixtures import generate_pages, pages_to_parquet

    t0 = time.time()
    pages = generate_pages(n_docs, seed=42)
    pages_to_parquet(pages, path)
    print(f"generated {n_docs} pages in {time.time()-t0:.1f}s -> {path}",
          file=sys.stderr)
    return path


def run_level(cpus: int, corpus: str, groups: int, trials: int) -> dict:
    """Run ``trials`` fresh-JVM builds; report the best-throughput trial
    (least-noise estimate of level capability — single trials on a
    shared box swing +/-20% from JIT/page-cache/thermal noise)."""
    results = []
    for t in range(trials):
        index_dir = f"/tmp/ir_spark_scale/index_{cpus}"
        cmd = [sys.executable, os.path.join(REPO, "BENCH", "scale_worker.py"),
               "--cpus", str(cpus), "--input", corpus,
               "--index-dir", index_dir, "--segment-groups", str(groups)]
        if t < trials - 1:
            cmd.append("--skip-queries")  # queries timed once per level
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        if proc.returncode != 0:
            raise RuntimeError(f"worker cpus={cpus} failed:\n{proc.stderr[-3000:]}")
        r = json.loads(proc.stdout.strip().splitlines()[-1])
        print(json.dumps(r), file=sys.stderr)
        results.append(r)
    best = max(results, key=lambda r: r["docs_per_sec"])
    # query latencies come from the last trial (the only one that ran them)
    for k in ("query_p50_sec", "query_p95_sec", "query_mean_sec", "batch_qps"):
        if k in results[-1]:
            best[k] = results[-1][k]
    best["all_trials_docs_per_sec"] = [r["docs_per_sec"] for r in results]
    return best


def update_baseline_md(result: dict) -> None:
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    lo, hi = result["low"], result["high"]
    table = f"""{MARK_BEGIN}
Measured {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())} — same job,
same input ({result['n_docs']:,} synthetic Common-Crawl-style pages,
seed=42), one fresh local[N] JVM per level (sandbox stand-in for N vs 4N
executors, per driver instruction).

| parallelism | build sec | docs/sec | query p50 | query p95 | batch q/s |
|---|---|---|---|---|---|
| local[{lo['cpus']}] (N) | {lo['build_sec']} | {lo['docs_per_sec']} | {lo.get('query_p50_sec','-')} | {lo.get('query_p95_sec','-')} | {lo.get('batch_qps','-')} |
| local[{hi['cpus']}] (4N) | {hi['build_sec']} | {hi['docs_per_sec']} | {hi.get('query_p50_sec','-')} | {hi.get('query_p95_sec','-')} | {hi.get('batch_qps','-')} |

**Scaling efficiency (N -> 4N) = ({hi['docs_per_sec']} / {lo['docs_per_sec']}) / 4
= {result['scaling_efficiency']:.3f}** (north-rule target: >= 0.8 — {'PASS' if result['scaling_efficiency'] >= 0.8 else 'FAIL'}).
{MARK_END}"""
    if os.path.exists(path):
        content = open(path).read()
        if MARK_BEGIN in content:
            pre = content.split(MARK_BEGIN)[0]
            post = content.split(MARK_END)[1] if MARK_END in content else "\n"
            content = pre + table + post
        else:
            content = content.rstrip() + "\n\n## Measured scaling\n\n" + table + "\n"
    else:
        content = "# BENCH baseline — two-parallelism scaling evidence\n\n" + table + "\n"
    with open(path, "w") as fh:
        fh.write(content)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=100000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--segment-groups", type=int, default=1)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "scaling.json"))
    args = ap.parse_args()

    corpus = ensure_corpus(args.n_docs)
    low = run_level(args.low, corpus, args.segment_groups, args.trials)
    high = run_level(args.high, corpus, args.segment_groups, args.trials)

    eff = (high["docs_per_sec"] / low["docs_per_sec"]) / (args.high / args.low)
    result = {
        "n_docs": args.n_docs,
        "low": low,
        "high": high,
        "parallelism_ratio": args.high / args.low,
        "scaling_efficiency": round(eff, 4),
        "pass": eff >= 0.8,
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=2)
    update_baseline_md(result)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
