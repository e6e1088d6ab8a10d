#!/usr/bin/env python
r"""spark-submit entry point: crawl-control plane.

Turns a candidate-url table plus per-host robots.txt into a polite
fetch plan, and reports per-url revisit-change statistics when a
capture history is supplied::

    python jobs/package_pyfiles.py
    spark-submit --py-files dist/ir_spark.zip jobs/crawl_plan.py \
        --urls   /data/frontier_candidates  \  # (url [, priority])
        --robots /data/robots               \  # (host, robots_txt)
        --output /data/fetch_plan           \
        [--captures /data/capture_history]  \  # (url, ts, content_md5)
        [--delay-ms 1000]

Stages (operators in ir_spark/operators/crawl.py — gates
robots_rules / robots_allowed / crawl_frontier / revisit_change_rate):

  1. parse_robots():  per-host ``*``-group Allow/Disallow prefix rules
  2. apply_robots():  longest-prefix-match fetch permission per url
  3. crawl_frontier(): politeness waves over the ALLOWED urls
     (one fetch per host per wave; eta spaced by --delay-ms)
  4. revisit_stats(): change rate per url from the capture history
     (joined into the plan as recrawl-priority evidence; optional)

Output: parquet fetch plan (url, host, allowed, matched_path,
host_rank, eta_ms [, n_captures, n_changes, change_rate_micro]);
the report JSON (one line on stdout) records url/host/blocked counts.
"""

from __future__ import annotations

import argparse
import json
import sys


def _get_spark(app: str, local_cpus: int | None):
    from pyspark.sql import SparkSession

    if local_cpus is not None:
        from ir_spark.session import get_spark

        return get_spark(app, cpus=local_cpus)
    builder = (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    return builder.getOrCreate()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--urls", required=True,
                    help="candidate urls table: (url [, priority])")
    ap.add_argument("--robots", required=True,
                    help="robots table: (host, robots_txt)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--captures", default=None,
                    help="capture history: (url, ts, content_md5)")
    ap.add_argument("--input-format", default="parquet")
    ap.add_argument("--delay-ms", type=int, default=1000)
    ap.add_argument("--local-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from ir_spark.operators.crawl import (apply_robots, crawl_frontier,
                                          parse_robots, revisit_stats)

    spark = _get_spark("crawl_plan", args.local_cpus)
    urls = spark.read.format(args.input_format).load(args.urls)
    if "priority" not in urls.columns:
        urls = urls.withColumn("priority", F.lit(0).cast("long"))
    robots = spark.read.format(args.input_format).load(args.robots)

    rules = parse_robots(robots)
    checked = apply_robots(urls, rules)
    allowed = checked.where(F.col("allowed") == 1)
    plan = crawl_frontier(allowed, delay_ms=args.delay_ms)
    blocked = (checked.where(F.col("allowed") == 0)
               .withColumn("host", F.lit(None).cast("string"))
               .withColumn("host_rank", F.lit(None).cast("long"))
               .withColumn("eta_ms", F.lit(None).cast("long")))
    out = plan.unionByName(blocked.select(*plan.columns))
    if args.captures:
        caps = spark.read.format(args.input_format).load(args.captures)
        out = out.join(revisit_stats(caps), "url", "left")
    out.write.mode("overwrite").parquet(args.output)

    written = spark.read.parquet(args.output)
    n_urls = written.count()
    n_blocked = written.where(F.col("allowed") == 0).count()
    n_hosts = int(written.where(F.col("allowed") == 1)
                  .select("host").distinct().count())
    report = {
        "job": "crawl_plan",
        "n_urls": n_urls,
        "n_allowed": n_urls - n_blocked,
        "n_blocked": n_blocked,
        "n_hosts": n_hosts,
        "output": args.output,
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
