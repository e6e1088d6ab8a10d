#!/usr/bin/env python
"""spark-submit entry point: merge independently-built segment indexes
into one (operators/merge.py — the distributed k-way merge of partial
indexes; e.g. per-crawl or per-datacenter builds combined into the
global serving index).

Usage::

    spark-submit --py-files dist/ir_spark.zip jobs/merge_index.py \
        --sources /data/index_a /data/index_b [...] \
        --out /data/index_merged \
        [--local-cpus N]

Sources must share n_buckets / range_width / stem (checked).  Prints
one JSON line with the merge metrics (per-source doc-id offsets,
totals, wall time).
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sources", nargs="+", required=True,
                    help="two or more completed index directories")
    ap.add_argument("--out", required=True,
                    help="destination directory for the merged index")
    ap.add_argument("--local-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from ir_spark.operators.merge import merge_indexes

    if args.local_cpus is not None:
        from ir_spark.session import get_spark

        spark = get_spark("ir_spark_merge_index", cpus=args.local_cpus)
    else:
        spark = (
            SparkSession.builder.appName("ir_spark_merge_index")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )

    metrics = merge_indexes(spark, args.sources, args.out)
    print(json.dumps({"out": args.out, "metrics": metrics}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
