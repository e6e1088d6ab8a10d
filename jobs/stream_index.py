#!/usr/bin/env python
"""spark-submit entry point: continuously index pages dropped into a
directory (Structured Streaming; the incremental-maintenance path).

Usage::

    spark-submit --py-files dist/ir_spark.zip jobs/stream_index.py \
        --source /data/incoming_pages      \  # parquet files appear here
        --index-dir /data/index            \
        [--checkpoint-dir /data/ckpt] [--stem] \
        [--continuous]                        # default: availableNow catch-up
        [--compact]                           # merge per-batch segment groups

Default mode processes everything currently in --source exactly once
(availableNow) and exits — suitable for cron-style incremental
refresh.  --continuous keeps the stream running until killed; the
checkpoint + per-batch manifests make restarts exactly-once either
way (see ir_spark/streaming/incremental.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True,
                    help="directory watched for new parquet page files")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--stem", action="store_true")
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--compact", action="store_true",
                    help="after catch-up, rewrite accumulated per-batch "
                         "segment groups into one consolidated group "
                         "(Lucene-merge analogue; results identical)")
    ap.add_argument("--local-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from ir_spark.streaming.incremental import stream_index

    if args.local_cpus is not None:
        from ir_spark.session import get_spark

        spark = get_spark("ir_spark_stream_index", cpus=args.local_cpus)
    else:
        spark = (
            SparkSession.builder.appName("ir_spark_stream_index")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )

    query = stream_index(
        spark, args.source, args.index_dir,
        checkpoint_dir=args.checkpoint_dir, stem=args.stem,
        available_now=not args.continuous,
    )
    if args.continuous:
        query.awaitTermination()
    out = {"index_dir": args.index_dir}
    if args.compact:
        from ir_spark.operators.segments import compact_segments

        out["compaction"] = compact_segments(spark, args.index_dir)
    from ir_spark.sources.storage import read_manifests

    out["stats"] = read_manifests(args.index_dir).get(
        "stats", {}).get("metrics", {})
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
