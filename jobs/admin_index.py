#!/usr/bin/env python
"""spark-submit entry point: segment-index administration.

Subcommands (north-rule deployment path, one JSON line per action)::

    spark-submit --py-files dist/ir_spark.zip jobs/admin_index.py \
        delete   --index-dir DIR --urls urls.txt        # tombstone urls
    ... admin_index.py compact  --index-dir DIR [--keep-deletes]
    ... admin_index.py maintain --index-dir DIR \
        [--segs-per-tier N] [--max-merge-at-once N] [--floor-kb N]
    ... admin_index.py verify   --index-dir DIR        # integrity fsck
    ... admin_index.py snapshots --index-dir DIR        # time-travel log
    ... admin_index.py stats    --index-dir DIR         # committed stats

``delete`` appends tombstones (results exclude the docs immediately;
collection stats keep pre-delete values until compaction — Lucene
maxDoc/numDocs semantics).  ``compact`` rewrites all segment groups
into one and, unless ``--keep-deletes``, physically purges tombstoned
docs and rebuilds dictionary/stats/norms from the survivors.
``maintain`` runs ONE tiered-merge pass (segments.py::
maintain_segments — Lucene TieredMergePolicy shape): merges only
overflowing size tiers, so the cost is bounded by the small fresh
groups, never the index; the cron-friendly alternative to ``compact``
for a continuously-appending index.  ``snapshots`` lists the per-batch
snapshot manifests usable with ``query_index.py --as-of-grp``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_del = sub.add_parser("delete", help="tombstone urls")
    p_del.add_argument("--index-dir", required=True)
    p_del.add_argument("--urls", required=True,
                       help="text file, one url per line")
    p_del.add_argument("--local-cpus", type=int, default=None, help="pin a local[N] master; omitted: uses the ambient spark-submit conf, or local[8] when none is set")

    p_cmp = sub.add_parser("compact", help="merge groups / apply deletes")
    p_cmp.add_argument("--index-dir", required=True)
    p_cmp.add_argument("--keep-deletes", action="store_true",
                       help="consolidate groups but leave tombstones live")
    p_cmp.add_argument("--range-width", type=int, default=None,
                       help="re-tier run geometry while compacting "
                            "(wider runs for a corpus that outgrew its "
                            "build-time width)")
    p_cmp.add_argument("--local-cpus", type=int, default=None, help="pin a local[N] master; omitted: uses the ambient spark-submit conf, or local[8] when none is set")

    p_mnt = sub.add_parser("maintain", help="one tiered-merge pass")
    p_mnt.add_argument("--index-dir", required=True)
    p_mnt.add_argument("--segs-per-tier", type=int, default=4)
    p_mnt.add_argument("--max-merge-at-once", type=int, default=8)
    p_mnt.add_argument("--floor-kb", type=int, default=64)
    p_mnt.add_argument("--local-cpus", type=int, default=None, help="pin a local[N] master; omitted: uses the ambient spark-submit conf, or local[8] when none is set")

    p_snap = sub.add_parser("snapshots", help="list time-travel snapshots")
    p_snap.add_argument("--index-dir", required=True)

    p_al = sub.add_parser("alias", help="atomic serving pointer")
    p_al.add_argument("--alias", required=True, metavar="FILE.alias.json")
    p_al.add_argument("--set", default=None, metavar="INDEX_DIR",
                      help="point the alias here (atomic); omit to read")

    p_exp = sub.add_parser("expire-snapshots",
                           help="retention for the time-travel log")
    p_exp.add_argument("--index-dir", required=True)
    p_exp.add_argument("--keep-last", type=int, default=10)

    p_stat = sub.add_parser("stats", help="committed stats manifest")
    p_stat.add_argument("--index-dir", required=True)

    p_ver = sub.add_parser("verify", help="integrity check (fsck)")
    p_ver.add_argument("--index-dir", required=True)
    p_ver.add_argument("--local-cpus", type=int, default=None, help="pin a local[N] master; omitted: uses the ambient spark-submit conf, or local[8] when none is set")

    args = ap.parse_args(argv)

    if args.cmd == "alias":
        from ir_spark.sources.storage import resolve_alias, set_alias

        if args.set:
            print(json.dumps(set_alias(args.alias, args.set)))
        else:
            print(json.dumps({"index_dir": resolve_alias(args.alias)}))
        return 0

    if args.cmd == "expire-snapshots":
        from ir_spark.streaming.incremental import expire_snapshots

        print(json.dumps(expire_snapshots(args.index_dir,
                                          keep_last=args.keep_last)))
        return 0

    if args.cmd in ("snapshots", "stats"):
        # manifest reads need no SparkSession
        from ir_spark.sources import storage

        manifests = storage.read_manifests(args.index_dir)
        if args.cmd == "snapshots":
            snaps = [m["metrics"] for k, m in sorted(manifests.items())
                     if k.startswith("snapshot_grp")]
            print(json.dumps({"n_snapshots": len(snaps),
                              "snapshots": snaps}))
        else:
            stats = manifests.get("stats", {})
            tomb = manifests.get("tombstones", {}).get("metrics", {})
            print(json.dumps({"stats": stats.get("metrics", {}),
                              "lineage": stats.get("lineage", {}),
                              "tombstones": tomb}))
        return 0

    # session discipline shared with build_index/query_index: only an
    # explicit --local-cpus pins a local master; under spark-submit the
    # ambient conf (--master yarn etc.) must win, or the O(index)
    # compact/verify/maintain work silently runs on the driver box
    local_cpus = getattr(args, "local_cpus", None)
    if local_cpus is None and "PYSPARK_GATEWAY_PORT" not in os.environ \
            and "MASTER" not in os.environ:
        # plain `python jobs/admin_index.py` (no spark-submit, no
        # ambient conf) has no master — getOrCreate would fail with a
        # master-not-set error.  spark-submit launches the driver
        # python against an already-running JVM gateway and exports
        # PYSPARK_GATEWAY_PORT, so its absence is the reliable "bare
        # invocation" signal (SparkConf() can't be probed here: the
        # submit conf lives in JVM system properties the gateway
        # hasn't exposed yet).  Fall back to local[8], matching the
        # pre-r3 behavior for bare invocations.
        local_cpus = 8
    if local_cpus is not None:
        from ir_spark.session import get_spark

        spark = get_spark("ir_spark_admin_index", cpus=local_cpus)
    else:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("ir_spark_admin_index")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate())
        spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "delete":
        from ir_spark.operators.deletes import delete_docs

        with open(args.urls) as fh:
            urls = [ln.strip() for ln in fh if ln.strip()]
        print(json.dumps(delete_docs(spark, args.index_dir, urls)))
        return 0

    if args.cmd == "maintain":
        from ir_spark.operators.segments import maintain_segments

        merges = maintain_segments(
            spark, args.index_dir, segs_per_tier=args.segs_per_tier,
            max_merge_at_once=args.max_merge_at_once,
            floor_bytes=args.floor_kb * 1024)
        print(json.dumps({"n_merges": len(merges), "merges": merges}))
        return 0

    if args.cmd == "verify":
        from ir_spark.operators.segments import verify_index

        report = verify_index(spark, args.index_dir)
        print(json.dumps(report))
        return 0 if report["ok"] else 1

    from ir_spark.operators.segments import compact_segments

    metrics = compact_segments(spark, args.index_dir,
                               purge_deletes=not args.keep_deletes,
                               range_width=args.range_width)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
