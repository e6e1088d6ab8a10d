#!/usr/bin/env python
"""spark-submit entry point: resumable compressed segment-index build.

North-rule deployment path (BASELINE.json)::

    python jobs/package_pyfiles.py
    spark-submit --py-files dist/ir_spark.zip jobs/build_index.py \
        --input  /data/pages            \
        --index-dir /data/index         \
        --input-format parquet          \
        [--stem] [--buckets 64] [--range-width 16384] \
        [--segment-groups 4] [--from-html]

Input schemas accepted:
  * pages  (url:string, warc_ts:timestamp, html:binary, text:string,
    lang:string) — the authoritative input_hint shape; ``--from-html``
    re-derives ``text`` from ``html`` with the reference extraction
    (byte-identical invariant, ir_spark/text.py::extract_text).
  * documents (doc_id:bigint, text:string, ...) — driver testdata shape;
    a deterministic ``url`` is synthesized from doc_id so the same
    build path (dense doc ids via doc_map) applies.

On a cluster, pass ``--master yarn``/``--deploy-mode cluster`` etc. to
spark-submit itself; this script only builds the SparkSession from the
ambient config (no master override when run under spark-submit).

Re-running with the same lineage skips committed stages (per-partition
manifests under <index-dir>/_manifests) — the resume path exercised by
tests/test_segment_index.py.
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
    # under spark-submit: respect the submitted conf, add engine defaults
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
    ap.add_argument("--input", required=True, help="pages/documents table path")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--input-format", default="parquet",
                    help="any spark.read format: parquet, iceberg, orc ...")
    ap.add_argument("--stem", action="store_true", help="Porter-stem terms (T9)")
    ap.add_argument("--from-html", action="store_true",
                    help="derive text from the html column (T1 extraction)")
    ap.add_argument("--buckets", type=int, default=None,
                    help="term hash buckets (segment partition pruning unit)")
    ap.add_argument("--range-width", type=int, default=None,
                    help="docs per posting run (doc-range sharding width)")
    ap.add_argument("--segment-groups", type=int, default=4,
                    help="independent segment jobs = resume granularity")
    ap.add_argument("--positions-dir", default=None, metavar="DIR",
                    help="also build the term-bucketed positional store "
                         "(phrase / span-near / SDM serving) with doc ids "
                         "aligned to this index's doc_map")
    ap.add_argument("--local-cpus", type=int, default=None,
                    help="run on local[N] instead of the submitted master "
                         "(sandbox/bench use)")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from ir_spark.operators.segments import DEFAULT_RANGE_WIDTH, build_segment_index
    from ir_spark.sources import storage

    spark = _get_spark("ir_spark_build_index", args.local_cpus)
    pages = spark.read.format(args.input_format).load(args.input)

    if "url" not in pages.columns:
        if "doc_id" not in pages.columns:
            raise SystemExit("input needs a url or doc_id column")
        pages = pages.withColumn(
            "url", F.format_string("doc://%012d", F.col("doc_id"))
        )
    if args.from_html:
        from ir_spark.functions.tokenize import extract_text_udf

        pages = pages.withColumn("text", extract_text_udf(F.col("html")))
    if "text" not in pages.columns:
        raise SystemExit("input needs a text column (or pass --from-html)")
    # the build needs exactly (url, text); dropping the rest up front
    # both avoids doc_id collisions with doc_map and lets Parquet column
    # pruning skip heavy payload columns (html) at the scan
    pages = pages.select("url", "text")

    report = build_segment_index(
        spark,
        pages,
        args.index_dir,
        source=args.input,
        stem=args.stem,
        n_buckets=args.buckets or storage.DEFAULT_BUCKETS,
        range_width=args.range_width or DEFAULT_RANGE_WIDTH,
        segment_groups=args.segment_groups,
    )
    out = {
        "index_dir": report.index_dir,
        "stages_run": report.stages_run,
        "stages_skipped": report.stages_skipped,
        "metrics": report.metrics,
    }
    if args.positions_dir:
        from ir_spark.operators.positions import build_positional_store
        from ir_spark.operators.segments import index_paths

        doc_map = spark.read.parquet(index_paths(args.index_dir)["doc_map"])
        docs = pages.join(doc_map, "url").select("doc_id", "text")
        build_positional_store(spark, docs, args.positions_dir,
                               stem=args.stem)
        out["positions_dir"] = args.positions_dir
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
