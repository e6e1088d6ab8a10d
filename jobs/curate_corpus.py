#!/usr/bin/env python
r"""spark-submit entry point: training-data curation pipeline.

Chains the corpus-curation operators into the standard pre-training
data flow and writes the curated corpus plus a JSON report::

    python jobs/package_pyfiles.py
    spark-submit --py-files dist/ir_spark.zip jobs/curate_corpus.py \
        --input  /data/documents        \
        --output /data/curated          \
        [--bench /data/benchmarks]      \  # decontamination n-gram source
        [--sample-rate en=0.5 --sample-rate zh=0.8] \
        [--jaccard 0.3] [--min-words 5] [--decon-n 4]

Stages (each one of the operators in ir_spark/operators/{dedup,corpus}
— see COVERAGE.md for their individual gates and plans):

  1. curate():   exact dedup -> LSH near-dup drop -> quality floor
  2. repetition_profile(): drop Gopher-style repetitive docs
  3. decontaminate():      drop docs sharing any word n-gram with the
                           benchmark set (skipped without --bench)
  4. dsir_importance():    keep the --dsir-keep fraction of docs most
                           like the --dsir-target seed set (DSIR
                           importance resampling; skipped without
                           --dsir-target)
  4.5 host_profile()/host_blocklist(): drop every doc of hosts
                           failing the duplicate-mass / mean-length
                           thresholds (--block-hosts; UT1/FineWeb
                           host-granularity filtering)
  5. stratified_sample():  deterministic md5-threshold downsampling
                           per language (skipped without --sample-rate)
  6. mix_report():         per-language doc/token/char totals + shares
                           of the final corpus (printed in the report)

Input: documents-shaped table (doc_id:bigint, text:string, lang:string,
...).  A missing lang column disables sampling.  Output: parquet with
the surviving (doc_id, text, lang) rows; the report JSON (one line on
stdout) records per-stage surviving-row counts and the final mix.
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
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--input-format", default="parquet")
    ap.add_argument("--bench", default=None,
                    help="benchmark table (doc_id, text) for decontamination")
    ap.add_argument("--sample-rate", action="append", default=[],
                    metavar="LANG=RATE",
                    help="per-language keep fraction, repeatable")
    ap.add_argument("--dsir-target", default=None,
                    help="seed table (doc_id, text) for DSIR selection")
    ap.add_argument("--dsir-keep", type=float, default=0.5,
                    help="fraction of docs kept by DSIR weight")
    ap.add_argument("--block-hosts", action="store_true",
                    help="drop all docs of hosts failing the profile "
                         "thresholds (host_profile/host_blocklist)")
    ap.add_argument("--host-max-dup-frac", type=float, default=0.5)
    ap.add_argument("--host-min-mean-tokens", type=float, default=5.0)
    ap.add_argument("--jaccard", type=float, default=0.3)
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--decon-n", type=int, default=4)
    ap.add_argument("--local-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from ir_spark.operators import corpus as C
    from ir_spark.operators.dedup import curate

    spark = _get_spark("ir_spark_curate", args.local_cpus)
    docs = spark.read.format(args.input_format).load(args.input)
    report: dict = {"input": args.input, "n_input": docs.count()}

    # 1. exact dedup -> near-dup drop -> quality floor
    caches: list = []
    kept = curate(docs.select("doc_id", "text"),
                  jaccard_threshold=args.jaccard,
                  min_words=args.min_words, caches=caches)

    # 2. repetition filter
    rep = C.repetition_profile(kept)
    kept = kept.join(rep.filter(F.col("keep") == 1).select("doc_id"), "doc_id")
    # several downstream ACTIONS consume this relation (decontamination
    # / DSIR totals + quantile / host profile / the final write) — one
    # persist here stops each of them re-running the whole
    # dedup+repetition chain from the source
    kept = kept.persist()
    caches.append(kept)

    # 3. decontamination vs the benchmark set
    if args.bench:
        bench = spark.read.format(args.input_format).load(args.bench)
        flags = C.decontaminate(kept, bench.select("doc_id", "text"),
                                n=args.decon_n)
        kept = kept.join(
            flags.filter(F.col("contaminated") == 1).select("doc_id"),
            "doc_id", "left_anti")

    # 3.5 DSIR selection toward the seed distribution.  Selection by
    # a weight-quantile CUTOFF (one approxQuantile scalar + a narrow
    # filter), not a global top-n sort — the kept fraction is
    # approximate at tie boundaries, which is the right trade at
    # corpus scale.
    if args.dsir_target:
        target = spark.read.format(args.input_format).load(args.dsir_target)
        w = C.dsir_importance(kept, target.select("doc_id", "text"))
        cutoff = w.approxQuantile(
            "dsir_logw", [1.0 - args.dsir_keep], 0.001)[0]
        selected = w.filter(F.col("dsir_logw") >= cutoff).select("doc_id")
        kept = kept.join(selected, "doc_id")
        report["dsir_cutoff_logw"] = cutoff

    # re-attach metadata columns for sampling / reporting
    extra = [c for c in ("lang", "source") if c in docs.columns]
    kept = kept.join(docs.select("doc_id", *extra), "doc_id")

    # 3.7 host-level blocklist (UT1/FineWeb-style): host reputation
    # comes from the RAW corpus (the doc-level dedup above already
    # collapsed a mill's copies, which is precisely the evidence the
    # host score needs), then every surviving doc of a failing host
    # drops
    if args.block_hosts and "source" in docs.columns:
        prof_in = docs if "lang" in docs.columns else docs.withColumn(
            "lang", F.lit("und"))
        prof = C.host_profile(
            prof_in.select("doc_id", "text", "lang", "source"))
        blocked = C.host_blocklist(
            prof, max_dup_frac=args.host_max_dup_frac,
            min_mean_tokens=args.host_min_mean_tokens)
        report["n_blocked_hosts"] = blocked.count()
        kept = kept.join(blocked.withColumnRenamed("host", "source"),
                         "source", "left_anti")

    # 4. deterministic stratified sampling
    rates = {}
    for spec in args.sample_rate:
        lang, _, rate = spec.partition("=")
        rates[lang] = float(rate)
    if rates and "lang" in kept.columns:
        sampled_ids = C.stratified_sample(kept, rates).select("doc_id")
        kept = kept.join(sampled_ids, "doc_id")

    # one pass materializes the surviving corpus; stage-count jobs run
    # against the written output (cheap re-read beats recomputing the
    # whole lineage per count)
    from ir_spark.sources.storage import atomic_write_parquet

    atomic_write_parquet(kept, args.output)
    for c in caches:
        c.unpersist()
    out = spark.read.parquet(args.output)
    report["n_kept"] = out.count()

    # 5. final training-mix report
    if "lang" in out.columns:
        report["mix"] = [r.asDict() for r in C.mix_report(out)
                         .orderBy("lang").collect()]
    print(json.dumps({"output": args.output, **report}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
