#!/usr/bin/env python
"""Full-pipeline scale rehearsal (VERDICT r4 item 1): ONE end-to-end
run chaining every major leg of the engine at 1M docs —

    WARC export -> WARC read + HTML extract (byte-identity invariant)
    -> robots filtering -> Gopher quality filter -> dedup (exact +
    MinHash-LSH) -> compressed segment index build -> 20-query set
    (per-query + fused batch) -> oracle rank-identity on a sampled
    shard

— with per-stage wall seconds / rows in-out / bytes recorded, run at
TWO corpus sizes (default 250k and 1M) so stage-wise scaling ratios
expose any superlinear stage (4x data should cost ~4x wall; the probe
flags ratios above 4 * 1.5).

Everything is deterministic synthetic data (fixtures.generate_pages —
Common-Crawl-shaped pages with the frozen extraction invariant); no
external inputs.  Corpus generation itself is fixture prep, timed but
NOT part of the pipeline total.

Writes BENCH/pipeline_probe.json; bench.py merges it into
BENCH/detail.json when present.

Usage::

    python BENCH/pipeline_probe.py [--sizes 250000,1000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS_CACHE = "/tmp/ir_spark_pipeline"


def ensure_corpus(n_docs: int) -> tuple[str, float]:
    """Deterministic fixture corpus parquet, cached across runs."""
    path = os.path.join(CORPUS_CACHE, f"pages_{n_docs}.parquet")
    if os.path.exists(path):
        return path, 0.0
    os.makedirs(CORPUS_CACHE, exist_ok=True)
    from ir_spark.fixtures import generate_pages, pages_to_parquet

    t0 = time.time()
    pages_to_parquet(generate_pages(n_docs, seed=42), path)
    return path, round(time.time() - t0, 1)


def run_pipeline(spark, src_parquet: str, n_docs: int, work: str) -> dict:
    from pyspark.sql import functions as F

    from ir_spark.fixtures import REFERENCE_QUERIES
    from ir_spark.functions.tokenize import extract_text_udf
    from ir_spark.operators.build import assign_doc_ids
    from ir_spark.operators.corpus import gopher_quality_filter
    from ir_spark.operators.crawl import apply_robots, parse_robots
    from ir_spark.operators.dedup import curate
    from ir_spark.operators.segment_query import (SegmentIndex,
                                                  search_segments,
                                                  search_segments_batch)
    from ir_spark.operators.segments import build_segment_index
    from ir_spark.sources.warc import read_warc, write_warc

    stages: dict[str, dict] = {}

    def stage(name: str, t0: float, **kw) -> None:
        stages[name] = {"wall_sec": round(time.time() - t0, 2), **kw}
        print(json.dumps({"stage": name, **stages[name]}), flush=True)

    # -- 1. WARC export (distributed writer, one file per partition) ------
    raw = spark.read.parquet(src_parquet)
    warc_dir = os.path.join(work, "warc")
    t0 = time.time()
    res = write_warc(
        raw.select("url", "warc_ts", "html").repartition(32), warc_dir)
    stage("warc_export", t0, rows=res["n_records"], bytes=res["bytes"],
          files=res["n_files"])

    # -- 2. WARC read + HTML extract (the S3 invariant, distributed) ------
    t0 = time.time()
    extracted_path = os.path.join(work, "extracted.parquet")
    pages = read_warc(spark, warc_dir).withColumn(
        "text", extract_text_udf(F.col("html"))).select(
        "url", "warc_ts", "text")
    pages.write.mode("overwrite").parquet(extracted_path)
    pages = spark.read.parquet(extracted_path)
    n_extracted = pages.count()
    stage("warc_read_extract", t0, rows=n_extracted,
          bytes=sum(os.path.getsize(os.path.join(extracted_path, f))
                    for f in os.listdir(extracted_path)))
    assert n_extracted == n_docs, (n_extracted, n_docs)
    # byte-identity vs the fixture's frozen text on a hash sample
    sample = pages.where(F.pmod(F.abs(F.xxhash64("url")), F.lit(997)) == 0)
    mism = (sample.alias("e")
            .join(raw.select("url", F.col("text").alias("want")), "url")
            .where(F.col("e.text") != F.col("want")).count())
    assert mism == 0, f"{mism} extraction mismatches"

    # -- 3. robots filtering ---------------------------------------------
    # one robots.txt per host: every 10th host disallows its whole
    # /page/ tree (a full-site opt-out), the rest disallow /private/
    t0 = time.time()
    hosts = pages.select(
        F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host")
    ).distinct()
    robots = hosts.withColumn(
        "robots_txt",
        F.when(F.pmod(F.abs(F.xxhash64("host")), F.lit(10)) == 0,
               F.lit("User-agent: *\nDisallow: /page/"))
        .otherwise(F.lit("User-agent: *\nDisallow: /private/")))
    rules = parse_robots(robots)
    allowed = apply_robots(pages, rules).where(F.col("allowed") == 1) \
        .select("url", "warc_ts", "text")
    allowed_path = os.path.join(work, "allowed.parquet")
    allowed.write.mode("overwrite").parquet(allowed_path)
    allowed = spark.read.parquet(allowed_path)
    n_allowed = allowed.count()
    stage("robots_filter", t0, rows_in=n_extracted, rows_out=n_allowed)

    # -- 4. quality filter (Gopher rules) ---------------------------------
    t0 = time.time()
    ids = assign_doc_ids(allowed)
    docs = allowed.join(ids, "url").select("doc_id", "url", "text")
    keep_q = gopher_quality_filter(
        docs.select("doc_id", "text")).where(F.col("keep") == 1) \
        .select("doc_id")
    quality = docs.join(keep_q, "doc_id")
    qual_path = os.path.join(work, "quality.parquet")
    quality.write.mode("overwrite").parquet(qual_path)
    quality = spark.read.parquet(qual_path)
    n_quality = quality.count()
    stage("quality_filter", t0, rows_in=n_allowed, rows_out=n_quality)

    # -- 5. dedup (exact md5 + MinHash-LSH near-dup + min-words) ----------
    t0 = time.time()
    caches: list = []
    kept = curate(quality.select("doc_id", "text"), caches=caches)
    final = quality.join(kept.select("doc_id"), "doc_id") \
        .select("url", "text")
    final_path = os.path.join(work, "curated.parquet")
    final.write.mode("overwrite").parquet(final_path)
    for c in caches:
        c.unpersist()
    final = spark.read.parquet(final_path)
    n_final = final.count()
    stage("dedup", t0, rows_in=n_quality, rows_out=n_final)

    # -- 6. compressed segment index build --------------------------------
    idx_dir = os.path.join(work, "index")
    t0 = time.time()
    build_segment_index(spark, final, idx_dir, source=final_path)
    build_sec = time.time() - t0
    from ir_spark.sources.storage import tree_bytes

    stage("index_build", t0, rows=n_final,
          docs_per_sec=round(n_final / build_sec, 1),
          bytes=tree_bytes(os.path.join(idx_dir, "segments")))

    return stages


def run_serve(spark, n_docs: int, work: str) -> dict:
    """Stages 7-8 — run in their OWN process (production shape: the
    ingest job and the serving job are separate JVMs; measured, a
    session that just chewed through the WARC/dedup pipeline serves
    queries with multi-second GC outliers that a fresh serving JVM
    never shows on the identical index)."""
    import statistics

    from pyspark.sql import functions as F

    from ir_spark.fixtures import REFERENCE_QUERIES
    from ir_spark.operators.segment_query import (SegmentIndex,
                                                  search_segments,
                                                  search_segments_batch)
    from ir_spark.operators.segments import build_segment_index

    stages: dict[str, dict] = {}

    def stage(name: str, t0: float, **kw) -> None:
        stages[name] = {"wall_sec": round(time.time() - t0, 2), **kw}
        print(json.dumps({"stage": name, **stages[name]}), flush=True)

    idx_dir = os.path.join(work, "index")
    final = spark.read.parquet(os.path.join(work, "curated.parquet"))
    n_final = final.count()

    # -- 7. the 20-query reference set ------------------------------------
    sidx = SegmentIndex.load(spark, idx_dir)
    search_segments(spark, sidx, REFERENCE_QUERIES[0], k=10,
                    mode="bm25").collect()  # cold start, untimed
    lat = []
    t0 = time.time()
    for q in REFERENCE_QUERIES:
        tq = time.time()
        search_segments(spark, sidx, q, k=10, mode="bm25").collect()
        lat.append(time.time() - tq)
    lat.sort()
    tb = time.time()
    nb = search_segments_batch(spark, sidx, REFERENCE_QUERIES,
                               k=10, mode="bm25").count()
    batch_sec = time.time() - tb
    stage("query_set", t0, p50_sec=round(statistics.median(lat), 4),
          p95_sec=round(lat[int(len(lat) * 0.95)], 4),
          batch_rows=int(nb),
          batch_qps=round(len(REFERENCE_QUERIES) / batch_sec, 2))

    # -- 7b. compaction + post-compaction query leg (r4 verdict #6) -------
    # the batch build writes multiple segment groups; compaction
    # rewrites them into one sorted file per bucket (fewer files, one
    # dictionary row per term).  Queries must be result-identical;
    # the point of measuring here is the query-latency delta at the
    # as-built group/file count vs the compacted one.
    from ir_spark.operators.segments import compact_segments

    pre = {}
    for q in REFERENCE_QUERIES:
        pre[q] = [(int(r["doc_id"]), round(float(r["score"]), 9))
                  for r in search_segments(spark, sidx, q, k=10,
                                           mode="bm25").collect()]
    # retier run geometry to the corpus size while compacting: the
    # build's default range_width (2048) leaves ~n/2048 (term, run)
    # rows per posting list; ~32 runs keeps per-run fixed cost (row
    # decode, kernel dispatch, k-row output) off the latency path
    new_rw = max(2048, n_final // 32 + 1)
    t0 = time.time()
    cm = compact_segments(spark, idx_dir, range_width=new_rw)
    compact_sec = time.time() - t0
    sidx2 = SegmentIndex.load(spark, idx_dir)
    search_segments(spark, sidx2, REFERENCE_QUERIES[0], k=10,
                    mode="bm25").collect()  # cold start, untimed
    lat2 = []
    identical = 0
    t0 = time.time()
    for q in REFERENCE_QUERIES:
        tq = time.time()
        rows = [(int(r["doc_id"]), round(float(r["score"]), 9))
                for r in search_segments(spark, sidx2, q, k=10,
                                         mode="bm25").collect()]
        lat2.append(time.time() - tq)
        identical += int(rows == pre[q])
    lat2.sort()
    stage("query_set_compacted", t0,
          compact_sec=round(compact_sec, 2),
          range_width=new_rw,
          rows_before=cm.get("rows_before"),
          rows_after=cm.get("rows_after"),
          files_before=cm.get("files_before"),
          files_after=cm.get("files_after"),
          p50_sec=round(statistics.median(lat2), 4),
          p95_sec=round(lat2[int(len(lat2) * 0.95)], 4),
          queries_identical=identical,
          queries_total=len(REFERENCE_QUERIES))
    assert identical == len(REFERENCE_QUERIES), stages

    # -- 8. oracle rank-identity on a sampled shard -----------------------
    # a hash-sampled shard of the CURATED corpus, indexed BOTH by the
    # engine and the pure-python executable spec; top-10 must be
    # rank-identical (urls + scores at 1e-9) on all 20 queries
    t0 = time.time()
    mod = max(1, n_final // 4000)
    shard = final.where(F.pmod(F.abs(F.xxhash64("url")), F.lit(mod)) == 0)
    shard_dir = os.path.join(work, "shard_idx")
    build_segment_index(spark, shard, shard_dir, source="shard")
    ssidx = SegmentIndex.load(spark, shard_dir)
    local = shard.collect()
    from ir_spark.oracle import build_index as oracle_build
    from ir_spark.oracle import search as oracle_search

    url_by_pos = {}
    docs_for_oracle = []
    srt = sorted(local, key=lambda r: r["url"])
    for i, r in enumerate(srt):
        url_by_pos[i + 1] = r["url"]  # oracle ids 1-based over sorted urls
        docs_for_oracle.append((i + 1, r["text"]))
    oidx = oracle_build(docs_for_oracle)
    dm = {int(r["doc_id"]): r["url"] for r in
          spark.read.parquet(os.path.join(shard_dir, "doc_map")).collect()}
    matched = 0
    for q in REFERENCE_QUERIES:
        eng = [(dm[int(r["doc_id"])], round(float(r["score"]), 9))
               for r in search_segments(spark, ssidx, q, k=10,
                                        mode="bm25").collect()]
        orc = [(url_by_pos[d], round(s, 9))
               for d, s in oracle_search(oidx, q, k=10, mode="bm25")]
        if eng == orc:
            matched += 1
    stage("shard_oracle_parity", t0, shard_docs=len(local),
          queries_matched=matched, queries_total=len(REFERENCE_QUERIES))
    assert matched == len(REFERENCE_QUERIES), stages

    return stages


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="250000,1000000")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--keep-corpus", action="store_true",
                    help="keep /tmp corpus parquets for re-runs")
    ap.add_argument("--single-run-output", default=None,
                    help=argparse.SUPPRESS)  # child-mode result file
    ap.add_argument("--phase", default=None, choices=["build", "serve"],
                    help=argparse.SUPPRESS)  # child-mode phase
    ap.add_argument("--work", default=None,
                    help=argparse.SUPPRESS)  # child-mode work dir
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    if args.single_run_output:
        # child mode: ONE size, ONE phase, own JVM, stages to the file
        from ir_spark.session import get_spark

        spark = get_spark(f"pipeline_probe_{args.phase}", cpus=args.cpus)
        assert len(sizes) == 1 and args.phase and args.work
        if args.phase == "build":
            src, gen_sec = ensure_corpus(sizes[0])
            stages = run_pipeline(spark, src, sizes[0], args.work)
            stages["_fixture_gen_sec"] = gen_sec
        else:
            stages = run_serve(spark, sizes[0], args.work)
        with open(args.single_run_output, "w") as fh:
            json.dump(stages, fh)
        return 0

    # parent mode: TWO FRESH JVMs PER SIZE — one for the ingest
    # pipeline (stages 1-6), one for serving (stages 7-8), matching
    # production (ingest job and query serving are separate
    # processes).  A shared session poisons later measurements:
    # broadcasts, python-worker pools and heap history from the heavy
    # WARC/dedup stages survive catalog.clearCache() and tax the query
    # legs with multi-second GC outliers (measured: query p50 7.8s
    # in-session vs 0.97s in a fresh JVM on the identical index).
    import subprocess

    def child(n: int, phase: str, work: str) -> dict:
        res_file = tempfile.mktemp(prefix=f"ir_spark_pipe_res_{n}_")
        cmd = [sys.executable, os.path.abspath(__file__),
               "--sizes", str(n), "--cpus", str(args.cpus),
               "--keep-corpus", "--phase", phase, "--work", work,
               "--single-run-output", res_file]
        subprocess.run(cmd, check=True)
        with open(res_file) as fh:
            res = json.load(fh)
        os.unlink(res_file)
        return res

    out: dict = {"cpus": args.cpus, "runs": []}
    for n in sizes:
        ensure_corpus(n)  # generate once here; the children reuse it
        work = tempfile.mkdtemp(prefix=f"ir_spark_pipe_{n}_")
        try:
            stages = child(n, "build", work)
            gen_sec = stages.pop("_fixture_gen_sec", 0.0)
            stages.update(child(n, "serve", work))
        finally:
            shutil.rmtree(work, ignore_errors=True)
        pipeline_sec = sum(
            s["wall_sec"] for name, s in stages.items()
            if name in ("warc_export", "warc_read_extract",
                        "robots_filter", "quality_filter", "dedup",
                        "index_build"))
        res = {"n_docs": n, "stages": stages,
               "ingest_to_index_sec": round(pipeline_sec, 2),
               "ingest_to_index_docs_per_sec": round(n / pipeline_sec, 1),
               "fixture_gen_sec": gen_sec,
               "date": time.strftime("%Y-%m-%d")}
        out["runs"].append(res)
        print(json.dumps({"run_done": n, **{k: v for k, v in res.items()
                                            if k != "stages"}}), flush=True)

    # stage-wise scaling ratios between consecutive sizes: Kx data
    # should cost ~Kx wall; flag anything above ratio * 1.5 as
    # superlinear
    if len(out["runs"]) >= 2:
        out["pairs"] = []
        flagged_all = []
        for a, b in zip(out["runs"], out["runs"][1:]):
            data_ratio = b["n_docs"] / a["n_docs"]
            ratios = {}
            flagged = []
            for name in a["stages"]:
                wa, wb = a["stages"][name]["wall_sec"], \
                    b["stages"][name]["wall_sec"]
                r = round(wb / wa, 2) if wa > 0 else None
                ratios[name] = r
                # stages under 30s at the LARGE size are fixed-
                # overhead / host-noise dominated; a ratio there says
                # nothing about algorithmic scaling
                if r is not None and wb >= 30 and r > data_ratio * 1.5:
                    flagged.append(name)
            pair = {"sizes": [a["n_docs"], b["n_docs"]],
                    "data_ratio": data_ratio,
                    "stage_wall_ratios": ratios,
                    "superlinear_stages": flagged}
            out["pairs"].append(pair)
            flagged_all.extend(flagged)
            print(json.dumps(pair), flush=True)
        out["superlinear_stages"] = sorted(set(flagged_all))

    if not args.keep_corpus:
        shutil.rmtree(CORPUS_CACHE, ignore_errors=True)
    dest = os.path.join(REPO, "BENCH", "pipeline_probe.json")
    # APPEND, keyed by n_docs (r4 verdict #1: a smoke run at one size
    # must never clobber the committed evidence at other sizes) —
    # same-size runs are replaced by the newer run, other sizes kept,
    # and the scaling pairs are recomputed over the merged set
    merged = out
    if os.path.exists(dest):
        try:
            with open(dest) as fh:
                prev = json.load(fh)
            by_n = {r["n_docs"]: r for r in prev.get("runs", [])}
            by_n.update({r["n_docs"]: r for r in out["runs"]})
            merged_runs = [by_n[k] for k in sorted(by_n)]
            merged = {"cpus": out["cpus"], "runs": merged_runs}
            if len(merged_runs) >= 2:
                merged["pairs"] = []
                flagged_all = []
                for a, b in zip(merged_runs, merged_runs[1:]):
                    data_ratio = b["n_docs"] / a["n_docs"]
                    ratios, flagged = {}, []
                    for name in a["stages"]:
                        if name not in b["stages"]:
                            continue
                        wa = a["stages"][name]["wall_sec"]
                        wb = b["stages"][name]["wall_sec"]
                        r = round(wb / wa, 2) if wa > 0 else None
                        ratios[name] = r
                        if (r is not None and wb >= 30
                                and r > data_ratio * 1.5):
                            flagged.append(name)
                    merged["pairs"].append(
                        {"sizes": [a["n_docs"], b["n_docs"]],
                         "data_ratio": data_ratio,
                         "stage_wall_ratios": ratios,
                         "superlinear_stages": flagged})
                    flagged_all.extend(flagged)
                merged["superlinear_stages"] = sorted(set(flagged_all))
        except (OSError, json.JSONDecodeError, KeyError):
            merged = out
    with open(dest, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(json.dumps({"wrote": dest}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
