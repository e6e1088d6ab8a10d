"""Compressed segment index build (SURVEY E2; north-star scale path).

Pipeline (each stage an atomic, manifest-committed parquet write —
resumable; SURVEY §4.5):

  pages ──► doc_map (dense ids)                                [stage doc_map]
        ──► tokenize kernel ──► docinfo                        [stage docinfo]
                            └─► postings_flat: (term, doc_id, tf,
                                doc_len, max_tf) — doc stats joined in
                                so segments are self-contained          [stage postings]
        postings_flat ──► dictionary (term, df, cf)            [stage dictionary]
        postings_flat ──► groupBy(term, run) ──► encode UDF ──►
                          segments/ grp=G/bucket=B parquet     [stages segments_g*]
        postings_flat ──► per-doc L2 norms (w1, w2)            [stage norms]

Skew / shuffle design (SURVEY §4.1): ``run = floor(doc_id /
range_width)`` shards every posting list into contiguous doc-id
ranges.  Head terms (Zipf "the"-class) split across ~n_docs/R runs and
therefore across tasks — no single reducer sees a whole head list.
Runs double as the query-time unit of document-at-a-time scoring: all
terms of one run are co-partitioned, so top-k scoring needs NO doc_id
shuffle (operators/segment_query.py).  The groupBy(term, run) is
sort-based: Spark's shuffle IS the distributed k-way merge of partial
indexes (README.md:25, SPIMI merge).

Posting-list encoding per (term, run): doc-id gaps delta+varbyte
(codec.py, D6), tf / doc_len / max_tf varbyte streams, per-128-posting
block skip metadata (last doc id, max tf, min doc_len) for block-max
pruning.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codec
from ..sources import storage
from .build import (
    assign_doc_ids,
    build_dictionary,
    docinfo_from_fused,
    postings_from_fused,
    token_counts_fused,
)

# Docs per posting run.  Smaller runs = more (term, run) groups = finer
# encode/query parallelism and tighter head-term balance; larger runs =
# fewer rows and better compression.  2^11 keeps every local corpus
# (5k-200k docs) at tens of runs so head terms split across all cores;
# on a 1000-executor cluster use ~2^22 (10^12 docs -> ~240k runs).
DEFAULT_RANGE_WIDTH = 1 << 11

_ENCODED = T.StructType(
    [
        T.StructField("first_doc_id", T.LongType()),
        T.StructField("last_doc_id", T.LongType()),
        T.StructField("doc_gaps_vb", T.BinaryType()),
        T.StructField("tfs_vb", T.BinaryType()),
        T.StructField("doc_lens_vb", T.BinaryType()),
        T.StructField("max_tfs_vb", T.BinaryType()),
        T.StructField("block_last_doc_id", T.ArrayType(T.LongType())),
        T.StructField("block_max_tf", T.ArrayType(T.IntegerType())),
        T.StructField("block_min_doc_len", T.ArrayType(T.LongType())),
        # Pareto skyline of (tf, doc_len) per block (codec.block_skyline)
        # — tight attained upper bounds for block-max WAND
        T.StructField("block_sky_idx", T.ArrayType(T.IntegerType())),
        T.StructField("block_sky_tf", T.ArrayType(T.IntegerType())),
        T.StructField("block_sky_dl", T.ArrayType(T.LongType())),
    ]
)


@F.pandas_udf(_ENCODED)
def _encode_postings(doc_ids: pd.Series, tfs: pd.Series, doc_lens: pd.Series,
                     max_tfs: pd.Series) -> pd.DataFrame:
    """Arrow-batched encoder: one input row = one (term, run) posting
    run, already doc_id-sorted by sort_array upstream.

    The byte codecs run BATCHED across the whole Arrow batch
    (codec.*_encode_batch): most (term, run) groups hold a handful of
    postings, so per-group numpy calls paid ~10 small allocations per
    group — >80% of encode wall in profiles; one concatenated pass
    amortizes it (~9x kernel speedup, round-trip-identical bytes)."""
    n_rows = len(doc_ids)
    if n_rows == 0:
        return pd.DataFrame({k.name: [] for k in _ENCODED.fields})
    id_arrays = [np.asarray(x, dtype=np.int64) for x in doc_ids]
    sizes = np.fromiter((a.size for a in id_arrays), dtype=np.int64,
                        count=n_rows)
    splits = np.cumsum(sizes)
    ids_all = np.concatenate(id_arrays)
    tf_all = np.concatenate([np.asarray(x, dtype=np.int64) for x in tfs])
    dl_all = np.concatenate([np.asarray(x, dtype=np.int64) for x in doc_lens])
    mtf_all = np.concatenate([np.asarray(x, dtype=np.int64) for x in max_tfs])
    starts = np.concatenate(([np.int64(0)], splits[:-1]))

    out = {k.name: [] for k in _ENCODED.fields}
    out["first_doc_id"] = ids_all[starts].tolist()
    out["last_doc_id"] = ids_all[splits - 1].tolist()
    out["doc_gaps_vb"] = codec.delta_encode_batch(ids_all, splits)
    out["tfs_vb"] = codec.varbyte_encode_batch(tf_all, splits)
    out["doc_lens_vb"] = codec.varbyte_encode_batch(dl_all, splits)
    out["max_tfs_vb"] = codec.varbyte_encode_batch(mtf_all, splits)
    nb, (last, bmax_tf, bmin_dl) = codec.block_stats_batch(
        ids_all, tf_all, dl_all, sizes)
    b_cuts = np.cumsum(nb)[:-1]
    out["block_last_doc_id"] = [a.tolist() for a in np.split(last, b_cuts)]
    out["block_max_tf"] = [a.tolist() for a in np.split(bmax_tf, b_cuts)]
    out["block_min_doc_len"] = [a.tolist() for a in np.split(bmin_dl, b_cuts)]
    pts, sky_blk, sky_tf, sky_dl = codec.block_skyline_batch(
        tf_all, dl_all, sizes)
    p_cuts = np.cumsum(pts)[:-1]
    out["block_sky_idx"] = [a.tolist() for a in np.split(sky_blk, p_cuts)]
    out["block_sky_tf"] = [a.tolist() for a in np.split(sky_tf, p_cuts)]
    out["block_sky_dl"] = [a.tolist() for a in np.split(sky_dl, p_cuts)]
    return pd.DataFrame(out)


def encode_segments(postings_flat: DataFrame, n_buckets: int,
                    range_width: int) -> DataFrame:
    """(term, doc_id, tf, doc_len, max_tf) -> segment rows.

    The heavy lifting (shuffle + per-group sort) is Catalyst's
    sort-based aggregate; Python only sees one already-grouped array
    per row.
    """
    run = F.floor(F.col("doc_id") / F.lit(range_width)).cast("long")
    grouped = (
        postings_flat.withColumn("run", run)
        .groupBy("term", "run")
        .agg(
            F.count("*").alias("run_df"),
            F.sum("tf").alias("run_cf"),
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf", "doc_len", "max_tf"))
            ).alias("plist"),
        )
    )
    arrays = grouped.select(
        "term",
        "run",
        "run_df",
        "run_cf",
        F.col("plist.doc_id").alias("doc_ids"),
        F.col("plist.tf").alias("tfs"),
        F.col("plist.doc_len").alias("doc_lens"),
        F.col("plist.max_tf").alias("max_tfs"),
    )
    enc = arrays.select(
        "term",
        "run",
        "run_df",
        "run_cf",
        _encode_postings("doc_ids", "tfs", "doc_lens", "max_tfs").alias("e"),
    )
    return enc.select(
        "term", "run", "run_df", "run_cf", "e.*",
        storage.term_bucket_col(F.col("term"), n_buckets).alias("bucket"),
    )


@dataclass
class BuildReport:
    index_dir: str
    stages_run: list[str]
    stages_skipped: list[str]
    metrics: dict


def build_segment_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    *,
    source: str = "",
    stem: bool = False,
    n_buckets: int = storage.DEFAULT_BUCKETS,
    range_width: int = DEFAULT_RANGE_WIDTH,
    segment_groups: int = 4,
    fail_after_stage: str | None = None,
    norms: bool = True,
) -> BuildReport:
    """Full resumable build.  ``fail_after_stage`` injects a crash right
    after that stage commits — used by the resume test (SURVEY §5.2.6).

    ``norms=False`` skips the cosine-norms stage: partial builds that
    will be merged defer norms to the merge (which must recompute them
    against the merged global stats anyway — merge.py), and bm25-only
    indexes never need them (``refresh_norms`` backfills on demand).

    Lineage = (source, options); a stage whose manifest carries the same
    lineage is skipped on re-run.
    """
    os.makedirs(index_dir, exist_ok=True)
    lineage = {
        "source": source,
        "stem": stem,
        "n_buckets": n_buckets,
        "range_width": range_width,
        "segment_groups": segment_groups,
    }
    run_stages: list[str] = []
    skipped: list[str] = []
    metrics: dict = {}

    def _stage(name: str) -> bool:
        if storage.stage_committed(index_dir, name, lineage):
            skipped.append(name)
            return False
        run_stages.append(name)
        return True

    def _commit(name: str, m: dict):
        metrics[name] = m
        storage.commit_stage(index_dir, name, lineage, m)
        if fail_after_stage == name:
            raise RuntimeError(f"injected failure after stage {name}")

    paths = index_paths(index_dir)

    # -- stage: doc_map --------------------------------------------------
    if _stage("doc_map"):
        t0 = time.time()
        caches: list = []
        # row counts ride the write job as Observation metrics — no
        # re-read count() job per stage (same pattern below)
        obs = Observation()
        doc_map = assign_doc_ids(pages, caches).observe(
            obs, F.count(F.lit(1)).alias("n"))
        storage.atomic_write_parquet(doc_map, paths["doc_map"])
        for c in caches:
            c.unpersist()
        _commit("doc_map", {"n_docs": int(obs.get["n"]),
                            "wall_sec": time.time() - t0,
                            "bytes": storage.tree_bytes(paths["doc_map"])})

    doc_map = spark.read.parquet(paths["doc_map"])
    pages_ids = pages.join(doc_map, "url")

    # -- stages: docinfo + postings (one tokenize pass) --------------------
    need_docinfo, need_postings = (
        not storage.stage_committed(index_dir, "docinfo", lineage),
        not storage.stage_committed(index_dir, "postings", lineage),
    )
    if need_docinfo or need_postings:
        t0 = time.time()
        # fused kernel: docinfo rides the tokenize pass as sentinel
        # rows, so the docinfo stage is a narrow filter over the cached
        # relation, not a second aggregation.  Materialize the cache
        # with its own timed action so the stage table attributes the
        # kernel cost to "tokenize", not to whichever consumer happens
        # to run first (r4's docinfo number was mostly this).
        tokens = token_counts_fused(pages_ids, stem=stem).persist()
        tokens.count()
        tok_sec = round(time.time() - t0, 3)
        if need_docinfo:
            run_stages.append("docinfo")
            t1 = time.time()
            storage.atomic_write_parquet(
                docinfo_from_fused(tokens), paths["docinfo"])
            _commit("docinfo", {"wall_sec": time.time() - t1,
                                "tokenize_sec": tok_sec,
                                "bytes": storage.tree_bytes(paths["docinfo"])})
        else:
            skipped.append("docinfo")
        if need_postings:
            run_stages.append("postings")
            t1 = time.time()
            docinfo = spark.read.parquet(paths["docinfo"])
            obs = Observation()
            flat = postings_from_fused(tokens).join(docinfo, "doc_id").observe(
                obs, F.count(F.lit(1)).alias("n"))
            storage.atomic_write_parquet(flat, paths["postings"])
            _commit("postings", {"n_postings": int(obs.get["n"]),
                                 "wall_sec": time.time() - t1,
                                 "bytes": storage.tree_bytes(paths["postings"])})
        else:
            skipped.append("postings")
        tokens.unpersist()
    else:
        skipped.extend(["docinfo", "postings"])

    postings_flat = spark.read.parquet(paths["postings"])

    # -- stage: dictionary -------------------------------------------------
    if _stage("dictionary"):
        t0 = time.time()
        obs = Observation()
        dictionary = build_dictionary(
            postings_flat.select("term", "doc_id", "tf")
        ).observe(obs, F.count(F.lit(1)).alias("n"))
        storage.atomic_write_parquet(dictionary, paths["dictionary"])
        _commit("dictionary", {"n_terms": int(obs.get["n"]),
                               "wall_sec": time.time() - t0,
                               "bytes": storage.tree_bytes(paths["dictionary"])})

    # -- stages: segments, one job per bucket group (resume granularity) ---
    for g in range(segment_groups):
        name = f"segments_g{g}"
        if not _stage(name):
            continue
        t0 = time.time()
        part = postings_flat.filter(
            F.pmod(storage.term_bucket_col(F.col("term"), n_buckets),
                   F.lit(segment_groups)) == g
        )
        # AQE's partition coalescing sizes by shuffle bytes and shrinks
        # the collect_list agg output to a handful of partitions, which
        # then strangles the encode UDF's parallelism (measured 1.5x
        # slower at 32 cores).  Disable it for the encode job only.
        coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
        prev_coalesce = spark.conf.get(coalesce_key, "true")
        spark.conf.set(coalesce_key, "false")
        try:
            seg = encode_segments(part, n_buckets, range_width)
            # cluster rows by bucket before the partitioned write: one
            # task per bucket -> one sorted file per bucket dir (instead
            # of one file per shuffle task per bucket — 40x the files,
            # 40x the per-query open/list cost).  Parquet row groups
            # keep the scan splittable for large buckets.
            buckets_in_group = max(1, n_buckets // segment_groups)
            seg = seg.repartition(buckets_in_group, "bucket")
            dest = os.path.join(paths["segments"], f"grp={g}")
            storage.atomic_write_parquet(
                seg, dest, partition_by=["bucket"], sort_within=["term", "run"]
            )
        finally:
            # exception-safe restore: a failed encode must not leave
            # coalescing disabled for every later job in the session
            spark.conf.set(coalesce_key, prev_coalesce)
        written = spark.read.parquet(dest)
        agg = written.agg(
            F.count("*").alias("runs"),
            F.sum("run_df").alias("postings"),
            F.countDistinct("term").alias("terms"),
            F.sum(F.octet_length("doc_gaps_vb") + F.octet_length("tfs_vb")
                  + F.octet_length("doc_lens_vb")
                  + F.octet_length("max_tfs_vb")).alias("payload"),
        ).collect()[0]
        _commit(name, {
            "group": g,
            "n_runs": int(agg["runs"]),
            "n_postings": int(agg["postings"] or 0),
            "n_terms": int(agg["terms"]),
            "wall_sec": time.time() - t0,
            "bytes": storage.tree_bytes(dest),
            "payload_bytes": int(agg["payload"] or 0),
        })

    # -- stage: norms (w1 + w2, idempotent — D4) ---------------------------
    if norms and _stage("norms"):
        t0 = time.time()
        from .query import doc_weight_expr

        docinfo = spark.read.parquet(paths["docinfo"])
        stats = docinfo.agg(F.count("*").alias("n"),
                            F.avg("doc_len").alias("avg")).collect()[0]
        n_docs, avg_dl = int(stats["n"]), float(stats["avg"])
        dictionary = spark.read.parquet(paths["dictionary"])
        joined = postings_flat.join(dictionary.select("term", "df"), "term")
        w1 = doc_weight_expr("w1", n_docs, avg_dl)
        w2 = doc_weight_expr("w2", n_docs, avg_dl)
        norms = joined.groupBy("doc_id").agg(
            F.sqrt(F.sum(w1 * w1)).alias("norm_w1"),
            F.sqrt(F.sum(w2 * w2)).alias("norm_w2"),
        )
        storage.atomic_write_parquet(norms, paths["norms"])
        _commit("norms", {"n_docs": n_docs, "avg_doc_len": avg_dl,
                          "wall_sec": time.time() - t0,
                          "bytes": storage.tree_bytes(paths["norms"])})

    # -- stage: stats (global scalars for the query engine) ----------------
    if _stage("stats"):
        docinfo = spark.read.parquet(paths["docinfo"])
        stats = docinfo.agg(F.count("*").alias("n"),
                            F.avg("doc_len").alias("avg")).collect()[0]
        # index-size evidence (reference stats.md:16-24 publishes
        # compressed vs uncompressed index sizes).  compression_ratio is
        # the CODEC-level number comparable to the reference's -38%:
        # varbyte stream bytes vs the same four streams fixed-width
        # (4 x int32 per posting).  The on-disk totals are also
        # recorded; note segments deliberately denormalize doc stats
        # into every (term, run) row for query locality, and the flat
        # relation is itself snappy-parquet (dictionary+RLE), so
        # segments_bytes vs flat_postings_bytes compares two DIFFERENT
        # trade-offs, not compressed-vs-raw.
        seg_manifests = storage.read_manifests(index_dir)
        payload = sum(
            m["metrics"].get("payload_bytes", 0)
            for name_, m in seg_manifests.items()
            if name_.startswith("segments_g"))
        n_post = sum(
            m["metrics"].get("n_postings", 0)
            for name_, m in seg_manifests.items()
            if name_.startswith("segments_g"))
        raw_bytes = 16 * n_post  # 4 streams x int32 fixed width
        _commit("stats", {"n_docs": int(stats["n"]),
                          "avg_doc_len": float(stats["avg"]),
                          "segments_bytes": storage.tree_bytes(
                              paths["segments"]),
                          "flat_postings_bytes": storage.tree_bytes(
                              paths["postings"]),
                          "payload_bytes": payload,
                          "raw_fixed_width_bytes": raw_bytes,
                          "compression_ratio": (
                              round(payload / raw_bytes, 4)
                              if raw_bytes else None)})

    return BuildReport(index_dir, run_stages, skipped, metrics)


def decode_segments(segments: DataFrame) -> DataFrame:
    """Inverse of :func:`encode_segments`: segment rows back to the flat
    (term, doc_id, tf, doc_len, max_tf) relation.  Arrow-batched numpy
    decode, fully distributed — the re-derivation path for consumers
    that need the flat relation after the postings checkpoint is gone
    (e.g. refresh_norms on a streamed, segment-only index)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            ts, ids, tfs, dls, mtfs = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                d_ids = codec.delta_decode(row.doc_gaps_vb)
                n = len(d_ids)
                ts.extend([row.term] * n)
                ids.extend(d_ids.tolist())
                tfs.extend(codec.varbyte_decode(row.tfs_vb).tolist())
                dls.extend(codec.varbyte_decode(row.doc_lens_vb).tolist())
                mtfs.extend(codec.varbyte_decode(row.max_tfs_vb).tolist())
            yield pd.DataFrame({"term": ts, "doc_id": ids, "tf": tfs,
                                "doc_len": dls, "max_tf": mtfs})

    cols = ["term", "doc_gaps_vb", "tfs_vb", "doc_lens_vb", "max_tfs_vb"]
    return segments.select(*cols).mapInPandas(
        kernel,
        "term string, doc_id long, tf long, doc_len long, max_tf long")


def compact_segments(spark: SparkSession, index_dir: str,
                     purge_deletes: bool = True,
                     range_width: int | None = None) -> dict:
    """Rewrite all segment groups into one consolidated group (grp=0)
    and consolidate dictionary delta rows — the Lucene-merge / Iceberg-
    compaction analogue for the append-only streamed index.

    Every streamed batch appends its own ``grp=N`` tree
    (streaming/incremental.py), so a long-running stream accumulates
    one directory level + >=1 file per (batch, bucket) and multiple
    segment rows per (term, run).  Compaction re-encodes from the flat
    postings checkpoint (or the distributed segment decode when the
    checkpoint is gone), writes one sorted file per bucket under a
    fresh ``grp=0``, atomically swaps the tree, and collapses the
    dictionary to one (term, df, cf) row per term.  Queries are
    result-identical before and after; the next streamed batch simply
    appends ``grp=1``.

    ``purge_deletes``: when the index carries tombstones
    (operators/deletes.py), compaction physically drops the tombstoned
    docs — postings, segments, docinfo, doc_map, norms — recomputes the
    dictionary and global stats from the survivors, and clears the
    tombstones.  This is the Lucene merge-applies-deletes step: after
    it, the index is value-identical to a fresh build over the live
    corpus (doc ids keep their original values; id gaps are fine — runs
    simply hold fewer docs).  Queries are then result-identical WITHOUT
    any tombstone mask, and collection stats stop counting the deleted
    docs.

    Returns metrics (rows/files/bytes before and after)."""
    paths = index_paths(index_dir)
    manifests = storage.read_manifests(index_dir)
    lineage = manifests["stats"]["lineage"]
    n_buckets = int(lineage["n_buckets"])
    # compaction is the natural point to RE-TIER run geometry: a corpus
    # that grew 100x since the build carries 100x the (term, run) rows
    # per posting list, and per-run fixed cost (row decode, kernel
    # dispatch, k-row output) starts to dominate query latency.  Pass
    # ``range_width`` to re-encode with wider runs; queries only read
    # the width from the stats lineage, which is re-committed below.
    if range_width is not None:
        range_width = int(range_width)
        if range_width < 1:
            # the old tree is deleted after the swap — a bad width must
            # fail HERE, not corrupt the only copy of the index
            raise ValueError(f"range_width must be >= 1, got {range_width}")
        retier = range_width != int(lineage["range_width"])
    else:
        range_width = int(lineage["range_width"])
        retier = False
    if retier:
        lineage = {**lineage, "range_width": range_width}
    t0 = time.time()

    seg_before = spark.read.parquet(paths["segments"])
    rows_before = seg_before.count()
    bytes_before = storage.tree_bytes(paths["segments"])
    files_before = sum(
        1 for root, _d, files in os.walk(paths["segments"])
        for f in files if not f.startswith(("_", ".")))

    from .deletes import tombstones_path

    tomb_dir = tombstones_path(index_dir)
    tomb = None
    if purge_deletes and os.path.isdir(tomb_dir):
        tomb = spark.read.parquet(tomb_dir).select("doc_id")

    if os.path.isdir(paths["postings"]):
        flat = spark.read.parquet(paths["postings"])
    else:
        flat = decode_segments(seg_before)
    n_purged = 0
    if tomb is not None:
        # tombstones are the small side (deletes.py cap) — broadcast
        # anti-join, the corpus-sized flat relation never shuffles
        flat = flat.join(F.broadcast(tomb), "doc_id", "left_anti")
        n_purged = tomb.count()
    seg = encode_segments(flat, n_buckets, range_width)
    seg = seg.repartition(n_buckets, "bucket")
    tmp = paths["segments"] + ".compact.tmp"
    storage.atomic_write_parquet(
        seg, os.path.join(tmp, "grp=0"),
        partition_by=["bucket"], sort_within=["term", "run"])
    # swap the whole tree; the .tmp-then-replace makes a crash leave
    # either the old or the new tree, never a mix
    import shutil

    old = paths["segments"] + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.replace(paths["segments"], old)
    os.replace(tmp, paths["segments"])
    shutil.rmtree(old)

    # compaction rewrites history into one group: per-batch snapshot
    # manifests (streaming/incremental.py) no longer address readable
    # grp=N data, so time-travel entries are retired — Iceberg's
    # expire-snapshots-on-rewrite semantics.  Readers get a loud
    # "no snapshot" error instead of a silently wrong as-of view.
    mdir = os.path.join(index_dir, "_manifests")
    if os.path.isdir(mdir):
        for f in os.listdir(mdir):
            if f.startswith("snapshot_grp") and f.endswith(".json"):
                os.remove(os.path.join(mdir, f))

    if tomb is None:
        # consolidate dictionary deltas (sum is the read-side contract,
        # so this is a pure rewrite)
        dictionary = (spark.read.parquet(paths["dictionary"])
                      .groupBy("term")
                      .agg(F.sum("df").cast("long").alias("df"),
                           F.sum("cf").cast("long").alias("cf")))
        storage.atomic_write_parquet(dictionary, paths["dictionary"])
        if retier:
            # queries read range_width from the stats lineage — publish
            # the re-tiered width (metrics unchanged)
            storage.commit_stage(index_dir, "stats", lineage,
                                 dict(manifests["stats"]["metrics"]))
    else:
        # apply the deletes to every side table.  Fresh read handles
        # after the segment swap (a pre-swap DataFrame's file listing
        # points at the replaced tree).
        if os.path.isdir(paths["postings"]):
            purged_flat = spark.read.parquet(paths["postings"]).join(
                F.broadcast(tomb), "doc_id", "left_anti")
            storage.atomic_write_parquet(purged_flat, paths["postings"])
            new_flat = spark.read.parquet(paths["postings"])
        else:
            # segment tree is already purged (encoded from the
            # anti-joined flat) — decode it for the dictionary rebuild
            new_flat = decode_segments(spark.read.parquet(paths["segments"]))
        # df/cf must shrink with the deleted docs — rebuild, don't sum
        from .build import build_dictionary

        storage.atomic_write_parquet(
            build_dictionary(new_flat).select(
                "term", F.col("df").cast("long").alias("df"),
                F.col("cf").cast("long").alias("cf")),
            paths["dictionary"])
        for side in ("docinfo", "doc_map"):
            purged = spark.read.parquet(paths[side]).join(
                F.broadcast(tomb), "doc_id", "left_anti")
            storage.atomic_write_parquet(purged, paths[side])
        # global stats over the survivors (numDocs == maxDoc again)
        docinfo = spark.read.parquet(paths["docinfo"])
        srow = docinfo.agg(F.count("*").alias("n"),
                           F.avg("doc_len").alias("avg")).collect()[0]
        stats_metrics = dict(manifests["stats"]["metrics"])
        stats_metrics["n_docs"] = int(srow["n"])
        stats_metrics["avg_doc_len"] = float(srow["avg"] or 0.0)
        stats_metrics["segments_bytes"] = storage.tree_bytes(
            paths["segments"])
        storage.commit_stage(index_dir, "stats", lineage, stats_metrics)
        # tombstones are applied — clear them (all readers of ``tomb``
        # above have materialized)
        shutil.rmtree(tomb_dir)
        storage.commit_stage(index_dir, "tombstones", lineage,
                             {"n_total": 0, "purged_at_compaction": n_purged})
        if os.path.isdir(paths["norms"]):
            # idf/N moved with the purge — recompute cosine norms
            from ..streaming.incremental import refresh_norms

            refresh_norms(spark, index_dir)

    # a purge that deleted every doc leaves a fileless (unreadable)
    # segment tree — 0 rows by definition
    try:
        rows_after = spark.read.parquet(paths["segments"]).count()
    except Exception:
        rows_after = 0
    metrics = {
        "rows_before": int(rows_before),
        "rows_after": int(rows_after),
        "files_before": files_before,
        "files_after": sum(
            1 for root, _d, files in os.walk(paths["segments"])
            for f in files if not f.startswith(("_", "."))),
        "bytes_before": bytes_before,
        "bytes_after": storage.tree_bytes(paths["segments"]),
        "wall_sec": time.time() - t0,
    }
    storage.commit_stage(index_dir, "compaction", lineage, metrics)
    return metrics


def verify_index(spark: SparkSession, index_dir: str) -> dict:
    """Index integrity check (fsck): recompute cross-table invariants
    and report violations — the operational guard for an index that
    survived crashes, resumes, appends, deletes and compactions.

    Invariants checked (each one distributed aggregation; the decode
    pass is the expensive one, O(index), like a Lucene checkIndex):
      1. decoded segments == flat postings checkpoint (row count + per-
         column checksums) when the checkpoint exists;
      2. dictionary delta-sums == df/cf recomputed from the decode;
      3. committed stats (n_docs, avg_doc_len) == docinfo aggregate;
      4. doc_map covers exactly docinfo's doc ids;
      5. every tombstone id (if any) resolves to a doc_map row.

    Returns {"ok": bool, "errors": [...], "checked": {...}} — never
    raises on a violation (callers decide), only on unreadable input."""
    paths = index_paths(index_dir)
    manifests = storage.read_manifests(index_dir)
    errors: list[str] = []
    checked: dict = {}

    seg = spark.read.parquet(paths["segments"])
    # the O(index) distributed decode feeds TWO consumers (checksum
    # aggregate + dictionary recompute) — persist or fsck pays the
    # dominant cost twice
    dec = decode_segments(seg).persist()
    dec_agg = dec.agg(
        F.count("*").alias("rows"),
        F.sum(F.crc32(F.concat_ws("|", "term", "doc_id", "tf"))).alias("crc"),
        F.sum("tf").alias("tf_sum")).collect()[0]
    checked["decoded_rows"] = int(dec_agg["rows"])

    if os.path.isdir(paths["postings"]):
        flat_agg = spark.read.parquet(paths["postings"]).agg(
            F.count("*").alias("rows"),
            F.sum(F.crc32(F.concat_ws("|", "term", "doc_id", "tf")))
            .alias("crc"),
            F.sum("tf").alias("tf_sum")).collect()[0]
        for col in ("rows", "crc", "tf_sum"):
            if int(flat_agg[col] or 0) != int(dec_agg[col] or 0):
                errors.append(
                    f"segments/postings mismatch on {col}: decoded "
                    f"{dec_agg[col]} vs checkpoint {flat_agg[col]}")

    dict_sum = (spark.read.parquet(paths["dictionary"])
                .groupBy("term").agg(F.sum("df").alias("df"),
                                     F.sum("cf").alias("cf")))
    dict_re = dec.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf"))
    diff = (dict_sum.join(dict_re, "term", "full")
            .filter((F.coalesce(dict_sum["df"], F.lit(-1))
                     != F.coalesce(dict_re["df"], F.lit(-2)))
                    | (F.coalesce(dict_sum["cf"], F.lit(-1))
                       != F.coalesce(dict_re["cf"], F.lit(-2)))).count())
    checked["dictionary_terms"] = int(dict_sum.count())
    dec.unpersist()
    if diff:
        errors.append(f"dictionary drift on {diff} term(s) vs decode")

    docinfo = spark.read.parquet(paths["docinfo"])
    srow = docinfo.agg(F.count("*").alias("n"),
                       F.avg("doc_len").alias("avg")).collect()[0]
    stats = manifests.get("stats", {}).get("metrics", {})
    checked["n_docs"] = int(srow["n"])
    if int(stats.get("n_docs", -1)) != int(srow["n"]):
        errors.append(f"stats n_docs {stats.get('n_docs')} != docinfo "
                      f"{srow['n']}")
    if abs(float(stats.get("avg_doc_len", -1.0))
           - float(srow["avg"] or 0.0)) > 1e-9:
        errors.append(f"stats avg_doc_len {stats.get('avg_doc_len')} != "
                      f"docinfo {srow['avg']}")

    doc_map = spark.read.parquet(paths["doc_map"]).select("doc_id")
    orphans = docinfo.select("doc_id").join(
        doc_map, "doc_id", "left_anti").count()
    if orphans:
        errors.append(f"{orphans} docinfo doc_id(s) missing from doc_map")

    from .deletes import tombstones_path

    tdir = tombstones_path(index_dir)
    if os.path.isdir(tdir):
        dangling = (spark.read.parquet(tdir).select("doc_id")
                    .join(doc_map, "doc_id", "left_anti").count())
        checked["tombstones"] = int(
            spark.read.parquet(tdir).count())
        if dangling:
            errors.append(f"{dangling} tombstone(s) not in doc_map")

    return {"ok": not errors, "errors": errors, "checked": checked}


def index_paths(index_dir: str) -> dict[str, str]:
    return {
        name: os.path.join(index_dir, name)
        for name in ("doc_map", "docinfo", "postings", "dictionary",
                     "segments", "norms")
    }


# --- tiered merge policy (Lucene TieredMergePolicy analogue) -----------------


def select_tiered_merges(group_bytes: dict[int, int], *,
                         segs_per_tier: int = 4,
                         max_merge_at_once: int = 8,
                         floor_bytes: int = 64 * 1024) -> list[list[int]]:
    """Which segment groups to merge, log-structured: full compaction
    (``compact_segments``) rewrites the WHOLE index per call — O(index)
    writes each time, which a continuously-appending web index cannot
    afford.  Tiered merging (Lucene's TieredMergePolicy shape) instead
    buckets groups into geometric size tiers (tier i holds groups in
    [floor·base^i, floor·base^(i+1)), base = ``segs_per_tier``; every
    group below ``floor_bytes`` shares tier 0) and merges ONLY when a
    tier overflows ``segs_per_tier`` members — so each posting byte is
    rewritten O(log N) times over the index's lifetime, and a merge
    touches only the overflowing tier's smallest ``max_merge_at_once``
    groups, never the big settled ones.

    Pure, deterministic (ties broken by grp id), unit-testable: takes
    {grp: bytes}, returns a list of grp-lists to merge (possibly
    empty).  A returned list always has >= 2 members."""
    if segs_per_tier < 2 or max_merge_at_once < 2:
        raise ValueError("segs_per_tier and max_merge_at_once must be >= 2")
    if floor_bytes <= 0:
        # floor 0 would make the tier loop below non-terminating
        raise ValueError("floor_bytes must be > 0")
    tiers: dict[int, list[tuple[int, int]]] = {}
    for grp, nbytes in group_bytes.items():
        t = 0
        size = max(int(nbytes), 0)
        while size >= floor_bytes * (segs_per_tier ** (t + 1)):
            t += 1
        tiers.setdefault(t, []).append((max(int(nbytes), 0), grp))
    merges = []
    for t in sorted(tiers):
        members = sorted(tiers[t])
        if len(members) > segs_per_tier:
            take = min(max_merge_at_once, len(members))
            merges.append(sorted(g for _, g in members[:take]))
    return merges


def merge_segment_groups(spark: SparkSession, index_dir: str,
                         grps: list[int]) -> dict:
    """Physically merge the given segment groups into one fresh group.

    Decode the chosen groups' rows to the flat relation, re-encode
    (same bucket/run layout, one row per (term, run) where the merged
    groups each held a partial), and swap atomically: the FULL new
    tree — hardlinked surviving groups + the merged group — is built
    in a .tmp sibling before a single os.replace, so a crash leaves
    either the old tree or the new one, never a mix (the
    compact_segments contract).  Side tables (doc_map, docinfo,
    dictionary deltas, flat postings) are untouched: group membership
    is invisible to them.

    Snapshot manifests whose grp falls in [min(merged), new) become
    unreadable as-of views (their groups' rows now live in a HIGHER
    group id) and are retired loudly, Iceberg expire-snapshots style;
    snapshots older than every merged group keep working."""
    import shutil

    if len(grps) < 2:
        raise ValueError("need >= 2 groups to merge")
    paths = index_paths(index_dir)
    manifests = storage.read_manifests(index_dir)
    lineage = manifests["stats"]["lineage"]
    n_buckets = int(lineage["n_buckets"])
    range_width = int(lineage["range_width"])
    seg_dir = paths["segments"]
    have = {int(d.split("=", 1)[1]) for d in os.listdir(seg_dir)
            if d.startswith("grp=")}
    missing = sorted(set(grps) - have)
    if missing:
        raise ValueError(f"segment groups not found: {missing}")
    t0 = time.time()
    bytes_before = storage.tree_bytes(seg_dir)

    from ..streaming.incremental import _next_grp

    new_grp = _next_grp(seg_dir)
    chosen = spark.read.parquet(seg_dir).filter(
        F.col("grp").isin([int(g) for g in grps]))
    merged = encode_segments(decode_segments(chosen), n_buckets, range_width)
    tmp = seg_dir + ".merge.tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    storage.atomic_write_parquet(
        merged.repartition(max(1, n_buckets // 4), "bucket"),
        os.path.join(tmp, f"grp={new_grp}"),
        partition_by=["bucket"], sort_within=["term", "run"])
    # hardlink the surviving groups into the tmp tree (no data copy)
    for g in sorted(have - set(grps)):
        shutil.copytree(os.path.join(seg_dir, f"grp={g}"),
                        os.path.join(tmp, f"grp={g}"),
                        copy_function=os.link)
    old = seg_dir + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.replace(seg_dir, old)
    os.replace(tmp, seg_dir)
    shutil.rmtree(old)

    mdir = os.path.join(index_dir, "_manifests")
    retired = []
    if os.path.isdir(mdir):
        for f in sorted(os.listdir(mdir)):
            if f.startswith("snapshot_grp") and f.endswith(".json"):
                g = int(f[len("snapshot_grp"):-len(".json")])
                if min(grps) <= g < new_grp:
                    os.remove(os.path.join(mdir, f))
                    retired.append(g)
    metrics = {
        "merged_from": [int(g) for g in sorted(grps)],
        "new_grp": int(new_grp),
        "n_groups_before": len(have),
        "n_groups_after": len(have) - len(grps) + 1,
        "bytes_before": int(bytes_before),
        "bytes_after": int(storage.tree_bytes(seg_dir)),
        "snapshots_retired": retired,
        "wall_sec": time.time() - t0,
    }
    storage.commit_stage(index_dir, f"merge_grp{new_grp:06d}", lineage,
                         metrics)
    return metrics


def maintain_segments(spark: SparkSession, index_dir: str, *,
                      segs_per_tier: int = 4, max_merge_at_once: int = 8,
                      floor_bytes: int = 64 * 1024) -> list[dict]:
    """One maintenance pass: apply :func:`select_tiered_merges` to the
    on-disk group sizes and execute every selected merge.  Call it
    from the stream's foreachBatch every N batches (or a cron); each
    call is bounded by the overflowing tiers, never by index size.
    Returns the executed merges' metrics (empty = nothing to do)."""
    seg_dir = index_paths(index_dir)["segments"]
    if not os.path.isdir(seg_dir):
        return []
    sizes = {
        int(d.split("=", 1)[1]): storage.tree_bytes(
            os.path.join(seg_dir, d))
        for d in os.listdir(seg_dir) if d.startswith("grp=")}
    out = []
    for grps in select_tiered_merges(
            sizes, segs_per_tier=segs_per_tier,
            max_merge_at_once=max_merge_at_once, floor_bytes=floor_bytes):
        out.append(merge_segment_groups(spark, index_dir, grps))
    return out
