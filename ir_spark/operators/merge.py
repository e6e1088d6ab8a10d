"""Index merge: combine independently-built segment indexes into one.

The north-star shape is a distributed k-way merge of PARTIAL indexes
(each built over its own document shard with a local dense doc-id
space, e.g. per-crawl or per-datacenter builds) into one queryable
index.  The reference merges in-memory SPIMI blocks inside one process
(SPIMI.java run merge); this is the cluster-scale analogue.

The key property making the merge cheap is the segment codec layout
(codec.py): a posting run's ``doc_gaps_vb`` stores the FIRST doc id
absolute and the rest as gaps, and runs are doc-range sharded
(run = floor(doc_id / range_width)).  Re-basing a source index onto a
disjoint doc-id range by an offset that is a multiple of range_width
therefore touches only:

  - the first varint of each ``doc_gaps_vb`` blob (re-encoded),
  - the run number and the first/last/block-last doc-id metadata,

while the gap tail, tf/doc_len/max_tf streams, and WAND skylines pass
through byte-identical.  Work is O(runs), not O(postings): merging
P indexes is a narrow map over segment rows + one bucket-clustered
write, no posting decode, no re-sort, no shuffle of posting payloads
beyond the bucket clustering.  Dictionary rows merge by sum (the
read-side delta contract dictionaries already obey), doc-local tables
(doc_map / docinfo / flat postings) union with the offset applied, and
collection stats + cosine norms are recomputed — norms depend on the
GLOBAL n/avg_dl/df, so per-source norms are invalid after a merge by
construction.

Offsets come from each source's max doc id (not n_docs), so already-
merged indexes (whose id space has range-alignment gaps) merge again
correctly.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import codec
from ..sources import storage
from .segments import index_paths


def _shifted_segments(seg: DataFrame, off: int, range_width: int) -> DataFrame:
    """Re-base one source's segment rows by ``off`` (a multiple of
    range_width): metadata shifts in Catalyst, the first varint of the
    gaps blob is re-encoded in an Arrow-batched UDF (one small python
    loop over RUNS, never postings)."""
    if off == 0:
        return seg
    if off % range_width:
        raise ValueError("offset must be a multiple of range_width")

    # lazy UDF construction: module-level pandas_udf breaks under
    # spark-submit (no active session at import)
    @F.pandas_udf("binary")
    def shift_first(bufs: pd.Series) -> pd.Series:
        out = []
        for b in bufs:
            if not b:
                out.append(b)
                continue
            ba = np.frombuffer(b, dtype=np.uint8)
            end = int(np.flatnonzero((ba & 0x80) == 0)[0])
            first = int(codec.varbyte_decode(bytes(ba[: end + 1]))[0])
            out.append(codec.varbyte_encode([first + off])
                       + b[end + 1:])
        return pd.Series(out)

    o = F.lit(off)
    return (
        seg.withColumn("run", F.col("run") + F.lit(off // range_width))
        .withColumn("first_doc_id", F.col("first_doc_id") + o)
        .withColumn("last_doc_id", F.col("last_doc_id") + o)
        .withColumn("block_last_doc_id",
                    F.transform("block_last_doc_id", lambda x: x + o))
        .withColumn("doc_gaps_vb", shift_first("doc_gaps_vb"))
    )


def merge_indexes(spark: SparkSession, src_dirs: list[str],
                  out_dir: str) -> dict:
    """Merge segment indexes at ``src_dirs`` into a new index at
    ``out_dir``.  Sources must share n_buckets / range_width / stem.
    Returns metrics (per-source offsets, totals, wall time)."""
    if len(src_dirs) < 2:
        raise ValueError("need at least two source indexes")
    t0 = time.time()

    lineages = []
    kept: list[str] = []
    for d in src_dirs:
        m = storage.read_manifests(d)
        if "stats" not in m:
            raise ValueError(f"{d}: not a completed index (no stats manifest)")
        # an empty source (a shard that ingested 0 pages is still a
        # completed index) has nothing to contribute — and its table
        # dirs may hold no schema-bearing files, so reading them would
        # crash with UNABLE_TO_INFER_SCHEMA.  Skip it.
        if int(m["stats"]["metrics"].get("n_docs", 0) or 0) == 0:
            continue
        kept.append(d)
        lineages.append(m["stats"]["lineage"])
    if not kept:
        raise ValueError("every source index is empty")
    src_dirs = kept
    base = lineages[0]
    for key in ("n_buckets", "range_width", "stem"):
        vals = {ln.get(key) for ln in lineages}
        if len(vals) != 1:
            raise ValueError(f"sources disagree on {key}: {vals}")
    n_buckets = int(base["n_buckets"])
    range_width = int(base["range_width"])

    paths = [index_paths(d) for d in src_dirs]
    out = index_paths(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # offsets from each source's max doc id, range-aligned
    offsets: list[int] = []
    off = 0
    for p in paths:
        offsets.append(off)
        raw_max = spark.read.parquet(p["docinfo"]) \
            .agg(F.max("doc_id")).collect()[0][0]
        # an empty source (a shard that ingested 0 pages is still a
        # completed index) aggregates max() to NULL — contribute no
        # id range rather than crash on int(None)
        if raw_max is None:
            continue
        off += (int(raw_max) // range_width + 1) * range_width

    lineage = {
        "source": "merge:" + ";".join(src_dirs),
        "stem": base["stem"],
        "n_buckets": n_buckets,
        "range_width": range_width,
        "segment_groups": 1,
        "offsets": offsets,
    }

    def _union(name: str, shift_doc_id: bool) -> DataFrame:
        parts = []
        for p, o in zip(paths, offsets):
            df = spark.read.parquet(p[name])
            if shift_doc_id and o:
                df = df.withColumn("doc_id", F.col("doc_id") + F.lit(o))
            parts.append(df)
        u = parts[0]
        for df in parts[1:]:
            u = u.unionByName(df)
        return u

    # doc-local tables: union + offset
    storage.atomic_write_parquet(_union("doc_map", True), out["doc_map"])
    storage.commit_stage(out_dir, "doc_map", lineage,
                         {"bytes": storage.tree_bytes(out["doc_map"])})
    storage.atomic_write_parquet(_union("docinfo", True), out["docinfo"])
    storage.commit_stage(out_dir, "docinfo", lineage,
                         {"bytes": storage.tree_bytes(out["docinfo"])})
    storage.atomic_write_parquet(_union("postings", True), out["postings"])
    storage.commit_stage(out_dir, "postings", lineage,
                         {"bytes": storage.tree_bytes(out["postings"])})

    # dictionary: delta rows merge by sum (the read-side contract)
    dictionary = (_union("dictionary", False)
                  .groupBy("term")
                  .agg(F.sum("df").cast("long").alias("df"),
                       F.sum("cf").cast("long").alias("cf")))
    storage.atomic_write_parquet(dictionary, out["dictionary"])
    storage.commit_stage(out_dir, "dictionary", lineage,
                         {"bytes": storage.tree_bytes(out["dictionary"])})

    # segments: metadata-shift map + one bucket-clustered write
    shifted = None
    n_runs_in = 0
    for p, o in zip(paths, offsets):
        # drop the source tree's grp partition column (streamed indexes
        # have one per appended batch) — the merged tree is a single
        # fresh grp=0 and must not re-embed stale grp values in files
        seg = spark.read.parquet(p["segments"]).drop("grp")
        s = _shifted_segments(seg, o, range_width)
        shifted = s if shifted is None else shifted.unionByName(s)
    seg_all = shifted.repartition(n_buckets, "bucket")
    storage.atomic_write_parquet(
        seg_all, os.path.join(out["segments"], "grp=0"),
        partition_by=["bucket"], sort_within=["term", "run"])
    written = spark.read.parquet(out["segments"])
    agg = written.agg(
        F.count("*").alias("runs"),
        F.sum("run_df").alias("postings"),
        F.sum(F.octet_length("doc_gaps_vb") + F.octet_length("tfs_vb")
              + F.octet_length("doc_lens_vb")
              + F.octet_length("max_tfs_vb")).alias("payload"),
    ).collect()[0]
    n_runs_in = int(agg["runs"])
    storage.commit_stage(out_dir, "segments_g0", lineage, {
        "n_runs": n_runs_in,
        "n_postings": int(agg["postings"] or 0),
        "payload_bytes": int(agg["payload"] or 0),
        "bytes": storage.tree_bytes(out["segments"]),
    })

    # global stats changed -> commit them, then recompute norms via
    # the ONE canonical implementation (refresh_norms reads the stats
    # manifest, handles the n_docs<=1 degenerate case and the
    # segment-only fallback — this used to be a third hand-maintained
    # copy of the dictionary-join + sqrt-sum-of-squares pipeline)
    docinfo = spark.read.parquet(out["docinfo"])
    stats = docinfo.agg(F.count("*").alias("n"),
                        F.avg("doc_len").alias("avg")).collect()[0]
    n_docs = int(stats["n"])
    avg_dl = float(stats["avg"]) if stats["avg"] is not None else 0.0

    metrics = {
        "n_sources": len(src_dirs),
        "offsets": offsets,
        "n_docs": n_docs,
        "avg_doc_len": avg_dl,
        "n_runs": n_runs_in,
        "segments_bytes": storage.tree_bytes(out["segments"]),
        "flat_postings_bytes": storage.tree_bytes(out["postings"]),
        "payload_bytes": int(agg["payload"] or 0),
        "wall_sec": time.time() - t0,
    }
    storage.commit_stage(out_dir, "stats", lineage, metrics)

    from ..streaming.incremental import refresh_norms

    refresh_norms(spark, out_dir)
    storage.commit_stage(out_dir, "norms", lineage,
                         {"n_docs": n_docs, "avg_doc_len": avg_dl,
                          "bytes": storage.tree_bytes(out["norms"])})
    return metrics
