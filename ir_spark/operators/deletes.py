"""Document deletion for the segment index — Lucene liveDocs / Iceberg
delete-files analogue.

The reference engine has no deletion facility at all (its only index
mutation is whole re-serialization, Driver.java:26-57); a long-running
web index needs one (takedowns, re-crawls, spam removal).  Semantics
follow Lucene's maxDoc/numDocs convention exactly:

- ``delete_docs`` resolves urls to doc ids against the committed
  doc_map and APPENDS (doc_id, url) tombstone rows — no segment is
  rewritten.  Queries exclude tombstoned docs from RESULTS immediately,
  but collection statistics (N, avgDocLen, df) keep their pre-delete
  values until compaction — Lucene's exact behavior between a delete
  and the merge that applies it.
- ``compact_segments(purge_deletes=True)`` (operators/segments.py)
  physically drops the tombstoned rows from postings / segments /
  docinfo / doc_map, recomputes the dictionary and global stats from
  the surviving postings, refreshes norms, and clears the tombstones —
  after which the index is value-identical to a fresh build over the
  live corpus.

Scale shape: tombstones between compactions are operationally a small
fraction of the corpus (Lucene holds them as per-segment bitsets in
executor RAM; Iceberg as delete files merged on read).  Here the
delete set rides ONE explicit ``SparkContext.broadcast`` of a sorted
int64 array into the scoring kernels, which mask deleted ids BEFORE
the run-local top-k selection — masking after the kernels would
under-fill any run whose local top-k contained a deleted doc and
silently return fewer than k live results.  ``MAX_INLINE_TOMBSTONES``
guards the broadcast: past it (≈160 MB of ids) the right move is a
compaction, and the loader says so instead of degrading.  (If a
deployment must carry a larger live delete set between compactions,
``codec.roaring_encode`` — Lucene's actual liveDocs structure, tested
in tests/test_codec.py — cuts the broadcast to ≤2 B/id before the
cap binds; the kernels' sorted-slice masking would then decode per
executor once.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import storage
from .segments import index_paths

# 20M ids * 8B = 160 MB broadcast — past this, compact instead.
MAX_INLINE_TOMBSTONES = 20_000_000


def tombstones_path(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def delete_docs(spark: SparkSession, index_dir: str,
                urls: DataFrame | list[str]) -> dict:
    """Tombstone the given urls (list, or a DataFrame with a ``url``
    column).  Idempotent: urls already tombstoned or absent from the
    doc_map add nothing.  Returns {n_requested, n_new, n_total}."""
    paths = index_paths(index_dir)
    doc_map = spark.read.parquet(paths["doc_map"])
    if isinstance(urls, DataFrame):
        urls_df = urls.select("url").distinct()
    else:
        urls_df = spark.createDataFrame(
            [(u,) for u in sorted(set(urls))], "url string")
    n_requested = urls_df.count()
    # the delete set is the small side by construction — broadcast it so
    # the doc_map (corpus-sized) never shuffles for a delete
    hit = doc_map.join(F.broadcast(urls_df), "url").select("doc_id", "url")
    tomb_dir = tombstones_path(index_dir)
    if os.path.isdir(tomb_dir):
        existing = spark.read.parquet(tomb_dir).select("doc_id")
        hit = hit.join(F.broadcast(existing), "doc_id", "left_anti")
    # one action: materialize the new tombstones, then count from disk
    hit.coalesce(1).write.mode("append").parquet(tomb_dir)
    total_df = spark.read.parquet(tomb_dir)
    n_total = total_df.count()
    manifests = storage.read_manifests(index_dir)
    lineage = manifests.get("stats", {}).get("lineage", {})
    prev = manifests.get("tombstones", {}).get("metrics", {})
    n_new = n_total - int(prev.get("n_total", 0))
    storage.commit_stage(index_dir, "tombstones", lineage,
                         {"n_total": n_total, "n_last_batch": n_new})
    return {"n_requested": int(n_requested), "n_new": int(n_new),
            "n_total": int(n_total)}


def load_tombstone_ids(spark: SparkSession, index_dir: str):
    """Sorted int64 numpy array of tombstoned doc ids, or None when the
    index has no tombstones.  One small collect — the set is bounded by
    MAX_INLINE_TOMBSTONES (compaction is the pressure valve)."""
    import numpy as np

    tomb_dir = tombstones_path(index_dir)
    if not os.path.isdir(tomb_dir):
        return None
    ids_df = spark.read.parquet(tomb_dir).select("doc_id")
    # cap check via count(), NOT a capped collect(): materializing up
    # to MAX_INLINE_TOMBSTONES+1 pyspark Row objects is several GB of
    # Python overhead at the documented cap (vs the ~160 MB of raw
    # ids), i.e. a driver OOM on a legitimate in-cap delete set
    n = ids_df.count()
    if n > MAX_INLINE_TOMBSTONES:
        raise RuntimeError(
            f"{n} tombstones exceed the inline-broadcast cap "
            f"({MAX_INLINE_TOMBSTONES}); run compact_segments("
            "purge_deletes=True) to apply them physically")
    if n == 0:
        return None
    # Arrow path: one int64 column straight into numpy, no Row objects
    return np.sort(ids_df.toPandas()["doc_id"].to_numpy(np.int64))
