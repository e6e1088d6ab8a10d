"""Incremental (streaming) segment-index maintenance.

The batch index (operators/segments.py) shards every posting list into
doc-id-range *runs*.  That makes incremental updates append-only:

- new documents get doc ids ABOVE the current maximum (per-batch offset
  from the committed doc_map), so their postings land in new (or the
  tail) runs;
- the query kernel (operators/segment_query.py) accumulates any number
  of segment rows per (term, run) — two rows with disjoint doc ids sum
  correctly — so appended rows need NO merge/rewrite of existing
  segments;
- the dictionary becomes append-only delta rows (term, df, cf);
  readers aggregate with sum(df) (SegmentIndex.df_of does);
- docinfo rows append; global stats (N, avgDocLen) are recomputed from
  docinfo and re-committed after each batch;
- w1/w2 cosine norms depend on global df, so appends invalidate them —
  ``refresh_norms`` recomputes them (one agg) when cosine modes are
  needed; BM25/W-modes' df/N/avg_dl are always current.

``stream_index`` wires this into Structured Streaming:
``readStream.parquet(dir)`` -> ``foreachBatch(update)`` with a
checkpoint for exactly-once; replayed batches are skipped via a
``stream_batch_<id>`` manifest (idempotent foreachBatch — the standard
Spark pattern for exactly-once sinks without transactional storage).

Reference parity note: the reference's only "incremental" facility is
whole-index re-serialization (Driver.java:26-57); this module is the
Spark-native generalization the north star's resumable-build
requirement implies.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import storage
from ..operators.build import (build_dictionary, docinfo_from_fused,
                               postings_from_fused, token_counts_fused)
from ..operators.segments import encode_segments, index_paths
from ..operators.query import doc_weight_expr

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def _next_grp(segments_dir: str) -> int:
    """Increment batches write grp=<n> partition dirs above existing."""
    if not os.path.isdir(segments_dir):
        return 0
    grps = [int(d.split("=", 1)[1]) for d in os.listdir(segments_dir)
            if d.startswith("grp=")]
    return max(grps, default=-1) + 1


def _publish_append(df: DataFrame, dest: str, marker: str) -> None:
    """Append ``df``'s rows to the parquet table at ``dest`` with
    DETERMINISTIC per-batch file names (``<marker>-N.parquet``): the
    batch stages to a tmp sibling, any files of the SAME marker (a
    crashed earlier attempt) are cleared, then the parts publish via
    os.replace.  Re-running the same batch is therefore idempotent —
    plain ``mode('append')`` writes random part names, so a replayed
    half-written batch would duplicate rows."""
    import shutil

    stage = dest.rstrip("/") + f".{marker}.tmp"
    if os.path.exists(stage):
        shutil.rmtree(stage)
    df.write.mode("overwrite").parquet(stage)
    os.makedirs(dest, exist_ok=True)
    for old in os.listdir(dest):
        if old.startswith(marker + "-"):
            os.remove(os.path.join(dest, old))
    parts = sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))
    for i, f in enumerate(parts):
        os.replace(os.path.join(stage, f),
                   os.path.join(dest, f"{marker}-{i:05d}.parquet"))
    shutil.rmtree(stage)


def _repair_crashed_batch(paths: dict, manifests: dict) -> None:
    """Heal a batch that crashed mid-append: the ``batch_intent``
    manifest (written before any table write) without its matching
    snapshot manifest means the last attempt died with partial
    appends — remove every file the attempt published (deterministic
    ``b<offset>-*`` names + its segment group dir) so the replay sees
    exactly the committed state.  Without this, a crash after the
    doc_map append made the replay's first-seen anti-join drop the
    batch urls forever: doc ids with no postings, silently
    unsearchable."""
    import shutil

    intent = manifests.get("batch_intent")
    if not intent:
        return
    im = intent.get("metrics", {})
    grp = int(im.get("grp", -1))
    # the intent is re-committed with done=True right after the
    # snapshot commit; the snapshot check covers only the crash window
    # between those two writes (the snapshot manifest itself can be
    # legitimately retired later by compaction/expiry, so done is the
    # durable signal)
    if grp < 0 or im.get("done") or f"snapshot_grp{grp:06d}" in manifests:
        return  # no intent or the batch committed — nothing to heal
    marker = f"b{int(im['offset'])}"
    for tbl in ("doc_map", "docinfo", "dictionary", "postings"):
        d = paths[tbl]
        if os.path.isdir(d):
            for f in os.listdir(d):
                if f.startswith(marker + "-"):
                    os.remove(os.path.join(d, f))
    gdir = os.path.join(paths["segments"], f"grp={grp}")
    if os.path.isdir(gdir):
        shutil.rmtree(gdir)


def update_segment_index(
    spark: SparkSession,
    new_pages: DataFrame,
    index_dir: str,
    *,
    stem: bool = False,
    n_buckets: int | None = None,
    range_width: int | None = None,
    batch_tag: str | None = None,
    replace_existing: bool = False,
) -> dict:
    """Append a batch of pages to an existing (possibly empty) index.

    Usable directly for batch appends and from foreachBatch.  Returns
    batch metrics.  Layout parameters are read from the committed stats
    manifest when present so every increment matches the base build.

    ``replace_existing=False`` (default) keeps the first-seen-wins
    append contract: urls already in the doc_map are dropped.  With
    ``replace_existing=True`` every batch url is indexed under a FRESH
    doc id (the recrawl path — see :func:`upsert_documents`, which
    also tombstones the superseded ids).
    """
    os.makedirs(index_dir, exist_ok=True)
    paths = index_paths(index_dir)
    manifests = storage.read_manifests(index_dir)
    _repair_crashed_batch(paths, manifests)
    if "stats" in manifests:
        lineage = manifests["stats"]["lineage"]
        n_buckets = int(lineage["n_buckets"])
        range_width = int(lineage["range_width"])
        # the tokenizer variant is index lineage too: an increment
        # defaulting to stem=False on a stemmed base would append
        # unstemmed terms next to stemmed ones — df/cf split across
        # variants and queries silently match half the corpus
        stem = bool(lineage.get("stem", stem))
    else:
        from ..operators.segments import DEFAULT_RANGE_WIDTH

        lineage = {
            "source": "stream", "stem": stem,
            "n_buckets": n_buckets or storage.DEFAULT_BUCKETS,
            "range_width": range_width or DEFAULT_RANGE_WIDTH,
            "segment_groups": 0,
        }
        n_buckets = lineage["n_buckets"]
        range_width = lineage["range_width"]

    t0 = time.time()

    # within-batch url dedup (the cross-batch anti-join can't catch
    # these): keep one deterministic row per url — latest warc_ts when
    # the column exists, else max(text) — so a doubled url can't
    # double-count tf/doc_len/df in the appended deltas
    if "warc_ts" in new_pages.columns:
        new_pages = (
            new_pages.select("url", "warc_ts", "text")
            .groupBy("url")
            .agg(F.max(F.struct("warc_ts", "text")).alias("_s"))
            .select("url", F.col("_s.text").alias("text")))
    else:
        new_pages = (new_pages.select("url", "text").groupBy("url")
                     .agg(F.max("text").alias("text")))

    # -- doc ids: offset above the committed maximum ----------------------
    have_doc_map = os.path.isdir(paths["doc_map"])
    if have_doc_map:
        old_map = spark.read.parquet(paths["doc_map"])
        offset = old_map.agg(F.max("doc_id")).collect()[0][0] or 0
        fresh = (new_pages.select("url", "text") if replace_existing
                 else new_pages.select("url", "text").join(
                     old_map.select("url"), "url", "left_anti"))
    else:
        offset = 0
        fresh = new_pages.select("url", "text")

    # batch-local deterministic ids (rank over url within the batch),
    # shifted above the committed id space
    from ..operators.build import assign_doc_ids

    caches: list = []
    batch_map = assign_doc_ids(fresh, caches).withColumn(
        "doc_id", (F.col("doc_id") + F.lit(offset)).cast("long"))
    n_new = batch_map.count()
    if n_new == 0:
        for c in caches:
            c.unpersist()
        return {"n_new_docs": 0, "wall_sec": time.time() - t0}
    # batch intent BEFORE any table write + deterministic per-batch
    # file names afterwards: a crash anywhere in the append sequence
    # leaves an intent without its snapshot, and the next call's
    # _repair_crashed_batch removes the partial files — the
    # exactly-once foreachBatch contract holds through mid-batch
    # crashes, not just between batches
    grp = _next_grp(paths["segments"])
    marker = f"b{int(offset)}"
    storage.commit_stage(index_dir, "batch_intent", lineage,
                         {"offset": int(offset), "grp": int(grp)})
    _publish_append(batch_map, paths["doc_map"], marker)
    # release per-batch caches: foreachBatch calls this once per
    # micro-batch and a leaked persist per batch accumulates unbounded
    for c in caches:
        c.unpersist()

    # re-derive the batch ids from the DURABLE doc_map (ids > offset).
    # Joining against ``fresh`` here would be wrong: its anti-join plan
    # re-reads doc_map lazily, and after the append it would filter the
    # batch out (lazy evaluation over mutated storage).
    pages_ids = new_pages.select("url", "text").join(
        spark.read.parquet(paths["doc_map"]).filter(F.col("doc_id") > offset),
        "url")

    # -- tokenize once; docinfo + postings + dictionary deltas ------------
    tokens = token_counts_fused(pages_ids, stem=stem).persist()
    _publish_append(docinfo_from_fused(tokens), paths["docinfo"], marker)
    flat = postings_from_fused(tokens)
    _publish_append(build_dictionary(flat), paths["dictionary"], marker)

    # -- segment rows for the new docs (append-only: disjoint doc ids) ---
    docinfo_new = spark.read.parquet(paths["docinfo"]).filter(
        F.col("doc_id") > offset)
    flat_full = flat.join(docinfo_new, "doc_id")
    # keep the flat postings checkpoint complete too (norm refresh +
    # re-derivations read it), then encode from the written parquet so
    # the tokenize->join pipeline runs once
    _publish_append(flat_full, paths["postings"], marker)
    flat_written = spark.read.parquet(paths["postings"]).filter(
        F.col("doc_id") > offset)
    seg = encode_segments(flat_written, n_buckets, range_width)
    seg = seg.repartition(max(1, n_buckets // 4), "bucket")
    (seg.sortWithinPartitions("term", "run")
        .write.mode("append").partitionBy("bucket")
        .parquet(os.path.join(paths["segments"], f"grp={grp}")))
    tokens.unpersist()

    # -- refresh global stats ---------------------------------------------
    docinfo = spark.read.parquet(paths["docinfo"])
    stats = docinfo.agg(F.count("*").alias("n"),
                        F.avg("doc_len").alias("avg")).collect()[0]
    metrics = {
        "n_docs": int(stats["n"]),
        "avg_doc_len": float(stats["avg"]),
        "n_new_docs": n_new,
        "last_batch": batch_tag or "",
        "wall_sec": time.time() - t0,
    }
    storage.commit_stage(index_dir, "stats", lineage, metrics)
    # snapshot log (Iceberg-snapshot analogue): one immutable manifest
    # per committed batch, keyed by its segment group — enough to read
    # the index AS OF any batch later (SegmentIndex.load(as_of_grp=...)):
    # grp bounds the segment rows, max_doc_id bounds doc_map/docinfo,
    # and the frozen stats reproduce this moment's N / avgDocLen.
    storage.commit_stage(
        index_dir, f"snapshot_grp{grp:06d}", lineage,
        {"grp": int(grp), "max_doc_id": int(offset + n_new),
         "n_docs": int(stats["n"]), "avg_doc_len": float(stats["avg"]),
         "batch_tag": batch_tag or ""})
    # seal the intent: the durable committed signal (snapshots can be
    # retired later by compaction/expiry; the repair pass must never
    # mistake that for a crash)
    storage.commit_stage(index_dir, "batch_intent", lineage,
                         {"offset": int(offset), "grp": int(grp),
                          "done": True})
    return metrics


def upsert_documents(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    *,
    stem: bool = False,
    batch_tag: str | None = None,
) -> dict:
    """Recrawl upsert — LAST-wins replace-by-url, the page-refresh
    path a living web index needs (the append contract is first-seen-
    wins, so recrawled pages would otherwise be dropped):

      1. within-batch dedup keeps one row per url (latest warc_ts —
         done inside update_segment_index);
      2. urls already LIVE in the index are tombstoned (operators/
         deletes.py::delete_docs — Lucene's delete-then-add, exactly
         how IndexWriter.updateDocument works): the superseded doc ids
         vanish from results instantly, while collection stats keep
         maxDoc semantics until compaction;
      3. the whole batch is appended under FRESH doc ids
         (``replace_existing=True`` skips the first-seen anti-join),
         committing the usual dictionary/docinfo/segment deltas plus a
         snapshot manifest — as-of reads of PRE-upsert snapshots still
         see the old versions (tombstones are current-view only).

    Plan shape: one broadcast semi-join against the (batch-sized) url
    set for the tombstones — the corpus-sized doc_map never shuffles —
    then the ordinary append build on batch-sized data.  Repeated
    upserts of the same url tombstone only the currently-live id
    (earlier ids are already tombstoned and anti-joined away inside
    delete_docs).  Recrawl-heavy indexes should compact_segments(
    purge_deletes=True) periodically: live tombstones are capped by
    MAX_INLINE_TOMBSTONES (deletes.py).

    Returns the append metrics plus {"n_replaced": <tombstoned ids>}.
    """
    from ..operators.deletes import delete_docs

    paths = index_paths(index_dir)
    n_replaced = 0
    if os.path.isdir(paths["doc_map"]):
        batch_urls = pages.select("url").distinct()
        doc_map = spark.read.parquet(paths["doc_map"])
        matched = doc_map.join(F.broadcast(batch_urls), "url", "left_semi")
        if matched.limit(1).count():
            n_replaced = delete_docs(
                spark, index_dir,
                matched.select("url").distinct())["n_new"]
    metrics = update_segment_index(
        spark, pages, index_dir, stem=stem, batch_tag=batch_tag,
        replace_existing=True)
    metrics["n_replaced"] = int(n_replaced)
    return metrics


def refresh_norms(spark: SparkSession, index_dir: str) -> None:
    """Recompute w1/w2 cosine norms over the whole index (appends make
    them stale because idf moves with df/N).  One join + one agg."""
    paths = index_paths(index_dir)
    manifests = storage.read_manifests(index_dir)
    stats = manifests["stats"]["metrics"]
    n_docs, avg_dl = int(stats["n_docs"]), float(stats["avg_doc_len"])
    if n_docs <= 1:
        # w1/w2 idf divides by log(N): undefined at N<=1 (the oracle
        # never scores such a collection either).  Keep the norms table
        # present-but-empty so the index stays loadable — e.g. after a
        # compaction that purged every document.
        empty = spark.createDataFrame(
            [], "doc_id long, norm_w1 double, norm_w2 double")
        storage.atomic_write_parquet(empty, paths["norms"])
        return
    docinfo = spark.read.parquet(paths["docinfo"])
    dictionary = (spark.read.parquet(paths["dictionary"])
                  .groupBy("term").agg(F.sum("df").alias("df")))
    if os.path.isdir(paths["postings"]):
        postings = spark.read.parquet(paths["postings"])
    else:
        # segment-only index (e.g. streamed index whose flat postings
        # checkpoint was pruned): re-derive the flat relation from the
        # compressed segments — distributed decode, same shape
        from ..operators.segments import decode_segments

        postings = decode_segments(spark.read.parquet(paths["segments"]))
    joined = postings.join(dictionary, "term")
    w1 = doc_weight_expr("w1", n_docs, avg_dl)
    w2 = doc_weight_expr("w2", n_docs, avg_dl)
    norms = joined.groupBy("doc_id").agg(
        F.sqrt(F.sum(w1 * w1)).alias("norm_w1"),
        F.sqrt(F.sum(w2 * w2)).alias("norm_w2"),
    )
    storage.atomic_write_parquet(norms, paths["norms"])


def stream_index(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    *,
    checkpoint_dir: str | None = None,
    schema: str = PAGES_SCHEMA,
    stem: bool = False,
    available_now: bool = True,
):
    """Continuously (or catch-up with availableNow) index new page
    files dropped into ``source_dir``.

    Exactly-once: the streaming checkpoint replays uncommitted batches
    after a crash; ``stream_batch_<id>`` manifests make the replayed
    ``update_segment_index`` a no-op (idempotent foreachBatch).
    """
    checkpoint_dir = checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint")

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        stage = f"stream_batch_{batch_id}"
        lineage = {"source": source_dir, "stem": stem}
        if storage.stage_committed(index_dir, stage, lineage):
            return
        m = update_segment_index(
            spark, batch_df, index_dir, stem=stem,
            batch_tag=f"batch_{batch_id}")
        storage.commit_stage(index_dir, stage, lineage, m)

    reader = spark.readStream.schema(schema).parquet(source_dir)
    writer = reader.writeStream.foreachBatch(_update).option(
        "checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return query


def expire_snapshots(index_dir: str, *, keep_last: int = 10) -> dict:
    """Retention for the per-batch snapshot log (Iceberg
    expire-snapshots): keep the newest ``keep_last`` snapshot
    manifests, remove the rest.  Expiring a snapshot only forfeits
    the ability to time-travel to it (`SegmentIndex.load(as_of_grp=)`
    then raises loudly); no data files are touched — segment groups
    remain until a merge/compaction rewrites them.  Pure metadata op,
    no SparkSession needed."""
    if keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    mdir = os.path.join(index_dir, "_manifests")
    if not os.path.isdir(mdir):
        return {"expired": [], "kept": []}
    snaps = sorted(
        (int(f[len("snapshot_grp"):-len(".json")]), f)
        for f in os.listdir(mdir)
        if f.startswith("snapshot_grp") and f.endswith(".json"))
    cut = len(snaps) - keep_last
    expired = []
    for g, f in snaps[:max(cut, 0)]:
        os.remove(os.path.join(mdir, f))
        expired.append(g)
    return {"expired": expired,
            "kept": [g for g, _ in snaps[max(cut, 0):]]}
