"""Positional index + phrase / proximity search.

The reference engine indexes only (term -> doc_id, tf) — its SPIMI
invert loop keeps a per-term count and discards token order
(SPIMI.java:111-117, Indexer.java:104-111) — so phrase and proximity
queries are out of its reach.  A web-scale fulltext index needs them;
this module adds the positional layer Spark-first:

* ``token_positions`` — one Arrow-batched ``mapInPandas`` pass emits
  (doc_id, term, positions array<int>) with positions final per row
  (a document never spans rows), so NO downstream aggregation is
  needed: the relation is born grouped.  Position = 0-based index in
  the kept-token stream of the canonical ``tokenize`` pipeline
  (stopwords occupy positions and get posting rows — phrases like
  "state of the art" need them).
* ``phrase_search`` — match a k-term phrase with k-1 JVM-side
  ``array_intersect(transform(prev, +1), next)`` folds over ONE
  map-assembled row per candidate document: one shuffle on doc_id
  over only the phrase terms' postings, no positional explode, no
  self-join.  Overlapping occurrences count (positions [15,16,17] of
  "batch" contain "batch batch" twice).
* ``proximity_search`` — unordered within-window match for a term
  pair, min pairwise distance via a sorted two-array scan inside a
  higher-order expression; same one-shuffle shape.

Scale shape (100 TB): both searches touch only the queried terms'
rows.  With the positional relation stored term-bucketed (see
``build_positional_store``), the scan prunes to len(phrase) buckets
and pushes ``term IN (...)`` into parquet row-group stats, exactly
like the tf segment store (PLANS.md §1); the positions themselves
travel delta+varbyte-encoded (codec.py) and are decoded only for
candidate documents.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codec import (delta_decode, delta_encode, delta_encode_batch,
                     varbyte_decode)
from ..sources.storage import (
    DEFAULT_BUCKETS,
    atomic_write_parquet,
    term_bucket_col,
    term_bucket_py,
)
from ..text import tokenize

POSITIONS_SCHEMA = "doc_id long, term string, positions array<int>"


def token_positions_kernel(
    batches: Iterator[pd.DataFrame], stem: bool = False
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, text) -> (doc_id, term, positions).

    Positions are collected per document inside the batch; each output
    row is a complete posting (tf == len(positions))."""
    for pdf in batches:
        doc_ids: list[int] = []
        terms: list[str] = []
        poss: list[list[int]] = []
        for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
            if text is None:
                continue
            per_term: dict[str, list[int]] = {}
            for pos, term in enumerate(tokenize(text, stem=stem)):
                per_term.setdefault(term, []).append(pos)
            for term, plist in per_term.items():
                doc_ids.append(doc_id)
                terms.append(term)
                poss.append(plist)
        yield pd.DataFrame(
            {"doc_id": doc_ids, "term": terms, "positions": poss})


def token_positions(pages: DataFrame, stem: bool = False) -> DataFrame:
    """(doc_id, text) -> (doc_id, term, positions) via the Arrow kernel.

    Same small-input width guard as ``build.token_counts``: a
    one-file scan would run the CPU-bound kernel serially."""
    sel = pages.select("doc_id", "text")
    sc = sel.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_inputs = len(sel.inputFiles())
    except Exception:
        n_inputs = 0
    if n_inputs < target:
        sel = sel.repartition(2 * target)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return token_positions_kernel(batches, stem=stem)

    return sel.mapInPandas(kernel, schema=POSITIONS_SCHEMA)


def _phrase_candidates(positions: DataFrame,
                       terms: Sequence[str]) -> DataFrame:
    """Documents containing ALL phrase terms, with one map row
    {term -> positions} each: filter to the phrase vocabulary (the
    only rows that ever shuffle), group once on doc_id."""
    uniq = sorted(set(terms))
    return (
        positions.filter(F.col("term").isin(uniq))
        .groupBy("doc_id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("term", "positions"))).alias("m"))
        .filter(F.size(F.map_keys(F.col("m"))) == len(uniq))
    )


def phrase_search(positions: DataFrame, terms: Sequence[str]) -> DataFrame:
    """Exact phrase match -> (doc_id, phrase_tf), phrase_tf >= 1.

    Folds ``cand = array_intersect(transform(cand, +1), m[t])`` across
    the phrase — entirely JVM-side on sorted int arrays, no explode.
    ``phrase_tf`` counts occurrences by START position (overlaps
    allowed), matching the positional self-join semantics."""
    if not terms:
        raise ValueError("empty phrase")
    grouped = _phrase_candidates(positions, terms)
    cand = F.col("m")[terms[0]]
    for t in terms[1:]:
        cand = F.array_intersect(
            F.transform(cand, lambda x: x + 1), F.col("m")[t])
    out = grouped.select(
        "doc_id", F.size(cand).cast("long").alias("phrase_tf"))
    return out.filter(F.col("phrase_tf") > 0)


def proximity_search(positions: DataFrame, term_a: str, term_b: str,
                     window: int) -> DataFrame:
    """Unordered proximity match -> (doc_id, min_dist) where
    min |pos_a - pos_b| <= window.

    The min cross-array distance of two SORTED position arrays is
    always achieved by a pair ADJACENT in their merged order (any
    non-adjacent cross pair has a closer element in between), so the
    exact min is: tag each array, merge-sort the union, and take the
    min difference over adjacent merged elements from different
    sources — O((|a|+|b|)·log) per doc instead of the O(|a|·|b|)
    pairwise flatten this replaced, which blew up on pathological
    docs repeating both terms thousands of times.  All JVM
    higher-order functions, no Python.  (At 100 TB the per-document
    arrays stay bounded by doc_len; the distributed cost is the same
    pruned scan + one shuffle as ``phrase_search``.)"""
    if term_a == term_b:
        raise ValueError("proximity terms must differ")
    grouped = _phrase_candidates(positions, [term_a, term_b])
    tag = lambda col, s: F.transform(  # noqa: E731
        col, lambda x: F.struct(x.alias("pos"), F.lit(s).alias("src")))
    merged = F.array_sort(F.concat(tag(F.col("m")[term_a], 0),
                                   tag(F.col("m")[term_b], 1)))
    n = F.size(merged)
    # adjacent cross-source gaps; same-source pairs contribute NULL,
    # which array_min skips
    dists = F.zip_with(
        F.slice(merged, 1, n - 1), F.slice(merged, 2, n - 1),
        lambda x, y: F.when(x["src"] != y["src"], y["pos"] - x["pos"]))
    out = grouped.select(
        "doc_id", F.array_min(dists).cast("int").alias("min_dist"))
    return out.filter(F.col("min_dist") <= window)


# --- term-bucketed positional store (the 100 TB layout) ----------------------

_STORE_SCHEMA = ("bucket int, term string, doc_ids binary, pos_lens binary, "
                 "positions binary, n_docs long")


def _encode_positional(pdf_iter: Iterator[pd.DataFrame]
                       ) -> Iterator[pd.DataFrame]:
    """groupBy(term) applyInPandas-free encode: each input row carries
    the term's full (doc_id, positions) set collected as arrays; emit
    one delta+varbyte blob triple per term."""
    for pdf in pdf_iter:
        rows = []
        for _, r in pdf.iterrows():
            pairs = sorted(zip(r["doc_ids_arr"], r["positions_arr"]))
            doc_ids = np.array([p[0] for p in pairs], dtype=np.int64)
            pos_lists = [np.asarray(p[1], dtype=np.int64) for p in pairs]
            lens = np.array([len(p) for p in pos_lists], dtype=np.int64)
            flat = (np.concatenate(pos_lists)
                    if pos_lists else np.array([], dtype=np.int64))
            rows.append({
                "bucket": int(r["bucket"]),
                "term": r["term"],
                "doc_ids": delta_encode(doc_ids),
                "pos_lens": delta_encode(np.cumsum(lens))
                if len(lens) else b"",
                # positions restart the delta at each doc boundary is
                # NOT needed: decode re-splits by lens, and per-doc
                # positions are already ascending, so one global delta
                # stream would corrupt boundaries — encode per doc
                # (one batched pass, delta restarting at every doc),
                # concatenated as deltas within the doc only.
                "positions": b"".join(delta_encode_batch(
                    flat, np.cumsum(lens))) if len(lens) else b"",
                "n_docs": int(len(doc_ids)),
            })
        yield pd.DataFrame(
            rows, columns=["bucket", "term", "doc_ids", "pos_lens",
                           "positions", "n_docs"])


def build_positional_store(spark: SparkSession, pages: DataFrame,
                           out_dir: str, stem: bool = False,
                           n_buckets: int = DEFAULT_BUCKETS) -> None:
    """Persist the positional relation term-bucketed with delta+varbyte
    position blobs: <out_dir>/store/bucket=N/...  One sorted file per
    bucket; phrase queries read len(phrase) buckets, term-pushdown
    prunes row groups (same layout discipline as the tf segments,
    storage.py module docstring)."""
    rel = token_positions(pages, stem=stem)
    per_term = (
        rel.withColumn("bucket", term_bucket_col(F.col("term"), n_buckets))
        .groupBy("bucket", "term")
        .agg(F.collect_list("doc_id").alias("doc_ids_arr"),
             F.collect_list("positions").alias("positions_arr"))
    )
    encoded = (
        per_term.repartition(n_buckets, "bucket")
        .mapInPandas(_encode_positional, schema=_STORE_SCHEMA)
        .sortWithinPartitions("term")
    )
    atomic_write_parquet(encoded, os.path.join(out_dir, "store"),
                         partition_by=["bucket"])


def read_positional_store(spark: SparkSession, store_dir: str,
                          terms: Sequence[str],
                          n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Decode (doc_id, term, positions) for exactly ``terms`` from the
    bucketed store: bucket-pruned scan + term pushdown, then a
    mapInPandas decode of only the matching blobs."""
    uniq = sorted(set(terms))
    buckets = sorted({term_bucket_py(t, n_buckets) for t in uniq})
    seg = spark.read.parquet(os.path.join(store_dir, "store")).filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(uniq))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids_out: list[int] = []
            terms_out: list[str] = []
            poss_out: list[np.ndarray] = []
            for _, r in pdf.iterrows():
                doc_ids = delta_decode(r["doc_ids"])
                ends = delta_decode(r["pos_lens"])
                starts = np.concatenate(([0], ends[:-1]))
                # the positions blob is per-doc delta streams laid end
                # to end; varbyte is self-delimiting, so ONE vectorized
                # decode yields all gaps in order, and the per-doc
                # cumsum restart becomes a segmented cumsum (subtract
                # the running total at each doc boundary)
                gaps = varbyte_decode(r["positions"]).astype(np.int64)
                cs = np.cumsum(gaps)
                cs_before = np.concatenate(([0], cs))[starts]
                flat = (cs - np.repeat(cs_before, ends - starts)).astype(
                    np.int32)
                for d, pos in zip(doc_ids, np.split(flat, starts[1:])):
                    doc_ids_out.append(int(d))
                    terms_out.append(r["term"])
                    poss_out.append(pos)
            yield pd.DataFrame({"doc_id": doc_ids_out, "term": terms_out,
                                "positions": poss_out})

    return seg.mapInPandas(decode, schema=POSITIONS_SCHEMA)


def phrase_search_store(spark: SparkSession, store_dir: str,
                        terms: Sequence[str],
                        n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """phrase_search over the compressed bucketed store."""
    rel = read_positional_store(spark, store_dir, terms, n_buckets)
    return phrase_search(rel, terms)


def sloppy_phrase_search(positions: DataFrame, term_a: str, term_b: str,
                         slop: int) -> DataFrame:
    """ORDERED sloppy phrase ("a ... b" with at most ``slop`` tokens
    between, Lucene slop semantics for a two-term phrase) ->
    (doc_id, min_gap) where min over pairs of (pos_b - pos_a) in
    [1, slop + 1].

    Same candidate assembly and scan shape as ``proximity_search``
    (which is UNordered |pos_a - pos_b|); the ordered constraint keeps
    only positive gaps.  JVM-side pairwise transform over the per-doc
    position arrays (bounded by doc_len), gaps > slop + 1 filtered
    before the min."""
    if term_a == term_b:
        raise ValueError("sloppy-phrase terms must differ")
    grouped = _phrase_candidates(positions, [term_a, term_b])
    gaps = F.filter(
        F.flatten(F.transform(
            F.col("m")[term_a],
            lambda a: F.transform(F.col("m")[term_b], lambda b: b - a))),
        lambda g: g > 0)
    out = grouped.select(
        "doc_id", F.array_min(gaps).cast("int").alias("min_gap"))
    return out.filter(F.col("min_gap") <= slop + 1)


_SPAN_SENTINEL = 1 << 40  # larger than any in-document position


def span_near_search(positions: DataFrame, terms: Sequence[str],
                     slop: int, ordered: bool = True) -> DataFrame:
    """Multi-term span query (the Lucene ``SpanNearQuery`` over
    single-term clauses, which the 2-term ``proximity_search`` /
    ``sloppy_phrase_search`` specialize): documents containing a token
    window with ALL ``terms`` (in query order when ``ordered``) such
    that ``min_span - len(terms) <= slop`` -> (doc_id, min_span) with
    the EXACT minimal window width in tokens.

    One JVM-side ``F.aggregate`` pass per document over the merged
    position arrays tagged by clause — no explode, no positional
    self-join, O(sum of clause tfs) per doc:

    - unordered: the classic minimal-covering-window scan — carry the
      last-seen position per clause; every element closes the best
      window ending there (``pos - min(last_seen) + 1``) once every
      clause has been seen.  Exact because a minimal window ends at
      some clause occurrence, and at that scan element each other
      clause's last-seen is >= its occurrence inside the window.
    - ordered: subsequence DP — ``d[j]`` = start of the LATEST chain
      matching clauses ``0..j`` in order (``d[j] <= d[j-1]`` always,
      so seeing clause ``j`` sets ``d[j] = d[j-1]``); an occurrence of
      the last clause at ``pos`` closes a window ``pos - d[n-2] + 1``.

    Distributed shape identical to ``phrase_search``: the scan prunes
    to the clause terms (bucket + term pushdown on the positional
    store), one doc_id shuffle assembles candidates.  Clause terms
    must be distinct (repeated clauses would need multiset state).
    """
    terms = list(terms)
    n = len(terms)
    if n < 2:
        raise ValueError("span_near needs >= 2 terms")
    if len(set(terms)) != n:
        raise ValueError("span_near clause terms must be distinct")
    grouped = _phrase_candidates(positions, terms)

    tag = lambda col, s: F.transform(  # noqa: E731
        col, lambda x: F.struct(x.cast("long").alias("pos"),
                                F.lit(s).alias("src")))
    merged = F.array_sort(F.concat(*[
        tag(F.col("m")[t], i) for i, t in enumerate(terms)]))

    fields = [f"s{i}" for i in range(n)]
    init = F.struct(*(
        [F.lit(-1).cast("long").alias(f) for f in fields]
        + [F.lit(_SPAN_SENTINEL).cast("long").alias("best")]))

    if ordered:
        def step(acc, e):
            new = [F.when(e["src"] == 0, e["pos"])
                   .otherwise(acc["s0"]).alias("s0")]
            for j in range(1, n):
                new.append(
                    F.when((e["src"] == j) & (acc[f"s{j - 1}"] >= 0),
                           acc[f"s{j - 1}"])
                    .otherwise(acc[f"s{j}"]).alias(f"s{j}"))
            width = e["pos"] - acc[f"s{n - 2}"] + 1
            closes = ((e["src"] == n - 1) & (acc[f"s{n - 2}"] >= 0)
                      & (width < acc["best"]))
            return F.struct(
                *new, F.when(closes, width).otherwise(acc["best"])
                .alias("best"))
    else:
        def step(acc, e):
            upd = [F.when(e["src"] == j, e["pos"]).otherwise(acc[f"s{j}"])
                   for j in range(n)]
            new = [c.alias(f"s{j}") for j, c in enumerate(upd)]
            lo = F.least(*upd)
            width = e["pos"] - lo + 1
            closes = (lo >= 0) & (width < acc["best"])
            return F.struct(
                *new, F.when(closes, width).otherwise(acc["best"])
                .alias("best"))

    out = grouped.select(
        "doc_id",
        F.aggregate(merged, init, step, lambda acc: acc["best"])
        .alias("min_span"))
    return (out.filter(F.col("min_span") - n <= slop)
            .select("doc_id", F.col("min_span").cast("int")
                    .alias("min_span")))


def search_phrase_boosted(spark: SparkSession, index, positions: DataFrame,
                          query: str, phrase_terms: Sequence[str], *,
                          k: int = 10, boost: float = 1.0,
                          mode: str = "bm25", k1: float = 1.2,
                          b: float = 0.75) -> DataFrame:
    """Phrase-boosted ranking — the classic web-ranking composite
    (Lucene's ``query OR "exact phrase"^boost`` idiom): BM25 (or any
    ``query.search`` mode) over the OR candidates, plus
    ``boost * ln(1 + phrase_tf)`` for documents containing the exact
    phrase:

        score'(d) = score(d) + boost * ln(1 + phrase_tf(d))

    Composition stays lossless w.r.t. the final top-k because the
    base relation is UN-truncated (``search(k=None)`` returns all OR
    candidates unsorted — no global sort is spent before the fuse) and
    every phrase doc is an OR candidate by construction (its terms are
    query terms).  Scale shape: the phrase side touches only the
    phrase terms' buckets of the positional store; the fuse is an
    equi-join on doc_id between two already-pruned relations, then ONE
    TakeOrderedAndProject.
    """
    from ..oracle import parse_query
    from .query import search as _search

    extra = set(phrase_terms) - set(parse_query(query))
    if extra:
        raise ValueError(
            f"phrase terms {sorted(extra)} are not query terms: their "
            "docs would not be OR candidates and the left-join fuse "
            "would drop them — add them to the query")
    base = _search(spark, index, query, k=None, mode=mode, k1=k1, b=b)
    hits = phrase_search(positions, list(phrase_terms))
    fused = (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("score")
             + F.lit(float(boost))
             * F.log(F.lit(1.0)
                     + F.coalesce(F.col("phrase_tf"), F.lit(0)).cast("double"))
             ).alias("score"))
    )
    return fused.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def best_window_snippets(positions: DataFrame,
                         term_weights: dict[str, int],
                         window: int) -> DataFrame:
    """Query-dependent best-snippet selection (the Lucene unified
    highlighter's passage scoring, exact): for every document
    containing ANY weighted term, the ``window``-token span maximizing
    the sum of the DISTINCT matched terms' weights ->
    (doc_id, win_start, score_micro, n_terms), earliest window on
    ties.

    Weights are integer micro-units so both engines sum exactly (no
    float-order sensitivity).  Single ``F.aggregate`` pass per doc
    over the merged tagged occurrence array — at each occurrence the
    window ENDING there scores sum(w_j : last_seen_j inside window);
    exact because any window shrinks rightward to end at its last
    matched occurrence without losing terms.  Same pruned-scan +
    one-shuffle shape as the span operators; the oracle's
    anchor x in-window self-join is the quadratic shape this avoids.
    """
    terms = sorted(term_weights)
    n = len(terms)
    if n == 0:
        raise ValueError("no weighted terms")
    if window < 1:
        raise ValueError("window must be >= 1")
    grouped = (
        positions.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("term", "positions"))).alias("m"))
    )
    tag = lambda col, s: F.transform(  # noqa: E731
        col, lambda x: F.struct(x.cast("long").alias("pos"),
                                F.lit(s).alias("src")))
    merged = F.array_sort(F.concat(*[
        tag(F.coalesce(F.col("m")[t], F.array().cast("array<int>")), i)
        for i, t in enumerate(terms)]))

    fields = [f"s{i}" for i in range(n)]
    init = F.struct(*(
        [F.lit(-1).cast("long").alias(f) for f in fields]
        + [F.lit(-1).cast("long").alias("best"),
           F.lit(0).cast("long").alias("bend"),
           F.lit(0).cast("long").alias("bcnt")]))

    def step(acc, e):
        new = [F.when(e["src"] == j, e["pos"]).otherwise(acc[f"s{j}"])
               for j in range(n)]
        # the -1 "never seen" sentinel must fail the window test even
        # when pos - window < -1 (windows touching position 0)
        inside = [(nj >= 0) & (nj > e["pos"] - window) for nj in new]
        score = None
        cnt = None
        for j in range(n):
            w = F.when(inside[j], F.lit(int(term_weights[terms[j]]))
                       ).otherwise(F.lit(0)).cast("long")
            one = F.when(inside[j], F.lit(1)).otherwise(F.lit(0)).cast("long")
            score = w if score is None else score + w
            cnt = one if cnt is None else cnt + one
        better = score > acc["best"]
        return F.struct(
            *[c.alias(f"s{j}") for j, c in enumerate(new)],
            F.when(better, score).otherwise(acc["best"]).alias("best"),
            F.when(better, e["pos"]).otherwise(acc["bend"]).alias("bend"),
            F.when(better, cnt).otherwise(acc["bcnt"]).alias("bcnt"))

    agg = F.aggregate(merged, init, step)
    return (
        grouped.select("doc_id", agg.alias("a"))
        .filter(F.col("a")["best"] > 0)
        .select(
            "doc_id",
            F.greatest(F.lit(0),
                       F.col("a")["bend"] - F.lit(window - 1))
            .cast("int").alias("win_start"),
            F.col("a")["best"].alias("score_micro"),
            F.col("a")["bcnt"].cast("int").alias("n_terms"))
    )


def update_positional_store(spark: SparkSession, pages_with_ids: DataFrame,
                            store_dir: str, *, stem: bool = False,
                            n_buckets: int = DEFAULT_BUCKETS,
                            batch_id: str | None = None) -> dict:
    """Append a batch to an existing (possibly empty) positional store
    — the phrase-search counterpart of the tf-segment append
    (streaming/incremental.py): new docs own fresh doc ids, so their
    position rows are DISJOINT from every committed row and simply add
    files to the bucket partitions; the store reader already
    accumulates any number of rows per (bucket, term), exactly like
    the segment query kernel accumulates runs.  No rewrite, no merge
    — a later full rebuild (build_positional_store) plays the
    compaction role.

    Crash/retry safety: the batch stages to a tmp dir, then its part
    files publish into the bucket dirs under DETERMINISTIC
    ``append-<batch_id>-*`` names, with any partial files of the same
    batch cleared first — so a crashed append re-run can never leave
    duplicate (term, doc) rows (which would make the phrase reader's
    map_from_entries throw on every query over that term).
    ``batch_id`` defaults to the batch's doc-id span, which a
    fixed-input retry reproduces.

    ``pages_with_ids``: (doc_id, text) for the NEW docs only.  Returns
    {"n_terms", "batch_id"} — stats counted from the batch relation
    (persisted across the two actions so the tokenize pass runs once),
    never by scanning the (possibly huge) existing store."""
    import shutil

    rel = token_positions(pages_with_ids, stem=stem).persist()
    try:
        per_term = (
            rel.withColumn("bucket",
                           term_bucket_col(F.col("term"), n_buckets))
            .groupBy("bucket", "term")
            .agg(F.collect_list("doc_id").alias("doc_ids_arr"),
                 F.collect_list("positions").alias("positions_arr"))
        )
        encoded = (
            per_term.repartition(max(1, n_buckets // 4), "bucket")
            .mapInPandas(_encode_positional, schema=_STORE_SCHEMA)
            .sortWithinPartitions("term")
        )
        row = rel.agg(F.countDistinct("term").alias("nt"),
                      F.min("doc_id").alias("lo"),
                      F.max("doc_id").alias("hi"),
                      F.expr("bit_xor(xxhash64(doc_id, term))")
                      .alias("h")).collect()[0]
        n_terms = int(row["nt"] or 0)
        if n_terms == 0:
            return {"n_terms": 0, "batch_id": batch_id or ""}
        # default bid = span + order-independent content hash (bit_xor
        # of per-row xxhash64): a fixed-input retry reproduces it
        # exactly (idempotent crash repair), but a DIFFERENT batch that
        # happens to reuse an overlapping doc-id span gets a different
        # bid, so the clear-crashed-attempt pass below can never
        # silently delete an earlier batch's published files
        bid = batch_id or (f"b{int(row['lo'])}-{int(row['hi'])}"
                           f"-{int(row['h']) & 0xffffffff:08x}")
        # a crashed append published by PRE-content-hash code left files
        # named append-b{lo}-{hi}-{i:05d}.parquet (no hash segment); a
        # post-upgrade retry of that same batch must clear them too or
        # the store keeps duplicate (term, doc) rows.  Match the legacy
        # shape exactly (5-digit part index) so a different batch's
        # new-style files — same span, different hash — are never touched.
        legacy_re = (re.compile(
            rf"^append-b{int(row['lo'])}-{int(row['hi'])}-\d{{5}}\.parquet$")
            if batch_id is None else None)
        store_root = os.path.join(store_dir, "store")
        stage = os.path.join(store_dir, f".append-{bid}.tmp")
        if os.path.exists(stage):
            shutil.rmtree(stage)
        encoded.write.mode("overwrite").partitionBy("bucket").parquet(stage)
        for bdir in sorted(os.listdir(stage)):
            if not bdir.startswith("bucket="):
                continue
            dst_dir = os.path.join(store_root, bdir)
            os.makedirs(dst_dir, exist_ok=True)
            for old in os.listdir(dst_dir):  # clear a crashed attempt
                if (old.startswith(f"append-{bid}-")
                        or (legacy_re is not None
                            and legacy_re.match(old))):
                    os.remove(os.path.join(dst_dir, old))
            parts = sorted(
                f for f in os.listdir(os.path.join(stage, bdir))
                if f.endswith(".parquet"))
            for i, f in enumerate(parts):
                os.replace(
                    os.path.join(stage, bdir, f),
                    os.path.join(dst_dir,
                                 f"append-{bid}-{i:05d}.parquet"))
        shutil.rmtree(stage)
        return {"n_terms": n_terms, "batch_id": bid}
    finally:
        rel.unpersist()
