"""Index build pipeline, DataFrame level (SURVEY E1; operators A1-A6).

The reference's SPIMI invert loop (SPIMI.java:111-117,
pyindex/inverted_index.py:21-49) becomes: one scan over ``pages``, one
Arrow-batched tokenize kernel emitting per-doc term counts, then plain
Catalyst aggregations.  The single shuffle on ``term`` replaces the
in-memory TreeMap; Spark's sort-based shuffle IS the distributed k-way
merge (README.md:25).

Scale notes (100 TB / 10^12 docs):
- tokenize emits (doc_id, term, tf) pre-aggregated per doc inside the
  Arrow batch — the shuffle carries counts, never raw tokens.
- docinfo/dictionary are partial+final hash aggs (map-side combine).
- stopword filtering is a Catalyst ``~isin`` over a 54-element literal
  list — pushed into the scan stage, no join.
- doc_id assignment (dense_rank over url) is a one-time global sort,
  persisted as ``doc_map`` and reused on resume (SURVEY §7.2.4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import (TOKEN_COUNTS_DOCINFO_SCHEMA,
                                  TOKEN_COUNTS_SCHEMA, make_tokenize_counts,
                                  make_tokenize_counts_docinfo)
from ..text import STOPWORDS


def assign_doc_ids(pages: DataFrame,
                   caches: list | None = None) -> DataFrame:
    """Deterministic dense doc ids: 1-based rank over url (matching the
    Java reference's 1-based sequential ids, Indexer.java:88,116).

    Scale path (SURVEY §7.2.4): a naive ``dense_rank().over(orderBy)``
    funnels every url through ONE partition.  Instead: range-partition
    distinct urls, rank *within* each range partition (parallel), then
    add per-partition offsets (a driver-side cumsum over partition
    counts — one tiny collect) via a broadcast join.  Global order =
    (range order, within-range order), so the ids are identical to the
    single-sort formulation at any parallelism, and the heavy sort runs
    fully parallel.  Run once, persist as ``doc_map``, reuse on resume.

    The internal ``ranked`` persist must outlive the returned plan's
    first materialization; pass ``caches`` (a list) to receive the
    cached DataFrame and ``unpersist()`` it after writing the result —
    streaming callers invoke this once per micro-batch, so leaking one
    cache entry per call would accumulate without bound.
    """
    spark = pages.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    # dedupe INSIDE the range partitions instead of a separate
    # distinct(): repartitionByRange already co-locates equal urls, so
    # keeping the first of each equal run under the same sort the
    # ranking needs anyway erases the dedupe's own full-data shuffle —
    # one shuffle of the url column total (plus the range sampler),
    # at any scale.  (The range sampler now samples raw rather than
    # distinct urls; a pathologically hot duplicate url could skew one
    # range, which the within-partition rank tolerates.)
    urls = (
        pages.select("url")
        .repartitionByRange(n_parts, "url")
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy("url")
    deduped = (
        urls.withColumn("_prev", F.lag("url").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("url")))
        .drop("_prev")
    )
    ranked = deduped.withColumn("_rk", F.row_number().over(w)).persist()
    if caches is not None:
        caches.append(ranked)
    counts = sorted(
        (r["_pid"], r["n"]) for r in
        ranked.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, running = [], 0
    for pid, n in counts:
        offsets.append((pid, running))
        running += n
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "_pid int, _off long")
    )
    out = ranked.join(off_df, "_pid").select(
        "url", (F.col("_rk") + F.col("_off")).cast("long").alias("doc_id")
    )
    return out


def token_counts(pages: DataFrame, stem: bool = False) -> DataFrame:
    """(doc_id, text) -> (doc_id, term, tf) via the Arrow kernel.
    Column pruning: only doc_id + text reach the Python worker.

    Small inputs (fewer scan partitions than cores — e.g. one parquet
    file) would run the CPU-bound tokenize kernel serially; repartition
    the 2-column projection up to cluster width first.  Large inputs
    (partitions >= cores) keep their scan partitioning — no shuffle on
    the 100 TB path.
    """
    return _kernel_input(pages).mapInPandas(
        make_tokenize_counts(stem=stem), schema=TOKEN_COUNTS_SCHEMA
    )


def _kernel_input(pages: DataFrame) -> DataFrame:
    """The (doc_id, text) projection, widened for the CPU-bound kernel
    when the scan can't parallelize (shared by both kernel variants)."""
    sel = pages.select("doc_id", "text")
    sc = sel.sparkSession.sparkContext
    target = sc.defaultParallelism
    # DataFrame-native width probe (no .rdd plan conversion): a small
    # file count is the one case where the scan can't parallelize (one
    # row group = one task no matter the byte splits); in-memory frames
    # report [] and get repartitioned too, which is what we want for
    # streaming micro-batches.  The 100 TB path (files >= cores) keeps
    # its scan partitioning — no shuffle.
    try:
        n_inputs = len(sel.inputFiles())
    except Exception:
        n_inputs = 0
    if n_inputs < target:
        sel = sel.repartition(2 * target)
    return sel


def token_counts_fused(pages: DataFrame, stem: bool = False) -> DataFrame:
    """(doc_id, text) -> token counts + per-doc docinfo sentinels
    (term NULL rows carrying doc_len/max_tf) in ONE kernel pass — the
    build-path variant of ``token_counts``: split with
    ``docinfo_from_fused`` / ``postings_from_fused``, both narrow
    filters over this relation (persist it once), so docinfo costs no
    second aggregation over the token stream."""
    return _kernel_input(pages).mapInPandas(
        make_tokenize_counts_docinfo(stem=stem),
        schema=TOKEN_COUNTS_DOCINFO_SCHEMA,
    )


def docinfo_from_fused(tokens: DataFrame) -> DataFrame:
    """A3/A4 from the fused relation: the sentinel rows, verbatim —
    bit-identical to ``build_docinfo(token_counts(...))`` (same D2/D3
    arithmetic, computed in the kernel)."""
    return tokens.filter(F.col("term").isNull()).select(
        "doc_id", "doc_len", "max_tf")


def postings_from_fused(tokens: DataFrame) -> DataFrame:
    """A1 from the fused relation: the real token rows (the kernel
    already applied the T11 stopword exclusion — only the sentinel
    filter remains)."""
    return tokens.filter(F.col("term").isNotNull()).select(
        "doc_id", "term", "tf")


def build_docinfo(tokens: DataFrame) -> DataFrame:
    """A3/A4: doc_len counts ALL tokens (D2); max_tf over indexed
    (non-stopword) terms only (D3)."""
    stop = F.col("term").isin(*STOPWORDS)
    return tokens.groupBy("doc_id").agg(
        F.sum("tf").alias("doc_len"),
        # all-stopword docs aggregate max() over all-NULL -> coalesce
        # to 0, matching the Python oracle (oracle.py stores max_tf=0)
        # and sparing consumers an int(None) crash
        F.coalesce(F.max(F.when(~stop, F.col("tf"))), F.lit(0))
        .alias("max_tf"),
    )


def build_postings(tokens: DataFrame) -> DataFrame:
    """A1: the inverted file as a long relation (term, doc_id, tf),
    stopwords excluded (T11)."""
    return tokens.filter(~F.col("term").isin(*STOPWORDS))


def build_dictionary(postings: DataFrame) -> DataFrame:
    """A2: per-term document frequency + collection frequency."""
    return postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )


@dataclass
class DataFrameIndex:
    """The all-DataFrame index (SURVEY §7.1 step 4 — correctness
    backbone; the compressed segment index in sources/storage.py is the
    scale path and must produce identical query results)."""

    postings: DataFrame  # (term, doc_id, tf)
    docinfo: DataFrame   # (doc_id, doc_len, max_tf)
    dictionary: DataFrame  # (term, df, cf)
    n_docs: int
    avg_doc_len: float

    def df_of(self, terms: list[str]) -> dict[str, int]:
        """Collection df for a small term set (query path J1)."""
        rows = self.dictionary.filter(F.col("term").isin(terms)).select(
            "term", "df"
        ).collect()
        return {r["term"]: r["df"] for r in rows}


def term_vectors(index: DataFrameIndex, doc_ids: list[int]) -> DataFrame:
    """Per-document term vectors (the Lucene TermVectors / ES
    ``_termvectors`` document API): every indexed term of each
    requested doc with its in-doc tf, the doc's length, and the term's
    collection df -> (doc_id, term, tf, doc_len, df).

    Scale shape: ``doc_ids`` is a request-sized literal, so the
    ``isin`` prunes the postings scan (doc-bucketed storage turns it
    into a few row-group reads; a forward-index/docvalues sidecar is
    the dedicated-store upgrade).  The pruned slice — O(requested
    docs' vocabulary) rows — is BROADCAST to the dictionary join, so
    the vocabulary-sized side streams in place and never shuffles.
    """
    ids = [int(d) for d in doc_ids]
    if not ids:
        raise ValueError("empty doc_ids")
    sl = index.postings.filter(F.col("doc_id").isin(ids))
    di = index.docinfo.filter(F.col("doc_id").isin(ids)).select(
        "doc_id", "doc_len")
    sl = sl.join(F.broadcast(di), "doc_id")
    return (
        index.dictionary.select("term", "df")
        .join(F.broadcast(sl), "term")
        .select("doc_id", "term",
                F.col("tf").cast("long").alias("tf"),
                F.col("doc_len").cast("long").alias("doc_len"),
                F.col("df").cast("long").alias("df"))
    )


def build_dataframe_index(pages: DataFrame, stem: bool = False,
                          cache: bool = True) -> DataFrameIndex:
    """E1 end-to-end: pages -> tokens -> postings/docinfo/dictionary.

    ``pages`` must carry a ``doc_id`` column (join with
    ``assign_doc_ids`` output if not).
    """
    if "doc_id" not in pages.columns:
        doc_map = assign_doc_ids(pages)
        pages = pages.join(doc_map, "url")
    tokens = token_counts(pages, stem=stem)
    if cache:
        tokens = tokens.persist()
    postings = build_postings(tokens)
    docinfo = build_docinfo(tokens)
    dictionary = build_dictionary(postings)
    if cache:
        postings = postings.persist()
        docinfo = docinfo.persist()
    stats = docinfo.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avg_dl")
    ).collect()[0]
    return DataFrameIndex(
        postings=postings,
        docinfo=docinfo,
        dictionary=dictionary,
        n_docs=int(stats["n"]),
        # empty corpus: avg() is NULL — an index with no docs must
        # still construct (query paths all return empty cleanly)
        avg_doc_len=float(stats["avg_dl"]) if stats["avg_dl"] is not None
        else 0.0,
    )
