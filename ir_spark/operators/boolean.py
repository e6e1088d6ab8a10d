"""Boolean retrieval over the postings relation (beyond-reference).

The reference engine is ranked-only (QueryParser.java scores every
query as a weighted bag; there is no AND/OR/NOT path), but boolean
retrieval is the other half of a classic fulltext index and a common
pre-filter for ranked search, so the engine exposes it.

Shape at 100 TB: only the queried terms' posting rows ever move — the
term filter prunes the scan (term-bucketed store: bucket + row-group
pushdown, same as phrase search), then ONE groupBy(doc_id) over those
rows evaluates the whole boolean expression from a collected term-set
per candidate document.  NOT is evaluated against the same candidate
rows (a doc excluded by a must_not term necessarily contains it, so
its rows are in the filtered scan) — no full-corpus anti-join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boolean_search(postings: DataFrame,
                   must: Sequence[str] = (),
                   must_not: Sequence[str] = (),
                   should: Sequence[str] = (),
                   min_should: int = 1) -> DataFrame:
    """Evaluate (AND must...) AND NOT (any must_not) AND (>= min_should
    of should...) -> (doc_id, n_should) for matching documents.

    ``n_should`` is how many of the ``should`` terms matched (a cheap
    coordination signal callers can rank on).  With no ``should``
    terms the should-clause is vacuously true and n_should = 0.

    The plan: filter postings to the query vocabulary, one
    groupBy(doc_id) with conditional counts per clause — a single
    shuffle whose input is only the queried terms' postings.
    """
    must = sorted(set(must))
    must_not = sorted(set(must_not))
    should = sorted(set(should))
    if not must and not should:
        raise ValueError("need at least one positive (must/should) term")
    overlap = set(must) & set(must_not)
    if overlap:
        raise ValueError(f"terms both must and must_not: {sorted(overlap)}")
    vocab = sorted({*must, *must_not, *should})

    grouped = (
        postings.filter(F.col("term").isin(vocab))
        .groupBy("doc_id")
        .agg(
            F.count_distinct(
                F.when(F.col("term").isin(must) if must else F.lit(False),
                       F.col("term"))).alias("n_must"),
            F.count_distinct(
                F.when(F.col("term").isin(must_not) if must_not
                       else F.lit(False), F.col("term"))).alias("n_not"),
            F.count_distinct(
                F.when(F.col("term").isin(should) if should else F.lit(False),
                       F.col("term"))).alias("n_should"),
        )
    )
    cond = (F.col("n_must") == len(must)) & (F.col("n_not") == 0)
    if should:
        cond = cond & (F.col("n_should") >= min_should)
    return grouped.filter(cond).select(
        "doc_id", F.col("n_should").cast("int").alias("n_should"))


def facet_counts(postings, terms: list[str], facets,
                 facet_col: str) -> "DataFrame":
    """Search-results faceting: per-facet-value counts of the
    OR-semantics candidate set (docs matching >= 1 query term) — the
    sidebar counts a search front-end renders next to the top-k.

    ``facets`` is a (doc_id, <facet_col>) dimension table.  Plan:
    distinct candidate doc_ids from the term-pruned postings (one
    semi-ish aggregation), then one join + count per facet value.  The
    candidate relation is far smaller than the index; the join keys on
    doc_id and the final agg is facet-cardinality-sized.
    """
    from pyspark.sql import functions as F

    cands = (postings.filter(F.col("term").isin(list(terms)))
             .select("doc_id").distinct())
    return (cands.join(facets, "doc_id")
            .groupBy(facet_col)
            .agg(F.count("*").cast("long").alias("n_docs")))


def date_histogram(postings, terms: list[str], doc_ts,
                   epoch: str, interval_days: int = 7) -> "DataFrame":
    """Search-results date histogram: per-time-bucket counts of the
    OR-semantics candidate set over a (doc_id, ts) capture-time table
    (``warc_ts`` in the page schema) — the results-over-time facet a
    web-search front-end renders.

    Buckets are ``floor(datediff(ts, epoch) / interval_days)`` —
    integer day arithmetic only, so the bucketing is bit-reproducible
    across engines (calendar-aware truncation like date_trunc('week')
    differs in week-start conventions).  Same plan shape as
    facet_counts: candidate distinct + one join + a bucket-cardinality
    agg; returns (bucket, bucket_start_day, n_docs)."""
    from pyspark.sql import functions as F

    cands = (postings.filter(F.col("term").isin(list(terms)))
             .select("doc_id").distinct())
    bucket = F.floor(F.datediff(F.col("ts"), F.lit(epoch))
                     / F.lit(interval_days)).cast("long")
    return (cands.join(doc_ts.select("doc_id", "ts"), "doc_id")
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_docs"))
            .select("bucket",
                    (F.col("bucket") * interval_days).alias("bucket_start_day"),
                    "n_docs"))
