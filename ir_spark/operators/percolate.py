"""Percolation — reverse search (Elasticsearch percolate analogue).

Forward search matches one query against an indexed corpus; a
percolator matches each incoming DOCUMENT against a registry of stored
queries — the alerting / saved-search / routing primitive ("tell me
when a page matching `zero day exploit` is crawled").  In a streaming
ingest this runs per micro-batch over the new docs; the plan below is
identical batch and streaming because it is pure joins + keyed aggs.

Scale shape: the query registry is small next to the corpus (thousands
of alerts vs 10^12 docs), so it BROADCASTS — docs never shuffle to meet
queries.  The per-(doc, query) match count is a partial-aggregable
groupBy whose key space is bounded by actual term hits, not
|docs| x |queries|: a doc with no query term in common never produces
a row.  This is the sparse inverted-match trick percolators use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def percolate(doc_terms: DataFrame, queries: DataFrame,
              min_should_match: int | None = None) -> DataFrame:
    """Match docs against stored queries.

    doc_terms — (doc_id, term), duplicates allowed (tf rows are fine);
    queries   — (query_id, term), the registered query bags.

    Returns (query_id, doc_id, n_matched, n_terms) for every pair
    meeting the match rule: ALL query terms present (AND semantics)
    when ``min_should_match`` is None, else at least
    ``min(min_should_match, n_terms)`` of them (the Elasticsearch
    minimum_should_match analogue, capped so short queries stay
    matchable).
    """
    q = queries.select("query_id", "term").distinct()
    qsizes = q.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"))
    hits = (
        doc_terms.select("doc_id", "term").distinct()
        .join(F.broadcast(q), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched")))
    out = hits.join(F.broadcast(qsizes), "query_id")
    required: Column
    if min_should_match is None:
        required = F.col("n_terms")
    else:
        required = F.least(F.lit(int(min_should_match)), F.col("n_terms"))
    return (out.where(F.col("n_matched") >= required)
            .select("query_id", "doc_id", "n_matched", "n_terms"))
