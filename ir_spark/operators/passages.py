"""Passage-level BM25 retrieval — the RAG retrieval primitive.

Long web documents answer queries in a paragraph, not as a whole; a
retrieval-augmented pipeline wants the best-matching WINDOW (passage)
with its source doc and offset.  This composes the sliding-window
chunker (operators/corpus.py::chunk_windows) with BM25 scored at the
passage level (chunk-level df / avgdl statistics).

Scale shape — deliberately NOT an index build per query batch:
  - windows are a pure narrow map (no shuffle);
  - per-window query-term tfs are COLUMNAR: one
    ``size(filter(win, t = term))`` expression per query term — no
    token explode, no (token, window) shuffle; a 10^12-doc scan emits
    |q|+1 integer columns per window;
  - the collection stats (N, avgdl, df per term) are ONE aggregate
    collected as |q|+2 scalars;
  - top-k is TakeOrderedAndProject with the house (score DESC, doc_id,
    chunk_id) tie-break.
For repeated querying at scale, build a segment index over the chunk
corpus instead (operators/segments.py on (chunk-as-doc) rows); this
operator is the one-pass form that needs no materialized index.

BM25 matches the engine convention (oracle.py::bm25_weight): Lucene
idf ln(1 + (N - df + 0.5)/(df + 0.5)), zero contribution for df = 0.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def search_passages(docs: DataFrame, query_terms: list[str], *,
                    k: int = 10, chunk: int = 32, stride: int = 16,
                    k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k passages for a term list over (doc_id, text) docs.

    Returns (doc_id, chunk_id, start, score_micro), score micro-
    quantized per house convention, ordered by (score_micro DESC,
    doc_id ASC, chunk_id ASC), exactly k rows (fewer if the corpus has
    fewer scoring passages).  Duplicate query terms are deduplicated
    (unit query weights — passage retrieval's usual form).
    """
    from .corpus import chunk_windows

    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    wins = chunk_windows(docs, chunk=chunk, stride=stride)
    def _match(term: str):
        # NB: a two-arg lambda would make F.filter pass the element
        # INDEX as the second argument — keep it unary via closure
        return lambda t: t == F.lit(term)

    tf_cols = [
        F.size(F.filter("win", _match(term))).cast("double")
        .alias(f"_tf_{i}")
        for i, term in enumerate(terms)]
    scored_base = wins.select(
        "doc_id", "chunk_id", "start",
        F.size("win").cast("double").alias("_dl"), *tf_cols)
    stats_row = scored_base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("_dl").alias("avgdl"),
        *[F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
          for i in range(len(terms))]).collect()[0]
    n_chunks = int(stats_row["n"])
    avgdl = float(stats_row["avgdl"] or 0.0)
    if n_chunks == 0 or avgdl == 0.0:
        return scored_base.select(
            "doc_id", "chunk_id", "start",
            F.lit(0).cast("long").alias("score_micro")).limit(0)
    score = F.lit(0.0)
    for i in range(len(terms)):
        df_i = int(stats_row[f"_df_{i}"] or 0)
        if df_i == 0:
            continue  # oracle convention: df = 0 contributes nothing
        idf = math.log(1.0 + (n_chunks - df_i + 0.5) / (df_i + 0.5))
        tf = F.col(f"_tf_{i}")
        score = score + F.lit(idf) * tf * F.lit(k1 + 1.0) / (
            tf + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("_dl") / F.lit(avgdl)))
    out = scored_base.select(
        "doc_id", "chunk_id", "start",
        F.round(score * F.lit(1000000.0)).cast("long").alias("score_micro"))
    return (out.where(F.col("score_micro") > 0)
            .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc(),
                     F.col("chunk_id").asc())
            .limit(k))
