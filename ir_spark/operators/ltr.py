"""Learning-to-rank feature extraction.

A modern ranking stack retrieves candidates with BM25 and re-ranks
with a learned model; the step in between — one row of features per
(query, candidate doc) — is a join-shaped Spark job, and its output
feeds any trainer as a plain table.  Reference scope note: the
reference stops at the hand-tuned W1/W2 scores (QueryParser.java);
this is additive surface for the webtext payload.

Features per candidate (OR-semantics candidate set, same as
`query.search`):
  bm25          parameterized BM25(k1, b) with Lucene non-negative idf
  tf_sum        total matched-term frequency in the doc
  n_matched     number of distinct query terms present
  idf_sum       sum of matched-term idfs (query-coverage weight)
  doc_len / max_tf   document stats (D2/D3 semantics)

Shape: postings ⋈ broadcast(query terms) ⋈ broadcast(query-term df)
⋈ docinfo, then ONE groupBy(doc_id) — identical shuffle plan to the
exact scorer; every expression whole-stage codegen.  Extra priors
(PageRank, anchor hits, quality scores) join in by doc_id downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import parse_query
from .build import DataFrameIndex


def ltr_features(spark: SparkSession, index: DataFrameIndex, query: str,
                 *, k1: float = 1.2, b: float = 0.75,
                 stem: bool = False) -> DataFrame:
    """(index, query) -> (doc_id, bm25, tf_sum, n_matched, idf_sum,
    doc_len, max_tf) for every doc matching >= 1 query term."""
    bag = parse_query(query, stem=stem)
    if not bag:
        return spark.createDataFrame(
            [], "doc_id long, bm25 double, tf_sum long, n_matched long, "
                "idf_sum double, doc_len long, max_tf long")
    qdf = spark.createDataFrame(
        sorted(bag.items()), "term string, qtf long")
    n, avg_dl = float(index.n_docs), float(index.avg_doc_len)
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tf, dl = F.col("tf"), F.col("doc_len")
    w = (idf * tf * F.lit(k1 + 1.0)
         / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avg_dl)))
         * F.col("qtf").cast("double"))
    joined = (index.postings
              .join(F.broadcast(qdf), "term")
              .join(F.broadcast(
                  index.dictionary.join(qdf, "term").select("term", "df")),
                  "term")
              .join(index.docinfo, "doc_id"))
    return (joined.groupBy("doc_id")
            .agg(F.sum(w).alias("bm25"),
                 F.sum("tf").cast("long").alias("tf_sum"),
                 F.count(F.lit(1)).cast("long").alias("n_matched"),
                 F.sum(idf).alias("idf_sum"),
                 F.first("doc_len").cast("long").alias("doc_len"),
                 F.first("max_tf").cast("long").alias("max_tf")))
