"""Ranking evaluation: P@k / MRR / nDCG@k over (run, qrels) relations.

The offline-eval counterpart of the query engine: given a system run
(query_id, rank, doc_id) and graded judgments (query_id, doc_id, rel),
compute the standard retrieval metrics per query, distributed.  The
reference repo evaluates by eyeballing result files (stats.md); this
makes evaluation a first-class relational operator, which is what a
large-scale nightly-eval pipeline needs (runs x qrels can be billions
of rows; everything here is two keyed joins + one groupBy per side,
no driver materialization).

Conventions (TREC-standard):
  - P@k    = |relevant in top-k| / k
  - RR     = 1 / rank of first relevant in top-k, else 0
  - DCG@k  = sum over top-k of (2^rel - 1) / log2(rank + 1)
  - nDCG@k = DCG@k / IDCG@k, where IDCG ranks the query's full qrels
    by (rel desc, doc_id asc) truncated at k; 0 when the query has no
    relevant docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(run: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """Per-query metrics; returns (query_id, n_rel, p_at_k, rr, ndcg)
    as doubles (n_rel long).  Every query present in ``run`` yields a
    row, judged or not."""
    top = run.filter(F.col("rank") <= k)
    hits = top.join(qrels, ["query_id", "doc_id"], "left").select(
        "query_id", "rank", F.coalesce(F.col("rel"), F.lit(0)).alias("rel"))
    gain = (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)) / F.log2(
        F.col("rank") + F.lit(1.0))
    per = hits.groupBy("query_id").agg(
        (F.sum((F.col("rel") > 0).cast("int")) / F.lit(float(k))
         ).alias("p_at_k"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
        F.sum(gain).alias("dcg"),
    )

    w = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id"))
    ideal = (qrels.filter(F.col("rel") > 0)
             .withColumn("irank", F.row_number().over(w)))
    ideals = ideal.groupBy("query_id").agg(
        F.count("*").alias("n_rel"),
        F.sum(F.when(
            F.col("irank") <= k,
            (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0))
            / F.log2(F.col("irank") + F.lit(1.0)))).alias("idcg"),
    )

    return per.join(ideals, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
        "p_at_k",
        F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)).alias("rr"),
        F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
        .otherwise(F.lit(0.0)).alias("ndcg"),
    )
