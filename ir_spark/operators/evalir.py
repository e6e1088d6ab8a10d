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


def rbo_weights(p: float, k: int) -> list[tuple[int, int]]:
    """Per-doc RBO weight table: a doc first present in BOTH prefixes
    at depth m contributes (1-p) * sum_{d=m..k} p^(d-1)/d to RBO@k.
    Quantized to nano-units so the distributed accumulation is an
    INTEGER sum (order-free across engines); the Python loop below is
    the single definition both the operator and the SQL oracles embed
    as literals."""
    out = []
    for m in range(1, k + 1):
        w = (1.0 - p) * sum(p ** (d - 1) / d for d in range(m, k + 1))
        out.append((m, int(round(w * 1e9))))
    return out


def rbo_overlap(run_a: DataFrame, run_b: DataFrame, *, p: float = 0.9,
                k: int = 10) -> DataFrame:
    """Rank-biased overlap at evaluation depth ``k`` (Webber, Moffat &
    Zobel 2010, "A similarity measure for indefinite rankings") — the
    standard top-weighted measure for comparing two rankers' output
    (e.g. a nightly A/B of scoring functions) without judgments:

        RBO@k = (1-p) * sum_{d=1..k} p^(d-1) * |A_d intersect B_d| / d

    (the RBO_MIN form: prefixes beyond k contribute nothing).  Inputs
    are run relations (query_id, rank, doc_id); output one row per
    query_id: (query_id, rbo_micro, overlap_at_k).

    Distribution: X_d telescopes per doc — a doc whose LATER of the
    two ranks is m adds sum_{d=m..k} p^(d-1)/d — so the whole metric
    is one equi-join of the two (already top-k-pruned) runs, a
    broadcast k-row weight lookup, and one integer-sum groupBy; runs
    x queries can be arbitrarily large, nothing is driver-side.
    Persistence-grade determinism: weights are nano-quantized longs,
    so per-query sums are exact integers in any accumulation order.
    """
    if not 0.0 < p < 1.0:
        raise ValueError("rbo requires 0 < p < 1")
    a = run_a.filter(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").alias("ra"))
    b = run_b.filter(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").alias("rb"))
    joint = a.join(b, ["query_id", "doc_id"]).select(
        "query_id", F.greatest("ra", "rb").cast("int").alias("m"))
    wdf = joint.sparkSession.createDataFrame(
        rbo_weights(p, k), "m int, w_nano long")
    per_q = (joint.join(F.broadcast(wdf), "m")
             .groupBy("query_id")
             .agg(F.sum("w_nano").alias("nano"),
                  F.count(F.lit(1)).alias("overlap_at_k")))
    qids = (run_a.select("query_id")
            .union(run_b.select("query_id")).distinct())
    return qids.join(per_q, "query_id", "left").select(
        "query_id",
        F.round(F.coalesce(F.col("nano"), F.lit(0)) / F.lit(1000.0))
        .cast("long").alias("rbo_micro"),
        F.coalesce(F.col("overlap_at_k"), F.lit(0))
        .cast("long").alias("overlap_at_k"),
    )
