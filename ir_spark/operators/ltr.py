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


FEATURE_COLS = ["bm25", "tf_sum", "n_matched", "idf_sum", "doc_len",
                "max_tf"]


def standardize_stats(features: DataFrame,
                      cols: list[str] = FEATURE_COLS) -> dict:
    """Per-feature mean/std over the training table (one aggregate
    pass); std floors at 1 so constant features pass through.  The
    returned dict is driver-side state the size of the feature list —
    broadcastable into any later scoring plan."""
    aggs = []
    for c in cols:
        aggs += [F.avg(F.col(c).cast("double")).alias(f"mu_{c}"),
                 F.stddev_pop(F.col(c).cast("double")).alias(f"sd_{c}")]
    row = features.agg(*aggs).collect()[0]
    return {c: (float(row[f"mu_{c}"] or 0.0),
                max(float(row[f"sd_{c}"] or 0.0), 1e-12) if row[f"sd_{c}"]
                else 1.0) for c in cols}


def train_pairwise_ranker(features: DataFrame, qrels: DataFrame, *,
                          cols: list[str] = FEATURE_COLS,
                          epochs: int = 20, lr: float = 0.1,
                          l2: float = 1e-4,
                          stats: dict | None = None) -> dict:
    """RankNet-shaped pairwise logistic ranker, trained IN Spark.

    Each epoch is ONE distributed pass: within every query, preference
    pairs (doc_i ranked above doc_j because rel_i > rel_j) come from a
    query-keyed self-join of the (already top-k-bounded) feature rows,
    the per-pair gradient sigma(-w·dx)·dx is a column expression over
    broadcast weights, and the gradient sum returns to the driver as
    len(cols)+1 scalars for the weight update — the classic
    driver-coordinated distributed-GD shape (gradient traffic is
    O(features), never O(rows)).  Pairs per query are bounded by k², a
    constant; queries are the parallel axis.

    Determinism contract: per-pair gradient components are quantized
    to nano-units BEFORE the cross-partition sum (BIGINT addition is
    order-free), so training is bit-reproducible across runs,
    partitionings, and cluster sizes — the property that makes a
    nightly model diffable.  Features are standardized by
    ``standardize_stats`` (pass ``stats`` to reuse a frozen set).

    Returns {"weights": {col: w}, "stats": stats, "loss": [per-epoch
    pairwise log-loss], "n_pairs": int}."""
    import math

    if stats is None:
        stats = standardize_stats(features, cols)
    feat = features.join(qrels.select("query_id", "doc_id", "rel"),
                         ["query_id", "doc_id"], "left").fillna(
        0, subset=["rel"])
    std = [((F.col(c).cast("double") - F.lit(stats[c][0]))
            / F.lit(stats[c][1])).alias(c) for c in cols]
    feat = feat.select("query_id", "doc_id", F.col("rel").cast("long"),
                       *std)
    hi = feat.select(
        "query_id", F.col("rel").alias("rel_i"),
        *[F.col(c).alias(f"{c}_i") for c in cols])
    lo = feat.select(
        "query_id", F.col("rel").alias("rel_j"),
        *[F.col(c).alias(f"{c}_j") for c in cols])
    pairs = (hi.join(lo, "query_id")
             .filter(F.col("rel_i") > F.col("rel_j"))
             .select("query_id",
                     *[(F.col(f"{c}_i") - F.col(f"{c}_j")).alias(f"d_{c}")
                       for c in cols])
             .persist())
    n_pairs = pairs.count()
    if n_pairs == 0:
        pairs.unpersist()
        return {"weights": {c: 0.0 for c in cols}, "stats": stats,
                "loss": [], "n_pairs": 0}
    w = {c: 0.0 for c in cols}
    losses = []
    for _ in range(epochs):
        margin = sum((F.col(f"d_{c}") * F.lit(w[c]) for c in cols),
                     start=F.lit(0.0))
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(margin))  # sigma(-m)
        aggs = [F.sum(F.round(sig * F.col(f"d_{c}") * 1e9).cast("long"))
                .alias(f"g_{c}") for c in cols]
        aggs.append(F.sum(F.round(
            F.log(F.lit(1.0) + F.exp(-margin)) * 1e9).cast("long"))
            .alias("loss"))
        row = pairs.agg(*aggs).collect()[0]
        losses.append(float(row["loss"]) / 1e9 / n_pairs)
        for c in cols:
            g = float(row[f"g_{c}"]) / 1e9 / n_pairs
            w[c] += lr * (g - l2 * w[c])
    pairs.unpersist()
    return {"weights": {c: round(w[c], 9) for c in cols}, "stats": stats,
            "loss": losses, "n_pairs": int(n_pairs)}


def score_linear(features: DataFrame, model: dict,
                 cols: list[str] = FEATURE_COLS) -> DataFrame:
    """Apply a trained linear model to a feature table -> (query_id?,
    doc_id, score_micro) — one narrow whole-stage-codegen projection;
    the re-rank step of the retrieve-then-rerank stack."""
    stats, w = model["stats"], model["weights"]
    expr = sum(
        (((F.col(c).cast("double") - F.lit(stats[c][0]))
          / F.lit(stats[c][1])) * F.lit(w[c]) for c in cols),
        start=F.lit(0.0))
    keep = [c for c in ("query_id", "doc_id") if c in features.columns]
    return features.select(
        *keep, F.round(expr * 1000000.0).cast("long").alias("score_micro"))
