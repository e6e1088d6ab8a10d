"""Multinomial Naive Bayes document classifier, trained in-Spark.

The quality/domain/language classifier is a first-class stage of every
web-scale training-data pipeline (CCNet's fastText language filter,
FineWeb-Edu's quality scorer): score each crawled page against a small
supervised model and keep/route by the prediction.  This is the
lightweight, fully-distributed analogue: train multinomial NB over
token counts with one aggregation pass, classify with one join.

Scale shape (the reason NB fits 10^12 docs where a GPU scorer needs a
fleet):
  - TRAIN is two keyed aggregations over (term, label) and (label) —
    partial-aggregable, one shuffle each; the model is O(vocab x
    classes) rows.
  - CLASSIFY uses the matched-postings decomposition (same trick as
    QLD, operators/query.py): for class c and doc d

        score(d,c) = log prior_c
                     + sum_{t in d, t seen in c} tf_t * log P(t|c)
                     + (len_d - sum_{matched} tf_t) * log u_c

    where u_c = alpha / (cf_c + alpha*|V|) is the per-class unseen-term
    probability.  Only MATCHED (doc, term, class) rows travel the
    join; the unseen mass is closed-form from the doc length — no
    vocab-size fan-out per doc.  The (doc x class) grid is a broadcast
    cross join against the tiny class table.
  - Emitted score is the MEAN per-token log-likelihood (score/len):
    magnitude O(ln vocab), so micro-rounding is robust to float
    summation-order noise across engines (house convention, cf.
    textstats.bigram_nll).

Laplace smoothing: P(t|c) = (cf_tc + alpha) / (cf_c + alpha*|V|), |V| =
training vocabulary size across ALL classes (standard multinomial NB).
Prediction tie-break: highest score, then lexicographically smallest
label — deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nb_train(tokens: DataFrame, *, label_col: str = "label",
             doc_col: str = "doc_id", term_col: str = "term",
             tf_col: str = "tf", alpha: float = 1.0
             ) -> tuple[DataFrame, DataFrame]:
    """Train from (doc, label, term, tf) rows.

    Returns (model, classes):
      model   — (term, label, log_cond): ln P(term | label), matched
                terms only;
      classes — (label, log_prior, log_unseen): ln P(label) and the
                per-class unseen-term ln-probability.
    Both are O(model) small: persist/broadcast them at the call site
    if classifying many batches.
    """
    toks = tokens.select(
        F.col(doc_col).alias("doc_id"), F.col(label_col).alias("label"),
        F.col(term_col).alias("term"), F.col(tf_col).alias("tf"))
    # one job for both scalars (vocab size, doc count)
    row = toks.agg(F.countDistinct("term").alias("v"),
                   F.countDistinct("doc_id").alias("n")).collect()[0]
    v, n_docs = int(row["v"]), int(row["n"])
    per_class = toks.groupBy("label").agg(
        F.sum("tf").cast("double").alias("cf_c"),
        F.countDistinct("doc_id").cast("double").alias("n_docs_c"))
    classes = per_class.select(
        "label",
        F.log(F.col("n_docs_c") / F.lit(float(n_docs))).alias("log_prior"),
        F.log(F.lit(alpha)
              / (F.col("cf_c") + F.lit(alpha * v))).alias("log_unseen"),
        (F.col("cf_c") + F.lit(alpha * v)).alias("denom"))
    cf_tc = toks.groupBy("term", "label").agg(
        F.sum("tf").cast("double").alias("cf_tc"))
    model = (cf_tc.join(classes.select("label", "denom"), "label")
             .select("term", "label",
                     F.log((F.col("cf_tc") + F.lit(alpha))
                           / F.col("denom")).alias("log_cond")))
    return model, classes.drop("denom")


def nb_classify(doc_tokens: DataFrame, model: DataFrame,
                classes: DataFrame, *, doc_col: str = "doc_id",
                term_col: str = "term", tf_col: str = "tf") -> DataFrame:
    """Classify (doc, term, tf) bags -> one row per doc:
    (doc_id, pred_label, mean_ll_micro).

    mean_ll_micro = round(1e6 * best-class score / doc length); the
    prediction is argmax score with smallest-label tie-break.
    """
    toks = doc_tokens.select(
        F.col(doc_col).alias("doc_id"), F.col(term_col).alias("term"),
        F.col(tf_col).cast("double").alias("tf"))
    lens = toks.groupBy("doc_id").agg(F.sum("tf").alias("len"))
    matched = (
        toks.join(model, "term")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("tf") * F.col("log_cond")).alias("m_sum"),
             F.sum("tf").alias("m_tf")))
    grid = (lens.crossJoin(F.broadcast(classes))
            .join(matched, ["doc_id", "label"], "left")
            .select(
                "doc_id", "label", "len",
                (F.col("log_prior")
                 + F.coalesce(F.col("m_sum"), F.lit(0.0))
                 + (F.col("len") - F.coalesce(F.col("m_tf"), F.lit(0.0)))
                 * F.col("log_unseen")).alias("score")))
    scored = grid.select(
        "doc_id",
        F.struct(
            F.round(F.col("score") / F.col("len") * F.lit(1e6))
            .cast("long").alias("neg_ll"),
            F.col("label")).alias("cand"))
    # argmax on the MICRO-QUANTIZED score so the winner is identical
    # across engines; min of (-score_micro, label) = highest score,
    # smallest label on ties
    best = (scored.select(
                "doc_id",
                F.struct((-F.col("cand.neg_ll")).alias("k"),
                         F.col("cand.label").alias("label"),
                         F.col("cand.neg_ll").alias("micro")).alias("c"))
            .groupBy("doc_id").agg(F.min("c").alias("b")))
    return best.select(
        "doc_id",
        F.col("b.label").alias("pred_label"),
        F.col("b.micro").cast("long").alias("mean_ll_micro"))
