"""Multinomial Naive Bayes (operators/classify.py) vs hand math."""

from __future__ import annotations

import math

from ir_spark.operators.classify import nb_classify, nb_train


def _toks(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, label string, term string, tf double")


class TestNaiveBayes:
    def test_hand_computed_two_class(self, spark):
        # class a: doc0 "x x y", class b: doc1 "y z"
        train = _toks(spark, [
            (0, "a", "x", 2.0), (0, "a", "y", 1.0),
            (1, "b", "y", 1.0), (1, "b", "z", 1.0),
        ])
        model, classes = nb_train(train, label_col="label")
        test = spark.createDataFrame([(9, "x", 1.0), (9, "y", 1.0)],
                                     "doc_id long, term string, tf double")
        got = nb_classify(test, model, classes).collect()[0]

        # hand math: V=3, alpha=1
        # class a: cf=3, denom=6; P(x|a)=3/6, P(y|a)=2/6
        # class b: cf=2, denom=5; P(x|b)=1/5 (unseen), P(y|b)=2/5
        score_a = math.log(1 / 2) + (math.log(3 / 6) + math.log(2 / 6))
        score_b = math.log(1 / 2) + (math.log(1 / 5) + math.log(2 / 5))
        assert score_a > score_b
        assert got.pred_label == "a"
        assert got.mean_ll_micro == round(score_a / 2 * 1e6)

    def test_unseen_term_uses_smoothed_mass(self, spark):
        train = _toks(spark, [
            (0, "a", "x", 1.0),
            (1, "b", "y", 1.0),
        ])
        model, classes = nb_train(train, label_col="label")
        # doc of one term neither class saw -> decided purely by the
        # per-class unseen mass (equal priors, equal cf -> exact tie)
        test = spark.createDataFrame([(9, "q", 1.0)],
                                     "doc_id long, term string, tf double")
        got = nb_classify(test, model, classes).collect()[0]
        # V=2, both classes: cf=1, denom=3, unseen=1/3 -> tie ->
        # smallest label wins
        assert got.pred_label == "a"
        assert got.mean_ll_micro == round(
            (math.log(1 / 2) + math.log(1 / 3)) * 1e6)

    def test_priors_break_symmetric_likelihoods(self, spark):
        # identical conditional distributions, 2:1 doc prior for b
        train = _toks(spark, [
            (0, "a", "x", 1.0),
            (1, "b", "x", 1.0),
            (2, "b", "x", 1.0),
        ])
        model, classes = nb_train(train, label_col="label")
        test = spark.createDataFrame([(9, "x", 1.0)],
                                     "doc_id long, term string, tf double")
        got = nb_classify(test, model, classes).collect()[0]
        # P(x|a)=(1+1)/(1+1)=1 vs P(x|b)=(2+1)/(2+1)=1: likelihood
        # equal; prior log(2/3) > log(1/3) decides for b
        assert got.pred_label == "b"

    def test_every_doc_gets_exactly_one_row(self, spark):
        train = _toks(spark, [(0, "a", "x", 1.0), (1, "b", "y", 2.0)])
        model, classes = nb_train(train, label_col="label")
        test = spark.createDataFrame(
            [(i, t, 1.0) for i in range(10) for t in ("x", "y")],
            "doc_id long, term string, tf double")
        out = nb_classify(test, model, classes)
        assert out.count() == 10
        assert out.select("doc_id").distinct().count() == 10
