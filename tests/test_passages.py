"""Passage-level BM25 (operators/passages.py) vs hand math."""

from __future__ import annotations

import math

import pytest

from ir_spark.operators.passages import search_passages


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSearchPassages:
    def test_hand_computed_single_window_corpus(self, spark):
        docs = _docs(spark, [
            (1, "apple banana apple"),
            (2, "banana cherry dates"),
            (3, "cherry dates elder figs"),
        ])
        out = {(r.doc_id, r.chunk_id): (r.start, r.score_micro)
               for r in search_passages(docs, ["apple"], k=10,
                                        chunk=8, stride=4).collect()}
        # one window per doc; N=3, df(apple)=1, dl=(3,3,4), avgdl=10/3
        idf = math.log(1 + (3 - 1 + 0.5) / 1.5)
        tf, dl, avgdl = 2.0, 3.0, 10.0 / 3.0
        s = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        assert out == {(1, 0): (0, round(s * 1e6))}

    def test_best_window_within_long_doc(self, spark):
        filler = " ".join(["pad"] * 8)
        docs = _docs(spark, [
            (1, f"{filler} target target target {filler}"),
        ])
        rows = search_passages(docs, ["target"], k=3,
                               chunk=8, stride=4).collect()
        assert rows, "must match some window"
        best = rows[0]
        # the top window must contain all three 'target's (tf=3)
        assert 4 <= best.start <= 8
        ranks = [r.score_micro for r in rows]
        assert ranks == sorted(ranks, reverse=True)

    def test_absent_terms_scored_zero_and_dropped(self, spark):
        docs = _docs(spark, [(1, "alpha beta gamma")])
        out = search_passages(docs, ["nosuchterm"], k=5,
                              chunk=4, stride=2).collect()
        assert out == []

    def test_k_and_tie_break(self, spark):
        docs = _docs(spark, [(i, "same words here") for i in range(6)])
        rows = search_passages(docs, ["same"], k=4,
                               chunk=4, stride=2).collect()
        # identical scores everywhere: doc_id ASC breaks ties, k caps
        assert [r.doc_id for r in rows] == [0, 1, 2, 3]

    def test_empty_query_rejected(self, spark):
        docs = _docs(spark, [(1, "x y")])
        with pytest.raises(ValueError):
            search_passages(docs, [])
