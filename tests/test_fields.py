"""BM25F field-weighted retrieval semantics."""

from __future__ import annotations

import math

import pytest

from ir_spark.operators.fields import (
    bm25f_postings,
    search_bm25f,
    split_title_body,
)


def test_split_title_body(spark):
    docs = spark.createDataFrame(
        [(1, "a1 b1 c1 d1 e1 f1 g1 h1"), (2, "x1 y1")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in split_title_body(docs, 6).collect()}
    assert rows[1].title == "a1 b1 c1 d1 e1 f1"
    assert rows[1].body == "g1 h1"
    assert rows[2].title == "x1 y1"
    assert rows[2].body == ""


def test_bm25f_weighted_tf_and_length(spark):
    # 'aa' once in title (w=2) and once in body (w=1) -> wtf 3.0;
    # wdl = 2*len(title_toks) + 1*len(body_toks)
    docs = spark.createDataFrame(
        [(1, "aa t2 t3 t4 t5 t6 aa b2 b3")], "doc_id long, text string")
    postings, docinfo = bm25f_postings(
        docs, {"title": 2.0, "body": 1.0}, title_tokens=6)
    wtf = {r.term: r.wtf for r in postings.collect()}
    assert wtf["aa"] == pytest.approx(3.0)
    assert wtf["t2"] == pytest.approx(2.0)
    assert wtf["b2"] == pytest.approx(1.0)
    wdl = docinfo.collect()[0].wdl
    assert wdl == pytest.approx(2.0 * 6 + 1.0 * 3)


def test_title_match_outranks_body_match(spark):
    # same query term once per doc: title placement must win
    docs = spark.createDataFrame([
        (1, "query w2 w3 w4 w5 w6 b1 b2 b3 b4"),   # term in title
        (2, "w1 w2 w3 w4 w5 w6 query b2 b3 b4"),   # term in body
    ], "doc_id long, text string")
    res = search_bm25f(spark, docs, "query", k=2).collect()
    assert [r.doc_id for r in res] == [1, 2]
    assert res[0].score > res[1].score


def test_bm25f_matches_hand_computation(spark):
    docs = spark.createDataFrame([
        (1, "aa b1 c1 d1 e1 f1 g1"),
        (2, "x1 b1 c1 d1 e1 f1 aa"),
    ], "doc_id long, text string")
    k1, b = 1.2, 0.75
    res = {r.doc_id: r.score
           for r in search_bm25f(spark, docs, "aa", k=2,
                                 k1=k1, b=b).collect()}
    # doc1: aa in title -> wtf 2; doc2: aa in body -> wtf 1
    # wdl: 2*6 + 1*1 = 13 for both; avg = 13; df('aa') = 2, N = 2
    idf = math.log(1.0 + (2 - 2 + 0.5) / (2 + 0.5))
    for doc, wtf in [(1, 2.0), (2, 1.0)]:
        want = idf * wtf * (k1 + 1) / (wtf + k1 * (1 - b + b * 13 / 13.0))
        assert res[doc] == pytest.approx(want, rel=1e-12)


def test_stopwords_removed_but_count_in_length(spark):
    docs = spark.createDataFrame(
        [(1, "the aa b1 c1 d1 e1 f1")], "doc_id long, text string")
    postings, docinfo = bm25f_postings(docs, title_tokens=6)
    terms = {r.term for r in postings.collect()}
    assert "the" not in terms and "aa" in terms
    # 'the' still counts toward weighted doc length (D2 semantics)
    assert docinfo.collect()[0].wdl == pytest.approx(2.0 * 6 + 1.0 * 1)


def test_bm25f_empty_and_tokenless_corpus(spark):
    """No docs / no tokens: avg('wdl') is NULL -> must return an empty
    frame instead of crashing on float(None), and must not leak the
    persisted merged relation on that path."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert search_bm25f(spark, empty, "aa", k=3).collect() == []
    # docs whose text tokenizes to nothing at all
    blank = spark.createDataFrame(
        [(1, ""), (2, "   ")], "doc_id long, text string")
    assert search_bm25f(spark, blank, "aa", k=3).collect() == []


def test_anchor_field_ranks_doc_without_body_match(spark):
    """The web-IR point of anchor indexing: a doc whose BODY never
    mentions the query term still ranks when incoming anchors do."""
    from ir_spark.operators.fields import search_bm25f_relations

    body = spark.createDataFrame(
        [(1, "b1 c1 d1 e1"), (2, "b2 c2 d2 e2"), (3, "zz yy xx ww")],
        "doc_id long, text string")
    anchors = spark.createDataFrame(
        [(3, "qq qq"), (1, "d2 d2")], "doc_id long, text string")
    res = {r.doc_id: r.score
           for r in search_bm25f_relations(
               spark, {"body": (body, 1.0), "anchor": (anchors, 2.0)},
               "qq", k=3).collect()}
    assert set(res) == {3}  # only anchor-matched doc; body never has qq
    assert res[3] > 0
    # joint saturation: body match + anchor match beats body-only
    res2 = [r.doc_id for r in search_bm25f_relations(
        spark, {"body": (body, 1.0), "anchor": (anchors, 2.0)},
        "d2", k=3).collect()]
    assert res2[0] == 1  # doc 1: anchor 'd2 d2' (w=2) beats doc 2's body d2


class TestDisMax:
    """search_dismax: per-term best-field BM25 with tie-breaker."""

    def _brute(self, texts, query, *, k1=1.2, b=0.75, tie=0.0, tt=6):
        """Per-field BM25 indices + per-term dis_max, pure python."""
        from collections import Counter

        from ir_spark.text import STOPWORDS, tokenize

        bag = Counter(t for t in tokenize(query) if t not in STOPWORDS)
        fields = {}
        for doc_id, text in texts:
            w = text.split(" ")
            for fname, toks in (("title", w[:tt]), ("body", w[tt:])):
                kept = [t for t in tokenize(" ".join(toks))]
                if kept:
                    fields.setdefault(fname, {})[doc_id] = kept
        scores = {}
        for fname, docs_f in fields.items():
            n_f = len(docs_f)
            avg = sum(len(v) for v in docs_f.values()) / n_f
            for t in bag:
                df = sum(1 for v in docs_f.values()
                         if t in v and t not in STOPWORDS)
                if df == 0:
                    continue
                idf = math.log(1 + (n_f - df + 0.5) / (df + 0.5))
                for d, toks in docs_f.items():
                    tf = sum(1 for x in toks if x == t)
                    if tf == 0:
                        continue
                    s = idf * tf * (k1 + 1) / (
                        tf + k1 * (1 - b + b * len(toks) / avg))
                    scores.setdefault((d, t), []).append(s)
        out = {}
        for (d, t), ss in scores.items():
            m = max(ss)
            out[d] = out.get(d, 0.0) + (m + tie * (sum(ss) - m)) * bag[t]
        return sorted(out.items(), key=lambda r: (-round(r[1] * 1e6), r[0]))

    TEXTS = [
        (1, "query w2 w3 w4 w5 w6 b1 query b3 b4"),
        (2, "w1 w2 w3 w4 w5 w6 query query b3 b4"),
        (3, "query w2 w3 w4 w5 w6 other b2 b3 b4 b5 b6 b7"),
        (4, "x1 x2 x3"),
        (5, "other w2 query w4 w5 w6 query b2 query b4"),
    ]

    @pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
    def test_matches_bruteforce(self, spark, tie):
        from ir_spark.operators.fields import search_dismax

        docs = spark.createDataFrame(self.TEXTS, "doc_id long, text string")
        got = [(r.doc_id, round(r.score * 1e6)) for r in
               search_dismax(spark, docs, "query other", k=10,
                             tie=tie).collect()]
        want = [(d, round(s * 1e6)) for d, s in
                self._brute(self.TEXTS, "query other", tie=tie)]
        assert got == want

    def test_tie_one_equals_field_sum(self, spark):
        """tie=1.0 degenerates to summing per-field scores."""
        from ir_spark.operators.fields import search_dismax

        docs = spark.createDataFrame(self.TEXTS, "doc_id long, text string")
        got = {r.doc_id: r.score for r in
               search_dismax(spark, docs, "query", k=10, tie=1.0).collect()}
        want = dict(self._brute(self.TEXTS, "query", tie=1.0))
        for d, s in want.items():
            assert got[d] == pytest.approx(s, rel=1e-12)

    def test_tie_monotone_only_for_multifield_docs(self, spark):
        """Raising tie adds the non-best fields' scores: a doc matching
        in BOTH fields gains, a single-field match is tie-invariant."""
        from ir_spark.operators.fields import search_dismax

        docs = spark.createDataFrame(
            [(1, "aa t2 t3 t4 t5 t6 aa b2 b3 b4"),   # title + body match
             (2, "aa t2 t3 t4 t5 t6 b1 b2 b3 b4")],  # title-only match
            "doc_id long, text string")
        lo = {r.doc_id: r.score for r in
              search_dismax(spark, docs, "aa", k=2, tie=0.0).collect()}
        hi = {r.doc_id: r.score for r in
              search_dismax(spark, docs, "aa", k=2, tie=0.5).collect()}
        assert hi[1] > lo[1]
        assert hi[2] == pytest.approx(lo[2], rel=1e-12)

    def test_rejects_bad_tie(self, spark):
        from ir_spark.operators.fields import search_dismax

        docs = spark.createDataFrame([(1, "aa bb")],
                                     "doc_id long, text string")
        for tie in (-0.1, 1.01):
            with pytest.raises(ValueError):
                search_dismax(spark, docs, "aa", tie=tie)
