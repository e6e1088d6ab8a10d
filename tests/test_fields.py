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
