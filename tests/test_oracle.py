"""Tests for the executable spec (ir_spark/oracle.py) — SURVEY §5.2.2/3."""

import math

from ir_spark.fixtures import EDGE_QUERIES, REFERENCE_QUERIES, generate_pages
from ir_spark.oracle import (
    bm25_weight,
    build_index,
    doc_norms,
    max_tf_weight,
    okapi_weight,
    parse_query,
    search,
)
from ir_spark.text import STOPWORDS, tokenize


def _corpus(n=300, seed=42):
    pages = generate_pages(n, seed=seed)
    return [(i, p.text) for i, p in enumerate(pages)]


class TestBuildInvariants:
    def test_invariants(self):
        docs = _corpus()
        idx = build_index(docs)
        assert idx.n_docs == len(docs)
        for term, plist in idx.postings.items():
            assert term not in STOPWORDS
            # postings strictly increasing in doc_id
            ids = [d for d, _ in plist]
            assert ids == sorted(set(ids))
            assert idx.df(term) == len(plist)
        # doc_len counts ALL tokens (D2); postings exclude stopwords
        for doc_id, text in docs:
            toks = tokenize(text)
            dl, max_tf = idx.docinfo[doc_id]
            assert dl == len(toks)
            indexed = sum(
                tf for plist in idx.postings.values() for d, tf in plist if d == doc_id
            )
            assert indexed == sum(1 for t in toks if t not in STOPWORDS)
            if indexed:
                assert max_tf == max(
                    tf for plist in idx.postings.values() for d, tf in plist if d == doc_id
                )


class TestWeights:
    # hand-computed values incl. integer-division idf edge cases (D5)
    def test_w1_hand_value(self):
        # tf=2, max_tf=4, df=10, N=100 -> (0.4+0.6*ln2.5/ln5) * ln(10)/ln(100)
        expect = (0.4 + 0.6 * math.log(2.5) / math.log(5.0)) * math.log(10) / math.log(100)
        assert abs(max_tf_weight(2, 4, 10, 100) - expect) < 1e-12

    def test_w1_integer_division_idf_zero(self):
        # df > N/2 -> N//df == 1 -> ln(1) == 0 (quirk D5)
        assert max_tf_weight(3, 5, 51, 100) == 0.0
        assert max_tf_weight(3, 5, 50, 100) > 0.0  # 100//50 == 2

    def test_w1_zero_guards(self):
        assert max_tf_weight(0, 4, 10, 100) == 0.0
        assert max_tf_weight(2, 0, 10, 100) == 0.0
        assert max_tf_weight(2, 4, 0, 100) == 0.0

    def test_w2_hand_value(self):
        # tf=3, docLen=120, df=10, N=100, avg=100
        expect = 0.4 + 0.6 * (3 / (3 + 0.5 + 1.5 * 1.2)) * math.log(10) / math.log(100)
        assert abs(okapi_weight(3, 120, 10, 100, 100.0) - expect) < 1e-12

    def test_bm25_monotone_in_tf(self):
        w1 = bm25_weight(1, 100, 10, 1000, 100.0)
        w2 = bm25_weight(5, 100, 10, 1000, 100.0)
        assert 0 < w1 < w2

    def test_bm25_idf_positive_even_for_common_terms(self):
        assert bm25_weight(1, 100, 999, 1000, 100.0) > 0.0


class TestSearch:
    def test_all_stopword_query_empty(self):
        idx = build_index(_corpus(50))
        assert parse_query("the of and in") == {}
        assert search(idx, "the of and in") == []

    def test_unseen_terms_skipped(self):
        idx = build_index(_corpus(50))
        assert search(idx, "zzqqxx flibbertigibbet") == []

    def test_deterministic_tie_break(self):
        # two identical docs must rank by doc_id ascending (D8)
        idx = build_index([(7, "shock wave theory"), (3, "shock wave theory")])
        res = search(idx, "shock wave", k=2, mode="bm25")
        assert [d for d, _ in res] == [3, 7]
        assert abs(res[0][1] - res[1][1]) < 1e-12

    def test_modes_run_on_reference_queries(self):
        idx = build_index(_corpus(300))
        for q in REFERENCE_QUERIES + EDGE_QUERIES:
            for mode in ("w1", "w2", "bm25"):
                res = search(idx, q, k=5, mode=mode)
                assert len(res) <= 5
                scores = [s for _, s in res]
                assert scores == sorted(scores, reverse=True)

    def test_norms_idempotent(self):
        # D4: norms must not depend on how many times they're computed
        idx = build_index(_corpus(50))
        n1 = doc_norms(idx, "w1")
        n2 = doc_norms(idx, "w1")
        assert n1 == n2
