"""Sequential dependence model (operators/sdm.py::search_sdm) vs a
pure-Python brute force of the textbook Metzler-Croft formula —
verifies the single-scan distributed form (map-assembled pair counts,
bounded-buffer window counting, Dirichlet decomposition) including
repeated query terms, stopword-only neighbors and unseen terms."""

from __future__ import annotations

import math
import random

import pytest

from ir_spark.oracle import parse_query
from ir_spark.text import STOPWORDS, tokenize

MU, W, L = 1000.0, 8, (0.85, 0.1, 0.05)

QUERIES = [
    "alpha beta gamma",
    "beta beta alpha",
    "delta eps",
    "zeta alpha zeta",
    "the of alpha",          # stopword neighbors collapse adjacency
    "nosuchterm beta gamma",  # unseen unigram dropped, pair dropped
]


@pytest.fixture(scope="module")
def corpus(spark):
    from ir_spark.operators.build import build_dataframe_index
    from ir_spark.operators.positions import token_positions

    rng = random.Random(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [(i, " ".join(rng.choice(vocab)
                          for _ in range(rng.randint(3, 40))))
             for i in range(50)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    return build_dataframe_index(docs), token_positions(docs), texts


def _brute(texts, query, k=10):
    bag = parse_query(query)
    toks_by_doc = {i: tokenize(t) for i, t in texts}
    cf: dict[str, int] = {}
    for toks in toks_by_doc.values():
        for t in toks:
            if t not in STOPWORDS:
                cf[t] = cf.get(t, 0) + 1
    c = sum(cf.values())
    terms = sorted(t for t in bag if cf.get(t))
    if not terms:
        return []
    seq = [t for t in tokenize(query) if t not in STOPWORDS]
    pairs = [(a, b) for a, b in zip(seq, seq[1:])
             if cf.get(a) and cf.get(b) and a != b]

    def tf_o(toks, a, b):
        return sum(1 for i in range(len(toks) - 1)
                   if toks[i] == a and toks[i + 1] == b)

    def tf_u(toks, a, b):
        pa = [i for i, t in enumerate(toks) if t == a]
        pb = [i for i, t in enumerate(toks) if t == b]
        return sum(1 for x in pa for y in pb if abs(x - y) < W)

    cfo = {p: sum(tf_o(t, *p) for t in toks_by_doc.values()) for p in pairs}
    cfu = {p: sum(tf_u(t, *p) for t in toks_by_doc.values()) for p in pairs}
    lt, lo, lu = L
    out = {}
    for d, toks in toks_by_doc.items():
        if not any(toks.count(t) for t in terms):
            continue
        dl = len(toks)
        s = sum(lt * bag[t]
                * math.log((toks.count(t) + MU * cf[t] / c) / (dl + MU))
                for t in terms)
        for p in pairs:
            if cfo[p]:
                s += lo * math.log(
                    (tf_o(toks, *p) + MU * cfo[p] / c) / (dl + MU))
            if cfu[p]:
                s += lu * math.log(
                    (tf_u(toks, *p) + MU * cfu[p] / c) / (dl + MU))
        out[d] = s
    rows = sorted(out.items(), key=lambda r: (-round(r[1] * 1e6), r[0]))
    return [(d, round(s * 1e6)) for d, s in rows[:k]]


@pytest.mark.parametrize("query", QUERIES)
def test_sdm_matches_bruteforce(spark, corpus, query):
    from ir_spark.operators.sdm import search_sdm

    idx, rel, texts = corpus
    got = [(r.doc_id, round(r.score * 1e6))
           for r in search_sdm(spark, idx, rel, query, k=10, mu=MU,
                               window=W, lambdas=L).collect()]
    assert got == _brute(texts, query), query


def test_sdm_window_count_linear_stress(spark):
    """A doc interleaving both pair terms thousands of times: the
    bounded-buffer scan must return the exact pair count (brute force
    on this one doc) without quadratic blowup."""
    from ir_spark.operators.build import build_dataframe_index
    from ir_spark.operators.positions import token_positions
    from ir_spark.operators.sdm import search_sdm

    words = []
    for _ in range(1500):
        words.extend(["alpha", "beta"])
    texts = [(1, " ".join(words)), (2, "alpha xx beta")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    idx = build_dataframe_index(docs)
    rel = token_positions(docs)
    got = [(r.doc_id, round(r.score * 1e6))
           for r in search_sdm(spark, idx, rel, "alpha beta", k=2,
                               mu=MU, window=W, lambdas=L).collect()]
    assert got == _brute(texts, "alpha beta", k=2)
