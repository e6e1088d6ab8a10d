"""Bigram collocations (operators/ngrams.py) vs pure-Python ground
truth over the frozen tokenize stream on salted web text."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from ir_spark.operators.ngrams import bigram_counts, collocations
from ir_spark.text import tokenize


@pytest.fixture(scope="module")
def docs(spark, pages_small):
    path, _ = pages_small
    from ir_spark.operators.build import assign_doc_ids

    raw = spark.read.parquet(path)
    ids = assign_doc_ids(raw)
    df = raw.join(ids, "url").select("doc_id", "text")
    return df, {r["doc_id"]: r["text"] for r in df.collect()}


def _py_bigrams(texts):
    c: Counter = Counter()
    for text in texts.values():
        toks = tokenize(text)
        c.update(zip(toks, toks[1:]))
    return c


def test_bigram_counts_match_pure_python(docs):
    df, texts = docs
    want = {(a, b): n for (a, b), n in _py_bigrams(texts).items()}
    got = {(r["w1"], r["w2"]): r["n"] for r in bigram_counts(df).collect()}
    assert got == want


def test_collocations_match_pure_python(docs):
    df, texts = docs
    c = _py_bigrams(texts)
    total = sum(c.values())
    left: Counter = Counter()
    right: Counter = Counter()
    for (a, b), n in c.items():
        left[a] += n
        right[b] += n
    min_n = 2
    want = sorted(
        ((a, b, n, round(1e6 * math.log(n * total / (left[a] * right[b]))))
         for (a, b), n in c.items() if n >= min_n),
        key=lambda r: (-r[3], r[0], r[1]))[:10]
    got = [(r["w1"], r["w2"], r["n"], r["pmi_micro"])
           for r in collocations(df, min_count=min_n, k=10).collect()]
    assert got == want


def test_collocations_cache_release(docs):
    df, _ = docs
    caches: list = []
    collocations(df, min_count=2, k=5, caches=caches).collect()
    assert len(caches) == 1
    for c in caches:
        c.unpersist()
