"""Oracle-parity tests for the DataFrame engine (SURVEY §5.2.2).

The Spark engine must be rank-identical (docIDs) and score-identical
(<=1e-9) to the executable spec on the reference query set × all three
weighting modes.
"""

from __future__ import annotations

import pytest

from ir_spark import oracle
from ir_spark.fixtures import EDGE_QUERIES, REFERENCE_QUERIES
from ir_spark.operators import build as B
from ir_spark.operators import query as Q


@pytest.fixture(scope="module")
def spark_index(spark, pages_small):
    path, _ = pages_small
    pages = spark.read.parquet(path)
    return B.build_dataframe_index(pages)


class TestBuildParity:
    def test_collection_stats(self, spark_index, oracle_index):
        assert spark_index.n_docs == oracle_index.n_docs
        assert abs(spark_index.avg_doc_len - oracle_index.avg_doc_len) < 1e-9

    def test_dictionary_parity(self, spark_index, oracle_index):
        got = {
            r["term"]: (r["df"], r["cf"])
            for r in spark_index.dictionary.collect()
        }
        want = {
            t: (len(pl), sum(tf for _, tf in pl))
            for t, pl in oracle_index.postings.items()
        }
        assert got == want

    def test_docinfo_parity(self, spark_index, oracle_index):
        got = {
            r["doc_id"]: (r["doc_len"], r["max_tf"])
            for r in spark_index.docinfo.collect()
        }
        want = {
            d: (dl, mt if mt > 0 else None)
            for d, (dl, mt) in oracle_index.docinfo.items()
        }
        assert got == want

    def test_postings_parity_sample(self, spark_index, oracle_index):
        # full check on the 30 highest-df terms + 30 arbitrary tail terms
        terms = sorted(
            oracle_index.postings, key=lambda t: -len(oracle_index.postings[t])
        )[:30] + sorted(oracle_index.postings)[:30]
        rows = spark_index.postings.filter(
            spark_index.postings.term.isin(terms)
        ).collect()
        got: dict[str, list[tuple[int, int]]] = {}
        for r in rows:
            got.setdefault(r["term"], []).append((r["doc_id"], r["tf"]))
        for t in terms:
            assert sorted(got.get(t, [])) == oracle_index.postings[t], t


MODES = ("bm25", "w1", "w2")


class TestQueryParity:
    @pytest.mark.parametrize("mode", MODES)
    def test_reference_queries_rank_identical(self, spark, spark_index,
                                              oracle_index, mode):
        norms = Q.doc_norms(spark_index, mode).persist() if mode != "bm25" else None
        for q in REFERENCE_QUERIES + EDGE_QUERIES:
            want = oracle.search(oracle_index, q, k=5, mode=mode)
            got = [
                (r["doc_id"], r["score"])
                for r in Q.search(spark, spark_index, q, k=5, mode=mode,
                                  norms=norms).collect()
            ]
            assert [d for d, _ in got] == [d for d, _ in want], (mode, q)
            for (gd, gs), (wd, ws) in zip(got, want):
                assert abs(gs - ws) < 1e-9, (mode, q, gd, gs, ws)


def test_release_norms(spark, pages_small):
    """release_norms unpersists and clears the per-(mode, k1, b) norms
    cache (ADVICE r01 persist-leak release path)."""
    path, _ = pages_small
    idx = B.build_dataframe_index(spark.read.parquet(path))
    n1 = Q.doc_norms(idx, "w1")
    n2 = Q.doc_norms(idx, "w2")
    assert n1.storageLevel.useMemory and n2.storageLevel.useMemory
    assert len(idx._norms_cache) == 2
    Q.release_norms(idx)
    assert idx._norms_cache == {}
    assert not n1.storageLevel.useMemory
    assert not n2.storageLevel.useMemory


def test_curate_cache_release(spark, pages_small):
    """curate(caches=...) hands back its stage1 persist for release."""
    from ir_spark.operators.dedup import curate

    path, _ = pages_small
    docs = (spark.read.parquet(path).select("url", "text")
            .withColumn("doc_id",
                        __import__("pyspark.sql.functions",
                                   fromlist=["xxhash64"]).xxhash64("url"))
            .select("doc_id", "text"))
    caches: list = []
    out = curate(docs, caches=caches)
    assert out.count() > 0
    # r5: curate hands back THREE persists — stage1, the hashed
    # shingle relation, and the candidate-pair relation
    assert len(caches) == 3
    assert all(c.storageLevel.useMemory for c in caches)
    for c in caches:
        c.unpersist()
    assert not any(c.storageLevel.useMemory for c in caches)


def test_curate_no_caches_does_not_leak(spark, pages_small):
    """curate(caches=None) must release its internal persists before
    returning (r5 ADVICE: the leaked-session-cache pattern), and the
    rebuilt result must equal the cache-hand-off result."""
    from pyspark.sql import functions as F

    from ir_spark.operators.dedup import curate

    path, _ = pages_small
    docs = (spark.read.parquet(path).select("url", "text")
            .withColumn("doc_id", F.xxhash64("url"))
            .select("doc_id", "text"))
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = curate(docs)
    got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # only the eager keep-id localCheckpoint may remain registered;
    # the stage1/shingle persists must be gone
    after = jsc.getPersistentRDDs().size()
    assert after <= before + 1
    caches: list = []
    want = sorted(r["doc_id"] for r in
                  curate(docs, caches=caches).select("doc_id").collect())
    for c in caches:
        c.unpersist()
    assert got == want


def test_fused_tokenize_kernel_matches_two_pass(spark, pages_small):
    """token_counts_fused sentinel rows == build_docinfo over
    token_counts, and its token rows == build_postings (r5: the
    docinfo stage became a filter over the fused relation)."""
    from pyspark.sql import functions as F

    from ir_spark.operators import build as B

    path, _ = pages_small
    docs = (spark.read.parquet(path).select("url", "text")
            .withColumn("doc_id", F.xxhash64("url"))
            .select("doc_id", "text"))
    fused = B.token_counts_fused(docs).persist()
    try:
        di_new = {(r["doc_id"], r["doc_len"], r["max_tf"])
                  for r in B.docinfo_from_fused(fused).collect()}
        di_old = {(r["doc_id"], r["doc_len"], r["max_tf"])
                  for r in B.build_docinfo(B.token_counts(docs)).collect()}
        assert di_new == di_old
        po_new = {(r["doc_id"], r["term"], r["tf"])
                  for r in B.postings_from_fused(fused).collect()}
        po_old = {(r["doc_id"], r["term"], r["tf"])
                  for r in B.build_postings(B.token_counts(docs)).collect()}
        assert po_new == po_old
    finally:
        fused.unpersist()
