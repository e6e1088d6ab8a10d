"""Reverse search / percolation (operators/percolate.py)."""

from __future__ import annotations

from ir_spark.operators.percolate import percolate


def _frames(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"),
         (2, "a"), (2, "a"), (2, "x"),      # duplicate term rows ok
         (3, "x"), (3, "y")],
        "doc_id long, term string")
    queries = spark.createDataFrame(
        [(10, "a"), (10, "b"),              # AND pair
         (20, "a"),                          # single term
         (30, "a"), (30, "b"), (30, "z"),    # one term absent everywhere
         (40, "q")],                         # fully absent
        "query_id long, term string")
    return docs, queries


class TestPercolate:
    def test_and_semantics(self, spark):
        docs, queries = _frames(spark)
        got = {(r.query_id, r.doc_id): (r.n_matched, r.n_terms)
               for r in percolate(docs, queries).collect()}
        assert got == {
            (10, 1): (2, 2),          # doc1 has a AND b
            (20, 1): (1, 1), (20, 2): (1, 1),
        }

    def test_min_should_match(self, spark):
        docs, queries = _frames(spark)
        got = {(r.query_id, r.doc_id): r.n_matched
               for r in percolate(docs, queries,
                                  min_should_match=2).collect()}
        # q30 now matches doc1 (a, b of a/b/z); q20 (1 term) still
        # matches via the min(n_terms, msm) cap; q40 never matches
        assert (30, 1) in got and got[(30, 1)] == 2
        assert (20, 1) in got and (20, 2) in got
        assert not any(q == 40 for q, _ in got)

    def test_duplicate_doc_terms_counted_once(self, spark):
        docs, queries = _frames(spark)
        got = {(r.query_id, r.doc_id): r.n_matched
               for r in percolate(docs, queries).collect()}
        assert got[(20, 2)] == 1  # doc2 has 'a' twice -> one match


def test_percolate_streaming_foreachbatch(spark, tmp_path):
    """The alerting deployment shape: percolate each micro-batch of
    newly crawled docs against the stored queries via foreachBatch —
    per-batch results equal batch percolation of that batch's docs."""
    import os

    queries = spark.createDataFrame(
        [(10, "a"), (10, "b"), (20, "x")], "query_id long, term string")
    src = str(tmp_path / "docs")
    os.makedirs(src)
    b0 = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "x")], "doc_id long, term string")
    b1 = spark.createDataFrame(
        [(3, "a"), (3, "x")], "doc_id long, term string")
    # flat files (the file-stream source does not recurse into
    # nested .parquet output directories)
    b0.toPandas().to_parquet(os.path.join(src, "b0.parquet"), index=False)
    b1.toPandas().to_parquet(os.path.join(src, "b1.parquet"), index=False)

    seen: list[tuple] = []

    def _alert(batch_df, batch_id):
        rows = percolate(batch_df, queries).collect()
        seen.extend((r.query_id, r.doc_id) for r in rows)

    stream = (spark.readStream.schema("doc_id long, term string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(_alert)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    want = {(r.query_id, r.doc_id)
            for r in percolate(b0, queries).collect()}
    want |= {(r.query_id, r.doc_id)
             for r in percolate(b1, queries).collect()}
    assert set(seen) == want
    assert (10, 1) in set(seen) and (20, 2) in set(seen) \
        and (20, 3) in set(seen)
