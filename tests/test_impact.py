"""Impact-ordered index + SAAT retrieval (operators/impact.py):
quantization invariants, fidelity monotone in levels, certified
lossless pruning identical to the unpruned ranking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ir_spark.fixtures import REFERENCE_QUERIES, generate_pages
from ir_spark.operators.build import build_dataframe_index
from ir_spark.operators.impact import (
    build_impact_index,
    search_impacts,
    search_impacts_pruned,
)
from ir_spark.operators.query import search


@pytest.fixture(scope="module")
def idx(spark):
    pages = generate_pages(300, seed=42)
    df = spark.createDataFrame(
        [(i, p.text) for i, p in enumerate(pages)], "doc_id long, text string")
    index = build_dataframe_index(df)
    index.postings.persist().count()
    index.docinfo.persist().count()
    yield index
    index.postings.unpersist()
    index.docinfo.unpersist()


def test_impact_range_and_coverage(spark, idx):
    imp = build_impact_index(idx, levels=64)
    stats = imp.impacts.agg(
        F.min("impact"), F.max("impact"), F.count(F.lit(1))).collect()[0]
    assert stats[0] >= 1
    assert stats[1] == 64  # the max-scoring posting lands on the top level
    assert stats[2] == idx.postings.count()  # one impact per posting


def test_impact_monotone_in_score(spark, idx):
    """Quantization preserves order: a higher per-posting micro score
    never maps to a lower impact (uniform integer binning)."""
    from ir_spark.operators.query import doc_weight_expr

    imp = build_impact_index(idx, levels=16)
    w = doc_weight_expr("bm25", idx.n_docs, idx.avg_doc_len, 1.2, 0.75)
    scored = (idx.postings
              .join(idx.dictionary.select("term", "df"), "term")
              .join(idx.docinfo, "doc_id")
              .select("term", "doc_id",
                      F.round(w * 1_000_000).cast("long").alias("m")))
    joined = scored.join(imp.impacts, ["term", "doc_id"]).select(
        "m", "impact").collect()
    pairs = sorted((r["m"], r["impact"]) for r in joined)
    for (m1, i1), (m2, i2) in zip(pairs, pairs[1:]):
        assert i1 <= i2


def test_fidelity_monotone_in_levels(spark, idx):
    """Top-10 overlap with exact BM25 is (weakly) monotone in the
    quantization depth and high at 10 bits."""
    q = REFERENCE_QUERIES[0]
    exact = [r.doc_id for r in search(spark, idx, q, k=10).collect()]
    overlaps = []
    for levels in (4, 64, 1024):
        imp = build_impact_index(idx, levels=levels)
        got = [r.doc_id
               for r in search_impacts(spark, imp, idx, q, k=10).collect()]
        overlaps.append(len(set(got) & set(exact)) / 10)
    assert overlaps == sorted(overlaps)
    assert overlaps[-1] >= 0.8


def test_pruned_identical_to_unpruned(spark, idx):
    imp = build_impact_index(idx, levels=64)
    for q in REFERENCE_QUERIES[:5]:
        full = [(r.doc_id, r.score)
                for r in search_impacts(spark, imp, idx, q, k=10).collect()]
        pruned_df, cutoff = search_impacts_pruned(spark, imp, idx, q, k=10)
        pruned = [(r.doc_id, r.score) for r in pruned_df.collect()]
        assert pruned == full
        assert 1 <= cutoff <= imp.levels


def test_pruned_certificate_actually_prunes(spark, idx):
    """On the test corpus at least one reference query accepts a
    cutoff > 1 (otherwise the pruned path silently degenerated)."""
    imp = build_impact_index(idx, levels=64)
    cutoffs = [search_impacts_pruned(spark, imp, idx, q, k=10)[1]
               for q in REFERENCE_QUERIES[:5]]
    assert max(cutoffs) > 1


def test_empty_query_and_empty_index(spark, idx):
    imp = build_impact_index(idx, levels=64)
    assert search_impacts(spark, imp, idx, "the of and", k=10).count() == 0
    empty = spark.createDataFrame([], "doc_id long, text string")
    eidx = build_dataframe_index(empty, cache=False)
    eimp = build_impact_index(eidx, levels=64)
    assert eimp.max_micro == 0
    assert search_impacts(spark, eimp, eidx, "anything", k=5).count() == 0
