"""Document deletion lifecycle (operators/deletes.py + compaction
purge): tombstones exclude docs from every retrieval path immediately
with Lucene maxDoc/numDocs stats semantics, and
compact_segments(purge_deletes=True) makes the index value-identical
to a fresh build over the surviving corpus."""

from __future__ import annotations

import os

import pytest

from ir_spark.fixtures import REFERENCE_QUERIES
from ir_spark.operators import segment_query as SQ
from ir_spark.operators import segments as SEG
from ir_spark.operators.deletes import delete_docs, tombstones_path
from ir_spark.sources import storage

RANGE_WIDTH = 64
N_BUCKETS = 8
QUERIES = [q for q in REFERENCE_QUERIES[:5]]


def _build(spark, pages_path, dest):
    pages = spark.read.parquet(pages_path)
    SEG.build_segment_index(spark, pages, dest, source=pages_path,
                            n_buckets=N_BUCKETS, range_width=RANGE_WIDTH,
                            segment_groups=2)


@pytest.fixture(scope="module")
def del_setup(spark, pages_small, tmp_path_factory):
    """(index_dir, deleted_urls, pre_delete_full_rankings) — the full
    per-query rankings are captured BEFORE tombstoning; stats do not
    move on delete, so the expected post-delete ranking is exactly the
    pre-delete one with the victims filtered out."""
    path, pages = pages_small
    d = str(tmp_path_factory.mktemp("delidx"))
    _build(spark, path, d)
    sidx = SQ.SegmentIndex.load(spark, d)
    pre = {}
    for q in QUERIES:
        rows = SQ.search_segments(spark, sidx, q, k=500, mode="bm25").collect()
        pre[q] = [(r["doc_id"], r["score"]) for r in rows]
    victims = sorted({p.url for p in pages})[::5]  # every 5th url
    m = delete_docs(spark, d, victims)
    assert m["n_new"] == len(victims) == m["n_total"]
    doc_map = {r["url"]: r["doc_id"]
               for r in spark.read.parquet(os.path.join(d, "doc_map")).collect()}
    deleted_ids = {doc_map[u] for u in victims}
    return d, victims, deleted_ids, pre


class TestTombstonedQueries:
    @pytest.mark.parametrize("strategy", ["exhaustive", "wand", "maxscore"])
    def test_bm25_excludes_and_backfills(self, spark, del_setup, strategy):
        d, _victims, deleted_ids, pre = del_setup
        sidx = SQ.SegmentIndex.load(spark, d)
        for q in QUERIES:
            got = [(r["doc_id"], r["score"]) for r in
                   SQ.search_segments(spark, sidx, q, k=10, mode="bm25",
                                      strategy=strategy).collect()]
            assert not ({doc for doc, _ in got} & deleted_ids)
            # live docs ranked below a deleted one must surface: the
            # expected list is the pre-delete ranking minus the victims
            expect = [(doc, s) for doc, s in pre[q]
                      if doc not in deleted_ids][:10]
            assert got == expect, q

    def test_qld_and_cosine_masked(self, spark, del_setup):
        d, _victims, deleted_ids, _pre = del_setup
        sidx = SQ.SegmentIndex.load(spark, d)
        for mode in ("qld", "w1", "w2"):
            rows = SQ.search_segments(spark, sidx, QUERIES[0], k=25,
                                      mode=mode).collect()
            assert rows, mode
            assert not ({r["doc_id"] for r in rows} & deleted_ids), mode

    def test_batch_masked_and_equal_to_single(self, spark, del_setup):
        d, _victims, deleted_ids, _pre = del_setup
        sidx = SQ.SegmentIndex.load(spark, d)
        batch = SQ.search_segments_batch(spark, sidx, QUERIES, k=10,
                                         mode="bm25").collect()
        assert not ({r["doc_id"] for r in batch} & deleted_ids)
        by_q = {}
        for r in sorted(batch, key=lambda r: (r["query_id"], r["rank"])):
            by_q.setdefault(r["query_id"], []).append(r["doc_id"])
        for qid, q in enumerate(QUERIES):
            single = [r["doc_id"] for r in SQ.search_segments(
                spark, sidx, q, k=10, mode="bm25").collect()]
            assert by_q.get(qid, []) == single, q

    def test_delete_is_idempotent(self, spark, del_setup):
        d, victims, _deleted_ids, _pre = del_setup
        m = delete_docs(spark, d, victims[:3] + ["http://nosuch.example/x"])
        assert m["n_new"] == 0
        assert m["n_total"] == len(victims)

    def test_stats_unchanged_until_compaction(self, spark, del_setup,
                                              pages_small):
        d, _victims, _deleted_ids, _pre = del_setup
        _, pages = pages_small
        sidx = SQ.SegmentIndex.load(spark, d)
        assert sidx.n_docs == len({p.url for p in pages})  # maxDoc semantics


class TestCompactionPurge:
    @pytest.fixture(scope="class")
    def compacted(self, spark, del_setup, tmp_path_factory):
        import shutil

        d, victims, deleted_ids, _pre = del_setup
        c = str(tmp_path_factory.mktemp("compact") / "idx")
        shutil.copytree(d, c)
        metrics = SEG.compact_segments(spark, c, purge_deletes=True)
        return c, victims, deleted_ids, metrics

    def test_tombstones_cleared_and_stats_shrink(self, spark, compacted,
                                                 pages_small):
        c, victims, _deleted_ids, _metrics = compacted
        _, pages = pages_small
        assert not os.path.isdir(tombstones_path(c))
        manifests = storage.read_manifests(c)
        assert manifests["tombstones"]["metrics"]["n_total"] == 0
        n_live = len({p.url for p in pages}) - len(victims)
        sidx = SQ.SegmentIndex.load(spark, c)
        assert sidx.n_docs == n_live
        # side tables purged too
        for side in ("docinfo", "doc_map"):
            assert spark.read.parquet(os.path.join(c, side)).count() == n_live

    def test_equals_fresh_build_over_live_corpus(self, spark, compacted,
                                                 pages_small, tmp_path_factory):
        """After the purge, every retrieval mode is value-identical
        (per url, micro-quantized) to a FRESH build over only the
        surviving pages — dictionary/df, stats, and norms all moved."""
        c, victims, _deleted_ids, _metrics = compacted
        path, _pages = pages_small
        fresh_dir = str(tmp_path_factory.mktemp("fresh"))
        pages_df = spark.read.parquet(path)
        live = pages_df.filter(~pages_df["url"].isin(victims))
        SEG.build_segment_index(spark, live, fresh_dir, source=path + ":live",
                                n_buckets=N_BUCKETS, range_width=RANGE_WIDTH,
                                segment_groups=2)

        def ranked(index_dir, mode):
            sidx = SQ.SegmentIndex.load(spark, index_dir)
            res = SQ.search_segments(spark, sidx, QUERIES[0], k=15, mode=mode)
            doc_map = {r["doc_id"]: r["url"] for r in spark.read.parquet(
                os.path.join(index_dir, "doc_map")).collect()}
            return sorted((doc_map[r["doc_id"]], round(r["score"] * 1e6))
                          for r in res.collect())

        for mode in ("bm25", "w1", "w2", "qld"):
            assert ranked(c, mode) == ranked(fresh_dir, mode), mode

    def test_append_after_compaction(self, spark, compacted):
        from ir_spark.streaming.incremental import update_segment_index

        c, _victims, _deleted_ids, _metrics = compacted
        extra = spark.createDataFrame(
            [("http://new.example/a", "zzznewterm fast hash join appended"),
             ("http://new.example/b", "zzznewterm vector scan appended")],
            "url string, text string")
        m = update_segment_index(spark, extra, c)
        assert m["n_new_docs"] == 2
        sidx = SQ.SegmentIndex.load(spark, c)
        rows = SQ.search_segments(spark, sidx, "zzznewterm", k=5).collect()
        assert len(rows) == 2


def test_verify_index_clean_and_corrupted(spark, tmp_path):
    """fsck: a fresh build verifies ok; corrupting the dictionary or
    the stats manifest is detected with a specific error."""
    import json
    import os

    from ir_spark.fixtures import generate_pages, pages_to_parquet
    from ir_spark.operators.segments import build_segment_index, verify_index
    from ir_spark.sources import storage

    src = str(tmp_path / "pages.parquet")
    pages_to_parquet(generate_pages(150, seed=23), src)
    idx = str(tmp_path / "idx")
    build_segment_index(spark, spark.read.parquet(src), idx,
                        source=src, segment_groups=1)
    rep = verify_index(spark, idx)
    assert rep["ok"], rep["errors"]
    assert rep["checked"]["n_docs"] == 150

    # corrupt the dictionary: double one term's df
    from pyspark.sql import functions as F

    d = spark.read.parquet(os.path.join(idx, "dictionary"))
    broken = d.withColumn(
        "df", F.when(F.col("term") == d.orderBy("term").first()["term"],
                     F.col("df") * 2).otherwise(F.col("df")))
    storage.atomic_write_parquet(broken, os.path.join(idx, "dictionary"))
    rep2 = verify_index(spark, idx)
    assert not rep2["ok"]
    assert any("dictionary drift" in e for e in rep2["errors"])

    # corrupt the stats manifest
    mpath = os.path.join(idx, "_manifests", "stats.json")
    m = json.load(open(mpath))
    m["metrics"]["n_docs"] = 9999
    json.dump(m, open(mpath, "w"))
    rep3 = verify_index(spark, idx)
    assert any("stats n_docs" in e for e in rep3["errors"])
