"""Index merge (operators/merge.py): merging two half-corpus segment
indexes must be query-identical to one full build, and the merge must
be blob-preserving — posting payloads pass through byte-identical,
only the first doc-id varint and run metadata are re-based."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ir_spark.operators.build import assign_doc_ids
from ir_spark.operators.merge import merge_indexes
from ir_spark.operators.segment_query import SegmentIndex, search_segments
from ir_spark.operators.segments import build_segment_index, decode_segments

# fixture-vocabulary queries (make_vocab is aero-themed; absent-term
# queries would make the equality assertions pass vacuously)
QUERIES = ["boundary layer heat transfer", "supersonic wing pressure flow"]


@pytest.fixture(scope="module")
def merged(spark, pages_small, tmp_path_factory):
    path, _ = pages_small
    raw = spark.read.parquet(path)
    ids = assign_doc_ids(raw)
    n = ids.count()
    half_a = ids.filter(F.col("doc_id") <= n // 2).select("url")
    half_b = ids.filter(F.col("doc_id") > n // 2).select("url")
    base = tmp_path_factory.mktemp("merge")
    dirs = {k: str(base / k) for k in ("a", "b", "full", "merged")}
    # norms=False on the partial builds: the merge must recompute norms
    # against the merged global stats regardless (the w1/w2 cases below
    # prove it works with no half-index norms present at all)
    build_segment_index(spark, raw.join(half_a, "url"), dirs["a"], source="a",
                        norms=False)
    build_segment_index(spark, raw.join(half_b, "url"), dirs["b"], source="b",
                        norms=False)
    build_segment_index(spark, raw, dirs["full"], source="full")
    metrics = merge_indexes(spark, [dirs["a"], dirs["b"]], dirs["merged"])
    return dirs, metrics


def _results_by_url(spark, index_dir, query, mode):
    sidx = SegmentIndex.load(spark, index_dir)
    res = search_segments(spark, sidx, query, k=10, mode=mode)
    doc_map = spark.read.parquet(index_dir + "/doc_map")
    rows = res.join(doc_map, "doc_id").select("url", "score").collect()
    return sorted((r["url"], round(r["score"] * 1e6)) for r in rows)


@pytest.mark.parametrize("mode", ["bm25", "w1", "w2"])
@pytest.mark.parametrize("query", QUERIES)
def test_merged_query_equals_full_build(spark, merged, query, mode):
    dirs, _ = merged
    assert (_results_by_url(spark, dirs["merged"], query, mode)
            == _results_by_url(spark, dirs["full"], query, mode))


def test_merged_stats_and_postings_equal_full(spark, merged):
    dirs, metrics = merged
    sm = SegmentIndex.load(spark, dirs["merged"])
    sf = SegmentIndex.load(spark, dirs["full"])
    assert sm.n_docs == sf.n_docs
    assert abs(sm.avg_doc_len - sf.avg_doc_len) < 1e-9

    def rel(d):
        dec = decode_segments(spark.read.parquet(d + "/segments"))
        dm = spark.read.parquet(d + "/doc_map")
        return sorted(
            (r["url"], r["term"], r["tf"], r["doc_len"], r["max_tf"])
            for r in dec.join(dm, "doc_id").collect())

    assert rel(dirs["merged"]) == rel(dirs["full"])
    assert metrics["n_docs"] == sf.n_docs


def test_merge_is_blob_preserving(spark, merged):
    """Source B's rows appear in the merged index with IDENTICAL
    tf/doc_len/max_tf payloads and gap tails — only the first varint
    and doc-id metadata differ."""
    from ir_spark import codec

    dirs, metrics = merged
    off = metrics["offsets"][1]
    assert off > 0
    src = {(r["term"], r["run"]): r for r in
           spark.read.parquet(dirs["b"] + "/segments").collect()}
    rw = SegmentIndex.load(spark, dirs["b"]).range_width
    mrg = spark.read.parquet(dirs["merged"] + "/segments")
    picked = 0
    for r in mrg.collect():
        key = (r["term"], r["run"] - off // rw)
        if key not in src:
            continue
        s = src[key]
        if s["first_doc_id"] + off != r["first_doc_id"]:
            continue  # same (term, run) key could come from source A
        picked += 1
        assert bytes(s["tfs_vb"]) == bytes(r["tfs_vb"])
        assert bytes(s["doc_lens_vb"]) == bytes(r["doc_lens_vb"])
        assert bytes(s["max_tfs_vb"]) == bytes(r["max_tfs_vb"])
        assert s["last_doc_id"] + off == r["last_doc_id"]
        assert [x + off for x in s["block_last_doc_id"]] == list(
            r["block_last_doc_id"])
        assert list(codec.delta_decode(bytes(r["doc_gaps_vb"]))) == [
            d + off for d in codec.delta_decode(bytes(s["doc_gaps_vb"]))]
    assert picked > 50


def test_merge_rejects_mismatched_layout(spark, merged, tmp_path):
    dirs, _ = merged
    with pytest.raises(ValueError):
        merge_indexes(spark, [dirs["a"]], str(tmp_path / "x"))


def test_merge_streamed_with_batch_index(spark, pages_small,
                                         tmp_path_factory):
    """A STREAMED source (two appended batches -> multi-grp segment
    tree, dictionary delta rows) merges with a batch-built source;
    result is query-identical to one full build over the union."""
    from pyspark.sql import functions as F

    from ir_spark.streaming.incremental import update_segment_index

    path, _ = pages_small
    raw = spark.read.parquet(path)
    ids = assign_doc_ids(raw)
    n = ids.count()
    third = n // 3
    base = tmp_path_factory.mktemp("merge_stream")
    dirs = {k: str(base / k) for k in ("streamed", "batch", "full", "m")}

    u1 = ids.filter(F.col("doc_id") <= third).select("url")
    u2 = ids.filter((F.col("doc_id") > third)
                    & (F.col("doc_id") <= 2 * third)).select("url")
    u3 = ids.filter(F.col("doc_id") > 2 * third).select("url")
    update_segment_index(spark, raw.join(u1, "url"), dirs["streamed"],
                         batch_tag="b0")
    update_segment_index(spark, raw.join(u1.unionByName(u2), "url"),
                         dirs["streamed"], batch_tag="b1")
    build_segment_index(spark, raw.join(u3, "url"), dirs["batch"],
                        source="b", segment_groups=1)
    build_segment_index(spark, raw, dirs["full"], source="f",
                        segment_groups=1)
    merge_indexes(spark, [dirs["streamed"], dirs["batch"]], dirs["m"])

    for q in QUERIES:
        assert (_results_by_url(spark, dirs["m"], q, "bm25")
                == _results_by_url(spark, dirs["full"], q, "bm25"))


def test_merge_tolerates_empty_source(spark, tmp_path):
    """A source index with zero documents (e.g. every doc deleted and
    compacted away) is skipped — previously the offset pass crashed on
    int(None) / UNABLE_TO_INFER_SCHEMA reading its empty tables."""
    import os

    import pytest

    from ir_spark.fixtures import generate_pages
    from ir_spark.operators.merge import merge_indexes
    from ir_spark.operators.segments import build_segment_index
    from ir_spark.sources import storage

    full = str(tmp_path / "full")
    empty = str(tmp_path / "empty")
    outd = str(tmp_path / "merged")
    pages = spark.createDataFrame(
        [(p.url, p.text) for p in generate_pages(30, seed=3)],
        "url string, text string")
    build_segment_index(spark, pages, full, source="t")
    # a completed-but-empty index: stats manifest with n_docs=0 and
    # matching layout lineage, no table files
    base_lineage = storage.read_manifests(full)["stats"]["lineage"]
    os.makedirs(empty)
    storage.commit_stage(empty, "stats", dict(base_lineage),
                         {"n_docs": 0, "avg_doc_len": 0.0})
    m = merge_indexes(spark, [full, empty], outd)
    assert m["n_docs"] == 30
    with pytest.raises(ValueError, match="every source index is empty"):
        merge_indexes(spark, [empty, empty], str(tmp_path / "m2"))
