"""End-to-end web pipeline: the full path a Common-Crawl user runs.

WARC files -> read_warc -> robots gating -> URL-canonical dedup ->
HTML text extraction -> corpus curation (exact + near dedup + quality)
-> resumable segment-index build -> BM25 top-k.  Asserts the pipeline
output is IDENTICAL to indexing the clean pages directly — every stage
removed exactly what it should and nothing else.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from ir_spark.fixtures import REFERENCE_QUERIES, generate_pages
from ir_spark.functions.tokenize import extract_text_udf
from ir_spark.operators.crawl import apply_robots, parse_robots
from ir_spark.operators.dedup import curate
from ir_spark.operators.segments import build_segment_index
from ir_spark.operators.segment_query import SegmentIndex, search_segments
from ir_spark.operators.urlnorm import canonicalize_url
from ir_spark.sources.warc import synth_warc


def _iso(ts: dt.datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def test_warc_to_search_end_to_end(spark, tmp_path):
    pages = generate_pages(120, seed=23)

    records = [(p.url, _iso(p.warc_ts), p.html) for p in pages]
    # recrawl of page 0 (same canonical url, later ts) — canonical
    # dedup must keep only the FIRST capture
    records.append((pages[0].url + "#frag",
                    _iso(pages[0].warc_ts + dt.timedelta(days=1)),
                    pages[0].html))
    # a robots-blocked host — must never reach the index
    records.append(("https://blocked.example/page/x",
                    _iso(pages[0].warc_ts),
                    b"<html><title>secret</title>\n<body>\n<p>secret "
                    b"content</p>\n</body></html>"))
    warc_dir = str(tmp_path / "warcs")
    os.makedirs(warc_dir)
    half = len(records) // 2
    with open(os.path.join(warc_dir, "a.warc"), "wb") as f:
        f.write(synth_warc(records[:half]))
    with open(os.path.join(warc_dir, "b.warc.gz"), "wb") as f:
        f.write(synth_warc(records[half:], gzip_file=True))

    # 1. container read
    from ir_spark.sources.warc import read_warc

    captures = read_warc(spark, warc_dir)
    assert captures.count() == len(records)

    # 2. robots gating
    robots = spark.createDataFrame(
        [("blocked.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string")
    gated = apply_robots(captures, parse_robots(robots))
    allowed = gated.where(F.col("allowed") == 1).drop(
        "allowed", "matched_path")
    assert gated.where(F.col("allowed") == 0).count() == 1

    # 3. canonical-url dedup: first capture per canonical url
    w = Window.partitionBy("canon").orderBy("warc_ts", "url")
    first = (allowed.withColumn("canon", canonicalize_url("url"))
             .withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1).drop("_rn", "canon"))
    assert first.count() == len(pages)

    # 4. extraction (byte-identical per-url invariant) + doc ids
    docs = first.select(
        F.row_number().over(
            Window.orderBy("url")).cast("long").alias("doc_id"),
        extract_text_udf(F.col("html")).alias("text"),
        "url")

    # 5. curation: exact dedup + LSH near-dup + quality floor
    caches: list = []
    kept = curate(docs.select("doc_id", "text"), caches=caches)
    kept_docs = docs.join(kept.select("doc_id"), "doc_id")

    # 6. index build (page-shaped input: the builder assigns its own
    # url-ranked doc ids) + 7. search
    idx_dir = str(tmp_path / "idx")
    build_segment_index(spark, kept_docs.select("url", "text"), idx_dir)
    idx = SegmentIndex.load(spark, idx_dir)
    got = [(r.doc_id, round(r.score, 9)) for r in search_segments(
        spark, idx, REFERENCE_QUERIES[0], k=10, mode="bm25").collect()]
    for c in caches:
        c.unpersist()

    # reference path: index the SAME kept docs built directly from the
    # in-memory pages (no WARC, no gating) — results must be identical
    clean = spark.createDataFrame(
        [(p.url, p.text) for p in pages], "url string, text string")
    clean_docs = clean.select(
        F.row_number().over(Window.orderBy("url")).cast("long")
        .alias("doc_id"), "text", "url")
    caches2: list = []
    kept2 = curate(clean_docs.select("doc_id", "text"), caches=caches2)
    idx2_dir = str(tmp_path / "idx2")
    build_segment_index(
        spark,
        clean_docs.join(kept2.select("doc_id"), "doc_id")
        .select("url", "text"),
        idx2_dir)
    idx2 = SegmentIndex.load(spark, idx2_dir)
    want = [(r.doc_id, round(r.score, 9)) for r in search_segments(
        spark, idx2, REFERENCE_QUERIES[0], k=10, mode="bm25").collect()]
    for c in caches2:
        c.unpersist()

    assert got == want and len(got) > 0
    # the blocked host's vocabulary must not be searchable
    blocked_hits = search_segments(spark, idx, "secret content", k=5,
                                   mode="bm25").collect()
    assert blocked_hits == []
