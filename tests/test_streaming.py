"""Structured Streaming surface (ir_spark/streaming/):

- incremental index maintenance: streamed batches == batch build,
  value-identical BM25 results (modulo the doc-id permutation, compared
  via urls);
- stream_index end-to-end through readStream/foreachBatch/availableNow
  with checkpoint + batch-replay idempotency;
- windowed aggregation through a real stream with watermark == batch
  result (late-data semantics aside, availableNow replays everything).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from ir_spark.fixtures import generate_pages, pages_to_parquet
from ir_spark.operators.segment_query import SegmentIndex, search_segments
from ir_spark.operators.segments import build_segment_index
from ir_spark.streaming.incremental import (
    refresh_norms,
    stream_index,
    update_segment_index,
)
from ir_spark.streaming.windows import sessionize, tumbling_counts

N_DOCS = 400
QUERIES = [
    "flow pressure boundary layer",
    "supersonic wing heat transfer",
    "experimental shock wave theory",
]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_corpus")
    pages = generate_pages(N_DOCS, seed=7)
    full = str(root / "full.parquet")
    pages_to_parquet(pages, full)
    part_dir = root / "parts"
    part_dir.mkdir()
    cut = N_DOCS // 3
    pages_to_parquet(pages[:cut], str(part_dir / "part0.parquet"))
    pages_to_parquet(pages[cut:], str(part_dir / "part1.parquet"))
    return {"full": full, "parts": str(part_dir)}


def _topk_by_url(spark, index_dir, k=10):
    sidx = SegmentIndex.load(spark, index_dir)
    doc_map = spark.read.parquet(os.path.join(index_dir, "doc_map"))
    out = {}
    for q in QUERIES:
        hits = search_segments(spark, sidx, q, k=k, mode="bm25",
                               strategy="exhaustive")
        rows = hits.join(doc_map, "doc_id").select("url", "score").collect()
        out[q] = sorted((r["url"], round(r["score"], 8)) for r in rows)
    return out


def test_incremental_equals_batch(spark, corpus, tmp_path):
    batch_dir = str(tmp_path / "batch_idx")
    stream_dir = str(tmp_path / "incr_idx")
    pages = spark.read.parquet(corpus["full"])
    build_segment_index(spark, pages, batch_dir, source="full")

    p0 = spark.read.parquet(os.path.join(corpus["parts"], "part0.parquet"))
    p1 = spark.read.parquet(os.path.join(corpus["parts"], "part1.parquet"))
    m0 = update_segment_index(spark, p0, stream_dir, batch_tag="b0")
    m1 = update_segment_index(spark, p1, stream_dir, batch_tag="b1")
    assert m0["n_new_docs"] + m1["n_new_docs"] == N_DOCS
    assert m1["n_docs"] == N_DOCS

    assert _topk_by_url(spark, stream_dir) == _topk_by_url(spark, batch_dir)

    # re-sending an already-indexed batch is a no-op (url anti-join)
    m2 = update_segment_index(spark, p0, stream_dir, batch_tag="b0-again")
    assert m2["n_new_docs"] == 0


def test_incremental_cosine_after_refresh(spark, corpus, tmp_path):
    batch_dir = str(tmp_path / "batch_idx")
    stream_dir = str(tmp_path / "incr_idx")
    pages = spark.read.parquet(corpus["full"])
    build_segment_index(spark, pages, batch_dir, source="full")
    p0 = spark.read.parquet(os.path.join(corpus["parts"], "part0.parquet"))
    p1 = spark.read.parquet(os.path.join(corpus["parts"], "part1.parquet"))
    update_segment_index(spark, p0, stream_dir, batch_tag="b0")
    update_segment_index(spark, p1, stream_dir, batch_tag="b1")
    refresh_norms(spark, stream_dir)

    sidx_s = SegmentIndex.load(spark, stream_dir)
    sidx_b = SegmentIndex.load(spark, batch_dir)
    dm_s = spark.read.parquet(os.path.join(stream_dir, "doc_map"))
    dm_b = spark.read.parquet(os.path.join(batch_dir, "doc_map"))
    for q in QUERIES[:1]:
        def by_url(sidx, dm):
            hits = search_segments(spark, sidx, q, k=10, mode="w2",
                                   strategy="exhaustive")
            return sorted((r["url"], round(r["score"], 8))
                          for r in hits.join(dm, "doc_id").collect())
        assert by_url(sidx_s, dm_s) == by_url(sidx_b, dm_b)


def test_refresh_norms_segment_only(spark, corpus, tmp_path):
    """A streamed index that lost its flat postings checkpoint can still
    recompute cosine norms: refresh_norms decodes the flat relation back
    out of the compressed segments (VERDICT r01 missing item 4)."""
    import shutil

    batch_dir = str(tmp_path / "batch_idx")
    stream_dir = str(tmp_path / "incr_idx")
    pages = spark.read.parquet(corpus["full"])
    build_segment_index(spark, pages, batch_dir, source="full")
    p0 = spark.read.parquet(os.path.join(corpus["parts"], "part0.parquet"))
    p1 = spark.read.parquet(os.path.join(corpus["parts"], "part1.parquet"))
    update_segment_index(spark, p0, stream_dir, batch_tag="b0")
    update_segment_index(spark, p1, stream_dir, batch_tag="b1")
    shutil.rmtree(os.path.join(stream_dir, "postings"))
    refresh_norms(spark, stream_dir)

    sidx_s = SegmentIndex.load(spark, stream_dir)
    sidx_b = SegmentIndex.load(spark, batch_dir)
    dm_s = spark.read.parquet(os.path.join(stream_dir, "doc_map"))
    dm_b = spark.read.parquet(os.path.join(batch_dir, "doc_map"))
    for q in QUERIES[:2]:
        for mode in ("w1", "w2"):
            def by_url(sidx, dm):
                hits = search_segments(spark, sidx, q, k=10, mode=mode,
                                       strategy="exhaustive")
                return sorted((r["url"], round(r["score"], 8))
                              for r in hits.join(dm, "doc_id").collect())
            assert by_url(sidx_s, dm_s) == by_url(sidx_b, dm_b), (q, mode)


def test_within_batch_url_dedup(spark, corpus, tmp_path):
    """Duplicate urls INSIDE one batch must not double-count tf /
    doc_len / df (ADVICE r01): the batch is deduped to one deterministic
    row per url before id assignment."""
    from pyspark.sql import functions as F

    clean_dir = str(tmp_path / "clean_idx")
    dup_dir = str(tmp_path / "dup_idx")
    p0 = spark.read.parquet(os.path.join(corpus["parts"], "part0.parquet"))
    doubled = p0.unionAll(p0)  # every url twice in the same batch

    m_clean = update_segment_index(spark, p0, clean_dir, batch_tag="b0")
    m_dup = update_segment_index(spark, doubled, dup_dir, batch_tag="b0")
    assert m_dup["n_new_docs"] == m_clean["n_new_docs"]
    assert m_dup["n_docs"] == m_clean["n_docs"]
    # identical postings stats: same doc_len sum and dictionary deltas
    di_clean = spark.read.parquet(os.path.join(clean_dir, "docinfo"))
    di_dup = spark.read.parquet(os.path.join(dup_dir, "docinfo"))
    assert (di_clean.agg(F.sum("doc_len")).collect()[0][0]
            == di_dup.agg(F.sum("doc_len")).collect()[0][0])
    assert _topk_by_url(spark, dup_dir) == _topk_by_url(spark, clean_dir)


def test_compaction_preserves_results(spark, corpus, tmp_path):
    """compact_segments rewrites N streamed groups into one: fewer
    files, one row per (term, run), identical query results, and the
    next append still works."""
    from pyspark.sql import functions as F

    from ir_spark.operators.segments import compact_segments

    stream_dir = str(tmp_path / "compact_idx")
    pages = spark.read.parquet(corpus["full"])
    thirds = [
        pages.filter(F.crc32(F.col("url")) % 3 == i) for i in range(3)
    ]
    for i, part in enumerate(thirds[:2]):
        update_segment_index(spark, part, stream_dir, batch_tag=f"b{i}")

    before = _topk_by_url(spark, stream_dir)
    m = compact_segments(spark, stream_dir)
    assert m["files_after"] < m["files_before"]
    assert m["rows_after"] <= m["rows_before"]
    # one consolidated group, one dictionary row per term
    import os as _os

    grps = [d for d in _os.listdir(_os.path.join(stream_dir, "segments"))
            if d.startswith("grp=")]
    assert grps == ["grp=0"]
    dic = spark.read.parquet(_os.path.join(stream_dir, "dictionary"))
    assert dic.groupBy("term").count().filter("count > 1").count() == 0
    assert _topk_by_url(spark, stream_dir) == before

    # appends keep working post-compaction (lands in grp=1)
    update_segment_index(spark, thirds[2], stream_dir, batch_tag="b2")
    grps = sorted(
        d for d in _os.listdir(_os.path.join(stream_dir, "segments"))
        if d.startswith("grp="))
    assert grps == ["grp=0", "grp=1"]
    full_dir = str(tmp_path / "full_idx")
    build_segment_index(spark, pages, full_dir, source="full")
    assert _topk_by_url(spark, stream_dir) == _topk_by_url(spark, full_dir)


def test_compaction_retiers_range_width(spark, corpus, tmp_path):
    """compact_segments(range_width=W) re-encodes with wider runs —
    fewer (term, run) rows, the new width published through the stats
    lineage, identical query results (r5: the run-geometry knob for a
    corpus that outgrew its build-time width)."""
    from ir_spark.operators.segments import compact_segments

    d = str(tmp_path / "retier_idx")
    pages = spark.read.parquet(corpus["full"])
    # deliberately narrow runs at build time so the corpus spans many
    # (term, run) rows — the "outgrown" state retiering exists for
    build_segment_index(spark, pages, d, source="full", range_width=8)
    before = _topk_by_url(spark, d)
    assert SegmentIndex.load(spark, d).range_width == 8
    import pytest

    for bad in (0, -64):  # must fail BEFORE touching the only copy
        with pytest.raises(ValueError):
            compact_segments(spark, d, range_width=bad)
    m = compact_segments(spark, d, range_width=64)
    assert m["rows_after"] < m["rows_before"]
    sidx = SegmentIndex.load(spark, d)
    assert sidx.range_width == 64
    assert _topk_by_url(spark, d) == before


def test_stream_index_readstream(spark, corpus, tmp_path):
    """True Structured Streaming path: two files, availableNow, then a
    replay with the same checkpoint is a no-op."""
    index_dir = str(tmp_path / "sidx")
    stream_index(spark, corpus["parts"], index_dir)
    sidx = SegmentIndex.load(spark, index_dir)
    assert sidx.n_docs == N_DOCS

    batch_dir = str(tmp_path / "bidx")
    build_segment_index(spark, spark.read.parquet(corpus["full"]), batch_dir,
                        source="full")
    assert _topk_by_url(spark, index_dir) == _topk_by_url(spark, batch_dir)

    # replay: same source + checkpoint -> no new batches, index unchanged
    n_before = spark.read.parquet(os.path.join(index_dir, "docinfo")).count()
    stream_index(spark, corpus["parts"], index_dir)
    assert spark.read.parquet(os.path.join(index_dir, "docinfo")).count() == n_before


def test_tumbling_window_stream_equals_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_micro"])
        for r in tumbling_counts(events).collect()
    }

    src = str(tmp_path / "events_src")
    os.makedirs(src)
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                os.path.join(src, "e.parquet"))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string")
        .parquet(src)
    )
    out = tumbling_counts(stream, streaming=True)
    q = (out.writeStream.format("memory").queryName("tumbling")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_micro"])
        for r in spark.sql("select * from tumbling").collect()
    }
    assert streamed == batch


def test_stateful_sessionize_stream_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: streaming closed-session
    output == batch lag/cumsum sessionize, row for row.  Events arrive
    over 3 time-ordered micro-batches; a final per-user sentinel event
    (beyond the gap) closes every open session through the normal gap
    path."""
    from ir_spark.streaming.stateful import sessionize_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    batch = {
        (r["user_id"], r["session_id"]):
            (r["start_us"], r["end_us"], r["n_events"])
        for r in sessionize(events, gap_minutes=30).select(
            "user_id", "session_id",
            F.unix_micros("session_start").alias("start_us"),
            F.unix_micros("session_end").alias("end_us"),
            "n_events").collect()
    }

    pdf = events.select("user_id", "ts", "event_id").toPandas() \
        .sort_values(["ts", "event_id"]).reset_index(drop=True)
    import pandas as pd

    # parquet written as timestamp[us] (Spark's stream schema can't
    # read pandas' default nanosecond INT64)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    cuts = [0, len(pdf) // 3, 2 * len(pdf) // 3, len(pdf)]
    for i in range(3):
        pdf.iloc[cuts[i]: cuts[i + 1]].to_parquet(
            os.path.join(src, f"part{i}.parquet"), index=False)
    sentinel_ts = pdf["ts"].max() + pd.Timedelta(minutes=31)
    sent = pd.DataFrame({
        "user_id": sorted(pdf["user_id"].unique()),
        "ts": sentinel_ts,
        "event_id": -1,
    })
    sent["ts"] = sent["ts"].astype("datetime64[us]")
    sent.to_parquet(os.path.join(src, "part3_sentinel.parquet"), index=False)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (sessionize_stream(stream, gap_minutes=30)
         .writeStream.format("memory").queryName("sessions")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["session_id"]):
            (r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
    }
    assert streamed == batch


def test_stateful_sessionize_timeout_emission(spark, tmp_path):
    """A session with no further events is emitted when the event-time
    watermark passes its last event + gap (GroupState timeout) — the
    case the batch formulation cannot express incrementally."""
    import pandas as pd

    from ir_spark.streaming.stateful import sessionize_stream

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    src = str(tmp_path / "to_src")
    os.makedirs(src)
    def _wr(df, name):
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(os.path.join(src, name), index=False)

    _wr(pd.DataFrame({"user_id": [1, 1],
                      "ts": [t0, t0 + pd.Timedelta(minutes=5)],
                      "event_id": [1, 2]}), "a.parquet")
    # a different user 3 hours later drives the watermark past
    # user 1's (last event + gap) without touching user 1's state
    _wr(pd.DataFrame({"user_id": [2], "ts": [t0 + pd.Timedelta(hours=3)],
                      "event_id": [3]}), "b.parquet")
    # one more batch so the advanced watermark actually fires timeouts
    _wr(pd.DataFrame({"user_id": [2],
                      "ts": [t0 + pd.Timedelta(hours=3, minutes=1)],
                      "event_id": [4]}), "c.parquet")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (sessionize_stream(stream, gap_minutes=30)
         .writeStream.format("memory").queryName("sessions_to")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "to_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {(r["user_id"], r["session_id"]):
            (r["session_start_us"], r["session_end_us"], r["n_events"])
            for r in spark.sql("select * from sessions_to").collect()}
    us = lambda t: int(t.value // 1000)  # noqa: E731
    assert rows[(1, 1)] == (us(t0), us(t0 + pd.Timedelta(minutes=5)), 2)


def _stream_gate_names():
    from ir_spark import gates_streaming

    return sorted(gates_streaming.streaming_queries())


@pytest.mark.parametrize("name", _stream_gate_names())
def test_stream_gate_matches_oracle(spark, name):
    """Driver-mirror parity for the streaming gates (sf0.001)."""
    import math

    import duckdb

    from ir_spark import gates_streaming

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ["documents", "events"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    def norm(rows):
        out = []
        for r in rows:
            row = []
            for v in r:
                if isinstance(v, float):
                    assert float(v).is_integer() or math.isnan(v)
                    v = int(v)
                row.append(v)
            out.append(tuple(row))
        return sorted(out)

    sdf = gates_streaming.streaming_queries()[name](spark, sf_dir)
    sql = gates_streaming.streaming_oracle_sql()[name]
    spark_rows = norm([tuple(r) for r in sdf.collect()])
    duck_rows = norm(con.sql(sql).fetchall())
    assert len(spark_rows) > 0
    assert spark_rows == duck_rows


def test_sessionize_invariants(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    sess = sessionize(events, gap_minutes=30)
    agg = sess.agg(
        F.sum("n_events").alias("total"),
        F.min("session_id").alias("min_sid"),
    ).collect()[0]
    assert agg["total"] == events.count()
    assert agg["min_sid"] == 1
    # no session may contain an internal gap > 30 min: every session's
    # span divided by (n_events-1) avg gap is bounded by max single gap;
    # check directly that consecutive sessions of a user don't overlap
    w = sess.selectExpr("user_id", "session_id", "session_start", "session_end")
    joined = w.alias("x").join(
        w.alias("y"),
        (F.col("x.user_id") == F.col("y.user_id"))
        & (F.col("x.session_id") + 1 == F.col("y.session_id")),
    )
    bad = joined.filter(
        F.col("y.session_start").cast("long")
        - F.col("x.session_end").cast("long") <= 30 * 60).count()
    assert bad == 0


def test_stream_dedup_across_batches(spark, tmp_path):
    """First-seen url dedup with duplicates arriving in a LATER
    micro-batch: maxFilesPerTrigger=1 forces one file per batch, so
    the recrawl of urls a/b lands after their state row exists and
    must be dropped by state, not by within-batch sorting."""
    from ir_spark.streaming.stateful import dedup_stream

    src = tmp_path / "pages"
    src.mkdir()
    spark.createDataFrame(
        [("u://a", "2024-01-01 00:00:00"), ("u://b", "2024-01-01 00:00:01"),
         ("u://b", "2024-01-01 00:00:03")],  # within-batch dup too
        "url string, warc_ts string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp")) \
        .coalesce(1).write.mode("append").parquet(str(src / "b0"))
    spark.createDataFrame(
        [("u://a", "2024-01-02 00:00:00"), ("u://c", "2024-01-02 00:00:05")],
        "url string, warc_ts string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp")) \
        .coalesce(1).write.mode("append").parquet(str(src / "b1"))

    stream = (spark.readStream.schema("url string, warc_ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    q = (dedup_stream(stream).writeStream.format("memory")
         .queryName("dedup_xbatch")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.url, r.warc_ts_us)
           for r in spark.table("dedup_xbatch").collect()}
    day0 = 1_704_067_200 * 1_000_000
    assert got == {
        ("u://a", day0),
        ("u://b", day0 + 1_000_000),
        ("u://c", day0 + 86_400_000_000 + 5_000_000),
    }


def test_stream_dedup_ttl_purges_state_rocksdb(spark, tmp_path):
    """Bounded-state path: RocksDB state store provider + event-time
    TTL.  A url unseen past watermark + TTL has its state row PURGED,
    so a later recrawl re-emits — proving expiry actually dropped the
    row (an intact state row would have suppressed it).  Batches are
    one file each (maxFilesPerTrigger=1):

      b0: a@00:00, b@00:10          -> emit both; TTL clock 01:00ish
      b1: c@03:00                   -> emit; watermark advances to 3h
      b2: d@05:00                   -> emit; a/b state times out here
      b3: a@06:00 (post-TTL recrawl)-> RE-emitted (state was purged)
    """
    from ir_spark.streaming.stateful import dedup_stream

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        src = tmp_path / "pages"
        src.mkdir()
        batches = [
            [("u://a", "2024-01-01 00:00:00"), ("u://b", "2024-01-01 00:10:00")],
            [("u://c", "2024-01-01 03:00:00")],
            [("u://d", "2024-01-01 05:00:00")],
            [("u://a", "2024-01-01 06:00:00")],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, "url string, warc_ts string") \
                .withColumn("warc_ts", F.col("warc_ts").cast("timestamp")) \
                .coalesce(1).write.mode("append").parquet(str(src / f"b{i}"))
        stream = (spark.readStream.schema("url string, warc_ts timestamp")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src) + "/*"))
        q = (dedup_stream(stream, ttl_minutes=60).writeStream
             .format("memory").queryName("dedup_ttl")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        base = 1_704_067_200 * 1_000_000  # 2024-01-01 00:00:00 UTC
        got = sorted((r.url, r.warc_ts_us)
                     for r in spark.table("dedup_ttl").collect())
        assert got == sorted([
            ("u://a", base),
            ("u://b", base + 600 * 1_000_000),
            ("u://c", base + 3 * 3600 * 1_000_000),
            ("u://d", base + 5 * 3600 * 1_000_000),
            ("u://a", base + 6 * 3600 * 1_000_000),  # post-TTL re-emit
        ])
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)


def test_trending_terms_hand_case(spark):
    """Top-k per tumbling hour with deterministic lexicographic
    tie-break; stopwords excluded."""
    from ir_spark.streaming.windows import trending_terms

    rows = [
        # hour 0: zz x3, aa x2, bb x2 (tie -> aa before bb)
        (0, "2024-01-01 00:05:00", "zz zz zz aa aa bb bb the the"),
        # hour 1: only cc
        (1, "2024-01-01 01:10:00", "cc cc the of"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, ts_s string, text string").select(
        "doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "text")
    got = [(r.window_start.hour, r.term, r.n, r.rank)
           for r in trending_terms(docs, width="1 hour", k=2)
           .orderBy("window_start", "rank").collect()]
    # 'the'/'of' are stopwords -> hour 1 has a single trending term
    assert got == [
        (0, "zz", 3, 1), (0, "aa", 2, 2),
        (1, "cc", 2, 1),
    ]


def test_trending_counts_streaming_matches_batch(spark, tmp_path):
    """The trending COUNT stage runs under Structured Streaming
    (watermark + append mode: a window's counts emit exactly once, on
    close) and ranking its closed windows reproduces the batch
    trending_terms output row-for-row."""
    from ir_spark.streaming.windows import (
        rank_trending, trending_counts, trending_terms)

    src = tmp_path / "docs"
    src.mkdir()
    batches = [
        [(0, "2024-01-01 00:05:00", "zz zz aa bb"),
         (1, "2024-01-01 00:40:00", "zz cc cc")],
        [(2, "2024-01-01 01:10:00", "dd dd ee")],
        # sentinel batch: advances the watermark past hours 0-1 so
        # their windows close and emit; its own hour-5 window stays
        # open and is excluded from the comparison
        [(3, "2024-01-01 05:00:00", "sentinel sentinel")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, ts_s string, text string") \
            .select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"),
                    "text") \
            .coalesce(1).write.mode("append").parquet(str(src / f"b{i}"))

    stream = (spark.readStream
              .schema("doc_id long, ts timestamp, text string")
              .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    q = (trending_counts(stream, width="1 hour", watermark="0 seconds")
         .writeStream.format("memory").queryName("trend_counts")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    closed = spark.table("trend_counts").filter(
        F.col("window_start") < "2024-01-01 05:00:00")
    got = sorted((r.window_start.hour, r.term, r.n, r.rank)
                 for r in rank_trending(closed, k=2).collect())

    batch_docs = (spark.read.parquet(str(src) + "/*")
                  .filter(F.col("ts") < "2024-01-01 05:00:00"))
    want = sorted((r.window_start.hour, r.term, r.n, r.rank)
                  for r in trending_terms(batch_docs, width="1 hour",
                                          k=2).collect())
    assert got == want and len(got) > 0


def test_asof_snapshot_equals_fresh_index_at_that_moment(spark, corpus,
                                                         tmp_path):
    """Time travel: load(as_of_grp=0) over the two-batch index must be
    value-identical (scores included — i.e. historical df/N/avgDocLen)
    to a FRESH index built over only batch 0's pages; the current view
    stays the full corpus; bad snapshots and cosine modes fail loudly."""
    import pytest as _pytest

    stream_dir = str(tmp_path / "incr_idx")
    b0_dir = str(tmp_path / "b0_idx")
    p0 = spark.read.parquet(os.path.join(corpus["parts"], "part0.parquet"))
    p1 = spark.read.parquet(os.path.join(corpus["parts"], "part1.parquet"))
    update_segment_index(spark, p0, stream_dir, batch_tag="b0")
    update_segment_index(spark, p1, stream_dir, batch_tag="b1")
    update_segment_index(spark, p0, b0_dir, batch_tag="only")

    asof = SegmentIndex.load(spark, stream_dir, as_of_grp=0)
    fresh = SegmentIndex.load(spark, b0_dir)
    assert (asof.n_docs, round(asof.avg_doc_len, 9)) == \
        (fresh.n_docs, round(fresh.avg_doc_len, 9))
    map_a = spark.read.parquet(os.path.join(stream_dir, "doc_map"))
    map_f = spark.read.parquet(os.path.join(b0_dir, "doc_map"))
    for q in QUERIES:
        for strat in ("exhaustive", "wand", "maxscore"):
            got = sorted(
                (r["url"], round(r["score"], 8))
                for r in search_segments(spark, asof, q, k=10, mode="bm25",
                                         strategy=strat)
                .join(map_a, "doc_id").select("url", "score").collect())
            want = sorted(
                (r["url"], round(r["score"], 8))
                for r in search_segments(spark, fresh, q, k=10, mode="bm25",
                                         strategy="exhaustive")
                .join(map_f, "doc_id").select("url", "score").collect())
            assert got == want, (q, strat)
    # qld as-of uses snapshot-scoped cf/cf_total
    got = sorted(
        (r["url"], round(r["score"], 8))
        for r in search_segments(spark, asof, QUERIES[0], k=10, mode="qld")
        .join(map_a, "doc_id").select("url", "score").collect())
    want = sorted(
        (r["url"], round(r["score"], 8))
        for r in search_segments(spark, fresh, QUERIES[0], k=10, mode="qld")
        .join(map_f, "doc_id").select("url", "score").collect())
    assert got == want
    # the CURRENT view still sees both batches
    assert SegmentIndex.load(spark, stream_dir).n_docs == N_DOCS
    with _pytest.raises(ValueError, match="no snapshot"):
        SegmentIndex.load(spark, stream_dir, as_of_grp=99)
    with _pytest.raises(ValueError, match="cosine"):
        search_segments(spark, asof, QUERIES[0], k=5, mode="w1")


def test_asof_filter_is_partition_pruned(spark, corpus, tmp_path):
    """The as-of predicate must reach the scan as a PARTITION filter
    (grp <= G) composed with bucket pruning + term pushdown — no file
    of a later batch is opened (PLANS.md §24)."""
    import io
    from contextlib import redirect_stdout

    stream_dir = str(tmp_path / "incr_idx")
    p0 = spark.read.parquet(os.path.join(corpus["parts"], "part0.parquet"))
    p1 = spark.read.parquet(os.path.join(corpus["parts"], "part1.parquet"))
    update_segment_index(spark, p0, stream_dir, batch_tag="b0")
    update_segment_index(spark, p1, stream_dir, batch_tag="b1")
    sidx = SegmentIndex.load(spark, stream_dir, as_of_grp=0)
    df = search_segments(spark, sidx, QUERIES[0], k=5, mode="bm25",
                         strategy="exhaustive")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("grp" in ln and "<= 0" in ln and "bucket" in ln
               for ln in part_lines), part_lines
    assert "In(term" in plan


def test_interval_join_stream_batch_parity(spark, tmp_path):
    """Stream-stream interval join (windows.py::interval_join): the
    SAME function over two readStream file sources produces exactly
    the batch join's pairs — Structured Streaming's inner
    time-interval join contract."""
    from ir_spark.streaming.windows import interval_join

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"))
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("c_ts"))
    batch = {(r.purchase_id, r.click_id)
             for r in interval_join(p, c, key="user_id", left_ts="p_ts",
                                    right_ts="c_ts", lookback_sec=1800)
             .select("purchase_id", "click_id").collect()}
    assert batch, "fixture should produce at least one pair"

    pdir, cdir = str(tmp_path / "p"), str(tmp_path / "c")
    p.write.parquet(pdir)
    c.write.parquet(cdir)
    ps = spark.readStream.schema(
        "purchase_id long, user_id long, p_ts timestamp").parquet(pdir)
    cs = spark.readStream.schema(
        "click_id long, user_id long, c_ts timestamp").parquet(cdir)
    joined = interval_join(ps, cs, key="user_id", left_ts="p_ts",
                           right_ts="c_ts", lookback_sec=1800)
    assert joined.isStreaming
    q = (joined.select("purchase_id", "click_id")
         .writeStream.format("memory").queryName("ivj")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ivj_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    streamed = {(r.purchase_id, r.click_id)
                for r in spark.sql("select * from ivj").collect()}
    assert streamed == batch


def test_upsert_replaces_by_url(spark, corpus, tmp_path):
    """Recrawl upsert: the new version of a url is what retrieval
    sees, the superseded doc id is tombstoned (maxDoc stats until
    compaction), repeat upserts stay idempotent, and pre-upsert
    snapshots still serve the old text."""
    from ir_spark.streaming.incremental import upsert_documents

    idx_dir = str(tmp_path / "upsert_idx")
    pages = spark.read.parquet(corpus["full"])
    m = update_segment_index(spark, pages, idx_dir, batch_tag="base")
    assert m["n_new_docs"] == N_DOCS
    pre_grp = 0  # first committed batch group

    # recrawl 5 urls: the new text is the old text plus a marker term
    victims = (pages.orderBy("url").limit(5)
               .select("url", F.concat(F.col("text"),
                                       F.lit(" zzrecrawlmark zzrecrawlmark"))
                       .alias("text")))
    m1 = upsert_documents(spark, victims, idx_dir, batch_tag="recrawl")
    assert m1["n_replaced"] == 5 and m1["n_new_docs"] == 5
    # maxDoc semantics: docinfo keeps the superseded rows
    assert m1["n_docs"] == N_DOCS + 5

    sidx = SegmentIndex.load(spark, idx_dir)
    doc_map = spark.read.parquet(os.path.join(idx_dir, "doc_map"))
    hits = search_segments(spark, sidx, "zzrecrawlmark", k=50, mode="bm25",
                           strategy="exhaustive")
    got = {r["url"] for r in hits.join(doc_map, "doc_id").collect()}
    assert got == {r["url"] for r in victims.select("url").collect()}
    # each url resolves to exactly ONE live doc (old ids tombstoned)
    assert hits.count() == 5

    # a non-recrawled query term still ranks, and no url appears twice
    full = search_segments(spark, sidx, QUERIES[0], k=N_DOCS + 5,
                           mode="bm25", strategy="exhaustive")
    urls = [r["url"] for r in full.join(doc_map, "doc_id").collect()]
    assert len(urls) == len(set(urls))

    # second upsert of the same urls replaces the replacement
    m2 = upsert_documents(spark, victims, idx_dir, batch_tag="recrawl2")
    assert m2["n_replaced"] == 5 and m2["n_new_docs"] == 5
    sidx2 = SegmentIndex.load(spark, idx_dir)
    assert search_segments(spark, sidx2, "zzrecrawlmark", k=50,
                           mode="bm25").count() == 5

    # time travel: the pre-upsert snapshot has no marker postings
    old = SegmentIndex.load(spark, idx_dir, as_of_grp=pre_grp)
    assert search_segments(spark, old, "zzrecrawlmark", k=50,
                           mode="bm25").count() == 0


def test_upsert_on_fresh_index_is_plain_append(spark, corpus, tmp_path):
    from ir_spark.streaming.incremental import upsert_documents

    idx_dir = str(tmp_path / "upsert_fresh")
    pages = spark.read.parquet(corpus["full"]).limit(10)
    m = upsert_documents(spark, pages, idx_dir, batch_tag="b0")
    assert m["n_replaced"] == 0 and m["n_new_docs"] == 10


# --- tiered merge policy (operators/segments.py::maintain_segments) ----------


def test_select_tiered_merges_policy():
    from ir_spark.operators.segments import select_tiered_merges

    KB = 1024
    # under segs_per_tier members everywhere -> nothing to do
    assert select_tiered_merges(
        {0: 10 * KB, 1: 20 * KB, 2: 500 * KB}, segs_per_tier=4) == []
    # tier 0 overflows -> merge its smallest members, big group untouched
    sizes = {g: (g + 1) * KB for g in range(5)}
    sizes[9] = 100 * 1024 * KB
    got = select_tiered_merges(sizes, segs_per_tier=4, max_merge_at_once=8)
    assert got == [[0, 1, 2, 3, 4]]
    # max_merge_at_once caps a big overflow at the SMALLEST members
    sizes = {g: (g + 1) * KB for g in range(10)}
    got = select_tiered_merges(sizes, segs_per_tier=4, max_merge_at_once=4)
    assert got == [[0, 1, 2, 3]]
    # geometric tiers: 4 small + 5 big -> only the big tier overflows
    sizes = {g: 10 * KB for g in range(4)}
    sizes.update({10 + g: 4 * 1024 * KB for g in range(5)})
    got = select_tiered_merges(sizes, segs_per_tier=4, max_merge_at_once=8,
                               floor_bytes=64 * KB)
    assert got == [[10, 11, 12, 13, 14]]
    # deterministic under dict-order permutation
    import random

    sizes = {g: (97 * g) % 7 * KB + KB for g in range(9)}
    items = list(sizes.items())
    random.Random(3).shuffle(items)
    assert (select_tiered_merges(dict(items), segs_per_tier=4)
            == select_tiered_merges(sizes, segs_per_tier=4))
    with pytest.raises(ValueError):
        select_tiered_merges({0: 1, 1: 1}, segs_per_tier=1)


def test_tiered_merge_query_identical_and_snapshots(spark, corpus, tmp_path):
    from ir_spark.operators.segments import (maintain_segments,
                                             merge_segment_groups)

    stream_dir = str(tmp_path / "tiered_idx")
    pages = spark.read.parquet(corpus["full"]).orderBy("url")
    n = pages.count()
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    rows = pages.collect()
    for i in range(4):
        batch = spark.createDataFrame(rows[cuts[i]:cuts[i + 1]],
                                      pages.schema)
        update_segment_index(spark, batch, stream_dir, batch_tag=f"b{i}")
    seg_dir = os.path.join(stream_dir, "segments")
    grps = sorted(int(d.split("=")[1]) for d in os.listdir(seg_dir)
                  if d.startswith("grp="))
    assert grps == [0, 1, 2, 3]
    before = _topk_by_url(spark, stream_dir)
    as_of0_docs = SegmentIndex.load(spark, stream_dir, as_of_grp=0).n_docs

    # merge groups 1 and 2 -> new grp 4; 0 and 3 survive untouched
    m = merge_segment_groups(spark, stream_dir, [1, 2])
    assert m["new_grp"] == 4 and m["n_groups_after"] == 3
    assert sorted(int(d.split("=")[1]) for d in os.listdir(seg_dir)
                  if d.startswith("grp=")) == [0, 3, 4]
    # results value-identical; side tables untouched by construction
    assert _topk_by_url(spark, stream_dir) == before
    # snapshot BEFORE the merged range still loads; merged range retired
    assert SegmentIndex.load(spark, stream_dir,
                             as_of_grp=0).n_docs == as_of0_docs
    assert m["snapshots_retired"] == [1, 2, 3]
    for g in (1, 2, 3):
        with pytest.raises(ValueError, match="no snapshot"):
            SegmentIndex.load(spark, stream_dir, as_of_grp=g)

    # a maintenance pass with a high floor collapses the rest into one
    out = maintain_segments(spark, stream_dir, segs_per_tier=2,
                            max_merge_at_once=8,
                            floor_bytes=1 << 30)
    assert len(out) == 1 and out[0]["n_groups_after"] == 1
    assert _topk_by_url(spark, stream_dir) == before
    # appending after a merge keeps working (next grp above the merged)
    # (fresh URLs: extend the same deterministic page stream past N)
    extra = generate_pages(n + 30, seed=7)[n:]
    from ir_spark.fixtures import pages_to_parquet

    p = str(tmp_path / "extra.parquet")
    pages_to_parquet(extra, p)
    m2 = update_segment_index(spark, spark.read.parquet(p), stream_dir,
                              batch_tag="late")
    assert m2["n_new_docs"] > 0
    assert _topk_by_url(spark, stream_dir)  # still queryable


def test_tiered_merge_rejects_bad_groups(spark, corpus, tmp_path):
    from ir_spark.operators.segments import merge_segment_groups

    stream_dir = str(tmp_path / "tiny_idx")
    p0 = spark.read.parquet(os.path.join(corpus["parts"], "part0.parquet"))
    update_segment_index(spark, p0, stream_dir, batch_tag="b0")
    with pytest.raises(ValueError, match=">= 2 groups"):
        merge_segment_groups(spark, stream_dir, [0])
    with pytest.raises(ValueError, match="not found"):
        merge_segment_groups(spark, stream_dir, [0, 7])


def test_expire_snapshots_retention(spark, corpus, tmp_path):
    from ir_spark.streaming.incremental import expire_snapshots

    idx = str(tmp_path / "exp_idx")
    pages = spark.read.parquet(corpus["full"]).orderBy("url").limit(90)
    rows = pages.collect()
    for i in range(3):
        batch = spark.createDataFrame(rows[i * 30:(i + 1) * 30],
                                      pages.schema)
        update_segment_index(spark, batch, idx, batch_tag=f"b{i}")
    # all three snapshots load
    for g in (0, 1, 2):
        SegmentIndex.load(spark, idx, as_of_grp=g)
    rep = expire_snapshots(idx, keep_last=1)
    assert rep["expired"] == [0, 1] and rep["kept"] == [2]
    SegmentIndex.load(spark, idx, as_of_grp=2)  # survivor still loads
    for g in (0, 1):
        with pytest.raises(ValueError, match="no snapshot"):
            SegmentIndex.load(spark, idx, as_of_grp=g)
    # current (non-as-of) view unaffected: data files untouched
    assert _topk_by_url(spark, idx)
    # idempotent + keep-more-than-exist is a no-op
    assert expire_snapshots(idx, keep_last=5) == {"expired": [],
                                                  "kept": [2]}
    with pytest.raises(ValueError):
        expire_snapshots(idx, keep_last=-1)


def test_crashed_batch_repair_reindexes_urls(spark, corpus, tmp_path):
    """A crash right after the doc_map publish (intent written, no
    snapshot/done) must NOT strand the batch: the replay's repair pass
    removes the partial files so the first-seen anti-join passes and
    the docs get indexed.  Without repair, the urls sat in doc_map
    with no postings — permanently unsearchable."""
    from ir_spark.operators.build import assign_doc_ids
    from ir_spark.operators.segments import index_paths
    from ir_spark.sources import storage
    from ir_spark.streaming.incremental import (_next_grp,
                                                _publish_append)

    batch_dir = str(tmp_path / "batch_idx")
    stream_dir = str(tmp_path / "incr_idx")
    pages = spark.read.parquet(corpus["full"])
    build_segment_index(spark, pages, batch_dir, source="full")
    p0 = spark.read.parquet(os.path.join(corpus["parts"], "part0.parquet"))
    p1 = spark.read.parquet(os.path.join(corpus["parts"], "part1.parquet"))
    update_segment_index(spark, p0, stream_dir, batch_tag="b0")

    # simulate batch b1 dying right after its doc_map publish
    paths = index_paths(stream_dir)
    old_map = spark.read.parquet(paths["doc_map"])
    offset = old_map.agg(F.max("doc_id")).collect()[0][0]
    fresh = p1.select("url", "text").join(
        old_map.select("url"), "url", "left_anti")
    crashed_map = assign_doc_ids(fresh).withColumn(
        "doc_id", (F.col("doc_id") + F.lit(offset)).cast("long"))
    grp = _next_grp(paths["segments"])
    storage.commit_stage(stream_dir, "batch_intent", {"source": "test"},
                         {"offset": int(offset), "grp": int(grp)})
    _publish_append(crashed_map, paths["doc_map"], f"b{int(offset)}")

    # replay of the same batch must heal and fully index it
    m = update_segment_index(spark, p1, stream_dir, batch_tag="b1-replay")
    assert m["n_new_docs"] == p1.count()
    assert m["n_docs"] == N_DOCS
    assert _topk_by_url(spark, stream_dir) == _topk_by_url(spark, batch_dir)


def test_incremental_restores_stem_from_lineage(spark, corpus, tmp_path):
    """An increment on a stemmed base must tokenize stemmed even when
    the caller forgets stem=True — otherwise unstemmed terms land next
    to stemmed ones and df/cf split across variants."""
    a_dir = str(tmp_path / "stem_explicit")
    b_dir = str(tmp_path / "stem_lineage")
    p0 = spark.read.parquet(os.path.join(corpus["parts"], "part0.parquet"))
    p1 = spark.read.parquet(os.path.join(corpus["parts"], "part1.parquet"))
    for d in (a_dir, b_dir):
        update_segment_index(spark, p0, d, stem=True, batch_tag="base")
    update_segment_index(spark, p1, a_dir, stem=True, batch_tag="b1")
    update_segment_index(spark, p1, b_dir, batch_tag="b1")  # default stem
    da = {(r["term"], r["df"]) for r in spark.read.parquet(
        os.path.join(a_dir, "dictionary")).collect()}
    db = {(r["term"], r["df"]) for r in spark.read.parquet(
        os.path.join(b_dir, "dictionary")).collect()}
    assert da == db


def test_sessionize_stream_out_of_order_start(spark, tmp_path):
    """An in-watermark late event that predates the open session's
    start must move session_start back — batch/stream parity for
    out-of-order arrivals."""
    import pandas as pd

    from ir_spark.streaming.stateful import sessionize_stream

    rows = [
        (1, "2024-01-01 10:00:00", 1),
        (1, "2024-01-01 09:50:00", 2),   # late, within 30-min watermark
        (1, "2024-01-01 11:00:00", 3),   # sentinel: closes the session
    ]
    src = str(tmp_path / "ooo_src")
    os.makedirs(src)
    for i, (u, ts, eid) in enumerate(rows):
        pdf = pd.DataFrame({"user_id": [u],
                            "ts": pd.to_datetime([ts]),
                            "event_id": [eid]})
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(src, f"part{i}.parquet"), index=False)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (sessionize_stream(stream, gap_minutes=30)
         .writeStream.format("memory").queryName("ooo_sessions")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ooo_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["user_id"], r["session_id"]):
           (r["session_start_us"], r["session_end_us"], r["n_events"])
           for r in spark.sql("select * from ooo_sessions").collect()}
    import datetime as _dt

    def us(s):
        return int(_dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
                   .replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)

    # first closed session covers 09:50-10:00 with 2 events
    assert got[(1, 1)] == (us("2024-01-01 09:50:00"),
                           us("2024-01-01 10:00:00"), 2)
