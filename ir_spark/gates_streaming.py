"""Driver-contract gates: streaming-surface operators.

Two families:
- event-time analytics over the ``events`` table (tumbling windows,
  sessionization, JSON props).  The gate runs the SAME DataFrame
  function that the streaming tests drive through readStream; the
  DuckDB oracle reproduces the exact values in ANSI SQL.
- incremental index maintenance: build the segment index in two
  streamed batches over ``documents`` and answer the flagship BM25
  query — the oracle is the same SQL as the batch bm25 gate, proving
  streamed == batch results value-for-value.

Timestamps are emitted as epoch microseconds (BIGINT) so value hashes
are engine-independent.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .streaming import windows as W

WINDOW_SEC = 300
SESSION_GAP_MIN = 30


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the parquet carries naive timestamps (TIMESTAMP_NTZ in Spark 4);
    # cast to session-TZ (UTC) instants so window/watermark/unix_micros
    # apply — DuckDB's epoch() treats the same naive values as UTC
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = W.tumbling_counts(_events(spark, sf_dir), width="5 minutes")
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type", "n_events", "sum_value_micro",
    )


def sql_events_tumbling() -> str:
    return f"""
SELECT CAST(FLOOR(epoch(ts) / {WINDOW_SEC}) AS BIGINT) * {WINDOW_SEC} * 1000000
         AS window_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS BIGINT)
         AS sum_value_micro
FROM events
GROUP BY 1, 2
"""


SLIDE_SEC, SLIDE_WIDTH_SEC = 300, 900


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = W.sliding_counts(_events(spark, sf_dir),
                           width="15 minutes", slide="5 minutes")
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type", "n_events",
    )


def sql_events_sliding() -> str:
    # an event at t lands in windows starting at
    # floor((t - k*slide)/slide)*slide for k covering the width
    n_offsets = SLIDE_WIDTH_SEC // SLIDE_SEC
    return f"""
SELECT (CAST(FLOOR(epoch(ts) / {SLIDE_SEC}) AS BIGINT) - o.k) * {SLIDE_SEC}
         * 1000000 AS window_start_us,
       event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events CROSS JOIN (SELECT unnest(range(0, {n_offsets})) AS k) o
GROUP BY 1, 2
"""


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = W.sessionize(_events(spark, sf_dir), gap_minutes=SESSION_GAP_MIN)
    return out.select(
        "user_id", "session_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
    )


def sql_events_sessions() -> str:
    return f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_MIN * 60 * 1000000}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessioned GROUP BY user_id, session_id
"""


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.json_prop_stats(_events(spark, sf_dir))


def sql_events_json_props() -> str:
    return """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT))
            AS BIGINT) AS sum_k,
       MIN(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS min_k,
       MAX(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


TREND_K = 5
TREND_EPOCH0 = 1_704_067_200  # 2024-01-01 UTC


# stored alert queries over the corpus vocabulary (stable across SFs);
# q4's terms never occur -> proves the no-false-positive path
PERCOLATE_QUERIES: dict[int, tuple[str, ...]] = {
    0: ("hash", "join"),
    1: ("vector", "scan", "column"),
    2: ("merge", "sort"),
    3: ("group", "filter", "order", "window"),
    4: ("quantum", "flux"),
}


def q_percolate_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse search (operators/percolate.py): match every document
    against the stored alert queries, AND semantics — the saved-search
    primitive a streaming ingest runs per micro-batch (the plan is
    pure joins + keyed aggs, so it is batch/stream identical; the
    broadcast query registry never shuffles the docs)."""
    from .operators import build as B
    from .operators.percolate import percolate

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", "text")
    toks = B.token_counts(docs).select("doc_id", "term")
    qdf = spark.createDataFrame(
        [(qid, t) for qid, terms in PERCOLATE_QUERIES.items()
         for t in terms],
        "query_id long, term string")
    return percolate(toks, qdf)


def sql_percolate_match() -> str:
    from .gates import TOKS_CTE

    vals = ", ".join(
        f"(CAST({qid} AS BIGINT), '{t}')"
        for qid, terms in PERCOLATE_QUERIES.items() for t in terms)
    return f"""
WITH {TOKS_CTE},
qterms(query_id, term) AS (VALUES {vals}),
qsz AS (
  SELECT query_id, CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms
  FROM qterms GROUP BY query_id
),
hits AS (
  SELECT t.doc_id, q.query_id,
         CAST(COUNT(DISTINCT t.term) AS BIGINT) AS n_matched
  FROM (SELECT DISTINCT doc_id, term FROM toks) t
  JOIN qterms q ON q.term = t.term
  GROUP BY t.doc_id, q.query_id
)
SELECT h.query_id, h.doc_id, h.n_matched, s.n_terms
FROM hits h JOIN qsz s ON s.query_id = h.query_id
WHERE h.n_matched >= s.n_terms
"""


ATTRIB_LOOKBACK_SEC = 1800


def q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join + last-touch attribution
    (streaming/windows.py::interval_join / attribute_conversions):
    each purchase pairs with same-user clicks at-or-before it within
    the 30-min lookback, then keeps the latest click (click-ts DESC,
    click-id DESC tie-break).  The gate runs the identical plan batch-
    side; tests/test_streaming.py drives the same function through two
    readStream sources and asserts pair parity."""
    from .streaming.windows import attribute_conversions, interval_join

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"))
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("c_ts"))
    pairs = interval_join(purchases, clicks, key="user_id",
                          left_ts="p_ts", right_ts="c_ts",
                          lookback_sec=ATTRIB_LOOKBACK_SEC)
    return attribute_conversions(pairs, left_id="purchase_id",
                                 right_id="click_id", left_ts="p_ts",
                                 right_ts="c_ts")


def sql_event_attribution() -> str:
    return f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS click_id, user_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
),
pairs AS (
  SELECT p.purchase_id, c.click_id, c.c_ts,
         epoch_us(p.p_ts) - epoch_us(c.c_ts) AS lag_us
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.c_ts <= p.p_ts
   AND c.c_ts >= p.p_ts - INTERVAL {ATTRIB_LOOKBACK_SEC} SECONDS
),
best AS (
  SELECT purchase_id, click_id, lag_us,
         ROW_NUMBER() OVER (PARTITION BY purchase_id
                            ORDER BY c_ts DESC, click_id DESC) AS rn
  FROM pairs
)
SELECT purchase_id, click_id, CAST(lag_us AS BIGINT) AS lag_us
FROM best WHERE rn = 1
"""


def q_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k trending terms per tumbling hour over a timestamped doc
    stream (streaming/windows.py::trending_terms) — timestamps derived
    deterministically from doc_id (one doc per minute over 8 synthetic
    hours)."""
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text",
        F.timestamp_seconds(
            F.lit(TREND_EPOCH0) + (F.col("doc_id") % 480) * 60).alias("ts"))
    out = W.trending_terms(docs, width="1 hour", k=TREND_K)
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "term", "n", "rank")


def sql_trending_terms() -> str:
    from .gates import STOP_SQL

    return f"""
WITH base AS (
  SELECT {TREND_EPOCH0} + (doc_id % 480) * 60 AS es, text FROM documents
),
toks AS (
  SELECT (es // 3600) * 3600 * 1000000 AS window_start_us,
         UNNEST(list_filter(string_split(text, ' '),
                            t -> LENGTH(t) > 1)) AS term
  FROM base
),
counts AS (
  SELECT window_start_us, term, CAST(COUNT(*) AS BIGINT) AS n
  FROM toks WHERE term NOT IN ({STOP_SQL})
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY window_start_us ORDER BY n DESC, term ASC) AS rk
  FROM counts
)
SELECT window_start_us, term, n, CAST(rk AS INT) AS rank
FROM ranked WHERE rk <= {TREND_K}
"""


_STREAM_IDX_MEMO: dict[tuple, str] = {}


def _stream_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Memoized two-batch streamed index (the build is the expensive
    part of this gate; bench + repeated gate runs reuse it the way
    gates._seg_index_dir memoizes the batch index)."""
    from .streaming.incremental import update_segment_index

    key = (id(spark), sf_dir)
    if key not in _STREAM_IDX_MEMO:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        pages = docs.select(
            F.format_string("doc://%012d", "doc_id").alias("url"), "text")
        index_dir = tempfile.mkdtemp(prefix="ir_spark_stream_gate_")
        half = docs.agg(F.max("doc_id")).collect()[0][0] // 2
        update_segment_index(
            spark,
            pages.filter(
                F.col("url") <= F.format_string("doc://%012d", F.lit(half))),
            index_dir, batch_tag="b0")
        update_segment_index(spark, pages, index_dir, batch_tag="b1")
        _STREAM_IDX_MEMO[key] = index_dir
    return _STREAM_IDX_MEMO[key]


def q_stream_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-index gate: stream documents into the segment index
    in two batches, query, map ids back — must equal the batch oracle."""
    from .gates import FLAGSHIP_QUERY, K_FLAGSHIP
    from .operators.segment_query import SegmentIndex, search_segments

    from .gates import _to_original_ids

    index_dir = _stream_index_dir(spark, sf_dir)
    sidx = SegmentIndex.load(spark, index_dir)
    # over-fetch then re-rank on quantized score (same determinism
    # contract as the batch bm25 gate)
    raw = search_segments(spark, sidx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                          mode="bm25", strategy="exhaustive")
    return (
        _to_original_ids(spark, index_dir, raw)
        .select("doc_id",
                F.round(F.col("score") * 1e6).cast("long").alias("score_micro"))
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(K_FLAGSHIP)
    )


def sql_stream_bm25_topk() -> str:
    from .gates import sql_bm25_topk

    return sql_bm25_topk()


def q_bm25_topk_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel: BM25 over the two-batch streamed index AS
    OF its first snapshot (SegmentIndex.load(as_of_grp=0) — grp-pruned
    segments, frozen snapshot stats, term stats from run_df sums).  The
    oracle indexes ONLY the first batch's documents, so a value match
    proves the as-of view identical to a fresh index built at that
    moment — results, df, N, and avgDocLen all historical."""
    from .gates import FLAGSHIP_QUERY, K_FLAGSHIP, _to_original_ids
    from .operators.segment_query import SegmentIndex, search_segments

    index_dir = _stream_index_dir(spark, sf_dir)
    sidx = SegmentIndex.load(spark, index_dir, as_of_grp=0)
    raw = search_segments(spark, sidx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                          mode="bm25", strategy="wand")
    return (
        _to_original_ids(spark, index_dir, raw)
        .select("doc_id",
                F.round(F.col("score") * 1e6).cast("long").alias("score_micro"))
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(K_FLAGSHIP)
    )


def sql_bm25_topk_asof() -> str:
    # batch b0 of _stream_index_dir = docs with doc_id <= max//2; the
    # restricted CTE derives postings/stats/dict from that subset only
    from .gates import K_FLAGSHIP, _sql_query_terms, _toks_cte

    k1, b = 1.2, 0.75
    return f"""
WITH {_toks_cte("doc_id <= (SELECT MAX(doc_id) // 2 FROM documents)")},
{_sql_query_terms()},
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


DEDUP_TS0 = 1_704_067_200  # 2024-01-01T00:00:00Z
DEDUP_EVERY = 5
_DEDUP_MEMO: dict[tuple, list] = {}


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming first-seen URL dedup (streaming/stateful.py::
    dedup_stream): a duplicated crawl — every DEDUP_EVERY-th url
    recrawled 10^6 s later in a second file — streamed with
    availableNow; exactly the first capture of each url must come out,
    whether the duplicate lands in the same micro-batch or a later
    one."""
    import tempfile as _tf

    from .streaming.stateful import dedup_stream

    key = (id(spark), sf_dir)
    if key not in _DEDUP_MEMO:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")).select("doc_id")
        url = F.format_string("doc://%012d", "doc_id")
        ts = F.timestamp_seconds(F.col("doc_id") + F.lit(DEDUP_TS0))
        ts_dup = F.timestamp_seconds(
            F.col("doc_id") + F.lit(DEDUP_TS0 + 1_000_000))
        src = _tf.mkdtemp(prefix="ir_spark_dedup_gate_")
        docs.select(url.alias("url"), ts.alias("warc_ts")).coalesce(
            1).write.mode("append").parquet(src)
        (docs.where(F.col("doc_id") % DEDUP_EVERY == 0)
         .select(url.alias("url"), ts_dup.alias("warc_ts"))
         .coalesce(1).write.mode("append").parquet(src))
        stream = spark.readStream.schema(
            "url string, warc_ts timestamp").parquet(src)
        name = f"dedup_gate_{abs(hash(key)) % 10**8}"
        q = (dedup_stream(stream).writeStream.format("memory")
             .queryName(name)
             .option("checkpointLocation", os.path.join(src, "_ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        _DEDUP_MEMO[key] = spark.table(name).collect()
    return spark.createDataFrame(_DEDUP_MEMO[key],
                                 "url string, warc_ts_us long")


def sql_stream_dedup() -> str:
    return f"""
WITH pages AS (
  SELECT printf('doc://%012d', doc_id) AS url,
         (doc_id + {DEDUP_TS0}) * 1000000 AS ts_us
  FROM documents
  UNION ALL
  SELECT printf('doc://%012d', doc_id),
         (doc_id + {DEDUP_TS0 + 1_000_000}) * 1000000
  FROM documents WHERE doc_id % {DEDUP_EVERY} = 0
)
SELECT url, CAST(MIN(ts_us) AS BIGINT) AS warc_ts_us
FROM pages GROUP BY url
"""


def streaming_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "events_tumbling": q_events_tumbling,
        "events_sliding": q_events_sliding,
        "events_sessions": q_events_sessions,
        "events_json_props": q_events_json_props,
        "stream_bm25_topk": q_stream_bm25_topk,
        "bm25_topk_asof": q_bm25_topk_asof,
        "stream_dedup": q_stream_dedup,
        "trending_terms": q_trending_terms,
        "event_attribution": q_event_attribution,
        "percolate_match": q_percolate_match,
    }


def streaming_oracle_sql() -> dict[str, str]:
    return {
        "events_tumbling": sql_events_tumbling(),
        "events_sliding": sql_events_sliding(),
        "events_sessions": sql_events_sessions(),
        "events_json_props": sql_events_json_props(),
        "stream_bm25_topk": sql_stream_bm25_topk(),
        "bm25_topk_asof": sql_bm25_topk_asof(),
        "stream_dedup": sql_stream_dedup(),
        "trending_terms": sql_trending_terms(),
        "event_attribution": sql_event_attribution(),
        "percolate_match": sql_percolate_match(),
    }
