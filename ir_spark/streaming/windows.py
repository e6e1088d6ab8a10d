"""Event-time windowed aggregations + sessionization over the
``events`` stream table.

All transformations are written on plain DataFrames so the SAME
function runs in batch (driver-contract gates, DuckDB-oracle-checked)
and under Structured Streaming (``readStream`` + watermark — proven in
tests/test_streaming.py).  That is the idiomatic Spark pattern: the
logical plan is identical, only the source/sink differ.

Scale notes: tumbling windows aggregate with partial+final hash agg on
(window, event_type) — low cardinality keys, map-side combined.
Sessionization shuffles once on user_id; the lag/cumsum window runs
within each user partition (Window.partitionBy — parallel, unlike a
global orderBy window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "5 minutes",
                    watermark: str = "10 minutes",
                    streaming: bool = False) -> DataFrame:
    """Per event_type x tumbling window: count + sum(value).

    In streaming mode the watermark bounds state and drops events later
    than ``watermark``; batch mode computes the same windows exactly.
    """
    src = events.withWatermark("ts", watermark) if streaming else events
    # quantize each element BEFORE the cross-partition sum (house
    # determinism convention): rounding after a float SUM makes the
    # last micro depend on accumulation order, i.e. on partitioning
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.round(F.col("value") * 1e6).cast("long"))
             .cast("long").alias("sum_value_micro"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value_micro")
    )


def sliding_counts(events: DataFrame, width: str = "15 minutes",
                   slide: str = "5 minutes", watermark: str = "30 minutes",
                   streaming: bool = False) -> DataFrame:
    """Per event_type x sliding window (width > slide: each event lands
    in width/slide windows).  Spark expands the overlap internally —
    the shuffle still carries one row per (event, window) pre-agg pair
    with map-side combine."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``.  Classic lag + running-sum
    assignment; one shuffle on user_id.

    Returns (user_id, session_id, session_start, session_end, n_events)
    with session_id dense per user starting at 1.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact microseconds: cast-to-long truncates to whole seconds and
    # silently disagrees with a fractional-second oracle for gaps inside
    # (gap, gap+1s) — compare unix_micros on both sides instead
    gap = (F.unix_micros(F.col("ts"))
           - F.lag(F.unix_micros(F.col("ts"))).over(w))
    marked = events.select(
        "user_id", "ts", "event_id",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1)
        .otherwise(0).alias("is_new"),
    )
    sessioned = marked.withColumn(
        "session_id", F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).cast("long")
    )
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count("*").alias("n_events"))
    )


def json_prop_stats(events: DataFrame) -> DataFrame:
    """Extract the integer ``k`` property from the JSON ``props``
    column and aggregate per event_type — JSON path + agg, all JVM."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.sum("k").alias("sum_k"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"))
    )


def interval_join(left: DataFrame, right: DataFrame, *,
                  key: str = "user_id", left_ts: str = "ts",
                  right_ts: str = "ts", lookback_sec: int = 1800,
                  watermark: str = "1 hour") -> DataFrame:
    """Stream-stream (or batch) interval join: pair each LEFT row with
    every RIGHT row of the same key whose event time falls in
    ``(left_ts - lookback_sec, left_ts]`` (right happens at-or-before
    left, within the lookback) — the click->purchase attribution /
    impression->conversion shape.

    The SAME plan runs batch and streaming (the idiomatic Spark
    pattern used throughout this module): on streaming inputs both
    sides get event-time watermarks, which together with the two-sided
    time-range join condition let Spark BOUND the join state — old
    rows are evicted once the watermark passes their eligibility
    window (Structured Streaming's stream-stream inner join contract).
    Batch-side, Catalyst executes the equi-key part as an ordinary
    shuffled hash/SMJ join with the range condition as a residual
    filter — no cartesian.

    The timestamp refs are side-qualified (``left[left_ts]``), so the
    two sides may both carry a plain ``ts`` column; alias the OTHER
    columns before calling if you need to tell them apart downstream
    (the joined output keeps both sides' columns as-is).
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    # qualify against the (post-watermark) frames: unqualified
    # F.col("ts") would be AMBIGUOUS_REFERENCE whenever both sides use
    # the default "ts" name — i.e. on every default call
    lts, rts = left[left_ts], right[right_ts]
    cond = ((rts <= lts)
            & (rts >= lts - F.expr(f"INTERVAL {lookback_sec} SECONDS")))
    return left.join(right, on=[left[key] == right[key], cond],
                     how="inner").drop(right[key])


def attribute_conversions(pairs: DataFrame, *, left_id: str,
                          right_id: str, left_ts: str = "l_ts",
                          right_ts: str = "r_ts") -> DataFrame:
    """Last-touch attribution over interval_join output: for each LEFT
    event keep the LATEST matching RIGHT event (right_ts DESC, then
    right_id DESC for same-instant determinism) and the lag between
    them.  One partial-aggregable max-of-struct groupBy — no window,
    so it scales like any keyed agg.  Returns
    (left_id, right_id, lag_us)."""
    best = (
        pairs.groupBy(left_id)
        .agg(F.max(F.struct(
            F.col(right_ts).alias("ts"),
            F.col(right_id).alias("rid"),
            (F.unix_micros(F.col(left_ts))
             - F.unix_micros(F.col(right_ts))).alias("lag"))).alias("b")))
    return best.select(
        left_id,
        F.col("b.rid").alias(right_id),
        F.col("b.lag").cast("long").alias("lag_us"))


def trending_terms(docs: DataFrame, ts_col: str = "ts",
                   width: str = "1 hour", k: int = 5,
                   stopwords: frozenset | None = None) -> DataFrame:
    """Top-k terms per tumbling event-time window by count — the
    trending-topics query over a timestamped document stream.

    (ts, text) -> (window_start, term, n, rank), rank 1..k per window,
    ties broken lexicographically (deterministic).

    Shape: one explode + one (window, term) partial-agg shuffle (low
    fan-in keys, map-side combined), then a rank window PARTITIONED BY
    window_start — parallel across windows, never a global sort.  In
    Structured Streaming run the count stage with a watermark and rank
    each CLOSED window from foreachBatch (top-k needs the complete
    window); the batch formulation here is that per-window job.
    """
    counts = trending_counts(docs, ts_col=ts_col, width=width,
                             stopwords=stopwords)
    return rank_trending(counts, k=k)


def trending_counts(docs: DataFrame, ts_col: str = "ts",
                    width: str = "1 hour",
                    stopwords: frozenset | None = None,
                    watermark: str | None = None) -> DataFrame:
    """The streamable COUNT stage of ``trending_terms``:
    (window_start, term, n).  With ``watermark`` set it runs under
    Structured Streaming in append mode — each window's counts emit
    once, when the watermark closes the window (proven in
    tests/test_streaming.py)."""
    from ..text import STOPWORDS

    stop = sorted(STOPWORDS if stopwords is None else stopwords)
    src = docs.withWatermark(ts_col, watermark) if watermark else docs
    toks = F.filter(F.split("text", " "), lambda t: F.length(t) > 1)
    # group directly on window(ts): projecting w.start first would
    # sever the watermark-to-aggregation linkage the streaming planner
    # needs for append mode
    return (
        src.select(ts_col, F.explode(toks).alias("term"))
        .filter(~F.col("term").isin(stop))
        .groupBy(F.window(ts_col, width).alias("w"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "term", "n")
    )


def rank_trending(counts: DataFrame, k: int = 5) -> DataFrame:
    """The per-closed-window RANK stage: run it in batch, or from
    foreachBatch over the append-mode output of ``trending_counts``."""
    rk = Window.partitionBy("window_start").orderBy(F.desc("n"),
                                                    F.asc("term"))
    return (counts.withColumn("rank", F.row_number().over(rk))
            .filter(F.col("rank") <= k))
