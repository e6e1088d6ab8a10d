"""Custom stateful streaming operator: per-user sessionization with
explicit keyed state (``applyInPandasWithState``).

``windows.sessionize`` is the batch formulation (lag + running sum —
needs the whole history per user).  A stream cannot replay history, so
this operator keeps ONE small state row per live user — (session_id,
start_us, last_us, n_events) — and emits a session exactly once, when
it CLOSES:

- a new event for the user arrives more than ``gap`` after the
  previous one (the gap closes the old session and opens a new one), or
- the event-time watermark passes ``last event + gap`` with no new
  event (GroupStateTimeout.EventTimeTimeout) — the "user went away"
  case, which a pure window/lag formulation cannot express
  incrementally.

Scale: state is O(live users) x ~32 bytes, sharded by the groupBy
key; timeouts purge it, and the watermark bounds both state growth and
out-of-order buffering.  Emitted rows are append-mode (each session
final on emission) — safe for exactly-once file sinks.

Output matches the batch ``sessionize`` row-for-row (micro-quantized
bounds, dense per-user session ids) — proven in
tests/test_streaming.py by streaming the same events and comparing.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

SESSION_SCHEMA = ("user_id long, session_id long, session_start_us long, "
                  "session_end_us long, n_events long")
_STATE_SCHEMA = "session_id long, start_us long, last_us long, n long"


def _closed_row(user_id: int, sid: int, start_us: int, last_us: int,
                n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {"user_id": [user_id], "session_id": [sid],
         "session_start_us": [start_us], "session_end_us": [last_us],
         "n_events": [n]})


def _make_session_fn(gap_us: int):
    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.hasTimedOut:
            sid, start_us, last_us, n = state.get
            state.remove()
            yield _closed_row(user_id, sid, start_us, last_us, n)
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            # exact microseconds (datetime64[us] -> int64)
            ts_us.extend(pdf["ts"].astype("datetime64[us]").astype("int64").tolist())
        ts_us.sort()
        if state.exists:
            sid, start_us, last_us, n = state.get
        else:
            sid, start_us, last_us, n = 0, None, None, 0
        out: list[pd.DataFrame] = []
        for t in ts_us:
            if last_us is not None and t - last_us <= gap_us:
                n += 1
                last_us = max(last_us, t)
                # an in-watermark out-of-order event can predate the
                # current session start: batch sessionize would begin
                # the session at that earlier instant, so move the
                # start back too.  (An event older than start - gap —
                # extreme lateness — still folds in here: streaming
                # cannot retroactively split an open session; the
                # watermark bounds how far that approximation reaches.)
                if start_us is not None:
                    start_us = min(start_us, t)
                continue
            if last_us is not None:
                out.append(_closed_row(user_id, sid, start_us, last_us, n))
            sid, start_us, last_us, n = sid + 1, t, t, 1
        state.update((sid, start_us, last_us, n))
        # close the open session if the user stays silent past the gap;
        # clamped above the current watermark (Spark rejects timeouts
        # at-or-before it — can happen when this batch's events are all
        # older than watermark + gap)
        timeout_ms = last_us // 1000 + gap_us // 1000 + 1
        state.setTimeoutTimestamp(
            max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        yield from out

    return fn


DEDUP_SCHEMA = "url string, warc_ts_us long"
_DEDUP_STATE = "seen int"


def _make_dedup_fn(ttl_ms: int | None):
    def fn(key, pdfs: Iterable[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        url = key[0]
        if state.hasTimedOut:  # TTL purge: url unseen past the horizon
            state.remove()
            return
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        seen = state.exists
        if ttl_ms is not None:
            # refresh the TTL from the LAST sighting: every recrawl
            # (suppressed or not) extends the state's life; once the
            # watermark passes last_sighting + ttl the row is purged
            # and the next recrawl re-emits (freshness/TTL trade).
            # Clamped above the current watermark — Spark rejects
            # timeouts at-or-before it.
            state.update((1,))
            last_ms = int(rows["warc_ts_us"].max()) // 1000
            state.setTimeoutTimestamp(
                max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1))
        elif not seen:
            state.update((1,))
        if seen:  # url already emitted in an earlier batch
            return
        first = rows.sort_values("warc_ts_us").iloc[0]
        yield pd.DataFrame({"url": [url],
                            "warc_ts_us": [int(first["warc_ts_us"])]})

    return fn


def dedup_stream(pages: DataFrame, *, ttl_minutes: int | None = None,
                 watermark: str = "0 seconds") -> DataFrame:
    """Streaming first-seen URL dedup: emits each url exactly once —
    the earliest ``warc_ts`` capture — and drops every later recrawl,
    within and across micro-batches.  The standard ingestion front of
    a crawl pipeline (batch dedup can't drop a duplicate that arrives
    tomorrow; this does, with one tiny state row per seen url).

    ``pages`` must be a streaming DataFrame with (url, warc_ts).
    Output is append-mode (url, warc_ts_us) — each row final when
    emitted, safe for exactly-once file sinks; join back to the page
    payload downstream.

    Bounding state (the 100-TB path): with ``ttl_minutes`` set, a
    ``warc_ts`` watermark drives an event-time timeout that PURGES the
    state row of any url unseen for the TTL — state is then O(urls
    seen inside the horizon), not O(all urls ever).  A recrawl after
    the TTL re-emits; each sighting inside it refreshes the clock.
    Without a TTL, state is O(all distinct urls) — back it with the
    RocksDB state store provider either way
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) so state lives on executor
    disk instead of the JVM heap; tests/test_streaming.py runs this
    operator under RocksDB + TTL.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    if ttl_minutes is None:
        rows = pages.select("url",
                            F.unix_micros("warc_ts").alias("warc_ts_us"))
        timeout = GroupStateTimeout.NoTimeout
        ttl_ms = None
    else:
        # the watermark-tagged column must survive projection all the
        # way to the stateful operator, or the analyzer rejects the
        # event-time timeout; the pandas fn ignores it
        rows = pages.withWatermark("warc_ts", watermark).select(
            "url", "warc_ts", F.unix_micros("warc_ts").alias("warc_ts_us"))
        timeout = GroupStateTimeout.EventTimeTimeout
        ttl_ms = ttl_minutes * 60_000
    return (
        rows.groupBy("url")
        .applyInPandasWithState(
            _make_dedup_fn(ttl_ms), DEDUP_SCHEMA, _DEDUP_STATE,
            "append", timeout)
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "30 minutes") -> DataFrame:
    """Streaming counterpart of ``windows.sessionize``: append-mode
    stream of CLOSED sessions (user_id, session_id, session_start_us,
    session_end_us, n_events), session ids dense per user from 1.

    ``events`` must be a streaming DataFrame with an event-time ``ts``
    column; the watermark bounds late data and drives session-timeout
    emission."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_us), SESSION_SCHEMA, _STATE_SCHEMA,
            "append", GroupStateTimeout.EventTimeTimeout)
    )
