"""Structured Streaming surface: incremental index maintenance +
event-time windowed aggregations (SURVEY §2.7 notes the reference has
no streaming; this is the scale-path extension a continuously-crawled
corpus needs)."""
