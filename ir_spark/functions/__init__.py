"""Vectorized function layer: Arrow-batched kernels and Spark column
expressions.  No per-row Python UDFs anywhere (north rule)."""
