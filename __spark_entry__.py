"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k on sf0.001;
``queries()``/``oracle_sql()`` expose one gate per implemented operator
family from SURVEY.md §2 plus the training-pipeline and retrieval-model
extensions (engine code on the Spark side, ANSI SQL for the DuckDB
oracle) — every gate carries a full value oracle.  Gate
implementations live in ir_spark/gates.py (core IR: index build,
scoring modes incl. Dirichlet QLD and BM25F on both engines, segments,
merge, positional/boolean/lexicon/RM3, batch + eval), ir_spark/
gates_analytics.py (dedup incl. connected components, ANN, text
analytics, corpus curation, packing, codec-adjacent profiling, link
graph: PageRank / anchor text / URL canonicalization / authority
fusion) and ir_spark/gates_streaming.py (windows, sessions,
incremental index).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k over documents at sf0.001."""
    from ir_spark import gates

    return gates.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ir_spark import gates

    out = dict(gates.core_queries())
    try:
        from ir_spark import gates_analytics

        out.update(gates_analytics.analytics_queries())
    except ImportError:
        pass
    try:
        from ir_spark import gates_streaming

        out.update(gates_streaming.streaming_queries())
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from ir_spark import gates

    out = dict(gates.core_oracle_sql())
    try:
        from ir_spark import gates_analytics

        out.update(gates_analytics.analytics_oracle_sql())
    except ImportError:
        pass
    try:
        from ir_spark import gates_streaming

        out.update(gates_streaming.streaming_oracle_sql())
    except ImportError:
        pass
    return out
