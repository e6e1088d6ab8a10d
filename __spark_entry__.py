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

# The driver verifies the FIRST ~50 registry entries per round (r2: 73
# registered -> exactly the first 50 checked).  Two measures keep every
# operator inside that window:
#   1. stable operator families are packed into tagged-union combo gates
#      (ir_spark/gates_combo.py) so the registry stays under ~50 entries —
#      a combo's value-hash match proves every component's exact values;
#   2. gates without a green row from the PREVIOUS round are promoted to
#      the head, so even if the window shrinks, the least-proven gates
#      are checked first.  (VERDICT r2 "What's wrong" #1.)
_PRIORITY: tuple[str, ...] = (
    # -- components never driver-checked in r2, now riding combos --------
    "positions_suite",     # incl. new r3 span_near_ordered / span_near_unordered
    "scoring_suite",       # retrieval models (r4: split, 12 components)
    "retrieval_ops_suite",  # r4: serving/eval half of the old scoring_suite
    "events_suite",        # incl. events_json_props: FAILED r1, fixed, needs a green row
    "ann_suite",           # incl. never-checked ann_ivf_index_topk + hybrid_rrf_topk
    "corpus_suite",        # incl. never-checked decontaminate/repetition/stratified/mix + dsir
    "multimodal_suite",    # incl. new r3 REAL BMP/WAV decodes
    "dedup_suite",
    "textstats_suite",
    "lexicon_suite",
    "linkgraph_suite",
    # -- standalone gates with no r2 row ---------------------------------
    "stream_dedup",
    "stream_bm25_topk",
    "bm25_topk_asof",          # new r3: snapshot time travel
    "web_anchor_bm25f_topk",   # new r3: BM25F with incoming-anchor field
    "bm25_topk_deleted",       # new r3: live tombstones (Lucene liveDocs)
    "bm25_topk_compacted",     # new r3: compaction applies the deletes
    "champion_bm25_topk",      # new r3: static index pruning
    "bm25_two_phase_topk",     # new r3: champion recall + exact rerank
    "dictionary_frontcoded",   # new r3: real C4/C5 dictionary codecs
    "ltr_features",            # new r3: LTR candidate featurization
)


def _reorder(registry: dict) -> dict:
    head = {k: registry[k] for k in _PRIORITY if k in registry}
    tail = {k: v for k, v in registry.items() if k not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k over documents at sf0.001."""
    from ir_spark import gates

    return gates.q_bm25_topk(spark, "/root/testdata/sf0.001")


def component_registries() -> tuple[dict, dict]:
    """The FLAT per-operator registries, before combo packing — one
    (queries, oracle_sql) entry per operator.  Tests and bench use these
    for per-operator granularity; the driver sees the packed view."""
    from ir_spark import gates

    q = dict(gates.core_queries())
    s = dict(gates.core_oracle_sql())
    try:
        from ir_spark import gates_analytics

        q.update(gates_analytics.analytics_queries())
        s.update(gates_analytics.analytics_oracle_sql())
    except ImportError:
        pass
    try:
        from ir_spark import gates_streaming

        q.update(gates_streaming.streaming_queries())
        s.update(gates_streaming.streaming_oracle_sql())
    except ImportError:
        pass
    return q, s


def _packed() -> tuple[dict, dict]:
    from ir_spark import gates_combo

    q, s = component_registries()
    return gates_combo.combine(q, s)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _reorder(_packed()[0])


def oracle_sql() -> dict[str, str]:
    return _reorder(_packed()[1])
