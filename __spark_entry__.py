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

# The driver verifies the FIRST ~50 registry entries per round.  Gates that
# have not yet earned a green CORRECTNESS row (never checked, or checked
# only in an earlier round) are promoted to the head of the registry so
# every round's 50-gate window lands on the least-proven components first.
# Gates with standing green evidence from the previous round rotate to the
# tail — their rows remain on record.  (VERDICT r2 "Next round" items 1+8.)
_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked (r2) --------------------------------------
    "events_json_props",   # FAILED r1, fix in gates_streaming.py:125 — needs a green row
    "stream_dedup",
    "hybrid_rrf_topk",
    "ann_ivf_index_topk",
    "decontaminate",
    "repetition_filter",
    "stratified_sample",
    "mix_report",
    "dsir_weights",            # new r3: DSIR importance resampling weights
    "web_anchor_bm25f_topk",   # new r3: BM25F with incoming-anchor field
    "bm25_topk_deleted",       # new r3: live tombstones (Lucene liveDocs)
    "bm25_topk_compacted",     # new r3: compaction applies the deletes
    # -- green r1 but dropped from r2's 50-gate window -------------------
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "embedding_near_dup",
    "lang_id",
    "quality_score",
    "token_stats",
    "doc_fingerprint",
    "champion_bm25_topk",      # new r3: static index pruning
    "dictionary_frontcoded",   # new r3: real C4/C5 dictionary codecs
    "ltr_features",            # new r3: LTR candidate featurization
    "multimodal_meta",
    "multimodal_image_meta",   # new r3: REAL BMP decode on synthetic fixtures
    "multimodal_wav_stats",    # new r3: REAL WAV decode + numpy sample stats
    "multimodal_features",
    "frame_sample",
    "events_tumbling",
    "events_sliding",
    "events_sessions",
    "stream_bm25_topk",
    "trending_terms",          # new r3: top-k terms per tumbling window
)


def _reorder(registry: dict) -> dict:
    head = {k: registry[k] for k in _PRIORITY if k in registry}
    tail = {k: v for k, v in registry.items() if k not in head}
    return {**head, **tail}


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
    return _reorder(out)


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
    return _reorder(out)
