"""Hybrid retrieval: fuse lexical (BM25) and dense (embedding cosine)
rankings with reciprocal-rank fusion (RRF, Cormack et al. 2009 —
``score(d) = sum_r 1/(c + rank_r(d))``).

RRF is the standard score-free fusion for hybrid search: it needs no
score calibration between engines, only ranks, so the BM25 engine and
the ANN engine stay completely independent (each already has its own
gate) and the fusion is a pure DataFrame join over two tiny top-N
lists.

Scale shape: each source ranking is already reduced to N rows (the
engines' own top-k machinery did the heavy lifting); fusion is an
outer join + projection over O(N * n_sources) rows — driver-scale
input, executed as one broadcast-joined job, no corpus access at all.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_C = 60  # the constant from the RRF paper; dampens top-rank dominance


def rrf_fuse(rankings: list[DataFrame], k: int = 10, c: int = RRF_C,
             id_col: str = "doc_id") -> DataFrame:
    """Fuse ranked lists into (id_col, rrf_micro, rank).

    Each input must have (``id_col``, rank) with rank starting at 1.
    Items missing from a list contribute 0 for it (the standard RRF
    convention).  Deterministic: micro-quantized fused score, id-asc
    tie-break.
    """
    sides = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(c)) + F.col("rank").cast("double"))
             ).alias(f"_rrf{i}"))
        for i, df in enumerate(rankings)
    ]
    joined = reduce(lambda a, b: a.join(b, id_col, "full_outer"), sides)
    total = reduce(
        lambda x, y: x + y,
        [F.coalesce(F.col(f"_rrf{i}"), F.lit(0.0)) for i in range(len(sides))])
    # global (unpartitioned) window is deliberate: the input is the
    # union of already-top-N candidate lists (<= sum of N_i rows), so
    # the single-partition sort is O(N), not a corpus-wide shuffle
    w = Window.orderBy(F.desc("rrf_micro"), F.asc(id_col))
    return (
        joined.select(
            id_col,
            F.round(total * 1e6).cast("long").alias("rrf_micro"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rrf_micro", F.col("rank").cast("int").alias("rank"))
    )


def ranked(topk: DataFrame, order_col: str, id_col: str = "doc_id") -> DataFrame:
    """(id, score-ish) -> (id, rank) with the engine's deterministic
    (score desc, id asc) ordering."""
    # bounded input (a top-k list) — global window is O(k) by design
    w = Window.orderBy(F.desc(order_col), F.asc(id_col))
    return topk.select(id_col, F.row_number().over(w).alias("rank"))
