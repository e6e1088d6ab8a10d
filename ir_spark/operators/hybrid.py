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


def combsum_fuse(rankings: list[DataFrame], k: int = 10,
                 mnz: bool = False, id_col: str = "doc_id",
                 score_col: str = "score_micro") -> DataFrame:
    """Score-based fusion (Fox & Shaw 1994 CombSUM / CombMNZ with the
    standard per-list min-max normalization of Lee 1997) ->
    (id_col, fused_micro, rank).

    Each input is a top-N (id, score) list from one engine; scores are
    normalized to [0, 1] WITHIN their list ((s - min)/(max - min); a
    constant list maps to 1.0), missing items contribute 0, and

        CombSUM(d) = sum_r norm_r(d)
        CombMNZ(d) = CombSUM(d) * |{r : d in r}|

    The score-aware complement of ``rrf_fuse``: RRF uses only ranks
    (robust, calibration-free), Comb* preserves score GAPS within a
    list — a dense result that crushes the rest of its list keeps that
    margin through fusion.  Scale shape identical to ``rrf_fuse``:
    per-list min/max is a 1-row broadcast agg over an already-bounded
    top-N list, fusion is an outer join over O(sum N_i) rows, no
    corpus access.
    """
    sides = []
    for i, df in enumerate(rankings):
        mm = df.agg(F.min(score_col).alias("_mn"),
                    F.max(score_col).alias("_mx"))
        norm = F.when(
            F.col("_mx") == F.col("_mn"), F.lit(1.0)
        ).otherwise(
            (F.col(score_col).cast("double") - F.col("_mn"))
            / (F.col("_mx") - F.col("_mn")))
        sides.append(df.crossJoin(F.broadcast(mm)).select(
            F.col(id_col), norm.alias(f"_ns{i}")))
    joined = reduce(lambda a, b: a.join(b, id_col, "full_outer"), sides)
    parts = [F.coalesce(F.col(f"_ns{i}"), F.lit(0.0))
             for i in range(len(sides))]
    total = reduce(lambda x, y: x + y, parts)
    if mnz:
        nlists = reduce(
            lambda x, y: x + y,
            [F.when(F.col(f"_ns{i}").isNotNull(), 1).otherwise(0)
             for i in range(len(sides))])
        total = total * nlists.cast("double")
    # bounded input (union of top-N lists): global window is O(sum N_i)
    w = Window.orderBy(F.desc("fused_micro"), F.asc(id_col))
    return (
        joined.select(
            id_col, F.round(total * 1e6).cast("long").alias("fused_micro"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "fused_micro",
                F.col("rank").cast("int").alias("rank"))
    )
