"""Impact-ordered index + score-at-a-time retrieval (Anh & Moffat,
"Pruned query evaluation using pre-computed impacts", SIGIR 2006).

The third classic query-evaluation strategy next to this repo's
document-at-a-time block-max WAND (``segment_query``) and its
term-at-a-time MaxScore gate: quantize each posting's FULL scoring
contribution at INDEX time into a small integer *impact*, store
postings grouped by (term, impact) in decreasing impact order, and
evaluate queries by summing impacts — integer adds, no per-posting
float math, and early termination falls out of the ordering because
every unprocessed posting of a term is bounded by the last impact
level seen.

Determinism contract (driver gates): the per-posting BM25 score is
micro-quantized to int64 FIRST (the repo-wide 1e-6 convention that
absorbs float summation-order noise), then the impact is pure integer
arithmetic — ``1 + (micro * (levels-1)) div max_micro`` — so DuckDB
reproduces the table bit-for-bit.

Scale shape:
- build: per-posting scoring joins dictionary on ``term`` (the key the
  build shuffle already produced) and docinfo on ``doc_id`` — a
  one-time build-side cost identical in shape to the norms sweep (A7);
  the global ``max_micro`` is ONE scalar aggregate.  At 100 TB the
  impact relation is written bucketed by term exactly like the posting
  segments, so a query prunes to its terms' buckets.
- query: broadcast the query bag, one groupBy(doc_id) over integer
  impacts — the narrowest possible accumulation (SAAT engines exist
  because integer adds beat float BM25 in the hot loop).
- pruned query: candidates come from postings with ``impact >= c``
  only; candidates are then rescored over their FULL impact lists, and
  the result is accepted only when the k-th candidate's score clears
  the certificate ``sum_t qtf_t * (c - 1)`` — an upper bound on any
  non-candidate's score, since every posting a non-candidate has for a
  query term sits strictly below ``c``.  Accepted results are
  therefore IDENTICAL to the unpruned ranking (lossless, like WAND);
  on certificate failure the cutoff halves (worst case c=1 == the
  exhaustive plan).

Reference scope note: the reference engine (QueryParser.java) scores
full posting lists with floats at query time; impact ordering is
additive surface for the web-scale payload, like champions and WAND.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import DataFrameIndex
from .query import doc_weight_expr, query_weights

MICRO = 1_000_000


@dataclass(frozen=True)
class ImpactIndex:
    """(term, doc_id, impact) with impact in [1, levels], plus the
    per-(term, impact) posting-count sidecar ``hist`` — dictionary-
    sized (<= vocab * levels rows), probed per query to choose the
    pruning cutoff without touching the postings."""

    impacts: DataFrame
    levels: int
    max_micro: int
    hist: DataFrame | None = None


def build_impact_index(index: DataFrameIndex, levels: int = 64,
                       mode: str = "bm25", k1: float = 1.2,
                       b: float = 0.75,
                       caches: list | None = None) -> ImpactIndex:
    """Score EVERY posting with the exact engine expression, quantize
    to ``levels`` uniform integer impacts.  ``levels`` is the
    fidelity/space knob (Anh & Moffat report 5-6 bits suffice; the
    quality pytest shows overlap@k vs exact BM25 monotone in it).

    The per-posting scoring join is the dominant build cost, and THREE
    consumers need it (the max_micro scalar, the quantization pass,
    the hist sidecar) — so it is persisted for the build.  Pass
    ``caches`` (a list) to take ownership of the cached frame and
    release it yourself once the returned impacts/hist are
    materialized; without it the impacts are eagerly materialized
    (localCheckpoint) and the scored cache is released before
    returning, so nothing leaks for the session."""
    w = doc_weight_expr(mode, index.n_docs, index.avg_doc_len, k1, b)
    scored = (index.postings
              .join(index.dictionary.select("term", "df"), "term")
              .join(index.docinfo, "doc_id")
              .select("term", "doc_id",
                      F.round(w * MICRO).cast("long").alias("m"))
              .persist())
    if caches is not None:
        caches.append(scored)
    max_micro = scored.agg(F.max("m")).collect()[0][0]
    if not max_micro or max_micro <= 0:  # empty index
        empty = scored.select("term", "doc_id",
                              F.lit(1).cast("long").alias("impact"))
        if caches is None:
            empty = empty.localCheckpoint(eager=True)
            scored.unpersist()
        return ImpactIndex(empty, levels, 0)
    # pure INTEGER arithmetic end-to-end (`div`, not float division):
    # DuckDB's `//` reproduces it bit-for-bit in the gate oracle
    impacts = scored.select(
        "term", "doc_id",
        F.expr(f"1 + (m * {levels - 1}) div {int(max_micro)}")
        .cast("long").alias("impact"))
    if caches is None:
        # no cache hand-off from the caller: materialize the quantized
        # impacts once (localCheckpoint cuts lineage back through the
        # scoring join) so the per-posting scored cache can be released
        # HERE instead of leaking for the session
        impacts = impacts.localCheckpoint(eager=True)
    # per-(term, impact) counts — one extra build-time agg on the key
    # the quantization pass already grouped by; at scale this sidecar
    # is stored next to the dictionary and term-pruned per query
    hist = (impacts.groupBy("term", "impact")
            .agg(F.count(F.lit(1)).alias("nd")))
    if caches is None:
        scored.unpersist()
    return ImpactIndex(impacts, levels, int(max_micro), hist)


def search_impacts(spark: SparkSession, imp: ImpactIndex,
                   index: DataFrameIndex, query: str, k: int | None = 5,
                   stem: bool = False) -> DataFrame:
    """Unpruned SAAT: integer impact sum per doc, weighted by query
    term frequency; (score DESC, doc_id ASC) tie-break (D8).  Returns
    (doc_id, score) with score the integer impact sum."""
    weights, _ = query_weights(index, query, "bm25", stem=stem)
    if not weights:
        return spark.createDataFrame([], "doc_id long, score long")
    qdf = spark.createDataFrame(
        [(t, int(round(w))) for t, w in weights.items()],
        "term string, qtf long")
    scores = (imp.impacts
              .join(F.broadcast(qdf), "term")
              .groupBy("doc_id")
              .agg(F.sum(F.col("impact") * F.col("qtf")).alias("score")))
    if k is None:
        return scores
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_impacts_pruned(spark: SparkSession, imp: ImpactIndex,
                          index: DataFrameIndex, query: str, k: int = 5,
                          cutoff: int | None = None,
                          stem: bool = False) -> tuple[DataFrame, int]:
    """Certified lossless pruning: only postings with
    ``impact >= cutoff`` propose candidates; candidates are rescored
    over their FULL lists; accept iff the k-th candidate's score >=
    ``sum_t qtf_t * (cutoff - 1)`` (no non-candidate can exceed that),
    else halve the cutoff and retry — c=1 degenerates to exhaustive.

    Returns (top-k DataFrame, accepted cutoff) — the cutoff is the
    pruning-effectiveness evidence the caller can log."""
    weights, _ = query_weights(index, query, "bm25", stem=stem)
    if not weights:
        return spark.createDataFrame([], "doc_id long, score long"), 1
    qdf = spark.createDataFrame(
        [(t, int(round(w))) for t, w in weights.items()],
        "term string, qtf long")
    qtf_total = int(sum(int(round(w)) for w in weights.values()))
    matched = imp.impacts.join(F.broadcast(qdf), "term")

    if cutoff is None:
        # one-shot cutoff choice from the index-time (term, impact)
        # sidecar: summed per-level posting counts upper-bound the
        # candidate count at each cutoff; take the highest cutoff
        # proposing >= 3k.  The probe is term-pruned against a
        # dictionary-sized table — it never touches postings (blind
        # halving from levels/2 cost 4-5 wasted full rounds per query;
        # a per-query postings histogram cost a full shuffle)
        if imp.hist is not None:
            rows = (imp.hist.join(F.broadcast(qdf.select("term")), "term")
                    .groupBy("impact").agg(F.sum("nd").alias("nd"))
                    .collect())
        else:
            rows = []
        cum, c = 0, 1
        for r in sorted(rows, key=lambda r: -r["impact"]):
            cum += r["nd"]
            if cum >= 3 * k:
                c = int(r["impact"])
                break
    else:
        c = cutoff
    while True:
        if c <= 1:
            # cutoff 1 admits every matched doc — the "pruned" plan
            # would be the unpruned one plus a useless semi-join
            top = (matched.groupBy("doc_id")
                   .agg(F.sum(F.col("impact") * F.col("qtf"))
                        .alias("score"))
                   .orderBy(F.desc("score"), F.asc("doc_id"))
                   .limit(k).collect())
            return spark.createDataFrame(
                top, "doc_id long, score long"), 1
        cands = (matched.filter(F.col("impact") >= c)
                 .select("doc_id").distinct())
        rescored = (matched
                    .join(F.broadcast(cands), "doc_id", "left_semi")
                    .groupBy("doc_id")
                    .agg(F.sum(F.col("impact") * F.col("qtf"))
                         .alias("score")))
        top = rescored.orderBy(F.desc("score"), F.asc("doc_id")) \
                      .limit(k).collect()
        # a non-candidate's best possible score is exactly bound (every
        # matched term at impact c-1), and impact scores are integers,
        # so ties are REAL: at top[-1].score == bound a non-candidate
        # could still enter the top-k via the doc_id ASC tie-break.
        # Lossless acceptance therefore needs STRICTLY greater.
        bound = qtf_total * (c - 1)
        if c <= 1 or (len(top) == k and top[-1]["score"] > bound):
            return spark.createDataFrame(
                top, "doc_id long, score long"), c
        c = max(1, c // 2)
