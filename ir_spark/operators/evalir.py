"""Ranking evaluation: P@k / MRR / nDCG@k over (run, qrels) relations.

The offline-eval counterpart of the query engine: given a system run
(query_id, rank, doc_id) and graded judgments (query_id, doc_id, rel),
compute the standard retrieval metrics per query, distributed.  The
reference repo evaluates by eyeballing result files (stats.md); this
makes evaluation a first-class relational operator, which is what a
large-scale nightly-eval pipeline needs (runs x qrels can be billions
of rows; everything here is two keyed joins + one groupBy per side,
no driver materialization).

Conventions (TREC-standard):
  - P@k    = |relevant in top-k| / k
  - RR     = 1 / rank of first relevant in top-k, else 0
  - DCG@k  = sum over top-k of (2^rel - 1) / log2(rank + 1)
  - nDCG@k = DCG@k / IDCG@k, where IDCG ranks the query's full qrels
    by (rel desc, doc_id asc) truncated at k; 0 when the query has no
    relevant docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(run: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """Per-query metrics; returns (query_id, n_rel, p_at_k, rr, ndcg)
    as doubles (n_rel long).  Every query present in ``run`` yields a
    row, judged or not."""
    top = run.filter(F.col("rank") <= k)
    hits = top.join(qrels, ["query_id", "doc_id"], "left").select(
        "query_id", "rank", F.coalesce(F.col("rel"), F.lit(0)).alias("rel"))
    gain = (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)) / F.log2(
        F.col("rank") + F.lit(1.0))
    per = hits.groupBy("query_id").agg(
        (F.sum((F.col("rel") > 0).cast("int")) / F.lit(float(k))
         ).alias("p_at_k"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
        F.sum(gain).alias("dcg"),
    )

    w = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id"))
    ideal = (qrels.filter(F.col("rel") > 0)
             .withColumn("irank", F.row_number().over(w)))
    ideals = ideal.groupBy("query_id").agg(
        F.count("*").alias("n_rel"),
        F.sum(F.when(
            F.col("irank") <= k,
            (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0))
            / F.log2(F.col("irank") + F.lit(1.0)))).alias("idcg"),
    )

    return per.join(ideals, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
        "p_at_k",
        F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)).alias("rr"),
        F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
        .otherwise(F.lit(0.0)).alias("ndcg"),
    )


def rbo_weights(p: float, k: int) -> list[tuple[int, int]]:
    """Per-doc RBO weight table: a doc first present in BOTH prefixes
    at depth m contributes (1-p) * sum_{d=m..k} p^(d-1)/d to RBO@k.
    Quantized to nano-units so the distributed accumulation is an
    INTEGER sum (order-free across engines); the Python loop below is
    the single definition both the operator and the SQL oracles embed
    as literals."""
    out = []
    for m in range(1, k + 1):
        w = (1.0 - p) * sum(p ** (d - 1) / d for d in range(m, k + 1))
        out.append((m, int(round(w * 1e9))))
    return out


def rbo_overlap(run_a: DataFrame, run_b: DataFrame, *, p: float = 0.9,
                k: int = 10) -> DataFrame:
    """Rank-biased overlap at evaluation depth ``k`` (Webber, Moffat &
    Zobel 2010, "A similarity measure for indefinite rankings") — the
    standard top-weighted measure for comparing two rankers' output
    (e.g. a nightly A/B of scoring functions) without judgments:

        RBO@k = (1-p) * sum_{d=1..k} p^(d-1) * |A_d intersect B_d| / d

    (the RBO_MIN form: prefixes beyond k contribute nothing).  Inputs
    are run relations (query_id, rank, doc_id); output one row per
    query_id: (query_id, rbo_micro, overlap_at_k).

    Distribution: X_d telescopes per doc — a doc whose LATER of the
    two ranks is m adds sum_{d=m..k} p^(d-1)/d — so the whole metric
    is one equi-join of the two (already top-k-pruned) runs, a
    broadcast k-row weight lookup, and one integer-sum groupBy; runs
    x queries can be arbitrarily large, nothing is driver-side.
    Persistence-grade determinism: weights are nano-quantized longs,
    so per-query sums are exact integers in any accumulation order.
    """
    if not 0.0 < p < 1.0:
        raise ValueError("rbo requires 0 < p < 1")
    a = run_a.filter(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").alias("ra"))
    b = run_b.filter(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").alias("rb"))
    joint = a.join(b, ["query_id", "doc_id"]).select(
        "query_id", F.greatest("ra", "rb").cast("int").alias("m"))
    wdf = joint.sparkSession.createDataFrame(
        rbo_weights(p, k), "m int, w_nano long")
    per_q = (joint.join(F.broadcast(wdf), "m")
             .groupBy("query_id")
             .agg(F.sum("w_nano").alias("nano"),
                  F.count(F.lit(1)).alias("overlap_at_k")))
    qids = (run_a.select("query_id")
            .union(run_b.select("query_id")).distinct())
    return qids.join(per_q, "query_id", "left").select(
        "query_id",
        F.round(F.coalesce(F.col("nano"), F.lit(0)) / F.lit(1000.0))
        .cast("long").alias("rbo_micro"),
        F.coalesce(F.col("overlap_at_k"), F.lit(0))
        .cast("long").alias("overlap_at_k"),
    )


def team_draft_interleave(run_a: DataFrame, run_b: DataFrame, *,
                          salt: str = "tdi") -> DataFrame:
    """Team-draft interleaving (Radlinski, Kurup & Joachims, CIKM
    2008) — the ONLINE ranker A/B primitive: merge two rankings for
    the same query into one result list, alternating picks like
    schoolyard team captains, then credit user clicks to whichever
    ranker contributed the clicked doc.  RBO above compares rankings
    offline; this is what actually ships an experiment to users.

    Per query: while BOTH rankings still have unpicked docs, the team
    with fewer picks drafts next (ties broken by a deterministic
    md5 coin keyed on (salt, query_id, step) — reproducible across
    engines and reruns, the property a logged experiment needs);
    the drafting team appends its highest-ranked not-yet-picked doc.

    Implementation is ONE JVM-side ``F.aggregate`` fold per query over
    its two collected top-k arrays — the draft is inherently
    sequential, but the sequence is k≤tens long while queries are
    billions, so the parallelism axis is queries, never the draft.
    No Python in the loop; rows shuffle once per side (groupBy
    query_id on already-top-k runs).

    Inputs: (query_id, rank, doc_id) per side, rank 1-based dense.
    Returns (query_id, pos, doc_id, team) with pos 1..len, team
    'a'|'b'.  A query present in only one input drops (nothing to
    interleave — standard TDI stops when either side is dry)."""
    def side(run: DataFrame, name: str):
        return (run.groupBy("query_id")
                .agg(F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("rank", "doc_id"))),
                    lambda s: s["doc_id"]).alias(name)))

    joined = side(run_a, "la").join(side(run_b, "lb"), "query_id")
    qid_str = F.col("query_id").cast("string")
    hexes_a = list("13579bdf")

    def merge(acc, _):
        rem_a = F.filter(
            F.col("la"), lambda x: ~F.array_contains(acc["picked"], x))
        rem_b = F.filter(
            F.col("lb"), lambda x: ~F.array_contains(acc["picked"], x))
        dry = (F.size(rem_a) == 0) | (F.size(rem_b) == 0)
        step = F.size(acc["picked"]).cast("string")
        coin_a = F.substring(
            F.md5(F.concat(F.lit(salt), qid_str, F.lit(":"), step)),
            1, 1).isin(*hexes_a)
        turn_a = (F.when(acc["na"] < acc["nb"], F.lit(True))
                  .when(acc["na"] > acc["nb"], F.lit(False))
                  .otherwise(coin_a))
        pick = F.when(turn_a, F.element_at(rem_a, 1)) \
                .otherwise(F.element_at(rem_b, 1))
        team = F.when(turn_a, F.lit("a")).otherwise(F.lit("b"))
        stepped = F.struct(
            F.concat(acc["picked"], F.array(pick)).alias("picked"),
            F.concat(acc["teams"], F.array(team)).alias("teams"),
            (acc["na"] + F.when(turn_a, 1).otherwise(0)).alias("na"),
            (acc["nb"] + F.when(turn_a, 0).otherwise(1)).alias("nb"))
        return F.when(dry, acc).otherwise(stepped)

    init = F.struct(
        F.expr("CAST(array() AS ARRAY<BIGINT>)").alias("picked"),
        F.expr("CAST(array() AS ARRAY<STRING>)").alias("teams"),
        F.lit(0).alias("na"), F.lit(0).alias("nb"))
    acc = F.aggregate(
        F.sequence(F.lit(1), F.size("la") + F.size("lb")), init, merge)
    folded = joined.select("query_id", acc.alias("acc")).select(
        "query_id", F.col("acc.picked").alias("picked"),
        F.col("acc.teams").alias("teams"))
    return (folded
            .select("query_id",
                    F.posexplode(F.arrays_zip("picked", "teams")))
            .select("query_id",
                    (F.col("pos") + 1).cast("long").alias("pos"),
                    F.col("col.picked").cast("long").alias("doc_id"),
                    F.col("col.teams").alias("team")))


def interleave_credit(interleaved: DataFrame, clicks: DataFrame
                      ) -> DataFrame:
    """Credit assignment over a team-draft interleaved serving log:
    clicks (query_id, doc_id) join back to the team that contributed
    the doc; per query the team with more clicked docs wins the
    impression ('a' / 'b' / 'tie').  One broadcast-or-shuffle equi-join
    + one partial-agg groupBy — billions of impressions scale on the
    query_id axis."""
    hits = interleaved.join(clicks.select("query_id", "doc_id").distinct(),
                            ["query_id", "doc_id"])
    per_q = (interleaved.select("query_id").distinct()
             .join(hits.groupBy("query_id").agg(
                 F.sum(F.when(F.col("team") == "a", 1).otherwise(0))
                 .alias("clicks_a"),
                 F.sum(F.when(F.col("team") == "b", 1).otherwise(0))
                 .alias("clicks_b")), "query_id", "left"))
    ca = F.coalesce(F.col("clicks_a"), F.lit(0)).cast("long")
    cb = F.coalesce(F.col("clicks_b"), F.lit(0)).cast("long")
    return per_q.select(
        "query_id", ca.alias("clicks_a"), cb.alias("clicks_b"),
        F.when(ca > cb, "a").when(cb > ca, "b").otherwise("tie")
        .alias("winner"))
