"""Sequential dependence model retrieval (Metzler & Croft 2005) —
the classic term-dependence web ranking the flat BM25/LM engines
ignore: unigram + ordered-bigram + unordered-window features, each a
Dirichlet-smoothed language model, combined linearly:

    score(q, d) = lT * sum_t   f_T(t, d)
                + lO * sum_ab  f_O(#1(a b), d)
                + lU * sum_ab  f_U(#uwW(a b), d)

over ADJACENT query term pairs (a, b) of the kept-token query
sequence, where f_X(e, d) = ln((tf_e + mu*cf_e/C) / (dl + mu)) and

    tf_#1  = exact bigram occurrences (b directly after a),
    tf_#uw = unordered co-occurrence pairs with |pa - pb| < W.

The reference engine scores independent terms only
(QueryParser.java:159-174); SDM is the standard upgrade that made
term dependence pay on web collections.

Scale shape — ONE pruned scan for every feature:

* the positional relation is filtered to the query vocabulary (the
  only rows that ever shuffle) and grouped once per candidate doc
  into a {term -> positions} map; unigram tfs (array sizes), all
  bigram counts (the ``phrase_search`` array-intersect fold) and all
  window counts come out of that single row as JVM column
  expressions — no per-pair corpus passes, no explode, no self-join;
* window-pair counting is LINEAR per doc: an ``F.aggregate`` scan
  over the merged tagged occurrences carries a bounded buffer of
  in-window positions per side (buffer size <= W), so a pathological
  doc repeating both terms thousands of times costs O(n*W), not
  O(n^2) — the oracle's pairwise self-join is the shape avoided;
* pair collection frequencies need only docs containing BOTH terms
  (others contribute 0), so the cf aggregation rides the SAME grouped
  relation: one extra driver-scalar job over pruned candidates;
* Dirichlet decomposition (as in ``query.search_qld``): unmatched
  events fold into driver-side constants, the doc-length term
  ``-(lT*QT + lO*nO + lU*nU) * ln(dl + mu)`` joins from docinfo —
  candidates are exactly the >=1-matched-unigram OR set.

Collection length C = sum of dictionary cf (the QLD normalizer) is
shared by all three event spaces, the common Indri configuration.
Pairs whose collection frequency is zero carry no information and are
dropped per feature, like unseen unigrams.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import parse_query
from ..text import STOPWORDS, tokenize
from .query import collection_cf_total

DEFAULT_LAMBDAS = (0.85, 0.1, 0.05)  # Metzler & Croft's (lT, lO, lU)


def _pair_counts_exprs(a: str, b: str, window: int):
    """(tf_bigram, tf_window) column expressions over the per-doc
    {term -> positions} map column ``m``."""
    A = F.coalesce(F.col("m")[a], F.array().cast("array<int>"))
    B = F.coalesce(F.col("m")[b], F.array().cast("array<int>"))
    tf_o = F.size(F.array_intersect(
        F.transform(A, lambda x: x + 1), B)).cast("long")

    # linear unordered-window pair count: merged scan with a bounded
    # per-side buffer of positions still inside the window
    tag = lambda col, s: F.transform(  # noqa: E731
        col, lambda x: F.struct(x.cast("long").alias("pos"),
                                F.lit(s).alias("src")))
    merged = F.array_sort(F.concat(tag(A, 0), tag(B, 1)))
    empty = F.array().cast("array<long>")
    init = F.struct(empty.alias("ra"), empty.alias("rb"),
                    F.lit(0).cast("long").alias("cnt"))

    def step(acc, e):
        lo = e["pos"] - window
        ra = F.filter(acc["ra"], lambda x: x > lo)
        rb = F.filter(acc["rb"], lambda x: x > lo)
        is_a = e["src"] == 0
        cnt = acc["cnt"] + F.when(
            is_a, F.size(rb)).otherwise(F.size(ra)).cast("long")
        one = F.array(e["pos"])
        return F.struct(
            F.when(is_a, F.concat(ra, one)).otherwise(ra).alias("ra"),
            F.when(is_a, rb).otherwise(F.concat(rb, one)).alias("rb"),
            cnt.alias("cnt"))

    tf_u = F.aggregate(merged, init, step, lambda acc: acc["cnt"])
    return tf_o, tf_u


def search_sdm(spark: SparkSession, index, positions: DataFrame,
               query: str, *, k: int = 10, mu: float = 1000.0,
               window: int = 8,
               lambdas: tuple[float, float, float] = DEFAULT_LAMBDAS,
               stem: bool = False) -> DataFrame:
    """SDM top-k -> (doc_id, score).  ``index`` supplies dictionary /
    docinfo / collection stats; ``positions`` is the positional
    relation (or a bucket-pruned store read covering the query
    vocabulary)."""
    l_t, l_o, l_u = lambdas
    bag = parse_query(query, stem=stem)
    if not bag:
        return spark.createDataFrame([], "doc_id long, score double")
    seq = [t for t in tokenize(query, stem=stem) if t not in STOPWORDS]
    # duck-typed statistics: a SegmentIndex aggregates dictionary
    # DELTA rows via cf_of()/cf_total(); the DataFrameIndex probes its
    # flat dictionary directly
    if hasattr(index, "cf_of"):
        cfs = {t: int(v) for t, v in index.cf_of(sorted(bag)).items() if v}
        c_total = float(index.cf_total())
    else:
        rows = index.dictionary.filter(
            F.col("term").isin(list(bag))).select("term", "cf").collect()
        cfs = {r["term"]: int(r["cf"]) for r in rows if r["cf"]}
        c_total = float(collection_cf_total(index))
    terms = sorted(t for t in bag if t in cfs)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    pairs = [(a, b) for a, b in zip(seq, seq[1:])
             if a in cfs and b in cfs and a != b]

    grouped = (
        positions.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("term", "positions"))).alias("m"))
    )

    pair_exprs = {p: _pair_counts_exprs(p[0], p[1], window) for p in pairs}

    # pair collection frequencies: one scalar-agg job over the pruned
    # candidates (docs lacking either term contribute 0 by definition)
    cf_o: dict[tuple[str, str], int] = {}
    cf_u: dict[tuple[str, str], int] = {}
    if pairs:
        srow = grouped.select(
            *[e for p in pairs for e in pair_exprs[p]]
        ).toDF(*[f"{x}{i}" for i in range(len(pairs)) for x in ("o", "u")]
               ).agg(*[F.sum(f"{x}{i}").alias(f"{x}{i}")
                       for i in range(len(pairs)) for x in ("o", "u")]
                     ).collect()[0]
        for i, p in enumerate(pairs):
            cf_o[p] = int(srow[f"o{i}"] or 0)
            cf_u[p] = int(srow[f"u{i}"] or 0)

    o_pairs = [p for p in pairs if cf_o.get(p)]
    u_pairs = [p for p in pairs if cf_u.get(p)]

    const = (
        l_t * sum(bag[t] * math.log(mu * cfs[t] / c_total) for t in terms)
        + l_o * sum(math.log(mu * cf_o[p] / c_total) for p in o_pairs)
        + l_u * sum(math.log(mu * cf_u[p] / c_total) for p in u_pairs)
    )
    dl_coef = (l_t * float(sum(bag[t] for t in terms))
               + l_o * len(o_pairs) + l_u * len(u_pairs))

    matched = F.lit(0.0)
    for t in terms:
        tf = F.size(F.coalesce(F.col("m")[t],
                               F.array().cast("array<int>"))).cast("double")
        matched = matched + F.lit(l_t * bag[t]) * F.log(
            F.lit(1.0) + tf * F.lit(c_total) / F.lit(mu * cfs[t]))
    for p in o_pairs:
        o, _ = pair_exprs[p]
        matched = matched + F.lit(l_o) * F.log(
            F.lit(1.0) + o.cast("double") * F.lit(c_total)
            / F.lit(mu * cf_o[p]))
    for p in u_pairs:
        _, u = pair_exprs[p]
        matched = matched + F.lit(l_u) * F.log(
            F.lit(1.0) + u.cast("double") * F.lit(c_total)
            / F.lit(mu * cf_u[p]))

    scores = (
        grouped
        .join(index.docinfo.select("doc_id", "doc_len"), "doc_id")
        .select(
            "doc_id",
            (F.lit(const) + matched
             - F.lit(dl_coef) * F.log(F.col("doc_len") + F.lit(mu))
             ).alias("score"))
    )
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
