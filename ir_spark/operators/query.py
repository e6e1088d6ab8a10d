"""Query engine, DataFrame level (SURVEY E3; operators J1-J3, K1,
W1-W4).

Logical plan per query (SURVEY §3 E3):
  postings ⋈ broadcast(query_terms)          -- J1, bucket/filter-pruned
          ⋈ docinfo on doc_id                -- J2 (per-doc stats)
          -> weight column expr (W1/W2/BM25) -- whole-stage codegen
          -> groupBy(doc_id).sum             -- A9, partial+final agg
          [⋈ norms for cosine modes]         -- J3/W4
          -> orderBy(score desc, doc_id).limit(k)  -- K1,
             TakeOrderedAndProject (per-partition top-k + driver merge)

All weighting math is Catalyst column expressions (JVM codegen) — no
Python in the query hot path.  Query-side weights (W3: always the W1
maxTf form, QueryParser.java:141-146) are driver-side scalars over a
<=dozens-term bag.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import max_tf_weight, parse_query
from .build import DataFrameIndex


def _w1_expr(n_docs: int):
    """W1 maxTf weighting (QueryParser.java:78-84) with the
    integer-division idf kept deliberately (D5)."""
    tf, max_tf, df = F.col("tf"), F.col("max_tf"), F.col("df")
    idf = F.log(F.floor(F.lit(float(n_docs)) / df).cast("double")) / math.log(n_docs)
    w = (F.lit(0.4) + F.lit(0.6) * F.log(tf + F.lit(0.5)) / F.log(max_tf + F.lit(1.0))) * idf
    return F.when((tf == 0) | (max_tf == 0) | (df == 0), F.lit(0.0)).otherwise(w)


def _w2_expr(n_docs: int, avg_doc_len: float):
    """W2 Okapi variant (QueryParser.java:94-101), integer-division idf."""
    tf, dl, df = F.col("tf"), F.col("doc_len"), F.col("df")
    idf = F.log(F.floor(F.lit(float(n_docs)) / df).cast("double")) / math.log(n_docs)
    w = F.lit(0.4) + F.lit(0.6) * (
        tf / (tf + F.lit(0.5) + F.lit(1.5) * (dl / F.lit(avg_doc_len)))
    ) * idf
    return F.when((tf == 0) | (dl == 0) | (df == 0), F.lit(0.0)).otherwise(w)


def _bm25_expr(n_docs: int, avg_doc_len: float, k1: float, b: float):
    """Parameterized BM25 with Lucene-style non-negative idf."""
    tf, dl, df = F.col("tf"), F.col("doc_len"), F.col("df")
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - df + F.lit(0.5)) / (df + F.lit(0.5))
    )
    w = idf * tf * F.lit(k1 + 1.0) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avg_doc_len))
    )
    return F.when((tf == 0) | (df == 0), F.lit(0.0)).otherwise(w)


def doc_weight_expr(mode: str, n_docs: int, avg_doc_len: float,
                    k1: float = 1.2, b: float = 0.75):
    if mode == "w1":
        return _w1_expr(n_docs)
    if mode == "w2":
        return _w2_expr(n_docs, avg_doc_len)
    if mode == "bm25":
        return _bm25_expr(n_docs, avg_doc_len, k1, b)
    raise ValueError(f"unknown mode {mode!r}")


def doc_norms(index: DataFrameIndex, mode: str, k1: float = 1.2,
              b: float = 0.75) -> DataFrame:
    """Idempotent per-doc L2 norms over ALL index terms (D4; A7).
    One full postings sweep + hash agg, persisted per (index, mode,
    k1, b) — norms are query-independent, so repeated cosine queries
    reuse the cached table instead of re-sweeping the index."""
    cache = getattr(index, "_norms_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(index, "_norms_cache", cache)
    key = (mode, k1, b)
    if key not in cache:
        w = doc_weight_expr(mode, index.n_docs, index.avg_doc_len, k1, b)
        joined = index.postings.join(
            index.dictionary.select("term", "df"), "term"
        ).join(index.docinfo, "doc_id")
        cache[key] = joined.select("doc_id", w.alias("w")).groupBy(
            "doc_id").agg(
            F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
        ).persist()
    return cache[key]


def release_norms(index: DataFrameIndex) -> None:
    """Unpersist and drop all cached norms tables for ``index`` (one
    per (mode, k1, b)).  The cache is deliberately session-lived for
    repeated cosine queries; long-lived drivers that retire an index
    should call this to release executor storage."""
    cache = getattr(index, "_norms_cache", None)
    if cache:
        for df in cache.values():
            df.unpersist()
        cache.clear()


def compute_query_weights(bag: dict[str, int], dfs: dict[str, int],
                          n_docs: int, mode: str) -> tuple[dict[str, float], float]:
    """W3: query-term weights (always the W1 form on query-local
    tf/maxTf + collection df, QueryParser.java:141-146) and the query
    L2 norm.  Driver-side — the query bag is tiny (A8).  For bm25 the
    query weight is the raw query tf (plain BM25 sum)."""
    if not bag:
        return {}, 0.0
    if mode in ("bm25", "bm25plus", "bm25l", "pivoted"):
        # the whole probabilistic/pivoted family sums qtf-weighted
        # per-doc term weights — the query side is just the raw tf
        return {t: float(tf) for t, tf in bag.items()}, 0.0
    max_tf_q = max(bag.values())
    weights = {
        t: max_tf_weight(tf, max_tf_q, dfs.get(t, 0), n_docs)
        for t, tf in bag.items()
    }
    q_norm = math.sqrt(sum(w * w for w in weights.values()))
    return weights, q_norm


def query_weights(index: DataFrameIndex, query: str, mode: str,
                  stem: bool = False) -> tuple[dict[str, float], float]:
    bag = parse_query(query, stem=stem)
    if not bag:
        return {}, 0.0
    dfs = index.df_of(list(bag)) if mode != "bm25" else {}
    return compute_query_weights(bag, dfs, index.n_docs, mode)


def search(spark: SparkSession, index: DataFrameIndex, query: str,
           k: int | None = 5, mode: str = "bm25", k1: float = 1.2,
           b: float = 0.75, stem: bool = False,
           norms: DataFrame | None = None,
           doc_filter: DataFrame | None = None) -> DataFrame:
    """Top-k retrieval; OR-semantics over query terms
    (QueryParser.java:159-174); deterministic tie-break (D8).
    ``k=None`` returns ALL matching docs unsorted (for fusion callers
    that re-rank downstream).

    ``doc_filter``: optional (doc_id) DataFrame restricting the
    CANDIDATE set (metadata-filtered search, e.g. lang = 'en').
    Collection statistics (df / N / avgDocLen) stay GLOBAL — the
    standard filtered-search convention — and the filter applies as a
    semi-join on the posting candidates BEFORE top-k selection, so the
    returned k rows are exactly the top-k of the filtered universe.
    At scale a selective filter side broadcasts; a wide one shuffles
    the (already query-term-pruned) candidate rows only.

    Returns DataFrame (doc_id, score), k rows, already ordered.
    """
    weights, q_norm = query_weights(index, query, mode, stem=stem)
    return search_weighted(spark, index, weights, q_norm=q_norm, k=k,
                           mode=mode, k1=k1, b=b, norms=norms,
                           doc_filter=doc_filter)


def search_weighted(spark: SparkSession, index: DataFrameIndex,
                    weights: dict[str, float], q_norm: float = 0.0,
                    k: int | None = 5, mode: str = "bm25", k1: float = 1.2,
                    b: float = 0.75, norms: DataFrame | None = None,
                    doc_filter: DataFrame | None = None) -> DataFrame:
    """``search`` with an explicit weighted query bag (term -> w_tq)
    instead of a query string — the entry point for query expansion
    (pseudo-relevance feedback) and any caller that computes its own
    query-side weights.  Same plan, same tie-break."""
    if not weights:
        return spark.createDataFrame([], "doc_id long, score double")

    qdf = spark.createDataFrame(
        [(t, w) for t, w in weights.items()], "term string, w_tq double"
    )
    normalize = mode in ("w1", "w2")

    hits = (
        index.postings
        .join(F.broadcast(qdf), "term")
        .join(F.broadcast(index.dictionary.filter(
            F.col("term").isin(list(weights)))).select("term", "df"), "term")
        .join(index.docinfo, "doc_id")
    )
    if doc_filter is not None:
        hits = hits.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
    w_td = doc_weight_expr(mode, index.n_docs, index.avg_doc_len, k1, b)
    scores = (
        hits.select("doc_id", (w_td * F.col("w_tq")).alias("partial"))
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("score"))
    )
    if normalize:
        if norms is None:
            norms = doc_norms(index, mode, k1, b)
        scores = scores.join(norms, "doc_id").select(
            "doc_id",
            F.when(
                (F.col("norm") > 0) & (F.lit(q_norm) > 0),
                F.col("score") / F.col("norm") / F.lit(q_norm),
            ).otherwise(F.lit(0.0)).alias("score"),
        )
    if k is None:
        # all matching docs, unsorted — for callers that re-rank on a
        # fused score (a global sort here would be discarded work)
        return scores
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_min_should_match(spark: SparkSession, index: DataFrameIndex,
                            query: str, *, min_should_match: int,
                            k: int | None = 5, mode: str = "bm25",
                            k1: float = 1.2, b: float = 0.75,
                            stem: bool = False) -> DataFrame:
    """OR-retrieval with a coverage floor (Elasticsearch
    ``minimum_should_match``): docs matching fewer than
    ``min(min_should_match, |distinct query terms|)`` of the query's
    DISTINCT terms are excluded BEFORE top-k, so the returned k rows
    are exactly the top-k of the qualifying universe.  Scores are
    unchanged for qualifying docs — the floor prunes, it does not
    re-weight.  Cost over plain search: one extra countDistinct in the
    SAME per-doc aggregation — no extra shuffle, no extra pass.
    """
    weights, q_norm = query_weights(index, query, mode, stem=stem)
    if not weights:
        return spark.createDataFrame([], "doc_id long, score double")
    required = min(int(min_should_match), len(weights))

    qdf = spark.createDataFrame(
        [(t, w) for t, w in weights.items()], "term string, w_tq double")
    hits = (
        index.postings
        .join(F.broadcast(qdf), "term")
        .join(F.broadcast(index.dictionary.filter(
            F.col("term").isin(list(weights)))).select("term", "df"),
            "term")
        .join(index.docinfo, "doc_id")
    )
    w_td = doc_weight_expr(mode, index.n_docs, index.avg_doc_len, k1, b)
    scores = (
        hits.select("doc_id", "term",
                    (w_td * F.col("w_tq")).alias("partial"))
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("score"),
             F.countDistinct("term").alias("_n_matched"))
        .where(F.col("_n_matched") >= required)
        .drop("_n_matched")
    )
    if mode in ("w1", "w2"):
        norms = doc_norms(index, mode, k1, b)
        scores = scores.join(norms, "doc_id").select(
            "doc_id",
            F.when((F.col("norm") > 0) & (F.lit(q_norm) > 0),
                   F.col("score") / F.col("norm") / F.lit(q_norm))
            .otherwise(F.lit(0.0)).alias("score"))
    if k is None:
        return scores
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def boost_by_recency(scores: DataFrame, doc_ts: DataFrame,
                     now: str, half_life_days: float = 30.0) -> DataFrame:
    """Recency-boosted ranking for time-stamped web corpora: fold a
    capture-time decay into relevance scores —

        boosted = score * 1 / (1 + age_days / half_life_days)

    with ``age_days = max(0, datediff(now, ts))``.  The rational decay
    (not exp()) is deliberate: division/addition are exactly-rounded
    IEEE ops that agree bit-for-bit across engines, so an ANSI-SQL
    oracle reproduces the boosted ranking exactly — transcendental
    libm calls do not have that guarantee.

    ``scores``: (doc_id, score) from any search; ``doc_ts``: (doc_id,
    ts) capture times (``warc_ts`` in the input-hint page schema);
    ``now``: 'YYYY-MM-DD' reference date (a parameter, never a wall
    clock — keeps results reproducible).  Scale shape: the k-row (or
    candidate-set) scores side joins a broadcast-or-colocated doc_ts
    projection; no corpus shuffle.

    A scored doc with no ``doc_ts`` row (NULL/absent capture time)
    ranks UNBOOSTED (age 0) — an inner join would silently drop it
    from the ranking."""
    decayed = (
        scores.join(doc_ts.select("doc_id", "ts"), "doc_id", "left")
        .select(
            "doc_id",
            (F.col("score") / (F.lit(1.0)
             + F.coalesce(
                 F.greatest(F.lit(0), F.datediff(F.lit(now), F.col("ts")))
                 .cast("double"), F.lit(0.0)) / F.lit(float(half_life_days))))
            .alias("score"))
    )
    return decayed.orderBy(F.desc("score"), F.asc("doc_id"))


def search_with_synonyms(spark: SparkSession, index: DataFrameIndex,
                         query: str, synonyms: dict[str, list[str]],
                         syn_weight: float = 0.5, k: int | None = 5,
                         mode: str = "bm25", k1: float = 1.2,
                         b: float = 0.75, stem: bool = False) -> DataFrame:
    """Query-time synonym expansion (Lucene SynonymGraphFilter's
    query-side analogue; the reference scores only the literal bag):
    every original term keeps weight qtf, each mapped synonym joins the
    bag at ``syn_weight * qtf`` — unless it is itself an original term,
    where the original weight wins (expansion must never down-weight
    what the user typed).  Synonyms absent from the corpus contribute
    nothing (OR semantics), so a generic thesaurus is safe to apply.

    The synonym table is query-bag-sized driver state — the expansion
    never touches the corpus; the scoring plan is the ordinary
    weighted search.

    BM25 only: the cosine modes need a query-side W1 weighting +
    query norm that a fractional expanded bag does not define — refuse
    loudly rather than cosine-normalize with q_norm=0 (which zeroes
    every score)."""
    from ..oracle import parse_query

    if mode != "bm25":
        raise ValueError(
            f"search_with_synonyms supports mode='bm25', not {mode!r}")
    bag = parse_query(query, stem=stem)
    weights: dict[str, float] = {t: float(tf) for t, tf in bag.items()}
    for t, tf in bag.items():
        for s in synonyms.get(t, ()):
            s = s.lower()
            if s in bag:
                continue
            w = syn_weight * tf
            weights[s] = max(weights.get(s, 0.0), w)
    return search_weighted(spark, index, weights, k=k, mode=mode,
                           k1=k1, b=b)


def explain_score(spark: SparkSession, index: DataFrameIndex, query: str,
                  mode: str = "bm25", k1: float = 1.2, b: float = 0.75,
                  stem: bool = False,
                  doc_filter: DataFrame | None = None) -> DataFrame:
    """Per-term score breakdown — the Lucene ``IndexSearcher.explain``
    analogue (the reference engine prints only final scores,
    Driver.java:83-105): one row per (doc_id, matched term) with the
    posting evidence (tf, df, doc_len) and the term's exact
    contribution ``w_td * w_tq``; summing contributions per doc_id
    reproduces ``search``'s score bit-for-bit (same Catalyst
    expressions, same joins, no second scoring path to drift).

    Cosine modes explain the UNNORMALIZED dot product (the
    normalization is a per-doc scalar, not per-term evidence).
    ``doc_filter`` restricts to the docs being debugged — the usual
    call explains only a result page, so the plan is the pruned-
    postings join with a broadcast doc set, no corpus sweep."""
    weights, _ = query_weights(index, query, mode, stem=stem)
    if not weights:
        return spark.createDataFrame(
            [], "doc_id long, term string, tf long, df long, "
                "doc_len long, contribution double")
    qdf = spark.createDataFrame(
        [(t, w) for t, w in weights.items()], "term string, w_tq double")
    hits = (
        index.postings
        .join(F.broadcast(qdf), "term")
        .join(F.broadcast(index.dictionary.filter(
            F.col("term").isin(list(weights)))).select("term", "df"), "term")
        .join(index.docinfo, "doc_id")
    )
    if doc_filter is not None:
        hits = hits.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
    w_td = doc_weight_expr(mode, index.n_docs, index.avg_doc_len, k1, b)
    return hits.select(
        "doc_id", "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        F.col("doc_len").cast("long").alias("doc_len"),
        (w_td * F.col("w_tq")).alias("contribution"),
    )


def page_after(scores: DataFrame, cursor_score_micro: int,
               cursor_doc_id: int, k: int) -> DataFrame:
    """Keyset pagination over a ranked result set (Elasticsearch
    ``search_after``): the next ``k`` rows strictly after the cursor in
    the total order (score_micro DESC, doc_id ASC).

    ``scores`` must carry (doc_id, score_micro) with micro-quantized
    scores — quantization makes the cursor exact and engine-portable
    (a raw-double cursor would be bit-fragile at page boundaries).
    Unlike OFFSET, the predicate prunes BEFORE the top-k, so page N
    costs the same one TakeOrderedAndProject as page 1 — no
    deep-pagination blowup, and the cursor stays valid under
    concurrent appends (new docs rank in, already-seen rows never
    repeat)."""
    after = (
        (F.col("score_micro") < F.lit(int(cursor_score_micro)))
        | ((F.col("score_micro") == F.lit(int(cursor_score_micro)))
           & (F.col("doc_id") > F.lit(int(cursor_doc_id))))
    )
    return (scores.filter(after)
            .orderBy(F.desc("score_micro"), F.asc("doc_id")).limit(k))


def collection_cf_total(index: DataFrameIndex) -> int:
    """Total collection token count over indexed (non-stopword) terms
    (sum of cf) — the language-model denominator.  One dictionary
    sweep, memoized per index."""
    total = getattr(index, "_cf_total", None)
    if total is None:
        total = int(
            index.dictionary.agg(F.sum("cf").alias("c")).collect()[0]["c"]
            or 0)
        object.__setattr__(index, "_cf_total", total)
    return total


def search_qld(spark: SparkSession, index: DataFrameIndex, query: str,
               k: int = 5, mu: float = 1000.0,
               stem: bool = False) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001) — the standard LM alternative to BM25 the reference
    engine lacks.

        score(q, d) = sum_t qtf_t * ln( (tf_td + mu*cf_t/C) / (dl_d + mu) )

    over the query terms that occur in the collection (unseen terms
    carry no information under the MLE collection model and are
    dropped, the convention reference LM implementations use).

    Distributed form: only MATCHED postings are touched.  The sum
    decomposes as

        const + sum_{matched t} qtf_t * ln(1 + tf * C / (mu * cf_t))
              - Q * ln(dl_d + mu)

    with const = sum_t qtf_t*ln(mu*cf_t/C) and Q = sum_t qtf_t both
    driver-side scalars, so the plan is the same pruned
    postings >< broadcast(query) >< docinfo join + one hash agg as
    BM25 — candidates are docs with >=1 matched term, exactly the
    OR-semantics candidate set.  No per-document pass over unmatched
    query terms, which is what makes the textbook formula scale-hostile
    and this form shuffle-equivalent to BM25.
    """
    bag = parse_query(query, stem=stem)
    if not bag:
        return spark.createDataFrame([], "doc_id long, score double")
    rows = index.dictionary.filter(
        F.col("term").isin(list(bag))).select("term", "cf").collect()
    cfs = {r["term"]: int(r["cf"]) for r in rows if r["cf"]}
    terms = sorted(t for t in bag if t in cfs)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    c_total = float(collection_cf_total(index))
    const = sum(bag[t] * math.log(mu * cfs[t] / c_total) for t in terms)
    q_len = float(sum(bag[t] for t in terms))

    qdf = spark.createDataFrame(
        [(t, float(bag[t]), float(cfs[t])) for t in terms],
        "term string, qtf double, cf double")
    hits = (
        index.postings
        .join(F.broadcast(qdf), "term")
        .join(index.docinfo.select("doc_id", "doc_len"), "doc_id")
    )
    partial = F.col("qtf") * F.log(
        F.lit(1.0) + F.col("tf") * F.lit(c_total) / (F.lit(mu) * F.col("cf")))
    scores = (
        hits.select("doc_id", "doc_len", partial.alias("partial"))
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("matched"),
             F.max("doc_len").alias("doc_len"))
        .select(
            "doc_id",
            (F.lit(const) + F.col("matched")
             - F.lit(q_len) * F.log(F.col("doc_len") + F.lit(mu))
             ).alias("score"))
    )
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_lmjm(spark: SparkSession, index: DataFrameIndex, query: str,
                k: int = 5, lam: float = 0.1,
                stem: bool = False) -> DataFrame:
    """Query-likelihood retrieval with Jelinek-Mercer smoothing (the
    linear-interpolation LM of Zhai & Lafferty 2001, the standard
    companion to the Dirichlet ``search_qld``; ``lam`` is the
    collection weight — 0.1 for short web queries per the paper):

        score(q, d) = sum_t qtf_t
                      * ln( (1-lam)*tf_td/dl_d + lam*cf_t/C )

    over query terms present in the collection.  Matched-postings
    decomposition (same scale argument as ``search_qld``):

        const + sum_{matched t} qtf_t
                * ln(1 + (1-lam)*tf*C / (lam*dl*cf_t))

    with const = sum_t qtf_t*ln(lam*cf_t/C) driver-side.  Unlike
    Dirichlet there is NO separate doc-length term outside the matched
    sum (dl only enters through matched postings), so the plan is
    exactly the pruned postings >< broadcast(query) >< docinfo join +
    one hash agg — shuffle-equivalent to BM25.
    """
    if not 0.0 < lam < 1.0:
        raise ValueError("lam must be in (0, 1)")
    bag = parse_query(query, stem=stem)
    if not bag:
        return spark.createDataFrame([], "doc_id long, score double")
    rows = index.dictionary.filter(
        F.col("term").isin(list(bag))).select("term", "cf").collect()
    cfs = {r["term"]: int(r["cf"]) for r in rows if r["cf"]}
    terms = sorted(t for t in bag if t in cfs)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    c_total = float(collection_cf_total(index))
    const = sum(bag[t] * math.log(lam * cfs[t] / c_total) for t in terms)

    qdf = spark.createDataFrame(
        [(t, float(bag[t]), float(cfs[t])) for t in terms],
        "term string, qtf double, cf double")
    hits = (
        index.postings
        .join(F.broadcast(qdf), "term")
        .join(index.docinfo.select("doc_id", "doc_len"), "doc_id")
    )
    partial = F.col("qtf") * F.log(
        F.lit(1.0)
        + F.lit((1.0 - lam) / lam) * F.col("tf") * F.lit(c_total)
        / (F.col("doc_len") * F.col("cf")))
    scores = (
        hits.select("doc_id", partial.alias("partial"))
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("matched"))
        .select("doc_id",
                (F.lit(const) + F.col("matched")).alias("score"))
    )
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_pl2(spark: SparkSession, index: DataFrameIndex, query: str,
               k: int = 5, c: float = 1.0,
               stem: bool = False) -> DataFrame:
    """PL2 divergence-from-randomness retrieval (Amati & van
    Rijsbergen 2002; Terrier's default DFR model) — Poisson
    randomness, Laplace first normalization, length normalization 2:

        tfn      = tf * log2(1 + c * avg_dl / dl)
        lambda_t = cf_t / N
        score    = sum_t qtf_t / (tfn + 1) *
                   ( tfn * log2(tfn / lambda_t)
                     + (lambda_t - tfn) * log2(e)
                     + 0.5 * log2(2 * pi * tfn) )

    Unlike the LM scorers a term contributes ONLY where tf > 0, so the
    matched-postings plan needs no decomposition at all: the same
    pruned postings >< broadcast(query terms + lambda) >< docinfo join
    and one hash agg as BM25, all weighting in whole-stage codegen.
    """
    bag = parse_query(query, stem=stem)
    if not bag:
        return spark.createDataFrame([], "doc_id long, score double")
    rows = index.dictionary.filter(
        F.col("term").isin(list(bag))).select("term", "cf").collect()
    cfs = {r["term"]: int(r["cf"]) for r in rows if r["cf"]}
    terms = sorted(t for t in bag if t in cfs)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    n_docs = float(index.n_docs)
    avg_dl = float(index.avg_doc_len)

    qdf = spark.createDataFrame(
        [(t, float(bag[t]), cfs[t] / n_docs) for t in terms],
        "term string, qtf double, lam double")
    hits = (
        index.postings
        .join(F.broadcast(qdf), "term")
        .join(index.docinfo.select("doc_id", "doc_len"), "doc_id")
    )
    ln2 = math.log(2.0)
    tfn = F.col("tf") * F.log(
        F.lit(1.0) + F.lit(c * avg_dl) / F.col("doc_len")) / F.lit(ln2)
    lam = F.col("lam")
    gain = (tfn * F.log(tfn / lam) / F.lit(ln2)
            + (lam - tfn) * F.lit(math.log2(math.e))
            + F.lit(0.5) * F.log(F.lit(2.0 * math.pi) * tfn) / F.lit(ln2))
    partial = F.col("qtf") / (tfn + F.lit(1.0)) * gain
    scores = (
        hits.select("doc_id", partial.alias("partial"))
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("score"))
    )
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _bm25_variant_search(spark: SparkSession, index: DataFrameIndex,
                         query: str, k: int, stem: bool,
                         partial_of) -> DataFrame:
    """Shared plan for the matched-only BM25-family variants: pruned
    postings >< broadcast(qtf) >< broadcast(df) >< docinfo, one hash
    agg, deterministic (score DESC, doc_id) top-k — identical shape to
    ``search_weighted`` mode='bm25'.  ``partial_of(tf, dl, df, qtf)``
    returns the per-(doc, term) contribution Column."""
    bag = parse_query(query, stem=stem)
    if not bag:
        return spark.createDataFrame([], "doc_id long, score double")
    qdf = spark.createDataFrame(
        [(t, float(tf)) for t, tf in bag.items()], "term string, qtf double")
    hits = (
        index.postings
        .join(F.broadcast(qdf), "term")
        .join(F.broadcast(index.dictionary.filter(
            F.col("term").isin(list(bag)))).select("term", "df"), "term")
        .join(index.docinfo.select("doc_id", "doc_len"), "doc_id")
    )
    partial = partial_of(F.col("tf"), F.col("doc_len"), F.col("df"),
                         F.col("qtf"))
    scores = (
        hits.select("doc_id", partial.alias("partial"))
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("score"))
    )
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_bm25plus(spark: SparkSession, index: DataFrameIndex, query: str,
                    k: int = 5, k1: float = 1.2, b: float = 0.75,
                    delta: float = 1.0, stem: bool = False) -> DataFrame:
    """BM25+ (Lv & Zhai 2011, "Lower-bounding term frequency
    normalization"): plain BM25 penalizes very long documents past the
    point where a MATCHED term scores lower than an unmatched one in a
    short doc; BM25+ restores the lower bound by adding ``delta`` to
    the saturated tf term,

        score = sum_t qtf * idf(t) *
                ( (k1+1)*tf / (tf + k1*(1-b+b*dl/avgdl)) + delta )

    over matched terms only (tf > 0) — so the plan is EXACTLY the
    plain pruned BM25 join + one extra literal add in codegen; zero
    additional shuffles or stats.  idf is the engine's Lucene-style
    non-negative form (matches ``_bm25_expr``).
    """
    n_docs, avg_dl = float(index.n_docs), float(index.avg_doc_len)

    def partial(tf, dl, df, qtf):
        idf = F.log(F.lit(1.0)
                    + (F.lit(n_docs) - df + F.lit(0.5)) / (df + F.lit(0.5)))
        sat = tf * F.lit(k1 + 1.0) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avg_dl)))
        return qtf * idf * (sat + F.lit(delta))

    return _bm25_variant_search(spark, index, query, k, stem, partial)


def search_bm25l(spark: SparkSession, index: DataFrameIndex, query: str,
                 k: int = 5, k1: float = 1.2, b: float = 0.75,
                 delta: float = 0.5, stem: bool = False) -> DataFrame:
    """BM25L (Lv & Zhai 2011 CIKM): the companion long-doc fix that
    shifts the NORMALIZED tf instead of the saturated score,

        ctd   = tf / (1 - b + b * dl / avgdl)
        score = sum_t qtf * idf(t) *
                (k1 + 1) * (ctd + delta) / (k1 + ctd + delta)

    over matched terms only; same pruned single-join plan as BM25."""
    n_docs, avg_dl = float(index.n_docs), float(index.avg_doc_len)

    def partial(tf, dl, df, qtf):
        idf = F.log(F.lit(1.0)
                    + (F.lit(n_docs) - df + F.lit(0.5)) / (df + F.lit(0.5)))
        ctd = tf / (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avg_dl))
        shifted = ctd + F.lit(delta)
        return qtf * idf * F.lit(k1 + 1.0) * shifted / (F.lit(k1) + shifted)

    return _bm25_variant_search(spark, index, query, k, stem, partial)


def search_pivoted(spark: SparkSession, index: DataFrameIndex, query: str,
                   k: int = 5, slope: float = 0.2,
                   stem: bool = False) -> DataFrame:
    """Pivoted length normalization VSM (Singhal, Buckley & Mitra,
    SIGIR 1996 — the formulation axiomatized as PIV in Fang, Tao &
    Zhai 2004): the pre-BM25 fix for cosine normalization's long-doc
    bias, still the standard third baseline next to BM25 and Dirichlet:

        score = sum_t qtf * (1 + ln(1 + ln(tf)))
                          / (1 - slope + slope * dl/avgdl)
                          * ln((N + 1) / df)

    Matched-only contributions (tf > 0), so the plan is EXACTLY the
    plain pruned BM25 broadcast-join + one hash agg — zero extra
    shuffles or statistics."""
    n_docs, avg_dl = float(index.n_docs), float(index.avg_doc_len)

    def partial(tf, dl, df, qtf):
        num = F.lit(1.0) + F.log(F.lit(1.0) + F.log(tf))
        den = (F.lit(1.0 - slope)
               + F.lit(slope) * dl / F.lit(avg_dl))
        idf = F.log((F.lit(n_docs) + F.lit(1.0)) / df)
        return qtf * num / den * idf

    return _bm25_variant_search(spark, index, query, k, stem, partial)


def collapse_topk(scored: DataFrame, keys: DataFrame, key_col: str,
                  k: int) -> DataFrame:
    """Field collapsing (the Elasticsearch ``collapse`` analogue): keep
    only the single best-scoring document per ``key_col`` group (e.g.
    one result per host / per canonical-url cluster), then take the
    global top-k of the surviving representatives.

    ``scored`` is (doc_id, score_micro) — already micro-quantized so
    the per-group winner is engine-reproducible; ``keys`` is a
    (doc_id, <key_col>) dimension relation.  Winner per group = highest
    score_micro, lowest doc_id on ties.

    Distinct from result *diversification* (``bm25_diverse_topk``: up
    to N per host via a rank window): collapsing keeps exactly one and
    needs NO window — the winner is a plain min-aggregate over
    ``struct(-score_micro, doc_id)``, so the partial aggregate absorbs
    per-group candidates map-side before the shuffle (a row_number
    window has no combiner).  At 100 TB that is one bounded shuffle of
    group keys; the final top-k is a TakeOrderedAndProject.
    """
    winners = (scored.join(keys.select("doc_id", key_col), "doc_id")
               .groupBy(key_col)
               .agg(F.min(F.struct(
                   (-F.col("score_micro")).alias("neg_score"),
                   F.col("doc_id"))).alias("w"))
               .select(F.col(key_col),
                       F.col("w.doc_id").alias("doc_id"),
                       (-F.col("w.neg_score")).cast("long")
                       .alias("score_micro")))
    return winners.orderBy(F.desc("score_micro"), F.asc("doc_id")).limit(k)
