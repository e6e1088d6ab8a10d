"""Pseudo-relevance feedback (RM3-style query expansion).

The reference engine scores exactly the literal query bag
(QueryParser.java:141-174) — no expansion.  Classic PRF closes the
vocabulary-mismatch gap: retrieve top-n feedback docs, mine the terms
that characterize them, re-run the query with those terms mixed in
(Lavrenko & Croft relevance models; the RM3 interpolation).

Determinism contract: every cross-engine-visible float is quantized to
micro-units before it participates in a *selection* (feedback-doc set,
expansion-term set), exactly like the driver gates — so an ANSI-SQL
oracle reproduces the same expansion and the same final ranking
bit-for-bit.  Weights:

  feedback docs  d: rel(d)  = round(1e6 * BM25(q, d))         (top n_fb)
  expansion term t: w(t)    = round(1e6 * sum_d tf_td / len_d
                                            * rel(d) / 1e6)   (top n_exp,
                              original query terms excluded)
  final bag:        alpha * qtf(t)            for original terms
                    (1 - alpha) * w(t)/max(w) for expansion terms

Scale shape: the feedback pass is one ordinary top-k query; the
expansion mine touches only the n_fb feedback docs' posting rows
(docinfo ⋈ broadcast(fb), postings ⋈ broadcast(that)) — no extra
corpus sweep; the final pass is one ordinary weighted query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import parse_query
from .build import DataFrameIndex
from .query import search, search_weighted


def rm3_expansion_terms(spark: SparkSession, index: DataFrameIndex,
                        query: str, n_fb: int = 10, n_exp: int = 5,
                        k1: float = 1.2, b: float = 0.75
                        ) -> list[tuple[str, int]]:
    """Mine the top-``n_exp`` expansion terms for ``query`` from its
    top-``n_fb`` BM25 feedback docs -> [(term, w_micro)], ranked by
    (w_micro DESC, term ASC).  Driver-side result: n_exp is tiny by
    construction (a query bag, not data)."""
    orig = sorted(parse_query(query))
    if not orig:
        return []
    raw = search(spark, index, query, k=n_fb * 5, mode="bm25", k1=k1, b=b)
    fb = (
        raw.select(
            "doc_id",
            F.round(F.col("score") * 1000000.0).cast("long")
            .alias("score_micro"))
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(n_fb)
    )
    fbinfo = index.docinfo.join(F.broadcast(fb), "doc_id").select(
        "doc_id", "doc_len", "score_micro")
    mined = (
        index.postings.join(F.broadcast(fbinfo), "doc_id")
        .filter(~F.col("term").isin(orig))
        .groupBy("term")
        .agg(
            F.round(F.lit(1000000.0) * F.sum(
                F.col("tf").cast("double") / F.col("doc_len")
                * F.col("score_micro") / F.lit(1000000.0)))
            .cast("long").alias("w_micro"))
        .filter(F.col("w_micro") > 0)
        .orderBy(F.desc("w_micro"), F.asc("term"))
        .limit(n_exp)
    )
    return [(r["term"], r["w_micro"]) for r in mined.collect()]


def search_rm3(spark: SparkSession, index: DataFrameIndex, query: str,
               k: int = 5, n_fb: int = 10, n_exp: int = 5,
               alpha: float = 0.6, k1: float = 1.2, b: float = 0.75
               ) -> DataFrame:
    """RM3 retrieval: expand ``query`` from its own top-``n_fb`` docs,
    score the interpolated bag -> (doc_id, score), k rows ordered."""
    bag = parse_query(query)
    if not bag:
        return spark.createDataFrame([], "doc_id long, score double")
    exp = rm3_expansion_terms(spark, index, query, n_fb=n_fb, n_exp=n_exp,
                              k1=k1, b=b)
    weights = {t: alpha * tf for t, tf in bag.items()}
    if exp:
        max_w = max(w for _, w in exp)
        weights.update(
            {t: (1.0 - alpha) * w / max_w for t, w in exp})
    return search_weighted(spark, index, weights, k=k, mode="bm25",
                           k1=k1, b=b)


def mlt_query_terms(spark: SparkSession, index: DataFrameIndex,
                    doc_id: int, n_terms: int = 5) -> list[str]:
    """Top-``n_terms`` tf-idf terms of one document — the
    More-Like-This query bag (Lucene MLT; the reference engine has no
    document-as-query facility).  Selection is on micro-quantized
    weights w = round(1e6 * tf * ln(N/df)) with (w DESC, term ASC)
    tie-break, so an ANSI-SQL oracle reproduces the exact term set.

    Scale shape: one bucket-pruned postings lookup for the source
    doc's rows (a doc has bounded vocabulary) joined to the dictionary
    — no corpus sweep; the driver receives only n_terms strings."""
    rows = (
        index.postings.filter(F.col("doc_id") == doc_id)
        .join(index.dictionary.select("term", "df"), "term")
        .select(
            "term",
            F.round(F.lit(1000000.0) * F.col("tf")
                    * F.log(F.lit(float(index.n_docs)) / F.col("df")))
            .cast("long").alias("w_micro"))
        .filter(F.col("w_micro") > 0)
        .orderBy(F.desc("w_micro"), F.asc("term"))
        .limit(n_terms)
        .collect()
    )
    return [r["term"] for r in rows]


def search_more_like_this(spark: SparkSession, index: DataFrameIndex,
                          doc_id: int, k: int = 5, n_terms: int = 5,
                          k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """More-Like-This: retrieve the docs most similar to ``doc_id`` by
    running its top tf-idf terms as a unit-weight BM25 query, the
    source doc itself excluded -> (doc_id, score), k rows ordered."""
    terms = mlt_query_terms(spark, index, doc_id, n_terms=n_terms)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    scores = search_weighted(spark, index, {t: 1.0 for t in terms},
                             k=None, mode="bm25", k1=k1, b=b)
    return (scores.filter(F.col("doc_id") != doc_id)
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def clarity_score(spark: SparkSession, index: DataFrameIndex, query: str,
                  *, n_fb: int = 10, k1: float = 1.2, b: float = 0.75
                  ) -> DataFrame:
    """Query clarity — pre-retrieval-quality prediction (Cronen-
    Townsend, Zhou & Croft, SIGIR 2002): the KL divergence between the
    query's relevance language model and the collection language model,

        clarity(Q) = sum_w P(w|R) * ln( P(w|R) / P_coll(w) )

    High clarity = the feedback docs speak a vocabulary distinct from
    the collection background (an unambiguous query); clarity near 0 =
    the query's result set looks like random background (likely to
    perform poorly).  The standard IR query-performance predictor; the
    reference engine has no analogue (it always executes the query).

    Determinism contract (the RM3 convention, see module docstring):
    every value that crosses engines is an integer —

      rel_micro(d)  = round(1e6 * BM25(q, d))            (fb selection)
      w_micro(t)    = round(1e6 * sum_d tf/len * rel_micro/1e6)  (RM1)
      W             = sum_t w_micro(t)                   (BIGINT sum)
      P(w|R)        = w_micro / W;   P_coll(w) = cf_w / C
      clarity_micro = sum_t round(1e6 * (w/W) * ln((w*C)/(W*cf_w)))

    The outer sum adds BIGINTs, so engine summation order cannot move
    the result.  Every model term has cf > 0 (it occurs in a fb doc),
    so the log is always finite.

    Returns one row (clarity_micro BIGINT, n_model_terms BIGINT), or
    zero rows for an empty/stopword-only query.

    Scale shape: one ordinary top-n_fb query, then the RM1 mine
    touches only the fb docs' posting rows (broadcast semi-join — no
    corpus sweep); dictionary join is term-keyed on those few hundred
    model terms; C and W are one-row aggregates broadcast into the
    final projection.  Nothing is corpus-wide but the initial
    retrieval."""
    out_schema = "clarity_micro long, n_model_terms long"
    if not parse_query(query):
        return spark.createDataFrame([], out_schema)
    raw = search(spark, index, query, k=n_fb * 5, mode="bm25", k1=k1, b=b)
    fb = (
        raw.select(
            "doc_id",
            F.round(F.col("score") * 1000000.0).cast("long")
            .alias("score_micro"))
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(n_fb)
    )
    fbinfo = index.docinfo.join(F.broadcast(fb), "doc_id").select(
        "doc_id", "doc_len", "score_micro")
    model = (
        index.postings.join(F.broadcast(fbinfo), "doc_id")
        .groupBy("term")
        .agg(
            F.round(F.lit(1000000.0) * F.sum(
                F.col("tf").cast("double") / F.col("doc_len")
                * F.col("score_micro") / F.lit(1000000.0)))
            .cast("long").alias("w_micro"))
        .filter(F.col("w_micro") > 0)
    )
    total_w = model.agg(F.sum("w_micro").cast("double").alias("w_total"))
    total_c = index.dictionary.agg(
        F.sum("cf").cast("double").alias("c_total"))
    contrib = (
        model.join(index.dictionary.select("term", "cf"), "term")
        .crossJoin(F.broadcast(total_w))
        .crossJoin(F.broadcast(total_c))
        .select(
            F.round(F.lit(1000000.0)
                    * (F.col("w_micro") / F.col("w_total"))
                    * F.log((F.col("w_micro") * F.col("c_total"))
                            / (F.col("w_total") * F.col("cf"))))
            .cast("long").alias("contrib_micro"))
    )
    return contrib.agg(
        F.sum("contrib_micro").cast("long").alias("clarity_micro"),
        F.count(F.lit(1)).cast("long").alias("n_model_terms"),
    ).filter(F.col("n_model_terms") > 0)  # no-match query -> no rows


def search_selective_prf(spark: SparkSession, index: DataFrameIndex,
                         query: str, *, clarity_threshold_micro: int,
                         k: int = 5, n_fb: int = 10, n_exp: int = 5,
                         alpha: float = 0.6, k1: float = 1.2,
                         b: float = 0.75) -> tuple[DataFrame, bool]:
    """Selective pseudo-relevance feedback — expand ONLY when the query
    needs it.  PRF helps ambiguous queries and HURTS clear ones (query
    drift), which is exactly what the clarity score predicts
    (Cronen-Townsend et al. 2002 propose clarity as the expansion
    gate; also Amati's "query difficulty" line of work).  Decision:

        expand  iff  clarity_micro(query) < clarity_threshold_micro

    (low clarity = the query's result set looks like collection
    background = vocabulary mismatch likely).  A query whose clarity is
    undefined (no matching docs at all) runs unexpanded — there are no
    feedback docs to mine anyway.

    Returns ``(results, expanded)``: the (doc_id, score) top-k of
    either `search_rm3` or plain BM25, plus the decision taken.  The
    decision is one integer comparison on the driver; both branches
    are the ordinary plans.  Deterministic across engines because
    clarity_micro is a BIGINT (see clarity_score)."""
    row = clarity_score(spark, index, query, n_fb=n_fb, k1=k1,
                        b=b).collect()
    expand = bool(row) and int(row[0]["clarity_micro"]) \
        < int(clarity_threshold_micro)
    if expand:
        res = search_rm3(spark, index, query, k=k, n_fb=n_fb,
                         n_exp=n_exp, alpha=alpha, k1=k1, b=b)
    else:
        res = search(spark, index, query, k=k, mode="bm25", k1=k1, b=b)
    return res, expand


def rocchio_weights(spark: SparkSession, index: DataFrameIndex,
                    query: str, n_fb: int = 10, n_exp: int = 5,
                    alpha: float = 1.0, beta: float = 0.75
                    ) -> dict[str, float]:
    """Pseudo-feedback Rocchio (IIR §9.1.1, gamma=0) in the reference's
    W2 vector space — the vector-model complement of the LM-flavored
    RM3 above: q' = alpha*q + beta*centroid(top-n_fb doc vectors),
    keeping the top-``n_exp`` NEW terms of the centroid plus every
    original term's centroid component.

    Same determinism contract as RM3: the feedback-doc selection and
    the centroid components are micro-quantized before any selection
    or weighting, so the SQL oracle reproduces the expanded bag and
    the final cosine ranking bit-for-bit.

    Scale shape: feedback pass = one ordinary cosine top-k; the
    centroid touches only the n_fb docs' posting rows (broadcast
    semi-join, no corpus sweep); returned bag is O(|q| + n_exp).
    """
    from .query import doc_weight_expr, query_weights

    orig_w, _ = query_weights(index, query, "w2")
    if not orig_w:
        return {}
    orig = sorted(orig_w)
    raw = search(spark, index, query, k=n_fb * 5, mode="w2")
    # collect the (tiny) feedback set: the centroid is the mean over
    # the docs ACTUALLY retrieved |Dr|, not the requested n_fb — a
    # sparse query matching 3 docs must not scale its centroid by 3/10
    fb_ids = [r["doc_id"] for r in
              (raw.select(
                  "doc_id",
                  F.round(F.col("score") * 1000000.0).cast("long")
                  .alias("score_micro"))
               .orderBy(F.desc("score_micro"), F.asc("doc_id"))
               .limit(n_fb).select("doc_id").collect())]
    if not fb_ids:
        return {t: alpha * w for t, w in orig_w.items()}
    n_dr = len(fb_ids)
    fb = spark.createDataFrame([(int(i),) for i in fb_ids], "doc_id long")
    w_td = doc_weight_expr("w2", index.n_docs, index.avg_doc_len)
    comp = (index.postings
            .join(F.broadcast(fb), "doc_id")
            .join(index.dictionary.select("term", "df"), "term")
            .join(index.docinfo, "doc_id")
            .groupBy("term")
            .agg(F.round(F.lit(1000000.0) * F.sum(w_td) / F.lit(n_dr))
                 .cast("long").alias("c_micro"))
            .filter(F.col("c_micro") > 0))
    exp = (comp.filter(~F.col("term").isin(orig))
           .orderBy(F.desc("c_micro"), F.asc("term"))
           .limit(n_exp).collect())
    oc = {r["term"]: r["c_micro"]
          for r in comp.filter(F.col("term").isin(orig)).collect()}
    weights = {t: alpha * w + beta * oc.get(t, 0) / 1000000.0
               for t, w in orig_w.items()}
    weights.update({r["term"]: beta * r["c_micro"] / 1000000.0
                    for r in exp})
    return weights


def search_rocchio(spark: SparkSession, index: DataFrameIndex, query: str,
                   k: int = 5, n_fb: int = 10, n_exp: int = 5,
                   alpha: float = 1.0, beta: float = 0.75) -> DataFrame:
    """Rocchio retrieval: expand in W2 space, rescore the expanded bag
    with the same cosine model -> (doc_id, score), k rows ordered."""
    import math

    weights = rocchio_weights(spark, index, query, n_fb=n_fb, n_exp=n_exp,
                              alpha=alpha, beta=beta)
    if not weights:
        return spark.createDataFrame([], "doc_id long, score double")
    q_norm = math.sqrt(sum(w * w for w in weights.values()))
    return search_weighted(spark, index, weights, q_norm=q_norm, k=k,
                           mode="w2")


def qpp_wig_nqc(run: DataFrame, qterms: DataFrame, index: DataFrameIndex,
                *, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Post-retrieval query-performance prediction: WIG (Zhou & Croft,
    SIGIR 2007) and NQC (Shtok, Kurland, Carmel & Raiber, TOIS 2012)
    over a batched run — the standard estimate-before-you-trust signals
    a production engine attaches to every result page (selective PRF,
    fusion weighting, fallback triggers).  The reference engine always
    executes and returns the query unexamined; ``clarity_score`` above
    is the pre-retrieval member of this family.

        WIG(q) = (mean_{d in top-k} S(d) - S(D|q)) / sqrt(|q|)
        NQC(q) = std_{d in top-k} S(d) / S(D|q)

    where S(D|q) scores the COLLECTION as one mega-document whose term
    frequencies are the collection frequencies cf_t and whose length is
    N * avg_dl — so its BM25 length ratio is EXACTLY N and no float
    division of corpus totals enters the formula:

        S(D|q) = sum_t qtf_t * idf(t) * cf_t*(k1+1)
                              / (cf_t + k1*(1 - b + b*N))

    Determinism contract (the module convention): each per-term corpus
    partial is micro-quantized BEFORE summation, so S(D|q) is a BIGINT
    sum; the top-k statistics are exact BIGINT sums of the run's
    ``score_micro`` and its squares (variance via k*sum_sq - sum^2 in
    integer arithmetic); the two final predictor values are single
    double expressions over those exact integers, identical on both
    engines.

    Inputs: ``run`` (query_id, score_micro) already truncated to the
    top-k rows per query; ``qterms`` (query_id, term, qtf).  Queries
    none of whose terms appear in the dictionary drop out (no corpus
    model to compare against), as do queries whose corpus score rounds
    to zero micro (ultra-rare terms in a huge corpus — a 0 baseline
    would divide NQC by zero), and |q| counts dictionary terms only —
    unseen terms contribute to neither side of the WIG difference.
    Returns (query_id, k_used, n_terms, corpus_micro, wig_micro,
    nqc_nano).

    Scale shape: the corpus model touches |q| dictionary rows per query
    (broadcast join on term), the run statistics are one partial-agg
    groupBy over k rows per query — nothing corpus-wide at all; the
    expensive part is the retrieval that produced ``run``, which the
    caller already paid for."""
    # N is already a driver scalar on the index — re-deriving it with
    # a docinfo count-aggregate would add a corpus-wide job per call
    n_docs = F.lit(float(index.n_docs))
    corpus = (
        qterms.join(F.broadcast(index.dictionary.select("term", "df", "cf")),
                    "term")
        .withColumn("n_docs", n_docs)
        .select(
            "query_id", "qtf",
            F.round(
                F.lit(1000000.0)
                * F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5))
                * (F.col("cf") * F.lit(k1 + 1.0))
                / (F.col("cf") + F.lit(k1) * (F.lit(1.0 - b)
                                              + F.lit(b) * F.col("n_docs")))
                * F.col("qtf")).cast("long").alias("partial_micro"))
        .groupBy("query_id")
        .agg(F.sum("partial_micro").cast("long").alias("corpus_micro"),
             F.sum("qtf").cast("long").alias("n_terms"))
    )
    runagg = run.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.sum("score_micro").cast("long").alias("s_sum"),
        F.sum(F.col("score_micro") * F.col("score_micro")).cast("long")
        .alias("s_sumsq"),
    )
    return (
        runagg.join(corpus.filter(F.col("corpus_micro") > 0), "query_id")
        .select(
            "query_id", "k_used", "n_terms", "corpus_micro",
            F.round((F.col("s_sum").cast("double") / F.col("k_used")
                     - F.col("corpus_micro"))
                    / F.sqrt(F.col("n_terms").cast("double")))
            .cast("long").alias("wig_micro"),
            F.round(F.lit(1000000000.0)
                    * F.sqrt((F.col("k_used") * F.col("s_sumsq")
                              - F.col("s_sum") * F.col("s_sum"))
                             .cast("double"))
                    / (F.col("k_used") * F.col("corpus_micro")))
            .cast("long").alias("nqc_nano"),
        )
    )
