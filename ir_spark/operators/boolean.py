"""Boolean retrieval over the postings relation (beyond-reference).

The reference engine is ranked-only (QueryParser.java scores every
query as a weighted bag; there is no AND/OR/NOT path), but boolean
retrieval is the other half of a classic fulltext index and a common
pre-filter for ranked search, so the engine exposes it.

Shape at 100 TB: only the queried terms' posting rows ever move — the
term filter prunes the scan (term-bucketed store: bucket + row-group
pushdown, same as phrase search), then ONE groupBy(doc_id) over those
rows evaluates the whole boolean expression from a collected term-set
per candidate document.  NOT is evaluated against the same candidate
rows (a doc excluded by a must_not term necessarily contains it, so
its rows are in the filtered scan) — no full-corpus anti-join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boolean_search(postings: DataFrame,
                   must: Sequence[str] = (),
                   must_not: Sequence[str] = (),
                   should: Sequence[str] = (),
                   min_should: int = 1) -> DataFrame:
    """Evaluate (AND must...) AND NOT (any must_not) AND (>= min_should
    of should...) -> (doc_id, n_should) for matching documents.

    ``n_should`` is how many of the ``should`` terms matched (a cheap
    coordination signal callers can rank on).  With no ``should``
    terms the should-clause is vacuously true and n_should = 0.

    The plan: filter postings to the query vocabulary, one
    groupBy(doc_id) with conditional counts per clause — a single
    shuffle whose input is only the queried terms' postings.
    """
    must = sorted(set(must))
    must_not = sorted(set(must_not))
    should = sorted(set(should))
    if not must and not should:
        raise ValueError("need at least one positive (must/should) term")
    overlap = set(must) & set(must_not)
    if overlap:
        raise ValueError(f"terms both must and must_not: {sorted(overlap)}")
    vocab = sorted({*must, *must_not, *should})

    grouped = (
        postings.filter(F.col("term").isin(vocab))
        .groupBy("doc_id")
        .agg(
            F.count_distinct(
                F.when(F.col("term").isin(must) if must else F.lit(False),
                       F.col("term"))).alias("n_must"),
            F.count_distinct(
                F.when(F.col("term").isin(must_not) if must_not
                       else F.lit(False), F.col("term"))).alias("n_not"),
            F.count_distinct(
                F.when(F.col("term").isin(should) if should else F.lit(False),
                       F.col("term"))).alias("n_should"),
        )
    )
    cond = (F.col("n_must") == len(must)) & (F.col("n_not") == 0)
    if should:
        cond = cond & (F.col("n_should") >= min_should)
    return grouped.filter(cond).select(
        "doc_id", F.col("n_should").cast("int").alias("n_should"))


def facet_counts(postings, terms: list[str], facets,
                 facet_col: str) -> "DataFrame":
    """Search-results faceting: per-facet-value counts of the
    OR-semantics candidate set (docs matching >= 1 query term) — the
    sidebar counts a search front-end renders next to the top-k.

    ``facets`` is a (doc_id, <facet_col>) dimension table.  Plan:
    distinct candidate doc_ids from the term-pruned postings (one
    semi-ish aggregation), then one join + count per facet value.  The
    candidate relation is far smaller than the index; the join keys on
    doc_id and the final agg is facet-cardinality-sized.
    """
    from pyspark.sql import functions as F

    cands = (postings.filter(F.col("term").isin(list(terms)))
             .select("doc_id").distinct())
    return (cands.join(facets, "doc_id")
            .groupBy(facet_col)
            .agg(F.count("*").cast("long").alias("n_docs")))


def date_histogram(postings, terms: list[str], doc_ts,
                   epoch: str, interval_days: int = 7) -> "DataFrame":
    """Search-results date histogram: per-time-bucket counts of the
    OR-semantics candidate set over a (doc_id, ts) capture-time table
    (``warc_ts`` in the page schema) — the results-over-time facet a
    web-search front-end renders.

    Buckets are ``floor(datediff(ts, epoch) / interval_days)`` —
    integer day arithmetic only, so the bucketing is bit-reproducible
    across engines (calendar-aware truncation like date_trunc('week')
    differs in week-start conventions).  Same plan shape as
    facet_counts: candidate distinct + one join + a bucket-cardinality
    agg; returns (bucket, bucket_start_day, n_docs)."""
    from pyspark.sql import functions as F

    cands = (postings.filter(F.col("term").isin(list(terms)))
             .select("doc_id").distinct())
    bucket = F.floor(F.datediff(F.col("ts"), F.lit(epoch))
                     / F.lit(interval_days)).cast("long")
    return (cands.join(doc_ts.select("doc_id", "ts"), "doc_id")
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_docs"))
            .select("bucket",
                    (F.col("bucket") * interval_days).alias("bucket_start_day"),
                    "n_docs"))


def significant_terms(postings, dictionary, n_docs: int,
                      terms: list[str], k: int = 20,
                      exclude_query: bool = True) -> "DataFrame":
    """Significant-terms aggregation (the Elasticsearch
    ``significant_terms`` analogue): terms over-represented in the
    query's OR-candidate set relative to the whole corpus, scored with
    the JLH heuristic ``(fg_rate - bg_rate) * (fg_rate / bg_rate)``
    where fg_rate = fg_df / |candidates| and bg_rate = df / N.  Only
    terms with fg_rate > bg_rate qualify (positive lift); the query's
    own terms are excluded by default (they trivially dominate).

    Returns (term, fg_df, bg_df, score_micro) — the top ``k`` by
    (score DESC, term ASC).  score_micro is the micro-quantized JLH
    score; every arithmetic step is a fixed-shape IEEE double
    expression (two exact-integer divisions, one subtraction, one
    division, one product), so the value is bit-reproducible across
    engines.

    Shape at 100 TB: the candidate set is one distinct over the
    term-pruned postings scan (bucket + term pushdown); foreground
    term counts are ONE groupBy(term) over the candidates' postings
    (shuffle bounded by the candidate postings, combiner absorbs
    per-partition repeats); the dictionary join is vocabulary-sized;
    the final top-k is a TakeOrderedAndProject.  |candidates| and N
    are scalars.  Nothing touches non-candidate documents' rows except
    the already-aggregated dictionary.
    """
    qterms = sorted(set(terms))
    cands = (postings.filter(F.col("term").isin(qterms))
             .select("doc_id").distinct())
    fg_size = float(cands.count())
    if fg_size == 0:
        return dictionary.select(
            "term", F.lit(0).cast("long").alias("fg_df"),
            F.col("df").cast("long").alias("bg_df"),
            F.lit(0).cast("long").alias("score_micro")).limit(0)
    fg = (postings.join(cands, "doc_id")
          .groupBy("term")
          .agg(F.count("*").cast("long").alias("fg_df")))
    if exclude_query:
        fg = fg.filter(~F.col("term").isin(qterms))
    fg_rate = F.col("fg_df").cast("double") / F.lit(fg_size)
    bg_rate = F.col("df").cast("double") / F.lit(float(n_docs))
    jlh = (fg_rate - bg_rate) * (fg_rate / bg_rate)
    return (fg.join(dictionary.select("term", "df"), "term")
            .filter(fg_rate > bg_rate)
            .select("term", "fg_df",
                    F.col("df").cast("long").alias("bg_df"),
                    F.round(jlh * F.lit(1000000.0)).cast("long")
                    .alias("score_micro"))
            .orderBy(F.desc("score_micro"), F.asc("term"))
            .limit(k))


def parse_querybox(query: str) -> dict:
    """Web search-box query language -> clause lists:

        +term      must appear            -term      must not appear
        "a b c"    required exact phrase  -"a b c"   forbidden phrase
        term       scored (should)

    Every segment runs through the engine tokenizer; must/must_not/
    should drop stopwords (the parse_query convention), phrase
    segments keep them (phrases match the positional stream, which
    stores every token).  Returns {"must", "must_not", "should":
    [terms...], "phrases", "not_phrases": [[terms...], ...]} — pure
    and driver-side, shared verbatim by the SQL oracle generator."""
    import re

    from ..text import STOPWORDS, tokenize

    out = {"must": [], "must_not": [], "should": [],
           "phrases": [], "not_phrases": []}
    for m in re.finditer(r'([+-]?)"([^"]*)"|([+-]?)(\S+)', query):
        if m.group(2) is not None:
            toks = [t for t in tokenize(m.group(2))]
            if not toks:
                continue
            (out["not_phrases"] if m.group(1) == "-"
             else out["phrases"]).append(toks)
        else:
            toks = [t for t in tokenize(m.group(4)) if t not in STOPWORDS]
            key = {"+": "must", "-": "must_not"}.get(m.group(3), "should")
            out[key].extend(toks)
    return out


def search_querybox(spark, index, positions_rel: DataFrame, query: str, *,
                    k: int = 10, k1: float = 1.2, b: float = 0.75
                    ) -> DataFrame:
    """Execute a search-box query by COMPOSING the engine's existing
    operators — the user-facing query language over the same plans:

    - score: BM25 over the bag of all positive terms (should + must +
      non-stopword phrase words, multiplicity counted), the ordinary
      pruned broadcast-join plan (``search_weighted``);
    - ``+`` terms: ``boolean_search`` must-filter pushed in as the
      scorer's ``doc_filter`` (candidates shrink BEFORE scoring);
    - ``-`` terms: one anti-join against the term-pruned postings;
    - phrases: ``phrase_search`` over the positional relation, semi-
      join per required phrase, anti-join per forbidden one — each
      phrase decodes only its own terms' position rows.

    Returns (doc_id, score) top-k, (score DESC, doc_id) tie-break —
    the house contract."""
    from collections import Counter

    from ..text import STOPWORDS
    from .positions import phrase_search
    from .query import search_weighted

    spec = parse_querybox(query)
    bag = Counter(spec["must"] + spec["should"]
                  + [t for ph in spec["phrases"] for t in ph
                     if t not in STOPWORDS])
    if not bag and not spec["phrases"]:
        return spark.createDataFrame([], "doc_id long, score double")
    doc_filter = None
    if spec["must"]:
        doc_filter = boolean_search(
            index.postings, must=spec["must"]).select("doc_id")
    if bag:
        scored = search_weighted(
            spark, index, {t: float(n) for t, n in bag.items()}, k=None,
            mode="bm25", k1=k1, b=b, doc_filter=doc_filter)
    else:
        # an all-stopword phrase query ('"to be or not to be"') has no
        # BM25 signal but the positional store matches it by design:
        # rank by summed phrase_tf instead of returning nothing
        first = phrase_search(positions_rel, spec["phrases"][0]).select(
            "doc_id", F.col("phrase_tf").cast("double").alias("score"))
        for ph in spec["phrases"][1:]:
            nxt = phrase_search(positions_rel, ph).select(
                "doc_id", F.col("phrase_tf").cast("double").alias("s2"))
            first = (first.join(nxt, "doc_id")
                     .select("doc_id",
                             (F.col("score") + F.col("s2")).alias("score")))
        scored = first
        if doc_filter is not None:
            scored = scored.join(doc_filter, "doc_id", "left_semi")
    if bag and spec["phrases"]:
        # required phrases are MUST clauses: the result SET is the
        # phrase intersection; bag terms only rank.  Candidates must
        # therefore come from the phrase hits, not the scorer — a doc
        # matching an all-stopword required phrase ('"to be"') but no
        # scored term is a match with score 0, not a miss (the
        # bag-empty branch above already got this right).
        base = None
        for ph in spec["phrases"]:
            hits = phrase_search(positions_rel, ph).select("doc_id")
            base = hits if base is None \
                else base.join(hits, "doc_id", "left_semi")
        scored = (base.join(scored, "doc_id", "left")
                  .select("doc_id",
                          F.coalesce("score", F.lit(0.0)).alias("score")))
        if doc_filter is not None:  # scorer-pushed filter: re-apply to
            scored = scored.join(   # the phrase-only zero-score docs
                doc_filter, "doc_id", "left_semi")
    if spec["must_not"]:
        bad = (index.postings
               .filter(F.col("term").isin(sorted(set(spec["must_not"]))))
               .select("doc_id").distinct())
        scored = scored.join(bad, "doc_id", "left_anti")
    for ph in spec["not_phrases"]:
        hits = phrase_search(positions_rel, ph).select("doc_id")
        scored = scored.join(hits, "doc_id", "left_anti")
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
