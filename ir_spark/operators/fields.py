"""Field-weighted retrieval (simplified BM25F).

Web pages are structured documents: a match in the <title> is worth
more than one in the body.  The reference engine scores a single flat
field (`QueryParser.java` scores one postings stream); real web search
weights fields.  This module implements the textbook "simple BM25F"
(Robertson & Zaragoza 2009, §6): per-field term frequencies are
combined into one weighted tf BEFORE the BM25 saturation curve,

    wtf(d, t)  = sum_f  w_f * tf_f(d, t)
    wdl(d)     = sum_f  w_f * len_f(d)
    score(d,q) = sum_t idf(t) * wtf*(k1+1) / (wtf + k1*(1-b+b*wdl/avgwdl)) * qtf

so a term's contribution saturates jointly across fields (summing
per-field BM25 scores — the common mistake — lets boilerplate body
matches re-earn the early-tf bonus).

Scale shape: one tokenize-kernel pass per field (cheap narrow maps
carve the field substrings first), one groupBy(doc_id, term) with
map-side combine to merge fields, then the same broadcast-terms join
plan as the flat BM25 path (`query.py::search_weighted`).  At 10^12
docs the field carve adds zero shuffles; the only wide exchange is
still the (doc_id, term) aggregation the flat build already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..text import STOPWORDS, tokenize
from . import build as B

DEFAULT_FIELD_WEIGHTS = {"title": 2.0, "body": 1.0}
DEFAULT_TITLE_TOKENS = 6


def split_title_body(docs: DataFrame,
                     title_tokens: int = DEFAULT_TITLE_TOKENS) -> DataFrame:
    """(doc_id, text) -> (doc_id, title, body): the first
    ``title_tokens`` whitespace tokens are the title field (the
    synthetic corpus derives titles the same way; for real pages the
    caller passes already-extracted fields instead)."""
    w = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(w, 1, title_tokens)).alias("title"),
        F.concat_ws(
            " ", F.expr(f"slice(split(text, ' '), {title_tokens + 1}, "
                        f"greatest(size(split(text, ' ')) - {title_tokens}, 0))")
        ).alias("body"),
    )


def _merged_from_relations(
        field_docs: dict[str, tuple[DataFrame, float]]) -> DataFrame:
    """(doc_id, term, wtf double) from arbitrary named field
    RELATIONS — each field its own (doc_id, text) DataFrame + weight
    (fields need not cover every doc: a doc missing from a field
    simply contributes no tokens there).  One real tokenize-kernel
    pass per field feeds one (doc_id, term) agg."""
    per_field = []
    for _fname, (fdf, w) in sorted(field_docs.items()):
        tc = B.token_counts(fdf.select("doc_id", "text"))
        per_field.append(tc.select(
            "doc_id", "term",
            (F.col("tf").cast("double") * F.lit(float(w))).alias("w_tf")))
    allf = per_field[0]
    for p in per_field[1:]:
        allf = allf.unionByName(p)
    return allf.groupBy("doc_id", "term").agg(F.sum("w_tf").alias("wtf"))


def _bm25f_merged(docs: DataFrame,
                  field_weights: dict[str, float] | None = None,
                  title_tokens: int = DEFAULT_TITLE_TOKENS) -> DataFrame:
    """(doc_id, term, wtf double): title/body carve of a flat text
    column merged with weights — the shared parent of both BM25F
    relations."""
    weights = field_weights or DEFAULT_FIELD_WEIGHTS
    fields = split_title_body(docs, title_tokens)
    return _merged_from_relations({
        fname: (fields.select("doc_id", F.col(fname).alias("text")), w)
        for fname, w in weights.items()})


def bm25f_postings(docs: DataFrame,
                   field_weights: dict[str, float] | None = None,
                   title_tokens: int = DEFAULT_TITLE_TOKENS,
                   ) -> tuple[DataFrame, DataFrame]:
    """Weighted postings + docinfo for BM25F.

    Returns (postings, docinfo):
      postings: (doc_id, term, wtf double) — stopwords removed;
      docinfo:  (doc_id, wdl double) — weighted length over ALL tokens
                (stopwords included, doc-length semantics D2).
    """
    merged = _bm25f_merged(docs, field_weights, title_tokens)
    docinfo = merged.groupBy("doc_id").agg(F.sum("wtf").alias("wdl"))
    postings = merged.where(~F.col("term").isin(sorted(STOPWORDS)))
    return postings, docinfo


def search_bm25f(
    spark: SparkSession,
    docs: DataFrame,
    query: str,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    field_weights: dict[str, float] | None = None,
    title_tokens: int = DEFAULT_TITLE_TOKENS,
) -> DataFrame:
    """BM25F top-k over (doc_id, text) docs -> (doc_id, score).

    Collection stats (N, avg wdl, df) come from the weighted relation.
    The two driver-side scalars (N, avg) are single-row aggregates —
    the query-term table broadcasts, as in the flat engine.  At index
    scale the postings here would be the materialized weighted
    relation; this function recomputes it inline for operator-level
    use (gates / tests / small corpora).
    """
    merged = _bm25f_merged(docs, field_weights, title_tokens)
    return _search_merged(spark, merged, query, k=k, k1=k1, b=b)


def search_bm25f_relations(
    spark: SparkSession,
    field_docs: dict[str, tuple[DataFrame, float]],
    query: str,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25F over arbitrary named field RELATIONS — e.g. body text
    from the pages table + incoming anchor text aggregated per target
    doc (the classic web-IR document-expansion setup: anchors describe
    the target and rank it for queries its own body never mentions).
    Same joint-saturation scoring as ``search_bm25f``."""
    merged = _merged_from_relations(field_docs)
    return _search_merged(spark, merged, query, k=k, k1=k1, b=b)


def _search_merged(spark: SparkSession, merged: DataFrame, query: str,
                   *, k: int, k1: float, b: float) -> DataFrame:
    from collections import Counter

    bag = Counter(t for t in tokenize(query) if t not in STOPWORDS)
    if not bag:  # before any Spark work or persist
        return spark.createDataFrame([], "doc_id long, score double")

    # persist the shared PARENT: both relations and the scoring job
    # read it, so the expensive Python tokenize pass runs exactly once
    merged = merged.persist()
    docinfo = merged.groupBy("doc_id").agg(F.sum("wtf").alias("wdl"))
    postings = merged.where(~F.col("term").isin(sorted(STOPWORDS)))
    n_docs, avg_wdl = docinfo.agg(
        F.count("*"), F.avg("wdl")).collect()[0]
    if n_docs == 0 or avg_wdl is None:
        # corpus produced no tokens at all: avg('wdl') is NULL and the
        # scoring plan below would crash on float(None); release the
        # persisted parent on this path too
        merged.unpersist()
        return spark.createDataFrame([], "doc_id long, score double")

    qterms = spark.createDataFrame(
        sorted(bag.items()), "term string, qtf long")

    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    wtf = F.col("wtf")
    denom = wtf + F.lit(k1) * (F.lit(1.0 - b)
                               + F.lit(b) * F.col("wdl") / F.lit(float(avg_wdl)))
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dictionary.join(qterms, "term").select("term", "df")),
              "term")
        .join(docinfo, "doc_id")
        .select(
            "doc_id",
            (idf * wtf * F.lit(k1 + 1.0) / denom
             * F.col("qtf").cast("double")).alias("partial"),
        )
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    out = scored.localCheckpoint(eager=True)
    merged.unpersist()
    return out


def search_dismax(spark: SparkSession, docs: DataFrame, query: str, *,
                  k: int = 10, k1: float = 1.2, b: float = 0.75,
                  tie: float = 0.0,
                  title_tokens: int = DEFAULT_TITLE_TOKENS) -> DataFrame:
    """Disjunction-max field retrieval (Lucene DisjunctionMaxQuery /
    the Elasticsearch ``multi_match type=best_fields`` default) ->
    (doc_id, score): each field is scored as its OWN BM25 index
    (per-field df, per-field doc count, per-field length norm) and a
    term's document contribution is

        dmax(t, d) = max_f s_f(t,d) + tie * sum_{f != argmax} s_f(t,d)

    summed over query terms (times qtf).  The semantic complement of
    ``search_bm25f``: BM25F saturates a term's tf JOINTLY across
    fields (best when fields are homogeneous text), dis_max takes the
    single best field per term (best when fields are alternative
    descriptions — title vs body vs anchors — and matching several
    should not multiply evidence).  ``tie`` in [0,1]; 0 = pure max
    (the ES default), 1 = plain per-field score sum.

    Scale shape: one tokenize pass per field (shared persisted
    parent), per-field stats are a 2-row broadcast, and scoring adds
    ONE extra partial-agg level — groupBy (doc_id, term) for the
    per-term max/sum — before the usual doc_id agg; both aggs combine
    map-side, so the only wide exchange is still keyed on doc_id
    grain.  No driver-side scalar collects at all (per-field N and
    avg length join in as columns).
    """
    from collections import Counter

    if not 0.0 <= tie <= 1.0:
        raise ValueError("tie must be in [0, 1]")
    bag = Counter(t for t in tokenize(query) if t not in STOPWORDS)
    if not bag:
        return spark.createDataFrame([], "doc_id long, score double")

    fields = split_title_body(docs, title_tokens)
    per_field = []
    for fname in ("title", "body"):
        tc = B.token_counts(
            fields.select("doc_id", F.col(fname).alias("text")))
        per_field.append(tc.select(
            "doc_id", F.lit(fname).alias("field"), "term",
            F.col("tf").cast("double").alias("tf")))
    rel = per_field[0].unionByName(per_field[1]).persist()

    fdocinfo = rel.groupBy("doc_id", "field").agg(
        F.sum("tf").alias("fdl"))
    fstats = fdocinfo.groupBy("field").agg(
        F.count("*").cast("double").alias("n_f"),
        F.avg("fdl").alias("avg_fdl"))
    fpost = rel.where(~F.col("term").isin(sorted(STOPWORDS)))
    fdict = fpost.groupBy("field", "term").agg(
        F.count("*").cast("double").alias("df"))
    qterms = spark.createDataFrame(
        sorted(bag.items()), "term string, qtf long")

    idf = F.log(F.lit(1.0)
                + (F.col("n_f") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf") + F.lit(k1)
             * (F.lit(1.0 - b)
                + F.lit(b) * F.col("fdl") / F.col("avg_fdl")))
    scored = (
        fpost.join(F.broadcast(qterms), "term")
        .join(F.broadcast(fdict.join(qterms.select("term"), "term")),
              ["field", "term"])
        .join(fdocinfo, ["doc_id", "field"])
        .join(F.broadcast(fstats), "field")
        .select("doc_id", "term", "qtf",
                (idf * F.col("tf") * F.lit(k1 + 1.0) / denom).alias("s"))
        .groupBy("doc_id", "term")
        .agg(F.max("s").alias("ms"), F.sum("s").alias("ss"),
             F.max("qtf").alias("qtf"))
        .select(
            "doc_id",
            ((F.col("ms") + F.lit(tie) * (F.col("ss") - F.col("ms")))
             * F.col("qtf").cast("double")).alias("dmax"))
        .groupBy("doc_id")
        .agg(F.sum("dmax").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    out = scored.localCheckpoint(eager=True)
    rel.unpersist()
    return out
