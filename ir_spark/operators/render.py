"""Per-query result rendering with query/document sparse vectors
(SURVEY S8/W5; reference Driver.java:83-105 writeSearchResults +
QueryParser.java:209-233 getVectors + SparseVector.java:48-60
toString).

Reproduces the reference's human-facing result files::

    Query = <text>
    Rank = 1, filename = <external id>, score = <score>
    Headline = <headline>
    Query vector = [ (term, i)=w ... ]
    Document vector = [ (term, i)=w ... ]
    ------------------------------------------------------------------------

Vector semantics match getVectors: the label universe is the sorted
union of ALL dictionary terms and the query terms; ``i`` is the term's
position in that sorted universe; only strictly-positive entries are
printed (SparseVector.put drops zeros), ordered by index.  The query
entry weight is the W3 query weight, the document entry weight is the
un-normalized per-term doc weight (getTFWeighted).

Scale shape: the top-k docs' postings are fetched with one
broadcast-joined scan and weighted by the Catalyst weight expr; term
positions come from one aggregation (count of dictionary terms sorted
before each needed term) — no full-vocabulary materialization on the
driver, so the renderer works unchanged over a 10^9-term dictionary.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import parse_query
from .query import compute_query_weights, doc_weight_expr
from .segment_query import SegmentIndex, search_segments
from .segments import decode_segments, index_paths

RULE = "-" * 72


def _fmt(vec: list[tuple[str, int, float]]) -> str:
    """SparseVector.toString: ``[ (label, i)=w ... ]``, index order."""
    parts = [f"({t}, {i})={w}" for t, i, w in sorted(vec, key=lambda x: x[1])]
    return "[ " + "".join(p + " " for p in parts) + "]"


def _term_positions(dictionary: DataFrame, query_terms: list[str],
                    needed: list[str]) -> dict[str, int]:
    """Position of each needed term in the sorted union of (all
    dictionary terms + query terms) — computed as a distributed count
    of dictionary terms ordering before each needed term (broadcast
    join + agg: one job, O(|needed|) driver rows) plus a driver-side
    correction for query terms absent from the dictionary."""
    spark = dictionary.sparkSession
    dict_terms = dictionary.select("term").distinct()
    need_df = spark.createDataFrame([(t,) for t in needed], "t string")
    below = (
        dict_terms.join(F.broadcast(need_df), F.col("term") < F.col("t"))
        .groupBy("t").agg(F.count("*").alias("n_below"))
    )
    counts = {r["t"]: int(r["n_below"]) for r in below.collect()}
    # query terms not in the dictionary still occupy label slots —
    # membership must be checked for ALL query terms (not just the
    # needed ones), else an in-dictionary query term outside ``needed``
    # gets double-counted as an extra slot
    qdf = spark.createDataFrame(
        [(t,) for t in sorted(set(query_terms))], "term string")
    in_dict = {
        r["term"]
        for r in dict_terms.join(F.broadcast(qdf), "term").collect()
    }
    extra = sorted(t for t in set(query_terms) if t not in in_dict)
    pos = {}
    for t in needed:
        pos[t] = counts.get(t, 0) + sum(1 for e in extra if e < t)
    return pos


def render_search_results(
    spark: SparkSession,
    index_dir: str,
    query: str,
    *,
    k: int = 5,
    mode: str = "w1",
    k1: float = 1.2,
    b: float = 0.75,
    stem: bool = False,
    strategy: str = "auto",
    documents: DataFrame | None = None,
    headline_chars: int = 60,
) -> str:
    """Render one query's top-k in the reference's file format.

    ``documents``: optional (url, text) DataFrame for headlines (the
    reference re-reads the source doc's title; our corpus analogue is
    the first ``headline_chars`` of the page text, newlines
    flattened).  Omitted -> empty headlines.
    """
    sidx = SegmentIndex.load(spark, index_dir)
    top = search_segments(spark, sidx, query, k=k, mode=mode, k1=k1, b=b,
                          stem=stem, strategy=strategy).collect()
    lines = [f"Query = {query}"]
    if not top:
        return "\n".join(lines) + "\n"
    doc_ids = [int(r["doc_id"]) for r in top]

    paths = index_paths(index_dir)
    doc_map = spark.read.parquet(paths["doc_map"])
    id_url = {
        int(r["doc_id"]): r["url"] for r in
        doc_map.filter(F.col("doc_id").isin(doc_ids)).collect()
    }
    headlines: dict[int, str] = {}
    if documents is not None:
        rows = (
            doc_map.filter(F.col("doc_id").isin(doc_ids))
            .join(documents.select("url", "text"), "url")
            .select("doc_id", F.substring("text", 1, headline_chars)
                    .alias("h")).collect()
        )
        headlines = {
            int(r["doc_id"]): r["h"].replace("\n", " ").strip() for r in rows
        }

    # postings of the top-k docs, engine-weighted (getTFWeighted)
    if os.path.isdir(paths["postings"]):
        postings = spark.read.parquet(paths["postings"])
    else:
        postings = decode_segments(spark.read.parquet(paths["segments"]))
    dictionary = (spark.read.parquet(paths["dictionary"])
                  .groupBy("term").agg(F.sum("df").alias("df")))
    w_td = doc_weight_expr(mode, sidx.n_docs, sidx.avg_doc_len, k1, b)
    # k docs' postings are tiny — broadcast them INTO the dictionary
    # scan (never the reverse: the dictionary is the big side at scale)
    top_postings = postings.filter(F.col("doc_id").isin(doc_ids))
    doc_rows = (
        dictionary.join(F.broadcast(top_postings), "term")
        .select("doc_id", "term", w_td.alias("w"))
        .filter(F.col("w") > 0)
        .collect()
    )
    doc_vecs: dict[int, list[tuple[str, float]]] = {}
    for r in doc_rows:
        doc_vecs.setdefault(int(r["doc_id"]), []).append(
            (r["term"], float(r["w"])))

    bag = parse_query(query, stem=stem)
    q_terms = sorted(bag)
    dfs = sidx.df_of(q_terms)
    q_weights, _ = compute_query_weights(bag, dfs, sidx.n_docs,
                                         mode if mode != "bm25" else "w1")
    q_vec = [(t, w) for t, w in q_weights.items() if w > 0]

    needed = sorted({t for t, _ in q_vec}
                    | {t for v in doc_vecs.values() for t, _ in v})
    pos = _term_positions(spark.read.parquet(paths["dictionary"]),
                          q_terms, needed)

    q_rendered = _fmt([(t, pos[t], w) for t, w in q_vec])
    for rank, row in enumerate(top, start=1):
        d = int(row["doc_id"])
        lines.append(
            f"Rank = {rank}, filename = {id_url.get(d, d)}, "
            f"score = {float(row['score'])}")
        lines.append(f"Headline = {headlines.get(d, '')}")
        lines.append(f"Query vector = {q_rendered}")
        lines.append("Document vector = " + _fmt(
            [(t, pos[t], w) for t, w in doc_vecs.get(d, [])]))
        lines.append(RULE)
    return "\n".join(lines) + "\n"


def render_trec_run(results: DataFrame, *, query_id: str,
                    run_tag: str = "ir_spark",
                    doc_map: DataFrame | None = None) -> list[str]:
    """Render a ranking as TREC run-file lines — the standard IR
    interchange format every evaluation toolkit (trec_eval, pytrec-
    eval, ir-measures) consumes::

        qid Q0 docno rank score tag

    ``results``: (doc_id, score), ALREADY ordered (any search()'s
    output).  ``doc_map``: optional (doc_id, url) to emit external
    document names; without it docno is ``doc%08d`` (the engine's S10
    external-id convention).  Rank is 1-based in result order, the
    engine's (score DESC, doc_id ASC) total order — exactly what
    trec_eval expects, no re-sorting.  Driver-side over the k-row
    result (a run file is human-scale output, not a data path)."""
    rows = results.collect()
    names: dict[int, str] = {}
    if doc_map is not None:
        ids = [int(r["doc_id"]) for r in rows]
        names = {int(r["doc_id"]): r["url"] for r in
                 doc_map.filter(F.col("doc_id").isin(ids)).collect()}
    out = []
    for rank, r in enumerate(rows, start=1):
        docno = names.get(int(r["doc_id"]), f"doc{int(r['doc_id']):08d}")
        out.append(f"{query_id} Q0 {docno} {rank} "
                   f"{float(r['score']):.6f} {run_tag}")
    return out
