"""Federated search over document-partitioned index shards with a
global-statistics exchange (the distributed-serving primitive).

At 100 TB one index directory is not how the corpus is served: the
documents are partitioned into S independent shards (by crawl batch,
host range, or time), each built as its own segment index
(operators/segments.py) with its own dense local doc-id space.  A
query must then rank across ALL shards — but BM25/QLD scores computed
with shard-LOCAL statistics are not comparable across shards (a term
rare in one shard and common in another gets different idf), the
classic distributed-IR pitfall that Elasticsearch exposes as
``dfs_query_then_fetch``.

``search_sharded`` runs the textbook two-phase protocol:

  1. **stats exchange** — per shard, probe df (and cf for QLD) for
     just the query's terms (bucket-pruned dictionary probes, O(|q|)
     rows per shard) plus the manifest scalars n_docs/avg_doc_len;
     sum them into the GLOBAL statistics.  This is the cheap phase: a
     few hundred bytes per shard regardless of corpus size — on a real
     cluster it is one round-trip to each shard's dictionary, never a
     data shuffle.
  2. **scatter/gather** — score every shard with the global stats
     injected (``search_segments(df_override=...)`` plus a
     ``dataclasses.replace``-d view carrying global N/avgDocLen), take
     each shard's LOCAL top-k, union the S*k candidate rows, and
     re-rank globally.

Correctness: with global statistics a document's score depends only on
its own (tf, doc_len) and the global constants, so it is IDENTICAL to
the score a single monolithic index would assign.  Every global top-k
doc therefore appears in its home shard's local top-k, which makes the
k-per-shard gather provably lossless — the invariant gate
``sharded_bm25_topk`` pins value-for-value against the flat single-
index oracle every round.

Results are keyed by ``url`` (the external id that is stable across
shards); local doc ids are shard-private and never leave this module.

Cosine modes are rejected: the build-time L2 norms bake shard-local
idf into the norm column, so comparability would need a
``refresh_norms`` pass against the global stats first.

Reference parity: the reference engine is single-node and has no
sharded serving path (its whole index is one process — pyindex/
query.py scores one local index); this operator is the Spark-first
scale-out of its query semantics (QueryParser.java weight formulas,
reproduced by compute_query_weights / the segment kernels).
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import parse_query
from .segment_query import SegmentIndex, search_segments
from .segments import index_paths


def global_term_stats(shards: list[SegmentIndex], terms: list[str],
                      *, with_cf: bool = False) -> dict:
    """Phase 1: sum per-shard statistics into the global view.

    Returns ``{"n_docs", "avg_doc_len", "df", ("cf", "cf_total")}``.
    Each shard contributes O(|terms|) dictionary-probe rows and two
    manifest scalars — the exchange is independent of corpus size.
    The per-shard probes are independent bucket-pruned jobs, so they
    are submitted CONCURRENTLY (Spark schedules concurrent actions
    from one driver fine); at S shards the exchange wall is the
    slowest single probe, not S probes end to end.
    """
    from concurrent.futures import ThreadPoolExecutor

    n_docs = sum(s.n_docs for s in shards)
    total_len = sum(s.n_docs * s.avg_doc_len for s in shards)

    def probe(s: SegmentIndex) -> tuple[dict, dict, int]:
        return (s.df_of(terms),
                s.cf_of(terms) if with_cf else {},
                s.cf_total() if with_cf else 0)

    with ThreadPoolExecutor(max_workers=min(len(shards), 16)) as pool:
        probed = list(pool.map(probe, shards))

    df: dict[str, int] = {}
    for sdf, _, _ in probed:
        for t, v in sdf.items():
            df[t] = df.get(t, 0) + v
    out = {
        "n_docs": n_docs,
        "avg_doc_len": (total_len / n_docs) if n_docs else 0.0,
        "df": df,
    }
    if with_cf:
        cf: dict[str, int] = {}
        for _, scf, _ in probed:
            for t, v in scf.items():
                cf[t] = cf.get(t, 0) + v
        out["cf"] = cf
        out["cf_total"] = float(sum(p[2] for p in probed))
    return out


def search_sharded(spark: SparkSession, shards: list[SegmentIndex],
                   query: str, k: int = 5, mode: str = "bm25",
                   k1: float = 1.2, b: float = 0.75, stem: bool = False,
                   strategy: str = "auto", mu: float = 1000.0) -> DataFrame:
    """Two-phase federated top-k over document-partitioned shards ->
    (url, score), k rows ordered by (score DESC, url ASC).

    Rank- and score-identical to a single index over the union corpus
    (see module docstring for why k-per-shard gather is lossless).
    """
    if mode not in ("bm25", "qld"):
        raise ValueError(
            "sharded search supports bm25/qld; cosine norms are a "
            "shard-local build artifact (refresh against global stats "
            "first)")
    out_schema = "url string, score double"
    bag = parse_query(query, stem=stem)
    if not bag or not shards:
        return spark.createDataFrame([], out_schema)
    terms = sorted(bag)

    g = global_term_stats(shards, terms, with_cf=(mode == "qld"))
    if g["n_docs"] == 0:
        return spark.createDataFrame([], out_schema)

    gathered = None
    for s in shards:
        gview = replace(s, n_docs=g["n_docs"], avg_doc_len=g["avg_doc_len"])
        # share the shard's cached DataFrame handles (file listings,
        # broadcast tombstones) — replace() resets the private cache
        object.__setattr__(gview, "_dfs", s._dfs)
        local = search_segments(
            spark, gview, query, k=k, mode=mode, k1=k1, b=b, stem=stem,
            strategy=strategy, mu=mu,
            df_override=g["df"] if mode == "bm25" else None,
            cf_override=g.get("cf"), cf_total_override=g.get("cf_total"))
        doc_map = spark.read.parquet(index_paths(s.index_dir)["doc_map"])
        # k-row result side broadcast: the shard's doc_map never shuffles
        part = (doc_map.select("doc_id", "url")
                .join(F.broadcast(local), "doc_id")
                .select("url", "score"))
        gathered = part if gathered is None else gathered.unionByName(part)

    # global gather: S*k candidate rows -> TakeOrderedAndProject
    return gathered.orderBy(F.desc("score"), F.asc("url")).limit(k)
