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
                   strategy: str = "auto", mu: float = 1000.0,
                   lam: float = 0.1, pl2_c: float = 1.0) -> DataFrame:
    """Two-phase federated top-k over document-partitioned shards ->
    (url, score), k rows ordered by (score DESC, url ASC).

    Rank- and score-identical to a single index over the union corpus
    (see module docstring for why k-per-shard gather is lossless).
    """
    if mode not in ("bm25", "qld", "lmjm", "pl2"):
        raise ValueError(
            "sharded search supports bm25 and the cf-statistics LM "
            "family (qld/lmjm/pl2); cosine norms are a shard-local "
            "build artifact (refresh against global stats first)")
    out_schema = "url string, score double"
    bag = parse_query(query, stem=stem)
    if not bag or not shards:
        return spark.createDataFrame([], out_schema)
    terms = sorted(bag)

    g = global_term_stats(shards, terms, with_cf=(mode != "bm25"))
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
            strategy=strategy, mu=mu, lam=lam, pl2_c=pl2_c,
            df_override=g["df"] if mode == "bm25" else None,
            cf_override=g.get("cf"), cf_total_override=g.get("cf_total"))
        doc_map = s._cached("doc_map")  # handle cached across queries
        #   (fresh read would re-list the file tree per query)
        # k-row result side broadcast: the shard's doc_map never shuffles
        part = (doc_map.select("doc_id", "url")
                .join(F.broadcast(local), "doc_id")
                .select("url", "score"))
        gathered = part if gathered is None else gathered.unionByName(part)

    # global gather: S*k candidate rows -> TakeOrderedAndProject
    return gathered.orderBy(F.desc("score"), F.asc("url")).limit(k)


def shard_upper_bound(shard: SegmentIndex, weights: dict[str, float],
                      g: dict, mode: str = "bm25", k1: float = 1.2,
                      b: float = 0.75) -> float:
    """Metadata-only upper bound on ANY document's score inside
    ``shard`` under the GLOBAL statistics ``g`` — the shard-granularity
    WAND bound.  Per query term: max over the shard's (term, run) rows
    of the max weight over the row's block (tf, doc_len) Pareto
    skyline (attained by a real posting, so tight), times the query
    weight; summed over terms.

    Cost: one bucket-pruned, term-pushdown scan reading only the
    skyline METADATA columns for the query's terms — O(|q| x runs)
    rows per shard, no postings decode.  Tombstones only shrink the
    attainable set, so the bound stays valid on indexes with deletes
    (same argument as the run-level WAND kernel).
    """
    import numpy as np

    from ..sources import storage
    from .segment_query import _np_doc_weight

    terms = sorted(weights)
    if not terms:
        return 0.0
    buckets = sorted({storage.term_bucket_py(t, shard.n_buckets)
                      for t in terms})
    rows = (shard.segments
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(terms))
            .select("term", "block_sky_tf", "block_sky_dl")
            .collect())
    ub = 0.0
    best: dict[str, float] = {}
    for r in rows:
        sky_tf = np.asarray(r["block_sky_tf"], dtype=np.int64)
        sky_dl = np.asarray(r["block_sky_dl"], dtype=np.int64)
        if not sky_tf.size:
            continue
        w = _np_doc_weight(mode, sky_tf, sky_dl, sky_tf,
                           g["df"].get(r["term"], 0), g["n_docs"],
                           g["avg_doc_len"], k1, b) * weights[r["term"]]
        m = float(w.max())
        if m > best.get(r["term"], 0.0):
            best[r["term"]] = m
    ub = sum(best.values())
    return ub


def search_sharded_pruned(spark: SparkSession, shards: list[SegmentIndex],
                          query: str, k: int = 5, k1: float = 1.2,
                          b: float = 0.75, stem: bool = False,
                          strategy: str = "auto",
                          info: dict | None = None,
                          wave: int = 4) -> DataFrame:
    """Federated BM25 top-k with SAFE shard pruning — distributed WAND
    at shard granularity.  Provably rank- and score-identical to
    ``search_sharded`` (and hence to the flat single index):

      1. phase 1 stats exchange (``global_term_stats``), as usual;
      2. per-shard upper bounds from skyline metadata
         (``shard_upper_bound``) — each bound dominates every document
         score its shard can produce under the global stats;
      3. shards are visited in DESCENDING bound order, ``wave`` at a
         time concurrently (their per-shard Spark jobs interleave as
         in the unpruned gather, so a one-box probe pays no
         serialization penalty); between waves the driver's candidate
         pool defines theta = current k-th best true score, and any
         remaining shard with ub < theta (strictly) is SKIPPED — all
         its documents score below k already-gathered candidates, and
         adding candidates only raises theta, so the skip is lossless
         for the final top-k including the url tie-break.

    At web scale this is the serving win: a query whose terms are
    concentrated in a few crawl batches touches only those shards'
    postings; the rest pay one metadata probe.  Per searched shard the
    driver materializes k (url, score) rows — bounded by S*k.

    BM25 only: QLD's per-absent-term document contributions make a
    per-shard max bound meaningless without scanning doc lengths.
    ``info`` (optional dict) receives {"bounds", "searched",
    "skipped"} for probes/tests.
    """
    out_schema = "url string, score double"
    bag = parse_query(query, stem=stem)
    if not bag or not shards:
        return spark.createDataFrame([], out_schema)
    terms = sorted(bag)

    g = global_term_stats(shards, terms)
    if g["n_docs"] == 0:
        return spark.createDataFrame([], out_schema)
    from .query import compute_query_weights

    weights, _ = compute_query_weights(bag, g["df"], g["n_docs"], "bm25")

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(shards), 16)) as pool:
        ubs = list(pool.map(
            lambda s: shard_upper_bound(s, weights, g, "bm25", k1, b),
            shards))
    order = sorted(range(len(shards)), key=lambda i: (-ubs[i], i))

    def visit(i: int) -> list[tuple[str, float]]:
        s = shards[i]
        gview = replace(s, n_docs=g["n_docs"], avg_doc_len=g["avg_doc_len"])
        object.__setattr__(gview, "_dfs", s._dfs)
        local = search_segments(
            spark, gview, query, k=k, mode="bm25", k1=k1, b=b, stem=stem,
            strategy=strategy, df_override=g["df"]).collect()
        if not local:
            return []
        ids = [int(r["doc_id"]) for r in local]
        doc_map = s._cached("doc_map")  # handle cached across queries
        #   (fresh read would re-list the file tree per query)
        urls = {int(r["doc_id"]): r["url"] for r in
                doc_map.filter(F.col("doc_id").isin(ids))
                .select("doc_id", "url").collect()}
        return [(urls[int(r["doc_id"])], float(r["score"])) for r in local]

    # bound-ordered WAVES: up to ``wave`` still-unpruned shards are
    # searched concurrently (their Spark jobs interleave exactly as in
    # the unpruned gather), theta refreshes between waves.  wave=1 is
    # the fully-sequential WAND visit (tightest theta, no parallelism);
    # wave>=S degenerates to the unpruned all-at-once gather with one
    # pre-filter.  Skips stay lossless: a shard is only dropped when
    # its bound is below the CURRENT k-th true score, which later
    # candidates can only raise.
    cands: list[tuple[str, float]] = []
    searched: list[int] = []
    skipped: list[int] = []
    pos = 0
    while pos < len(order):
        theta = (sorted((sc for _, sc in cands), reverse=True)[k - 1]
                 if len(cands) >= k else None)
        wave_ids: list[int] = []
        while pos < len(order) and len(wave_ids) < max(1, wave):
            i = order[pos]
            pos += 1
            if ubs[i] <= 0.0:
                # no query term occurs in this shard at all (df=0 for
                # every term): it cannot yield a candidate, skip before
                # any theta exists
                skipped.append(i)
                continue
            if theta is not None and ubs[i] < theta:
                skipped.append(i)
                continue
            wave_ids.append(i)
        if not wave_ids:
            continue
        with ThreadPoolExecutor(max_workers=len(wave_ids)) as pool:
            for i, res in zip(wave_ids, pool.map(visit, wave_ids)):
                cands.extend(res)
                searched.append(i)
    if info is not None:
        info.update(bounds=ubs, searched=searched, skipped=skipped)
    if not cands:
        return spark.createDataFrame([], out_schema)
    return (spark.createDataFrame(cands, out_schema)
            .orderBy(F.desc("score"), F.asc("url")).limit(k))


CORI_B = 0.4
CORI_DF_BASE = 50.0
CORI_DF_FACTOR = 150.0


def cori_shard_scores(shards: list[SegmentIndex], query: str, *,
                      b: float = CORI_B, stem: bool = False):
    """CORI resource selection (Callan, Lu & Croft SIGIR 1995) — rank
    SHARDS (collections) by how likely they are to hold relevant
    documents, from dictionary statistics alone:

        T(t, C_i) = df_i / (df_i + 50 + 150 * cw_i / avg_cw)
        I(t)      = ln((S + 0.5) / cf_t) / ln(S + 1.0)
        p(t|C_i)  = b + (1 - b) * T * I
        belief_i  = sum over live query terms of p(t|C_i)

    where cw_i is the shard's token mass (cf_total), cf_t the number
    of shards containing t, S the shard count.  This is the LOSSY
    complement of ``search_sharded_pruned``: WAND bounds are exact and
    per-query, CORI is the classical static selector when even a
    metadata probe per shard per query is too much — rank shards once
    from O(|q| x S) dictionary scalars and search only the top-R.

    Cost: per shard ONE bucket-pruned dictionary probe for the query's
    terms plus the cached cf_total scalar — a few hundred bytes per
    shard regardless of corpus size, the same exchange shape as
    phase 1 of ``search_sharded``.

    Determinism contract: per-(shard, term) beliefs are quantized to
    nano integers BEFORE summation, so the returned ``belief_nano`` is
    an exact integer reproducible in any accumulation order (the gate
    oracle recomputes it in SQL).  Returns a driver-built DataFrame
    (shard_id, belief_nano, n_terms, cw) — S rows, ordered by
    (belief_nano DESC, shard_id).
    """
    import math

    spark = shards[0].spark if shards else None
    bag = parse_query(query, stem=stem)
    schema = "shard_id int, belief_nano long, n_terms long, cw long"
    if not bag or not shards:
        raise ValueError("cori_shard_scores needs a non-empty query "
                         "and at least one shard")
    terms = sorted(bag)
    S = len(shards)
    dfs = [s.df_of(terms) for s in shards]
    cws = [s.cf_total() for s in shards]
    cf = {t: sum(1 for d in dfs if d.get(t, 0) > 0) for t in terms}
    live = [t for t in terms if cf[t] > 0]
    avg_cw = sum(cws) / float(S)
    rows = []
    for i in range(S):
        nano = 0
        for t in live:
            df_i = float(dfs[i].get(t, 0))
            t_belief = df_i / ((df_i + CORI_DF_BASE)
                               + CORI_DF_FACTOR * cws[i] / avg_cw)
            idf = math.log((S + 0.5) / cf[t]) / math.log(S + 1.0)
            p = b + (1.0 - b) * t_belief * idf
            # half-up like SQL ROUND (p is always positive), not
            # Python's banker's rounding
            nano += int(math.floor(p * 1e9 + 0.5))
        rows.append((i, nano, len(live), cws[i]))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(rows, schema)
