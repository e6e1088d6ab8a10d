"""Top-k retrieval over the compressed segment index (SURVEY E3 at
scale; K1, J1, block-max WAND §4.2).

Query plan:

  1. driver: tokenize query, look up per-term df (broadcast-size
     dictionary probe), compute w_tq scalars.
  2. ``segments`` scan pruned TWICE: partition pruning on
     ``bucket IN (md5-buckets of query terms)`` (directory level) +
     row-group stats on ``term`` (rows sorted by term within files).
  3. per-run DAAT scoring: all query terms of one doc-range run are
     co-partitioned by construction (operators/segments.py), so
     ``groupBy(run).applyInPandas`` scores documents with a dense
     numpy accumulator and emits only the run-local top-k — NO doc_id
     shuffle, candidate traffic is k rows per run.
  4. global merge: orderBy(score desc, doc_id asc).limit(k) over
     (runs x k) rows — TakeOrderedAndProject.

``strategy="wand"`` (bm25): block-max pruning.  A metadata-only pass
(Parquet column pruning: posting byte columns are NOT read) computes
per-run upper bounds from block_max_tf/block_min_doc_len; the best run
is scored driver-side to seed the threshold theta; runs whose bound is
< theta are never read, and within surviving runs blocks with
ub_block + sum(other terms' run bounds) < theta are skipped before
scoring.  Pruning is provably result-identical: only bounds strictly
below theta are skipped and theta is a true lower bound on the final
kth score (ties kept).  Verified against exhaustive on every test
query (SURVEY §5.2.4).

Cosine modes (w1/w2) use the exhaustive path + the build-time norms
table (normalization is not monotone per-term, so WAND bounds don't
apply; the reference's own cosine model predates WAND).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import codec
from ..oracle import parse_query
from ..sources import storage
from .query import compute_query_weights, doc_weight_expr
from .segments import index_paths

SCORE_SCHEMA = "doc_id long, score double"


@dataclass
class SegmentIndex:
    spark: SparkSession
    index_dir: str
    n_docs: int
    avg_doc_len: float
    n_buckets: int
    range_width: int

    @classmethod
    def load(cls, spark: SparkSession, index_dir: str) -> "SegmentIndex":
        manifests = storage.read_manifests(index_dir)
        stats = manifests["stats"]["metrics"]
        lineage = manifests["stats"]["lineage"]
        return cls(
            spark=spark,
            index_dir=index_dir,
            n_docs=int(stats["n_docs"]),
            avg_doc_len=float(stats["avg_doc_len"]),
            n_buckets=int(lineage["n_buckets"]),
            range_width=int(lineage["range_width"]),
        )

    # DataFrame handles are cached: spark.read.parquet lists the file
    # tree at analysis time, and per-query re-listing dominates small-
    # query latency.  A handle stays valid for appended files only after
    # re-load; callers that mutate the index make a fresh SegmentIndex.
    _dfs: dict = None

    def _cached(self, name: str) -> DataFrame:
        if self._dfs is None:
            object.__setattr__(self, "_dfs", {})
        if name not in self._dfs:
            self._dfs[name] = self.spark.read.parquet(
                index_paths(self.index_dir)[name])
        return self._dfs[name]

    @property
    def segments(self) -> DataFrame:
        return self._cached("segments")

    @property
    def dictionary(self) -> DataFrame:
        return self._cached("dictionary")

    @property
    def norms(self) -> DataFrame:
        return self._cached("norms")

    # vocabularies up to this size are pulled to the driver once and
    # probed locally (saves one Spark job per query); larger ones use
    # the pushdown-pruned scan per query (the cluster-scale path)
    LOCAL_DICT_MAX = 2_000_000

    def df_of(self, terms: list[str]) -> dict[str, int]:
        if self._dfs is None:
            object.__setattr__(self, "_dfs", {})
        if "local_dict" not in self._dfs:
            # sum, not read: incremental appends (streaming/
            # incremental.py) store dictionary DELTA rows per batch —
            # df(term) is their sum
            agg = self.dictionary.groupBy("term").agg(
                F.sum("df").alias("df"))
            n_terms = agg.count()
            self._dfs["local_dict"] = (
                {r["term"]: int(r["df"]) for r in agg.collect()}
                if n_terms <= self.LOCAL_DICT_MAX else None)
        local = self._dfs["local_dict"]
        if local is not None:
            return {t: local[t] for t in terms if t in local}
        rows = (
            self.dictionary.filter(F.col("term").isin(terms))
            .groupBy("term").agg(F.sum("df").alias("df")).collect()
        )
        return {r["term"]: int(r["df"]) for r in rows}


# --- numpy weight kernels (must match oracle.py bit-for-bit) -----------------

def _np_doc_weight(mode: str, tf: np.ndarray, dl: np.ndarray, mtf: np.ndarray,
                   df: int, n_docs: int, avg_dl: float, k1: float, b: float
                   ) -> np.ndarray:
    tf = tf.astype(np.float64)
    if mode == "w1":
        if df == 0:
            return np.zeros_like(tf)
        idf = math.log(float(n_docs // df)) / math.log(n_docs)
        w = (0.4 + 0.6 * np.log(tf + 0.5) / np.log(mtf.astype(np.float64) + 1.0)) * idf
        return np.where((tf == 0) | (mtf == 0), 0.0, w)
    if mode == "w2":
        if df == 0:
            return np.zeros_like(tf)
        idf = math.log(float(n_docs // df)) / math.log(n_docs)
        dlf = dl.astype(np.float64)
        w = 0.4 + 0.6 * (tf / (tf + 0.5 + 1.5 * (dlf / avg_dl))) * idf
        return np.where((tf == 0) | (dl == 0), 0.0, w)
    if mode == "bm25":
        if df == 0:
            return np.zeros_like(tf)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        dlf = dl.astype(np.float64)
        return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dlf / avg_dl))
    raise ValueError(mode)


def _weight_upper_bound(mode: str, max_tf: float, min_dl: float, df: int,
                        n_docs: int, avg_dl: float, k1: float, b: float) -> float:
    """Upper bound on the doc-term weight inside a block: weights are
    non-decreasing in tf and non-increasing in doc_len for all modes."""
    one = np.asarray([max(max_tf, 1)], dtype=np.int64)
    dl = np.asarray([max(min_dl, 1)], dtype=np.int64)
    return float(
        _np_doc_weight(mode, one, dl, one, df, n_docs, avg_dl, k1, b)[0]
    )


def _make_run_kernel(weights: dict[str, float], dfs: dict[str, int], *,
                     mode: str, n_docs: int, avg_dl: float, k1: float,
                     b: float, range_width: int, top_k: int,
                     theta: float = 0.0, run_term_ub: dict | None = None):
    """applyInPandas kernel over one doc-range run: dense-accumulator
    TAAT scoring, optional block-max skipping, emit run-local top-k
    (or all candidates when top_k=0 for cosine modes)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        run = int(pdf["run"].iloc[0])
        base = run * range_width
        acc = np.zeros(range_width, dtype=np.float64)
        # OR-semantics candidate set: every doc containing >=1 query term
        # is scored, even when its score is exactly 0.0 (the D5 idf quirk
        # zeroes whole terms) — QueryParser.java:159-174
        touched = np.zeros(range_width, dtype=bool)
        # per-term run bounds for block skipping (wand only)
        ub_by_term = run_term_ub.get(run) if run_term_ub else None
        total_ub = sum(ub_by_term.values()) if ub_by_term else 0.0
        for row in pdf.itertuples(index=False):
            term = row.term
            # NB: zero-weight terms still define candidates (OR
            # semantics) — only skip terms absent from the query
            w_tq = weights.get(term)
            if w_tq is None:
                continue
            df_t = dfs.get(term, 0)
            ids = codec.delta_decode(row.doc_gaps_vb)
            tfs = codec.varbyte_decode(row.tfs_vb).astype(np.int64)
            dls = codec.varbyte_decode(row.doc_lens_vb).astype(np.int64)
            mtfs = codec.varbyte_decode(row.max_tfs_vb).astype(np.int64)
            if ub_by_term is not None and theta > 0.0:
                # block skip: ub of this block + best others < theta.
                # Per-block bound = max over the block's (tf, doc_len)
                # skyline — attained by a real posting, so tight.
                others = total_ub - ub_by_term.get(term, 0.0)
                sky_idx = np.asarray(row.block_sky_idx, dtype=np.int64)
                sky_tf = np.asarray(row.block_sky_tf, dtype=np.int64)
                sky_dl = np.asarray(row.block_sky_dl, dtype=np.int64)
                pair_w = _np_doc_weight(
                    mode, sky_tf, sky_dl, sky_tf, df_t, n_docs, avg_dl,
                    k1, b)
                n_blocks = len(row.block_last_doc_id)
                block_ub = np.full(n_blocks, -np.inf)
                np.maximum.at(block_ub, sky_idx, pair_w)
                block_ub = block_ub * w_tq
                keep_blocks = (block_ub + others) >= theta
                if not keep_blocks.all():
                    keep = np.repeat(keep_blocks, codec.BLOCK)[: ids.size]
                    ids, tfs, dls, mtfs = ids[keep], tfs[keep], dls[keep], mtfs[keep]
                    if ids.size == 0:
                        continue
            w_td = _np_doc_weight(mode, tfs, dls, mtfs, df_t, n_docs,
                                  avg_dl, k1, b)
            acc[ids - base] += w_td * w_tq
            touched[ids - base] = True
        idx = np.flatnonzero(touched)
        if idx.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"})
        scores = acc[idx]
        doc_ids = idx + base
        if top_k and idx.size > top_k:
            # exact top-k with (score desc, doc_id asc) tie-break
            order = np.lexsort((doc_ids, -scores))[:top_k]
            doc_ids, scores = doc_ids[order], scores[order]
        return pd.DataFrame({"doc_id": doc_ids.astype(np.int64),
                             "score": scores})

    return kernel


def _prune_runs(spark: SparkSession, hits: DataFrame,
                weights: dict[str, float], dfs: dict[str, int], *,
                mode: str, n_docs: int, avg_dl: float, k1: float, b: float,
                k: int, kernel_args: dict) -> tuple[float, list[int] | None, dict]:
    """Block-max metadata pass: per-run upper bounds, theta seed from the
    best run, surviving run list.  Only metadata columns are read."""
    w_tq_df = spark.createDataFrame(
        [(t, w, dfs.get(t, 0)) for t, w in weights.items()],
        "term string, w_tq double, df long",
    )
    meta = (
        hits.select("term", "run",
                    F.explode(F.arrays_zip("block_sky_tf", "block_sky_dl"))
                    .alias("blk"))
        .select("term", "run",
                F.col("blk.block_sky_tf").alias("tf"),
                F.col("blk.block_sky_dl").alias("doc_len"))
        .join(F.broadcast(w_tq_df), "term")
    )
    # reuse the Catalyst weight expr; max_tf := tf for the bound
    ub = doc_weight_expr(mode, n_docs, avg_dl, k1, b)
    ub = ub.alias("ub")
    meta = meta.withColumn("max_tf", F.col("tf")).select(
        "term", "run", (F.col("w_tq") * ub).alias("ub"))
    term_ub = meta.groupBy("run", "term").agg(F.max("ub").alias("t_ub"))
    rows = term_ub.collect()
    run_term_ub: dict[int, dict[str, float]] = {}
    for r in rows:
        run_term_ub.setdefault(int(r["run"]), {})[r["term"]] = float(r["t_ub"])
    if not run_term_ub:
        return 0.0, [], {}
    run_ub = {run: sum(d.values()) for run, d in run_term_ub.items()}
    best_run = max(run_ub, key=lambda r: (run_ub[r], -r))
    # score the best run driver-side to seed theta
    best_pdf = hits.filter(F.col("run") == best_run).toPandas()
    kernel = _make_run_kernel(weights, dfs, top_k=k, theta=0.0,
                              run_term_ub=None, **kernel_args)
    best_scores = kernel(best_pdf)
    theta = float(best_scores["score"].min()) if len(best_scores) >= k else 0.0
    # keep every run whose bound can reach theta (the best run trivially
    # qualifies: its own kth score <= its bound); ties kept (>=)
    keep = [run for run, ubv in run_ub.items() if ubv >= theta]
    return theta, keep, run_term_ub


def search_segments(spark: SparkSession, sidx: SegmentIndex, query: str,
                    k: int = 5, mode: str = "bm25", k1: float = 1.2,
                    b: float = 0.75, stem: bool = False,
                    strategy: str = "exhaustive") -> DataFrame:
    """Top-k over the compressed index; result schema (doc_id, score),
    ordered, rank-identical to the DataFrame engine and the oracle."""
    bag = parse_query(query, stem=stem)
    if not bag:
        return spark.createDataFrame([], SCORE_SCHEMA)
    terms = sorted(bag)
    dfs = sidx.df_of(terms)
    weights, q_norm = compute_query_weights(bag, dfs, sidx.n_docs, mode)

    buckets = sorted({storage.term_bucket_py(t, sidx.n_buckets) for t in terms})
    hits = sidx.segments.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )

    kernel_args = dict(mode=mode, n_docs=sidx.n_docs, avg_dl=sidx.avg_doc_len,
                       k1=k1, b=b, range_width=sidx.range_width)

    if strategy == "auto":
        # pruning pays for its metadata pass (an extra Spark job +
        # driver seed-scoring) only when there are MANY doc-range runs
        # to skip; below ~256 runs the exhaustive scan is cheaper
        # (measured: wand p50 3.1s vs exhaustive ~0.9s at 49 runs).
        # Cluster-scale indexes (10^5+ runs) always take the wand path.
        n_runs_max = sidx.n_docs // sidx.range_width + 1
        strategy = "wand" if n_runs_max >= 256 else "exhaustive"

    if mode == "bm25":
        theta, keep_runs, run_term_ub = 0.0, None, None
        pre_scored = None
        if strategy == "wand":
            theta, keep_runs, run_term_ub = _prune_runs(
                spark, hits, weights, dfs, mode=mode, n_docs=sidx.n_docs,
                avg_dl=sidx.avg_doc_len, k1=k1, b=b, k=k,
                kernel_args=kernel_args)
            if keep_runs is not None:
                hits = hits.filter(F.col("run").isin(keep_runs))
        kernel = _make_run_kernel(weights, dfs, top_k=k, theta=theta,
                                  run_term_ub=run_term_ub, **kernel_args)
        scored = hits.groupBy("run").applyInPandas(kernel, SCORE_SCHEMA)
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # cosine modes: exhaustive dots + norms join (J3/W4)
    kernel = _make_run_kernel(weights, dfs, top_k=0, **kernel_args)
    dots = hits.groupBy("run").applyInPandas(kernel, SCORE_SCHEMA)
    norm_col = "norm_w1" if mode == "w1" else "norm_w2"
    scores = dots.join(sidx.norms.select("doc_id", norm_col), "doc_id").select(
        "doc_id",
        F.when((F.col(norm_col) > 0) & (F.lit(q_norm) > 0),
               F.col("score") / F.col(norm_col) / F.lit(q_norm))
        .otherwise(F.lit(0.0)).alias("score"),
    )
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
