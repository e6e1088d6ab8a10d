"""Champion lists — static index pruning (IIR §7.1.3).

For each term keep only its top-``m`` postings by (tf desc, doc_id
asc): the documents a high-idf term could ever rank highly.  Queries
then score ONLY the union of the query terms' champion lists — a
lossy latency/quality trade that needs no per-block metadata (cf. the
lossless block-max WAND path in ``segment_query``), standard in
first-phase candidate generation of a two-stage ranker.

Scale shape:
- build: one window rank partitioned by ``term`` — the exact key the
  index build already shuffles on, so champions fall out of the build
  shuffle as a side product; output size is ``sum(min(df, m))``
  postings, a small fraction of the index, broadcastable for hot-term
  serving tiers.
- query: identical plan to exact ``search`` (broadcast query terms ->
  pruned scan -> weight expr -> groupBy(doc_id) -> top-k) with the
  postings relation swapped for the champion table; collection
  statistics (df / N / avgDocLen) stay GLOBAL, so per-posting scores
  are identical to the exact engine — only the candidate set shrinks.

Quality: recall@k vs exhaustive is monotone non-decreasing in ``m``
(candidate sets are nested) and exactly 1.0 once ``m`` >= max df —
asserted in tests/test_champions.py.

Reference scope note: the reference engine (QueryParser.java) always
scores full posting lists; champion lists are additive surface for
the web-scale payload, like WAND.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .build import DataFrameIndex


def build_champion_lists(index: DataFrameIndex, m: int = 50) -> DataFrame:
    """(term, doc_id, tf) restricted to each term's top-``m`` postings
    by (tf desc, doc_id asc) — deterministic, reproducible in SQL as a
    ROW_NUMBER window."""
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    return (index.postings
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= m)
            .drop("_rn"))


def champion_index(index: DataFrameIndex,
                   champions: DataFrame) -> DataFrameIndex:
    """An index view whose candidate postings are the champion lists
    but whose dictionary / doc stats / scalars remain the FULL
    collection's — scoring math must not drift from the exact engine,
    only the candidate universe shrinks."""
    return replace(index, postings=champions)


def search_champions(spark: SparkSession, index: DataFrameIndex,
                     champions: DataFrame, query: str, k: int | None = 5,
                     mode: str = "bm25", k1: float = 1.2, b: float = 0.75,
                     stem: bool = False) -> DataFrame:
    """Approximate top-k over champion lists: same scoring expressions
    and global statistics as ``query.search``, candidates limited to
    the query terms' champions.  Cosine modes (w1) would additionally
    need FULL-index norms passed through; the common first-phase modes
    (bm25 / w2) need none."""
    from .query import search

    if mode == "w1":
        # cosine normalization needs FULL-index norms; computing them
        # from the pruned view would silently change scores.  Wire
        # norms=doc_norms(full_index, ...) through search() directly
        # if a cosine first phase is ever needed.
        raise ValueError("champion search supports bm25/w2 modes; "
                         "w1 cosine needs full-index norms")
    return search(spark, champion_index(index, champions), query, k=k,
                  mode=mode, k1=k1, b=b, stem=stem)


def search_two_phase(spark: SparkSession, index: DataFrameIndex,
                     champions: DataFrame, query: str, k: int = 5,
                     n_candidates: int | None = None, mode: str = "bm25",
                     k1: float = 1.2, b: float = 0.75,
                     stem: bool = False) -> DataFrame:
    """Two-phase retrieval — the standard web-serving shape: a cheap
    champion-list first phase proposes ``n_candidates`` docs (default
    4k), then the EXACT engine rescores only those candidates over the
    full postings (a champion-phase score can undercount: a doc inside
    term A's champions may sit below term B's cutoff, so its phase-1
    score misses B's contribution — phase 2 restores it).  Returned
    scores are therefore exact; only recall is approximate, governed by
    m and n_candidates (recall-curve pytest; equals exact top-k outright
    once m >= max df).

    Candidate selection quantizes phase-1 scores to micro-units before
    the cut (same determinism contract as the driver gates), so the
    candidate set — and with it the final ranking — is reproducible
    bit-for-bit across engines.

    Scale shape: phase 1 scans only champion postings (<= m rows/term);
    phase 2 is one ordinary pruned query with ``doc_filter`` =
    broadcast-sized candidate ids.  No corpus sweep in either phase."""
    from .query import search

    n1 = n_candidates or 4 * k
    raw1 = search_champions(spark, index, champions, query, k=None,
                            mode=mode, k1=k1, b=b, stem=stem)
    cand = (
        raw1.select(
            "doc_id",
            F.round(F.col("score") * 1000000.0).cast("long").alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id")).limit(n1)
        .select("doc_id"))
    return search(spark, index, query, k=k, mode=mode, k1=k1, b=b,
                  stem=stem, doc_filter=cand)
