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
