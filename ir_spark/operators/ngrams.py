"""Bigram collocation statistics (PMI) over the token stream.

Training-data pipelines mine collocations for tokenizer vocabulary
building, boilerplate detection, and corpus profiling; the reference
engine only ever aggregates unigrams (SPIMI.java keeps per-term
counts).  This module adds the bigram layer Spark-first:

* ``bigram_counts`` — ONE Arrow pass over (doc_id, text) emits
  per-batch partial (w1, w2, n) counts (Counter over adjacent kept
  tokens, batch-combined before anything shuffles), then a single
  groupBy(w1, w2) sum with map-side combine.  The shuffle carries one
  row per distinct bigram per partition — vocabulary-sized, not
  corpus-sized.
* ``collocations`` — PMI from the pair table alone:
  pmi(a,b) = ln(n(a,b) * T / (n(a,·) * n(·,b))), marginals computed
  with two hash aggregations joined back on their keys (NOT window
  functions — a window over w1 would re-sort the pair table; the agg
  + broadcast-join shape keeps everything a hash exchange), T a
  driver-side scalar.  Deterministic gate contract: pmi quantized to
  micro-units, ties broken by (w1, w2).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text import tokenize


def bigram_counts(pages: DataFrame, stem: bool = False) -> DataFrame:
    """(doc_id, text) -> (w1, w2, n): adjacent-token pair counts over
    the kept-token stream (stopwords occupy stream slots and pair up,
    same stream contract as the positional index)."""
    sel = pages.select("text")
    sc = sel.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_inputs = len(sel.inputFiles())
    except Exception:
        n_inputs = 0
    if n_inputs < target:
        sel = sel.repartition(2 * target)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            c: Counter = Counter()
            for text in pdf["text"].values:
                if text is None:
                    continue
                toks = tokenize(text, stem=stem)
                c.update(zip(toks, toks[1:]))
            yield pd.DataFrame(
                {"w1": [k[0] for k in c],
                 "w2": [k[1] for k in c],
                 "n": list(c.values())})

    partial = sel.mapInPandas(kernel, schema="w1 string, w2 string, n long")
    return partial.groupBy("w1", "w2").agg(
        F.sum("n").cast("long").alias("n"))


def collocations(pages: DataFrame, min_count: int = 5, k: int = 20,
                 stem: bool = False, caches: list | None = None) -> DataFrame:
    """Top-k collocations by PMI -> (w1, w2, n, pmi_micro), pairs with
    n >= min_count, ordered by (pmi_micro DESC, w1, w2).

    The pair table feeds four consumers (total, both marginals, the
    final join), so it is persisted; pass ``caches`` (same contract as
    build.assign_doc_ids) to receive the persisted frame for release,
    else it stays session-lived."""
    big = bigram_counts(pages, stem=stem).persist()
    if caches is not None:
        caches.append(big)
    total = big.agg(F.sum("n")).collect()[0][0] or 0
    left = big.groupBy("w1").agg(F.sum("n").alias("nl"))
    right = big.groupBy("w2").agg(F.sum("n").alias("nr"))
    pmi = (
        big.filter(F.col("n") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .select(
            "w1", "w2", "n",
            F.round(F.lit(1000000.0) * F.log(
                F.col("n").cast("double") * F.lit(float(total))
                / (F.col("nl") * F.col("nr"))))
            .cast("long").alias("pmi_micro"))
    )
    return pmi.orderBy(F.desc("pmi_micro"), F.asc("w1"), F.asc("w2")).limit(k)
