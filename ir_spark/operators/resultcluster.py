"""Search-result clustering — the Scatter/Gather / Carrot² SERP
feature: partition a query's top-N results into topical groups, each
labeled by its most characteristic terms, so a user disambiguates an
ambiguous query ("jaguar") in one glance.

The reference engine returns a flat ranked list (Driver.java:66-71);
clustering is additive result-page surface.

Scale shape: the DISTRIBUTED part is feature extraction — one
broadcast semi-join pulls exactly the candidates' posting rows (a doc
has bounded vocabulary; candidates are the top-N result page, a
CONSTANT), joined to the dictionary for df.  The k-means itself runs
on the driver over <= N sparse tf-idf vectors — the same
bounded-driver-work pattern as RM3's expansion pick or the phrase
suggester's Viterbi: result-page-sized, never corpus-sized.

Determinism contract: pure driver-side float math with fixed seeding
(farthest-first from the lowest doc_id, distance ties broken by
doc_id), fixed iteration cap, assignment ties broken by cluster index
— rerun-identical, partitioning-independent (the only distributed
output is a collected row set that is sorted before use).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import DataFrameIndex

ASSIGN_SCHEMA = "doc_id long, cluster_id int"
LABEL_SCHEMA = "cluster_id int, rank int, term string, weight_micro long"


def _tfidf_vectors(rows, n_docs: int) -> dict[int, dict[str, float]]:
    """(doc_id, term, tf, df) rows -> L2-normalized tf-idf vectors."""
    vecs: dict[int, dict[str, float]] = {}
    for doc_id, term, tf, df in rows:
        w = tf * math.log(n_docs / df) if df else 0.0
        if w > 0:
            vecs.setdefault(doc_id, {})[term] = w
    for d, v in vecs.items():
        norm = math.sqrt(sum(x * x for x in v.values()))
        if norm > 0:
            for t in v:
                v[t] /= norm
    return vecs


def _cos(a: dict[str, float], b: dict[str, float]) -> float:
    if len(b) < len(a):
        a, b = b, a
    return sum(w * b.get(t, 0.0) for t, w in a.items())


def _kmeans(vecs: dict[int, dict[str, float]], k: int, max_iter: int):
    """Deterministic spherical k-means: farthest-first seeds from the
    lowest doc_id, Lloyd with cosine similarity, ties by doc_id /
    cluster index."""
    ids = sorted(vecs)
    k = min(k, len(ids))
    seeds = [ids[0]]
    while len(seeds) < k:
        best = None
        for d in ids:
            if d in seeds:
                continue
            near = max(_cos(vecs[d], vecs[s]) for s in seeds)
            key = (near, d)  # farthest = smallest max-similarity
            if best is None or key < best:
                best = key
        seeds.append(best[1])
    cents = [dict(vecs[s]) for s in seeds]
    assign = {d: 0 for d in ids}
    for _ in range(max_iter):
        moved = False
        for d in ids:
            sims = [(-_cos(vecs[d], c), i) for i, c in enumerate(cents)]
            c = min(sims)[1]
            if assign[d] != c:
                assign[d] = c
                moved = True
        for i in range(k):
            members = [d for d in ids if assign[d] == i]
            if not members:
                continue  # keep the old centroid (empty-cluster guard)
            agg: dict[str, float] = {}
            for d in members:
                for t, w in vecs[d].items():
                    agg[t] = agg.get(t, 0.0) + w
            norm = math.sqrt(sum(x * x for x in agg.values()))
            cents[i] = {t: w / norm for t, w in agg.items()} if norm else {}
        if not moved:
            break
    return assign, cents


def cluster_results(spark: SparkSession, index: DataFrameIndex,
                    candidates: DataFrame, *, k_clusters: int = 4,
                    n_label_terms: int = 3, max_iter: int = 20
                    ) -> tuple[DataFrame, DataFrame]:
    """Cluster a result page's candidate docs -> (assignments, labels).

    ``candidates``: a DataFrame with a ``doc_id`` column (the top-N of
    any scorer).  Returns ``(doc_id, cluster_id)`` and per-cluster
    ``(cluster_id, rank, term, weight_micro)`` labels — the cluster
    centroid's top terms, micro-quantized, (weight DESC, term ASC)."""
    cand = candidates.select("doc_id").distinct()
    cand_ids = sorted(r["doc_id"] for r in cand.collect())
    rows = sorted(
        (r["doc_id"], r["term"], r["tf"], r["df"])
        for r in (index.postings.join(F.broadcast(cand), "doc_id")
                  .join(index.dictionary.select("term", "df"), "term")
                  .select("doc_id", "term", "tf", "df").collect()))
    vecs = _tfidf_vectors(rows, index.n_docs)
    # every candidate gets an assignment, even one whose every term has
    # zero idf (df == n_docs) or no indexed terms at all: an empty
    # vector has cosine 0 to every centroid and lands in cluster 0 by
    # the cluster-index tie-break — dropping it instead would make the
    # SERP silently lose result rows on join-back
    for d in cand_ids:
        vecs.setdefault(d, {})
    if not vecs:
        return (spark.createDataFrame([], ASSIGN_SCHEMA),
                spark.createDataFrame([], LABEL_SCHEMA))
    assign, cents = _kmeans(vecs, k_clusters, max_iter)
    label_rows = []
    for i, c in enumerate(cents):
        # half-up micro-quantization (house convention; Python round()
        # is banker's and would disagree with SQL ROUND at exact .5)
        top = sorted(((math.floor(w * 1e6 + 0.5), t) for t, w in c.items()),
                     key=lambda r: (-r[0], r[1]))[:n_label_terms]
        label_rows += [(i, rank + 1, t, int(w))
                       for rank, (w, t) in enumerate(top)]
    return (spark.createDataFrame(sorted(assign.items()), ASSIGN_SCHEMA),
            spark.createDataFrame(label_rows, LABEL_SCHEMA))
