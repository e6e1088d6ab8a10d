"""Champion lists (static index pruning): build invariants, exactness
once m >= max df, and monotone recall in m."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ir_spark.fixtures import REFERENCE_QUERIES, generate_pages
from ir_spark.operators.build import build_dataframe_index
from ir_spark.operators.champions import build_champion_lists, search_champions
from ir_spark.operators.query import search


@pytest.fixture(scope="module")
def idx(spark):
    pages = generate_pages(300, seed=42)
    df = spark.createDataFrame(
        [(i, p.text) for i, p in enumerate(pages)], "doc_id long, text string")
    index = build_dataframe_index(df)
    index.postings.persist().count()
    index.docinfo.persist().count()
    yield index
    index.postings.unpersist()
    index.docinfo.unpersist()


def test_champion_list_invariants(spark, idx):
    m = 5
    champs = build_champion_lists(idx, m=m)
    per_term = champs.groupBy("term").agg(
        F.count(F.lit(1)).alias("n"), F.min("tf").alias("min_tf"))
    assert per_term.filter(F.col("n") > m).count() == 0
    # every term's max-tf posting survives pruning
    top = idx.postings.groupBy("term").agg(F.max("tf").alias("max_tf"))
    kept_max = champs.groupBy("term").agg(F.max("tf").alias("kept_max"))
    assert top.join(kept_max, "term").filter(
        F.col("max_tf") != F.col("kept_max")).count() == 0


def test_champion_search_exact_when_m_covers_df(spark, idx):
    max_df = idx.dictionary.agg(F.max("df")).collect()[0][0]
    champs = build_champion_lists(idx, m=int(max_df))
    for q in REFERENCE_QUERIES[:5]:
        exact = [(r.doc_id, round(r.score, 9))
                 for r in search(spark, idx, q, k=10, mode="bm25").collect()]
        approx = [(r.doc_id, round(r.score, 9))
                  for r in search_champions(spark, idx, champs, q,
                                            k=10, mode="bm25").collect()]
        assert approx == exact


def test_champion_recall_quality(spark, idx):
    """Recall@10 vs exhaustive at a shallow and a covering m.

    NOT asserted monotone per step: champion scores are PARTIAL (a
    candidate only accumulates the query terms whose champion list it
    survived), so deepening one term's list can promote competitors
    past a still-partially-scored true hit — unlike IVF, where probed
    scores are exact.  Sound guarantees: recall is 1.0 once m >= max
    df, and a covering m can never do worse than a shallow one."""
    qs = REFERENCE_QUERIES[:5]
    truth = {q: {r.doc_id for r in search(spark, idx, q, k=10,
                                          mode="bm25").collect()}
             for q in qs}

    def recall(m: int) -> float:
        champs = build_champion_lists(idx, m=m)
        tot = 0.0
        for q in qs:
            got = {r.doc_id
                   for r in search_champions(spark, idx, champs, q,
                                             k=10, mode="bm25").collect()}
            tot += len(got & truth[q]) / max(len(truth[q]), 1)
        return tot / len(qs)

    shallow, covering = recall(2), recall(300)
    assert 0.0 < shallow <= 1.0
    assert covering == 1.0  # m >= max df on a 300-doc fixture


def test_dictionary_store_roundtrip(spark, idx):
    """Distributed front-coded dictionary store: encode per bucket,
    decode, compare the full (term, df, cf) relation."""
    from pyspark.sql import functions as F2

    from ir_spark.operators.dictionary import (
        decode_dictionary, encode_dictionary)

    d = idx.dictionary.select("term", "df", F2.col("cf").cast("long").alias("cf"))
    blocks = encode_dictionary(d, n_buckets=8)
    assert blocks.count() <= 8
    back = decode_dictionary(blocks)
    want = sorted(map(tuple, d.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_ltr_features_consistent_with_search(spark, idx):
    """The bm25 feature must equal the exact scorer's score for every
    candidate, and n_matched/tf_sum must match brute-force counting."""
    from collections import Counter

    from ir_spark.operators.ltr import ltr_features
    from ir_spark.operators.query import search
    from ir_spark.fixtures import REFERENCE_QUERIES

    q = REFERENCE_QUERIES[0]
    feats = {r.doc_id: r for r in ltr_features(spark, idx, q).collect()}
    scores = {r.doc_id: r.score
              for r in search(spark, idx, q, k=None, mode="bm25").collect()}
    assert set(feats) == set(scores)
    for d, s in scores.items():
        assert abs(feats[d].bm25 - s) < 1e-9
    # brute-force spot check of counts on one candidate
    from ir_spark.oracle import parse_query
    bag = parse_query(q)
    some = sorted(feats)[0]
    rows = idx.postings.filter(
        (idx.postings.doc_id == some)
        & idx.postings.term.isin(sorted(bag))).collect()
    assert feats[some].n_matched == len(rows)
    assert feats[some].tf_sum == sum(r.tf for r in rows)


def test_dictionary_lookup_prunes_buckets(spark, idx):
    """lookup_terms reads only the probed buckets (filter pushdown on
    the bucket column) and returns exact (term, df, cf) rows."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F2

    from ir_spark.operators.dictionary import encode_dictionary, lookup_terms

    d = idx.dictionary.select("term", "df", F2.col("cf").cast("long").alias("cf"))
    blocks = encode_dictionary(d, n_buckets=8)
    probe = [r.term for r in d.orderBy("term").limit(3).collect()]
    got = lookup_terms(blocks, probe, n_buckets=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    assert "bucket" in buf.getvalue()  # bucket IN (...) reaches the scan
    want = sorted(map(tuple, d.filter(d.term.isin(probe)).collect()))
    assert sorted(map(tuple, got.collect())) == want
    assert lookup_terms(blocks, [], n_buckets=8).collect() == []


def test_champion_w1_mode_rejected(spark, idx):
    import pytest as _pt

    champs = build_champion_lists(idx, m=5)
    with _pt.raises(ValueError, match="full-index norms"):
        search_champions(spark, idx, champs, "flow", mode="w1")


def test_champion_search_plan_broadcasts_query_side(spark, idx):
    """The champion query plan must keep the exact scorer's shape:
    broadcast joins for the query-term tables (no shuffle of the
    pruned postings onto a tiny side)."""
    import io
    from contextlib import redirect_stdout

    champs = build_champion_lists(idx, m=8)
    plan_df = search_champions(spark, idx, champs, "flow pressure", k=5)
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def _quantized_topk(df, k):
    rows = df.select(
        "doc_id",
        F.round(F.col("score") * 1e6).cast("long").alias("s")).collect()
    return sorted(((r["doc_id"], r["s"]) for r in rows),
                  key=lambda t: (-t[1], t[0]))[:k]


def test_two_phase_exact_when_champions_cover(spark, idx):
    """m >= max df makes champion lists the full postings — two-phase
    must then equal the exact top-k for every reference query."""
    from ir_spark.operators.champions import search_two_phase

    max_df = idx.postings.groupBy("term").count().agg(
        F.max("count")).collect()[0][0]
    champs = build_champion_lists(idx, m=int(max_df))
    for q in REFERENCE_QUERIES[:6]:
        want = _quantized_topk(search(spark, idx, q, k=None, mode="bm25"), 5)
        got = _quantized_topk(
            search_two_phase(spark, idx, champs, q, k=5), 5)
        assert got == want, q


def test_two_phase_scores_exact_and_recall_monotone(spark, idx):
    """At small m the candidate set is approximate but every RETURNED
    score must be the exact engine's score for that doc; recall@5 must
    not decrease as the candidate budget grows."""
    from ir_spark.operators.champions import search_two_phase

    q = "boundary layer flow pressure"
    exact = dict(
        (r["doc_id"], round(r["score"], 9))
        for r in search(spark, idx, q, k=None, mode="bm25").collect())
    want_top = set(d for d, _ in _quantized_topk(
        search(spark, idx, q, k=None, mode="bm25"), 5))
    champs = build_champion_lists(idx, m=4)
    recalls = []
    for n1 in (5, 20, 80):
        got = search_two_phase(spark, idx, champs, q, k=5,
                               n_candidates=n1).collect()
        for r in got:
            assert round(r["score"], 9) == exact[r["doc_id"]], (n1, r)
        recalls.append(
            len(want_top & {r["doc_id"] for r in got}) / len(want_top))
    assert recalls == sorted(recalls), recalls


# --- pairwise LTR training (ltr.py::train_pairwise_ranker) -------------------


@pytest.fixture(scope="module")
def ltr_setup(spark, idx):
    """Feature/qrel tables for 3 queries: graded rel = min(3, #distinct
    query terms in doc) — the eval-gate convention."""
    from ir_spark.operators.ltr import ltr_features
    from ir_spark.oracle import parse_query

    queries = REFERENCE_QUERIES[:3]
    feats = None
    qrels_rows = []
    for qid, q in enumerate(queries):
        f = ltr_features(spark, idx, q).withColumn(
            "query_id", F.lit(qid).cast("long"))
        feats = f if feats is None else feats.unionByName(f)
        terms = set(parse_query(q))
        hits = {}
        for t in terms:
            for r in idx.postings.filter(F.col("term") == t).collect():
                hits[r["doc_id"]] = hits.get(r["doc_id"], 0) + 1
        qrels_rows += [(qid, d, min(3, c)) for d, c in hits.items()]
    qrels = spark.createDataFrame(
        qrels_rows, "query_id long, doc_id long, rel long")
    feats = feats.persist()
    feats.count()
    yield feats, qrels
    feats.unpersist()


def test_ltr_training_deterministic_and_converges(spark, ltr_setup):
    from ir_spark.operators.ltr import train_pairwise_ranker

    feats, qrels = ltr_setup
    m1 = train_pairwise_ranker(feats, qrels, epochs=8)
    m2 = train_pairwise_ranker(
        feats.repartition(13), qrels.repartition(7), epochs=8)
    # nano-quantized gradients -> bit-identical weights regardless of
    # partitioning (the cross-run diffability contract)
    assert m1["weights"] == m2["weights"]
    assert m1["n_pairs"] > 0
    # pairwise log-loss decreases from the zero-weight start
    assert m1["loss"][-1] < m1["loss"][0]
    # more matched query terms => higher rel by construction, so the
    # learned n_matched weight must be positive
    assert m1["weights"]["n_matched"] > 0


def test_ltr_rerank_improves_ndcg(spark, ltr_setup):
    from ir_spark.operators.evalir import ranking_metrics
    from ir_spark.operators.ltr import score_linear, train_pairwise_ranker
    from pyspark.sql import Window

    feats, qrels = ltr_setup
    model = train_pairwise_ranker(feats, qrels, epochs=20)

    def run_of(scored):
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score_micro"), F.asc("doc_id"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 10)
                .select("query_id", "rank", "doc_id"))

    bm25_run = run_of(feats.select(
        "query_id", "doc_id",
        F.round(F.col("bm25") * 1e6).cast("long").alias("score_micro")))
    ltr_run = run_of(score_linear(feats, model))

    def mean_ndcg(run):
        rows = ranking_metrics(run, qrels, k=10).collect()
        return sum(r["ndcg"] for r in rows) / len(rows)

    base, learned = mean_ndcg(bm25_run), mean_ndcg(ltr_run)
    assert learned >= base - 1e-9, (base, learned)


def test_ltr_empty_qrels_yields_zero_model(spark, ltr_setup):
    from ir_spark.operators.ltr import train_pairwise_ranker

    feats, _ = ltr_setup
    empty = spark.createDataFrame([], "query_id long, doc_id long, rel long")
    m = train_pairwise_ranker(feats, empty, epochs=3)
    assert m["n_pairs"] == 0 and all(v == 0.0 for v in m["weights"].values())


# --- result clustering (operators/resultcluster.py) --------------------------


def test_result_clustering_invariants_and_determinism(spark, idx):
    from ir_spark.operators.query import search
    from ir_spark.operators.resultcluster import cluster_results

    top = search(spark, idx, "boundary layer heat transfer model",
                 k=30).select("doc_id")
    a1, l1 = cluster_results(spark, idx, top, k_clusters=3)
    a2, l2 = cluster_results(spark, idx, top, k_clusters=3)
    rows1 = sorted((r["doc_id"], r["cluster_id"]) for r in a1.collect())
    rows2 = sorted((r["doc_id"], r["cluster_id"]) for r in a2.collect())
    assert rows1 == rows2  # rerun-deterministic
    docs = [d for d, _ in rows1]
    assert sorted(docs) == sorted(
        r["doc_id"] for r in top.distinct().collect())  # partition
    cids = {c for _, c in rows1}
    assert cids <= {0, 1, 2} and len(cids) >= 2
    labels = sorted((r["cluster_id"], r["rank"], r["term"])
                    for r in l1.collect())
    assert labels == sorted((r["cluster_id"], r["rank"], r["term"])
                            for r in l2.collect())
    # every label term occurs in at least one member doc of its cluster
    from pyspark.sql import functions as F

    member_terms = {}
    prows = (idx.postings.join(F.broadcast(a1), "doc_id")
             .select("cluster_id", "term").distinct().collect())
    for r in prows:
        member_terms.setdefault(r["cluster_id"], set()).add(r["term"])
    for cid, _rank, term in labels:
        assert term in member_terms[cid], (cid, term)


def test_result_clustering_separates_disjoint_vocab(spark):
    """Two vocabulary-disjoint doc groups must land in two clusters."""
    from ir_spark.operators.build import build_dataframe_index
    from ir_spark.operators.resultcluster import cluster_results

    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(5)]
    rows += [(i + 10, "quark lepton boson hadron gluon photon")
             for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    index = build_dataframe_index(df)
    cand = df.select("doc_id")
    assign, labels = cluster_results(spark, index, cand, k_clusters=2)
    got = {r["doc_id"]: r["cluster_id"] for r in assign.collect()}
    g1 = {got[i] for i in range(5)}
    g2 = {got[i + 10] for i in range(5)}
    assert len(g1) == 1 and len(g2) == 1 and g1 != g2
    lab = {}
    for r in labels.collect():
        lab.setdefault(r["cluster_id"], []).append(r["term"])
    assert set(lab[g1.pop()]) <= set("alpha beta gamma delta epsilon "
                                     "zeta".split())
    assert set(lab[g2.pop()]) <= set("quark lepton boson hadron gluon "
                                     "photon".split())


def test_result_clustering_keeps_zero_weight_docs(spark):
    """A candidate whose every term is corpus-universal (df == n_docs
    -> tf-idf weight 0) must still receive an assignment — dropping it
    would lose result rows on the SERP join-back."""
    from ir_spark.operators.build import build_dataframe_index
    from ir_spark.operators.resultcluster import cluster_results

    rows = [(i, "common shared universal") for i in range(3)]
    rows += [(10, "common shared universal distinctive")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    index = build_dataframe_index(df)
    assign, _labels = cluster_results(spark, index,
                                      df.select("doc_id"), k_clusters=2)
    got = {r["doc_id"]: r["cluster_id"] for r in assign.collect()}
    assert sorted(got) == [0, 1, 2, 10]  # nothing vanished
    # the zero-vector docs agree on one cluster (tie-broken to index 0)
    assert got[0] == got[1] == got[2] == 0


def test_result_clustering_edge_cases(spark, idx):
    from ir_spark.operators.resultcluster import cluster_results

    empty = spark.createDataFrame([], "doc_id long")
    a, lab = cluster_results(spark, idx, empty, k_clusters=3)
    assert a.count() == 0 and lab.count() == 0
    one = spark.createDataFrame([(0,)], "doc_id long")
    a, lab = cluster_results(spark, idx, one, k_clusters=4)
    rows = a.collect()
    assert len(rows) == 1 and rows[0]["cluster_id"] == 0
