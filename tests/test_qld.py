"""Query-likelihood (Dirichlet LM) retrieval
(operators/query.py::search_qld) vs a driver-side brute-force
implementation of the textbook formula on the frozen oracle index —
checks that the distributed matched-postings decomposition equals the
full per-(doc, query-term) sum, including the unseen-term drop."""

from __future__ import annotations

import math

import pytest

from ir_spark.operators.query import search_qld
from ir_spark.oracle import build_index, parse_query

MU, K = 1000.0, 10

# fixture-vocabulary queries (make_vocab is aero-themed; absent-term
# queries would exercise only the empty path)
QUERIES = [
    "boundary layer heat transfer model",
    "supersonic wing pressure",
    "theory the of",            # mostly stopwords
    "zzzunseen shock wave",     # unseen term dropped
    "zzzunseen qqqunseen",      # nothing survives
]


@pytest.fixture(scope="module")
def both(spark, pages_small):
    path, _ = pages_small
    from ir_spark.operators.build import assign_doc_ids, build_dataframe_index

    raw = spark.read.parquet(path)
    ids = assign_doc_ids(raw)
    df = raw.join(ids, "url").select("doc_id", "text")
    texts = {r["doc_id"]: r["text"] for r in df.collect()}
    oracle = build_index(sorted(texts.items()))
    return build_dataframe_index(df), oracle


def _py_qld(oracle, query, mu=MU, k=K):
    """Textbook Dirichlet QL: full sum over surviving query terms for
    every candidate doc (tf = 0 when the doc lacks the term)."""
    bag = parse_query(query)
    cf = {t: sum(tf for _, tf in oracle.postings.get(t, ()))
          for t in bag}
    terms = sorted(t for t in bag if cf.get(t))
    if not terms:
        return []
    c_total = sum(sum(tf for _, tf in pl) for pl in oracle.postings.values())
    cands = sorted({d for t in terms for d, _ in oracle.postings[t]})
    out = []
    for d in cands:
        dl = oracle.docinfo[d][0]
        tfs = {t: dict(oracle.postings[t]).get(d, 0) for t in terms}
        s = sum(bag[t] * math.log((tfs[t] + mu * cf[t] / c_total)
                                  / (dl + mu)) for t in terms)
        out.append((d, s))
    out.sort(key=lambda r: (-round(r[1] * 1e6), r[0]))
    return [(d, round(s * 1e6)) for d, s in out[:k]]


@pytest.mark.parametrize("query", QUERIES)
def test_qld_matches_bruteforce(spark, both, query):
    idx, oracle = both
    got = [(r["doc_id"], round(r["score"] * 1e6))
           for r in search_qld(spark, idx, query, k=K, mu=MU).collect()]
    want = _py_qld(oracle, query)
    assert got == want


def test_qld_scores_negative_and_ordered(spark, both):
    idx, _ = both
    rows = search_qld(spark, idx, QUERIES[0], k=K, mu=MU).collect()
    scores = [r["score"] for r in rows]
    assert all(s < 0 for s in scores)  # log-probabilities
    assert scores == sorted(scores, reverse=True)


def test_keywords_tfidf_short_docs(spark):
    """Docs with fewer than k indexed terms yield all their terms;
    rank/tie-break is (w_micro desc, term asc)."""
    from ir_spark.operators.textstats import keywords_tfidf

    postings = spark.createDataFrame(
        [(0, "alpha", 2), (0, "beta", 2), (1, "alpha", 1)],
        "doc_id long, term string, tf long")
    dictionary = spark.createDataFrame(
        [("alpha", 2, 3), ("beta", 1, 2)], "term string, df long, cf long")
    out = keywords_tfidf(postings, dictionary, n_docs=2, k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    # beta (df=1) outweighs alpha (df=2) at equal tf
    assert by_doc[0] == [(1, "beta"), (2, "alpha")]
    assert by_doc[1] == [(1, "alpha")]


def test_kwic_snippets_edges(spark):
    """Window clamps at both text edges; earliest (pos, term) wins."""
    from ir_spark.operators.textstats import kwic_snippets

    docs = spark.createDataFrame(
        [(0, "alpha bb cc dd ee ff gg"),
         (1, "aa bb cc dd ee ff alpha"),
         (2, "aa beta alpha dd"),
         (3, "no match here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           kwic_snippets(docs, ["alpha", "beta"], window=2).collect()}
    assert set(out) == {0, 1, 2}
    assert (out[0]["pos"], out[0]["snippet"]) == (1, "alpha bb cc")
    assert (out[1]["pos"], out[1]["snippet"]) == (7, "ee ff alpha")
    assert (out[2]["pos"], out[2]["term"]) == (2, "beta")
    assert out[2]["snippet"] == "aa beta alpha dd"


def test_pii_scrub_patterns(spark):
    from ir_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame(
        [(0, "mail a@b.co and c.d@e.f.org ip 192.168.0.1 "
             "phone 555-123-4567 fake 55-123-4567 not-ip 1234.5.6.7"),
         (1, "clean text only")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (out[0]["n_emails"], out[0]["n_phones"], out[0]["n_ips"]) == (2, 1, 1)
    assert out[0]["scrubbed"] == (
        "mail <EMAIL> and <EMAIL> ip <IP> phone <PHONE> "
        "fake 55-123-4567 not-ip 1234.5.6.7")
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (0, 0, 0)
    assert out[1]["scrubbed"] == "clean text only"


def test_ranking_metrics_hand_computed(spark):
    import math

    from ir_spark.operators.evalir import ranking_metrics

    run = spark.createDataFrame(
        [(0, 1, 2), (0, 2, 9), (0, 3, 1), (1, 1, 1), (1, 2, 2)],
        "query_id long, rank int, doc_id long")
    qrels = spark.createDataFrame(
        [(0, 1, 3), (0, 2, 1), (0, 5, 2)],
        "query_id long, doc_id long, rel int")
    out = {r["query_id"]: r
           for r in ranking_metrics(run, qrels, k=3).collect()}
    q0 = out[0]
    assert q0["n_rel"] == 3
    assert abs(q0["p_at_k"] - 2 / 3) < 1e-12
    assert q0["rr"] == 1.0
    dcg = 1.0 + 7.0 / 2.0
    idcg = 7.0 + 3.0 / math.log2(3.0) + 1.0 / 2.0
    assert abs(q0["ndcg"] - dcg / idcg) < 1e-12
    q1 = out[1]
    assert (q1["n_rel"], q1["p_at_k"], q1["rr"], q1["ndcg"]) == (0, 0.0, 0.0, 0.0)


def test_pack_sequences_invariants(spark):
    """Start offsets are the exact prefix sum in doc_id order at any
    partitioning; bins advance monotonically."""
    from ir_spark.operators.corpus import pack_sequences

    rows = [(i, (i * 37) % 900 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    caches: list = []
    out = sorted(
        (r["doc_id"], r["start"], r["bin_id"], r["bin_offset"])
        for r in pack_sequences(df.repartition(7), 512,
                                caches=caches).collect())
    for c in caches:
        c.unpersist()
    running = 0
    for (doc_id, start, bin_id, bin_offset), (i, n) in zip(out, rows):
        assert doc_id == i
        assert start == running
        assert bin_id == running // 512
        assert bin_offset == running % 512
        running += n


def test_connected_components_path_graph(spark):
    """Min-label propagation converges on a path (worst diameter) and
    labels every node with its component minimum."""
    from ir_spark.operators.dedup import connected_components

    edges = [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    out = sorted((r["doc_id"], r["cluster_id"], r["is_canonical"])
                 for r in connected_components(pairs).collect())
    assert out == [(1, 1, 1), (2, 1, 0), (3, 1, 0), (4, 1, 0), (5, 1, 0),
                   (10, 10, 1), (11, 10, 0), (12, 10, 0)]


def test_bigram_nll_hand_computed(spark):
    import math

    from ir_spark.operators.textstats import bigram_nll

    docs = spark.createDataFrame(
        [(0, "aa bb aa"), (1, "bb cc"), (2, "aa")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_nll(docs, tau=1.0).collect()}
    # model: c1 = {aa:2(d0) + 1(d2)=3, bb:2, cc:1}, V=3
    # d0 bigrams (aa,bb),(bb,aa); d1 (bb,cc)
    nll0 = -(math.log((1 + 1) / (3 + 3)) + math.log((1 + 1) / (2 + 3))) / 2
    nll1 = -math.log((1 + 1) / (2 + 3))
    assert set(out) == {0, 1}          # d2 has no bigram
    assert out[0]["n_bigrams"] == 2
    assert abs(out[0]["nll_micro"] - round(nll0 * 1e6)) <= 1
    assert abs(out[1]["nll_micro"] - round(nll1 * 1e6)) <= 1
    assert out[0]["keep"] == int(nll0 <= 1.0)
    assert out[1]["keep"] == int(nll1 <= 1.0)


def test_qld_segment_engine_matches_dataframe(spark, pages_small,
                                              tmp_path_factory):
    """Compressed-index QLD (segment kernel) == DataFrame-engine QLD
    value-for-value, including unseen-term and stopword-heavy queries."""
    from ir_spark.operators.build import assign_doc_ids, build_dataframe_index
    from ir_spark.operators.segment_query import SegmentIndex, search_segments
    from ir_spark.operators.segments import build_segment_index

    path, _ = pages_small
    raw = spark.read.parquet(path)
    d = str(tmp_path_factory.mktemp("qldseg") / "idx")
    build_segment_index(spark, raw, d, source="qld", segment_groups=1)
    sidx = SegmentIndex.load(spark, d)
    doc_map = {r["doc_id"]: r["url"] for r in
               spark.read.parquet(d + "/doc_map").collect()}

    ids = assign_doc_ids(raw)
    df = raw.join(ids, "url").select("doc_id", "text")
    dfi = build_dataframe_index(df)
    df_map = {r["doc_id"]: r["url"] for r in ids.collect()}

    for q in QUERIES:
        seg = [(doc_map[r["doc_id"]], round(r["score"] * 1e6)) for r in
               search_segments(spark, sidx, q, k=K, mode="qld",
                               mu=MU).collect()]
        dfr = [(df_map[r["doc_id"]], round(r["score"] * 1e6)) for r in
               search_qld(spark, dfi, q, k=K, mu=MU).collect()]
        assert seg == dfr, q


def test_pii_scrub_counts_match_redactions(spark):
    """Counts reflect what was actually redacted: a PII-shaped
    substring consumed by the email pass is not double-counted."""
    from ir_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame(
        [(0, "bob@10.2.3.4.example.com end")], "doc_id long, text string")
    r = pii_scrub(docs).collect()[0]
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 0, 0)
    assert r["scrubbed"] == "<EMAIL> end"


def test_connected_components_empty_pairs(spark):
    """Empty edge relation converges immediately to an empty result
    (regression: NULL sum('chg') never compared equal to 0, so the
    loop exhausted max_iter and raised 'did not converge')."""
    from ir_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([], "a long, b long")
    assert connected_components(pairs, max_iter=3).collect() == []


def test_cc_star_equals_minlabel_random_graphs(spark):
    """Large-star/small-star and min-label propagation are independent
    exact CC algorithms: identical output on random edge sets."""
    import random

    from ir_spark.operators.dedup import connected_components

    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(40 + 10 * trial)]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "a long, b long")
        star = sorted(map(tuple, connected_components(
            pairs, algorithm="star").collect()))
        mini = sorted(map(tuple, connected_components(
            pairs, algorithm="minlabel", max_iter=80).collect()))
        assert star == mini


def test_cc_star_path_graph_log_rounds(spark):
    """A 1000-node path converges in O(log n) star rounds (min-label
    would need ~999 diameter rounds) and labels every node with the
    component minimum."""
    from ir_spark.operators.dedup import connected_components

    edges = [(i, i + 1) for i in range(999)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    stats: dict = {}
    out = connected_components(pairs, algorithm="star", stats=stats)
    rows = out.collect()
    assert len(rows) == 1000
    assert all(r.cluster_id == 0 for r in rows)
    assert sum(r.is_canonical for r in rows) == 1
    assert stats["rounds"] <= 12, stats


def test_cc_star_empty_and_self_pairs(spark):
    """Empty input -> empty output; a self-pair yields a singleton
    root rather than vanishing."""
    from ir_spark.operators.dedup import connected_components

    empty = spark.createDataFrame([], "a long, b long")
    assert connected_components(empty, algorithm="star").collect() == []
    selfp = spark.createDataFrame([(7, 7), (1, 2)], "a long, b long")
    got = sorted(map(tuple, connected_components(
        selfp, algorithm="star").collect()))
    assert got == [(1, 1, 1), (2, 1, 0), (7, 7, 1)]


# --- Jelinek-Mercer smoothing --------------------------------------------

LAM = 0.1


def _py_lmjm(oracle, query, lam=LAM, k=K):
    """Textbook JM LM: qtf * ln((1-lam)*tf/dl + lam*cf/C) over
    surviving query terms for every candidate doc."""
    bag = parse_query(query)
    cf = {t: sum(tf for _, tf in oracle.postings.get(t, ()))
          for t in bag}
    terms = sorted(t for t in bag if cf.get(t))
    if not terms:
        return []
    c_total = sum(sum(tf for _, tf in pl) for pl in oracle.postings.values())
    cands = sorted({d for t in terms for d, _ in oracle.postings[t]})
    out = []
    for d in cands:
        dl = oracle.docinfo[d][0]
        tfs = {t: dict(oracle.postings[t]).get(d, 0) for t in terms}
        s = sum(bag[t] * math.log((1 - lam) * tfs[t] / dl
                                  + lam * cf[t] / c_total) for t in terms)
        out.append((d, s))
    out.sort(key=lambda r: (-round(r[1] * 1e6), r[0]))
    return [(d, round(s * 1e6)) for d, s in out[:k]]


@pytest.mark.parametrize("query", QUERIES)
def test_lmjm_matches_bruteforce(spark, both, query):
    from ir_spark.operators.query import search_lmjm

    idx, oracle = both
    got = [(r["doc_id"], round(r["score"] * 1e6))
           for r in search_lmjm(spark, idx, query, k=K, lam=LAM).collect()]
    want = _py_lmjm(oracle, query)
    assert got == want


def test_lmjm_rejects_bad_lambda(spark, both):
    from ir_spark.operators.query import search_lmjm

    idx, _ = both
    for lam in (0.0, 1.0, -0.2, 1.5):
        with pytest.raises(ValueError):
            search_lmjm(spark, idx, QUERIES[0], lam=lam)


# --- PL2 divergence from randomness ---------------------------------------

PL2_C = 1.0


def _py_pl2(oracle, query, c=PL2_C, k=K):
    """Textbook PL2: matched terms only, log2 everywhere."""
    bag = parse_query(query)
    cf = {t: sum(tf for _, tf in oracle.postings.get(t, ()))
          for t in bag}
    terms = sorted(t for t in bag if cf.get(t))
    if not terms:
        return []
    n = len(oracle.docinfo)
    avg_dl = sum(v[0] for v in oracle.docinfo.values()) / n
    out = {}
    for t in terms:
        lam = cf[t] / n
        for d, tf in oracle.postings[t]:
            dl = oracle.docinfo[d][0]
            tfn = tf * math.log2(1 + c * avg_dl / dl)
            gain = (tfn * math.log2(tfn / lam)
                    + (lam - tfn) * math.log2(math.e)
                    + 0.5 * math.log2(2 * math.pi * tfn))
            out[d] = out.get(d, 0.0) + bag[t] / (tfn + 1.0) * gain
    rows = sorted(out.items(), key=lambda r: (-round(r[1] * 1e6), r[0]))
    return [(d, round(s * 1e6)) for d, s in rows[:k]]


@pytest.mark.parametrize("query", QUERIES)
def test_pl2_matches_bruteforce(spark, both, query):
    from ir_spark.operators.query import search_pl2

    idx, oracle = both
    got = [(r["doc_id"], round(r["score"] * 1e6))
           for r in search_pl2(spark, idx, query, k=K, c=PL2_C).collect()]
    want = _py_pl2(oracle, query)
    assert got == want


# --- BM25+ / BM25L long-doc variants ---------------------------------------

BMV_K1, BMV_B = 1.2, 0.75


def _bm25_family_brute(oracle, query, partial_of, k=K):
    """Shared textbook harness: matched terms only, Lucene idf."""
    bag = parse_query(query)
    terms = sorted(t for t in bag if oracle.postings.get(t))
    if not terms:
        return []
    n = len(oracle.docinfo)
    avg_dl = sum(v[0] for v in oracle.docinfo.values()) / n
    out = {}
    for t in terms:
        df = len(oracle.postings[t])
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, tf in oracle.postings[t]:
            dl = oracle.docinfo[d][0]
            out[d] = out.get(d, 0.0) + bag[t] * idf * partial_of(
                tf, dl, avg_dl)
    rows = sorted(out.items(), key=lambda r: (-round(r[1] * 1e6), r[0]))
    return [(d, round(s * 1e6)) for d, s in rows[:k]]


@pytest.mark.parametrize("query", QUERIES)
def test_bm25plus_matches_bruteforce(spark, both, query):
    from ir_spark.operators.query import search_bm25plus

    idx, oracle = both
    delta = 1.0

    def partial(tf, dl, avg_dl):
        return (tf * (BMV_K1 + 1.0)
                / (tf + BMV_K1 * (1.0 - BMV_B + BMV_B * dl / avg_dl))
                + delta)

    got = [(r["doc_id"], round(r["score"] * 1e6))
           for r in search_bm25plus(spark, idx, query, k=K, k1=BMV_K1,
                                    b=BMV_B, delta=delta).collect()]
    assert got == _bm25_family_brute(oracle, query, partial)


@pytest.mark.parametrize("query", QUERIES)
def test_bm25l_matches_bruteforce(spark, both, query):
    from ir_spark.operators.query import search_bm25l

    idx, oracle = both
    delta = 0.5

    def partial(tf, dl, avg_dl):
        ctd = tf / (1.0 - BMV_B + BMV_B * dl / avg_dl)
        return (BMV_K1 + 1.0) * (ctd + delta) / (BMV_K1 + (ctd + delta))

    got = [(r["doc_id"], round(r["score"] * 1e6))
           for r in search_bm25l(spark, idx, query, k=K, k1=BMV_K1,
                                 b=BMV_B, delta=delta).collect()]
    assert got == _bm25_family_brute(oracle, query, partial)


def test_bm25plus_rescues_long_doc_floor(spark, both):
    """The defining BM25+ property: every matched term contributes at
    least delta*idf*qtf however long the doc — so a matching long doc
    can never score below an adding-nothing floor.  With delta=0 the
    variant degenerates to plain BM25 (rank-identical scores)."""
    from ir_spark.operators.query import search, search_bm25plus

    idx, _ = both
    q = QUERIES[0]
    plain = [(r["doc_id"], round(r["score"] * 1e6))
             for r in search(spark, idx, q, k=K, mode="bm25",
                             k1=BMV_K1, b=BMV_B).collect()]
    degenerate = [(r["doc_id"], round(r["score"] * 1e6))
                  for r in search_bm25plus(spark, idx, q, k=K, k1=BMV_K1,
                                           b=BMV_B, delta=0.0).collect()]
    assert plain == degenerate


# --- Rank-biased overlap ----------------------------------------------------


def _py_rbo(list_a, list_b, p, k):
    """Textbook RBO_MIN@k: explicit prefix intersections."""
    s = 0.0
    for d in range(1, k + 1):
        x = len(set(list_a[:d]) & set(list_b[:d]))
        s += p ** (d - 1) * x / d
    return (1 - p) * s


def _runs(spark, qid, docs):
    return spark.createDataFrame(
        [(qid, r + 1, d) for r, d in enumerate(docs)],
        "query_id string, rank long, doc_id long")


@pytest.mark.parametrize("p", [0.5, 0.9])
def test_rbo_matches_bruteforce(spark, p):
    from ir_spark.operators.evalir import rbo_overlap

    k = 10
    a = [3, 1, 4, 15, 9, 2, 6, 5, 35, 8]
    b = [3, 4, 1, 9, 99, 2, 35, 7, 8, 100]
    got = rbo_overlap(_runs(spark, "q", a), _runs(spark, "q", b),
                      p=p, k=k).collect()[0]
    want = _py_rbo(a, b, p, k)
    # nano-quantized per-doc weights: micro result within 1 ulp
    assert abs(got["rbo_micro"] - round(want * 1e6)) <= 1
    assert got["overlap_at_k"] == len(set(a) & set(b))


def test_rbo_identical_and_disjoint(spark):
    from ir_spark.operators.evalir import rbo_overlap

    p, k = 0.9, 10
    a = list(range(1, 11))
    same = rbo_overlap(_runs(spark, "q", a), _runs(spark, "q", a),
                       p=p, k=k).collect()[0]
    # identical prefixes: RBO_MIN@k = 1 - p^k exactly
    assert abs(same["rbo_micro"] - round((1 - p ** k) * 1e6)) <= 1
    disj = rbo_overlap(_runs(spark, "q", a),
                       _runs(spark, "q", list(range(100, 110))),
                       p=p, k=k).collect()[0]
    assert disj["rbo_micro"] == 0 and disj["overlap_at_k"] == 0


def test_rbo_per_query_and_missing_query(spark):
    """Multiple queries resolve independently; a query present in only
    one run yields rbo 0 (not a dropped row)."""
    from ir_spark.operators.evalir import rbo_overlap

    a = _runs(spark, "q1", [1, 2, 3]).union(_runs(spark, "q2", [7, 8]))
    b = _runs(spark, "q1", [1, 2, 3])
    rows = {r["query_id"]: r
            for r in rbo_overlap(a, b, p=0.9, k=3).collect()}
    assert set(rows) == {"q1", "q2"}
    assert rows["q1"]["overlap_at_k"] == 3
    assert rows["q2"]["rbo_micro"] == 0 and rows["q2"]["overlap_at_k"] == 0


def test_rbo_rejects_bad_p(spark):
    from ir_spark.operators.evalir import rbo_overlap

    a = _runs(spark, "q", [1])
    for p in (0.0, 1.0, -1.0, 2.0):
        with pytest.raises(ValueError):
            rbo_overlap(a, a, p=p, k=5)


# --- team-draft interleaving (evalir.py::team_draft_interleave) --------------


def _py_tdi(la, lb, qid, salt="tdi"):
    """Pure-Python Radlinski team draft with the operator's md5 coin."""
    import hashlib

    picked, teams, na, nb = [], [], 0, 0
    while True:
        rem_a = [d for d in la if d not in picked]
        rem_b = [d for d in lb if d not in picked]
        if not rem_a or not rem_b:
            break
        if na < nb:
            turn_a = True
        elif na > nb:
            turn_a = False
        else:
            h = hashlib.md5(
                f"{salt}{qid}:{len(picked)}".encode()).hexdigest()
            turn_a = h[0] in "13579bdf"
        picked.append(rem_a[0] if turn_a else rem_b[0])
        teams.append("a" if turn_a else "b")
        na, nb = na + turn_a, nb + (not turn_a)
    return list(zip(range(1, len(picked) + 1), picked, teams))


def test_tdi_matches_bruteforce(spark):
    from ir_spark.operators.evalir import team_draft_interleave

    cases = {
        "q0": ([1, 2, 3, 4], [3, 5, 6, 7]),      # overlap mid-list
        "q1": ([10, 11], [10, 11]),              # identical
        "q2": ([1, 2, 3], [4, 5, 6]),            # disjoint
        "q3": ([1], [2, 3, 4, 5]),               # asymmetric lengths
    }
    ra = None
    rb = None
    for qid, (la, lb) in sorted(cases.items()):
        a, b = _runs(spark, qid, la), _runs(spark, qid, lb)
        ra = a if ra is None else ra.unionByName(a)
        rb = b if rb is None else rb.unionByName(b)
    got = {}
    for r in team_draft_interleave(ra, rb).collect():
        got.setdefault(r["query_id"], []).append(
            (r["pos"], r["doc_id"], r["team"]))
    for qid, (la, lb) in cases.items():
        assert sorted(got.get(qid, [])) == _py_tdi(la, lb, qid), qid


def test_tdi_invariants(spark):
    """No repeats; team sizes differ by <=1; every pick comes from its
    team's list; order within a team follows that team's ranking."""
    from ir_spark.operators.evalir import team_draft_interleave

    la = [5, 9, 1, 7, 3, 8]
    lb = [2, 9, 6, 1, 4, 0]
    rows = sorted(
        team_draft_interleave(_runs(spark, "q", la),
                              _runs(spark, "q", lb)).collect(),
        key=lambda r: r["pos"])
    docs = [r["doc_id"] for r in rows]
    assert len(set(docs)) == len(docs)
    a_picks = [r["doc_id"] for r in rows if r["team"] == "a"]
    b_picks = [r["doc_id"] for r in rows if r["team"] == "b"]
    assert abs(len(a_picks) - len(b_picks)) <= 1
    assert set(a_picks) <= set(la) and set(b_picks) <= set(lb)
    assert a_picks == [d for d in la if d in a_picks]
    assert b_picks == [d for d in lb if d in b_picks]


def test_tdi_credit_winner(spark):
    from ir_spark.operators.evalir import (interleave_credit,
                                           team_draft_interleave)

    inter = team_draft_interleave(_runs(spark, "q", [1, 2, 3]),
                                  _runs(spark, "q", [4, 5, 6]))
    b_docs = [r["doc_id"] for r in inter.collect() if r["team"] == "b"]
    clicks = spark.createDataFrame([("q", d) for d in b_docs[:2]],
                                   "query_id string, doc_id long")
    row = interleave_credit(inter, clicks).collect()[0]
    assert (row["clicks_a"], row["clicks_b"], row["winner"]) == (0, 2, "b")
    # clickless impression still reports, as a tie
    none = interleave_credit(
        inter, spark.createDataFrame([], "query_id string, doc_id long")
    ).collect()[0]
    assert (none["clicks_a"], none["clicks_b"], none["winner"]) == (0, 0,
                                                                    "tie")


# --- pivoted length normalization (query.py::search_pivoted) -----------------


@pytest.mark.parametrize("query", QUERIES)
def test_pivoted_matches_bruteforce(spark, both, query):
    from ir_spark.operators.query import search_pivoted

    idx, oracle = both
    slope = 0.2
    bag = parse_query(query)
    n = len(oracle.docinfo)
    avg_dl = sum(v[0] for v in oracle.docinfo.values()) / n
    out = {}
    for t in sorted(t for t in bag if oracle.postings.get(t)):
        df = len(oracle.postings[t])
        idf = math.log((n + 1.0) / df)
        for d, tf in oracle.postings[t]:
            dl = oracle.docinfo[d][0]
            num = 1.0 + math.log(1.0 + math.log(tf))
            den = 1.0 - slope + slope * dl / avg_dl
            out[d] = out.get(d, 0.0) + bag[t] * num / den * idf
    want = [(d, round(s * 1e6)) for d, s in
            sorted(out.items(), key=lambda r: (-round(r[1] * 1e6), r[0]))[:K]]
    got = [(r["doc_id"], round(r["score"] * 1e6))
           for r in search_pivoted(spark, idx, query, k=K,
                                   slope=slope).collect()]
    assert got == want


def test_pivoted_slope_zero_ignores_length(spark, both):
    """slope=0 removes the length penalty: two docs with identical tf
    profiles for the query terms score identically regardless of dl."""
    from ir_spark.operators.query import search_pivoted

    idx, oracle = both
    rows = search_pivoted(spark, idx, QUERIES[0], k=oracle.n_docs,
                          slope=0.0).collect()
    scores = {r["doc_id"]: r["score"] for r in rows}
    bag = parse_query(QUERIES[0])
    # group docs by their exact (term -> tf) signature over query terms
    sig = {}
    for t in bag:
        for d, tf in oracle.postings.get(t, ()):
            sig.setdefault(d, []).append((t, tf))
    groups = {}
    for d, pairs in sig.items():
        groups.setdefault(tuple(sorted(pairs)), []).append(d)
    for docs in groups.values():
        vals = {round(scores[d] * 1e9) for d in docs if d in scores}
        assert len(vals) == 1
