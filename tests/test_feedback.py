"""RM3 pseudo-relevance feedback (operators/feedback.py) vs a
driver-side pure-Python RM3 built on the frozen oracle index — checks
the full chain (feedback-doc selection, expansion-term mining,
interpolated rescoring) value-for-value on salted web text."""

from __future__ import annotations

import pytest

from ir_spark.operators.feedback import rm3_expansion_terms, search_rm3
from ir_spark.oracle import bm25_weight, build_index, parse_query, search

N_FB, N_EXP, ALPHA, K = 5, 4, 0.6, 10
# fixture-vocabulary query (make_vocab is aero-themed; an absent-term
# query would make every comparison here pass vacuously on empty sets)
QUERY = "boundary layer heat transfer model"


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


def _py_rm3(oracle, query):
    """Pure-Python RM3 with the operator's quantization contract."""
    fb_raw = search(oracle, query, k=oracle.n_docs, mode="bm25")
    fb = sorted(((d, round(s * 1e6)) for d, s in fb_raw),
                key=lambda r: (-r[1], r[0]))[:N_FB]
    orig = set(parse_query(query))
    relw = dict(fb)
    expw: dict[str, float] = {}
    for term, plist in oracle.postings.items():
        if term in orig:
            continue
        s = sum(tf / oracle.docinfo[d][0] * relw[d] / 1e6
                for d, tf in plist if d in relw)
        if s:
            expw[term] = round(s * 1e6)
    exp = sorted(((t, w) for t, w in expw.items() if w > 0),
                 key=lambda r: (-r[1], r[0]))[:N_EXP]
    weights = {t: ALPHA * tf for t, tf in parse_query(query).items()}
    if exp:
        mw = max(w for _, w in exp)
        weights.update({t: (1 - ALPHA) * w / mw for t, w in exp})
    scores: dict[int, float] = {}
    for t, w_tq in weights.items():
        df_t = oracle.df(t)
        for d, tf in oracle.postings.get(t, ()):
            dl = oracle.docinfo[d][0]
            scores[d] = scores.get(d, 0.0) + w_tq * bm25_weight(
                tf, dl, df_t, oracle.n_docs, oracle.avg_doc_len)
    ranked = sorted(((d, round(s * 1e6)) for d, s in scores.items()),
                    key=lambda r: (-r[1], r[0]))
    return exp, ranked[:K]


def test_expansion_terms_match_pure_python(spark, both):
    index, oracle = both
    exp, _ = _py_rm3(oracle, QUERY)
    got = rm3_expansion_terms(spark, index, QUERY, n_fb=N_FB, n_exp=N_EXP)
    assert got == exp
    assert all(t not in parse_query(QUERY) for t, _ in got)


def test_rm3_topk_matches_pure_python(spark, both):
    index, oracle = both
    _, want = _py_rm3(oracle, QUERY)
    raw = search_rm3(spark, index, QUERY, k=K * 5, n_fb=N_FB,
                     n_exp=N_EXP, alpha=ALPHA)
    got = sorted(((r["doc_id"], round(r["score"] * 1e6))
                  for r in raw.collect()), key=lambda r: (-r[1], r[0]))[:K]
    assert got == want


def test_rm3_empty_query(spark, both):
    index, _ = both
    assert search_rm3(spark, index, "of the", k=5).count() == 0


# --- More-Like-This (operators/feedback.py::search_more_like_this) ----------


def _py_mlt_terms(oracle, doc_id, n_terms):
    import math

    n = oracle.n_docs
    w = []
    for term, plist in oracle.postings.items():
        tf = dict(plist).get(doc_id)
        if tf:
            wm = round(1e6 * tf * math.log(n / len(plist)))
            if wm > 0:
                w.append((-wm, term))
    return [t for _, t in sorted(w)[:n_terms]]


def test_mlt_terms_match_pure_python(spark, both):
    from ir_spark.operators.feedback import mlt_query_terms

    index, oracle = both
    doc = sorted(oracle.docinfo)[3]
    assert (mlt_query_terms(spark, index, doc, n_terms=5)
            == _py_mlt_terms(oracle, doc, 5))


def test_mlt_excludes_source_and_ranks_by_bm25(spark, both):
    from ir_spark.operators.feedback import (mlt_query_terms,
                                             search_more_like_this)

    index, oracle = both
    doc = sorted(oracle.docinfo)[3]
    rows = search_more_like_this(spark, index, doc, k=K).collect()
    assert rows and all(r["doc_id"] != doc for r in rows)
    # pure-python BM25 over the same unit-weight bag
    terms = _py_mlt_terms(oracle, doc, 5)
    want = search(oracle, " ".join(terms), k=K + 1, mode="bm25")
    want = [(d, round(s * 1e6)) for d, s in want if d != doc][:K]
    got = [(r["doc_id"], round(r["score"] * 1e6)) for r in rows]
    assert got == want


def test_mlt_unknown_doc_is_empty(spark, both):
    from ir_spark.operators.feedback import search_more_like_this

    index, _ = both
    assert search_more_like_this(spark, index, 10**9, k=5).count() == 0


def test_recency_boost_clamps_future_and_orders(spark, both):
    from pyspark.sql import functions as F

    from ir_spark.operators.query import boost_by_recency

    index, _ = both
    scores = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 10.0)], "doc_id long, score double")
    ts = spark.createDataFrame(
        [(1, "2026-01-01"), (2, "2026-06-30"), (3, "2099-01-01")],
        "doc_id long, ts string").select(
            "doc_id", F.col("ts").cast("date").alias("ts"))
    rows = boost_by_recency(scores, ts, now="2026-06-30",
                            half_life_days=30.0).collect()
    by_id = {r["doc_id"]: r["score"] for r in rows}
    # half-life math: 180 days -> 10/(1+6); same-day -> no decay;
    # future capture clamps to age 0, not a boost above the raw score
    assert abs(by_id[1] - 10.0 / (1 + 180 / 30.0)) < 1e-12
    assert by_id[2] == 10.0 and by_id[3] == 10.0
    assert [r["doc_id"] for r in rows] == [2, 3, 1]


def test_page_after_never_repeats_and_chains_to_exhaustion(spark, both):
    from pyspark.sql import functions as F

    from ir_spark.operators.query import page_after
    from ir_spark.operators.query import search as df_search

    index, oracle = both
    raw = df_search(spark, index, QUERY, k=None, mode="bm25")
    quant = raw.select(
        "doc_id",
        F.round(F.col("score") * 1e6).cast("long").alias("score_micro"))
    total = quant.count()
    want = [(d, round(s * 1e6)) for d, s in
            search(oracle, QUERY, k=total, mode="bm25")]
    seen, pages, cursor = [], 0, None
    while True:
        page = (quant.orderBy(F.desc("score_micro"), F.asc("doc_id"))
                .limit(4).collect() if cursor is None else
                page_after(quant, cursor[0], cursor[1], 4).collect())
        if not page:
            break
        seen.extend((r["doc_id"], r["score_micro"]) for r in page)
        cursor = (page[-1]["score_micro"], page[-1]["doc_id"])
        pages += 1
        assert pages <= total  # termination guard
    assert seen == want  # full ranking, in order, no repeats, no gaps


def test_explain_contributions_sum_to_search_scores(spark, both):
    from pyspark.sql import functions as F

    from ir_spark.operators.query import explain_score
    from ir_spark.operators.query import search as df_search

    index, _ = both
    want = {r["doc_id"]: round(r["score"], 9) for r in
            df_search(spark, index, QUERY, k=None, mode="bm25").collect()}
    got = {
        r["doc_id"]: round(r["s"], 9)
        for r in explain_score(spark, index, QUERY, mode="bm25")
        .groupBy("doc_id").agg(F.sum("contribution").alias("s")).collect()}
    assert got == want
    # stopword-only query explains to nothing
    assert explain_score(spark, index, "of the", mode="bm25").count() == 0


def test_synonym_expansion_semantics(spark, both):
    from ir_spark.operators.query import search_weighted, search_with_synonyms

    index, oracle = both
    q = "shock wave"
    # expansion == explicit weighted bag (originals 1.0, synonyms 0.5,
    # original term wins over a synonym mapping onto it)
    syn = {"shock": ["mach", "wave"], "wave": ["nosuchterm"]}
    want = search_weighted(
        spark, index, {"shock": 1.0, "wave": 1.0, "mach": 0.5},
        k=10, mode="bm25").collect()
    got = search_with_synonyms(spark, index, q, syn, syn_weight=0.5,
                               k=10, mode="bm25").collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
        [(r["doc_id"], round(r["score"], 9)) for r in want]
    # an empty map degrades to plain search
    from ir_spark.operators.query import search as df_search

    plain = df_search(spark, index, q, k=10, mode="bm25").collect()
    none = search_with_synonyms(spark, index, q, {}, k=10,
                                mode="bm25").collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in none] == \
        [(r["doc_id"], round(r["score"], 9)) for r in plain]


# --- query clarity (clarity_score) -------------------------------------------


def _py_clarity(oracle, query, n_fb=10):
    """Pure-Python clarity with the operator's quantization contract:
    BIGINT w_micro RM1 weights, per-term BIGINT micro contributions,
    integer final sum."""
    import math

    if not parse_query(query):
        return None
    fb_raw = search(oracle, query, k=oracle.n_docs, mode="bm25")
    fb = sorted(((d, round(s * 1e6)) for d, s in fb_raw),
                key=lambda r: (-r[1], r[0]))[:n_fb]
    relw = dict(fb)
    w_micro: dict[str, int] = {}
    for term, plist in oracle.postings.items():
        s = sum(tf / oracle.docinfo[d][0] * relw[d] / 1e6
                for d, tf in plist if d in relw)
        w = round(s * 1e6)
        if w > 0:
            w_micro[term] = w
    if not w_micro:
        return None
    w_total = float(sum(w_micro.values()))
    cf = {t: sum(tf for _, tf in pl) for t, pl in oracle.postings.items()}
    c_total = float(sum(cf.values()))
    clarity = sum(
        round(1e6 * (w / w_total)
              * math.log((w * c_total) / (w_total * cf[t])))
        for t, w in w_micro.items())
    return clarity, len(w_micro)


def test_clarity_matches_python_oracle(spark, both):
    from ir_spark.operators.feedback import clarity_score

    idx, oracle = both
    for query in (QUERY, "supersonic wing pressure flow"):
        row = clarity_score(spark, idx, query).collect()
        expect = _py_clarity(oracle, query)
        assert (int(row[0]["clarity_micro"]),
                int(row[0]["n_model_terms"])) == expect


def test_clarity_nonnegative_and_empty_cases(spark, both):
    """KL(P(w|R) || P_coll) >= 0 (P_coll sub-normalized over the model
    support only strengthens the bound); degenerate queries emit no
    row."""
    from ir_spark.operators.feedback import clarity_score

    idx, _ = both
    row = clarity_score(spark, idx, QUERY).collect()
    assert len(row) == 1 and int(row[0]["clarity_micro"]) >= 0
    assert clarity_score(spark, idx, "the a of").count() == 0
    assert clarity_score(spark, idx, "zzzneverseen qqqabsent").count() == 0


def test_clarity_separates_specific_from_ambiguous(spark, both):
    """A vocabulary-specific query should score HIGHER clarity than a
    query of ubiquitous corpus terms (the predictor's whole point)."""
    from ir_spark.operators.feedback import clarity_score

    idx, oracle = both
    # most ubiquitous indexed terms = highest df
    common = sorted(oracle.postings,
                    key=lambda t: -len(oracle.postings[t]))[:3]
    specific = int(clarity_score(spark, idx, QUERY)
                   .collect()[0]["clarity_micro"])
    ambiguous = int(clarity_score(spark, idx, " ".join(common))
                    .collect()[0]["clarity_micro"])
    assert specific > ambiguous


def test_selective_prf_takes_the_predicted_branch(spark, both):
    """Below-threshold clarity -> RM3 ranking; above -> plain BM25;
    no-match query -> plain (nothing to mine)."""
    from pyspark.sql import functions as F

    from ir_spark.operators.feedback import (clarity_score, search_rm3,
                                             search_selective_prf)
    from ir_spark.operators.query import search as df_search

    idx, _ = both
    c = int(clarity_score(spark, idx, QUERY).collect()[0]["clarity_micro"])

    def rows(df):
        return [(r["doc_id"], round(r["score"], 9)) for r in
                df.orderBy(F.desc("score"), F.asc("doc_id")).collect()]

    got, expanded = search_selective_prf(
        spark, idx, QUERY, clarity_threshold_micro=c + 1, k=K)
    assert expanded and rows(got) == rows(
        search_rm3(spark, idx, QUERY, k=K))
    got, expanded = search_selective_prf(
        spark, idx, QUERY, clarity_threshold_micro=c, k=K)
    assert not expanded and rows(got) == rows(
        df_search(spark, idx, QUERY, k=K, mode="bm25"))
    got, expanded = search_selective_prf(
        spark, idx, "zzzneverseen", clarity_threshold_micro=10**9, k=K)
    assert not expanded and got.count() == 0


# --- Rocchio (W2 vector-space pseudo-feedback) ------------------------------

R_N_FB, R_N_EXP, R_ALPHA, R_BETA = 5, 4, 1.0, 0.75


def _py_rocchio_weights(oracle, query):
    """Pure-Python Rocchio with the operator's quantization contract:
    micro-rounded feedback selection and centroid components."""
    from ir_spark.oracle import _doc_weight, max_tf_weight

    bag = parse_query(query)
    if not bag:
        return {}
    max_tf_q = max(bag.values())
    orig_w = {t: max_tf_weight(tf, max_tf_q, oracle.df(t), oracle.n_docs)
              for t, tf in bag.items()}
    fb_raw = search(oracle, query, k=oracle.n_docs, mode="w2")
    fb = [d for d, _ in sorted(((d, round(s * 1e6)) for d, s in fb_raw),
                               key=lambda r: (-r[1], r[0]))[:R_N_FB]]
    fbset = set(fb)
    cent: dict[str, float] = {}
    for term, plist in oracle.postings.items():
        acc = sum(_doc_weight(oracle, "w2", term, d, tf, 1.2, 0.75)
                  for d, tf in plist if d in fbset)
        c = round(1e6 * acc / R_N_FB)
        if c > 0:
            cent[term] = c
    weights = {t: R_ALPHA * w + R_BETA * cent.get(t, 0) / 1e6
               for t, w in orig_w.items()}
    exp = sorted(((t, c) for t, c in cent.items() if t not in orig_w),
                 key=lambda r: (-r[1], r[0]))[:R_N_EXP]
    weights.update({t: R_BETA * c / 1e6 for t, c in exp})
    return weights


def _py_weighted_w2(oracle, weights, k):
    import math

    from ir_spark.oracle import _doc_weight, doc_norms

    q_norm = math.sqrt(sum(w * w for w in weights.values()))
    norms = doc_norms(oracle, "w2")
    dots: dict[int, float] = {}
    for term, w_tq in weights.items():
        for d, tf in oracle.postings.get(term, []):
            dots[d] = dots.get(d, 0.0) + _doc_weight(
                oracle, "w2", term, d, tf, 1.2, 0.75) * w_tq
    scored = [(d, (s / norms[d] / q_norm) if norms[d] > 0 and q_norm > 0
               else 0.0) for d, s in dots.items()]
    return sorted(((d, round(s * 1e6)) for d, s in scored),
                  key=lambda r: (-r[1], r[0]))[:k]


def test_rocchio_weights_match_pure_python(spark, both):
    from ir_spark.operators.feedback import rocchio_weights

    idx, oracle = both
    got = rocchio_weights(spark, idx, QUERY, n_fb=R_N_FB, n_exp=R_N_EXP,
                          alpha=R_ALPHA, beta=R_BETA)
    want = _py_rocchio_weights(oracle, QUERY)
    assert set(got) == set(want)
    for t in want:
        assert got[t] == pytest.approx(want[t], abs=1e-9), t


def test_rocchio_topk_matches_pure_python(spark, both):
    from ir_spark.operators.feedback import search_rocchio

    idx, oracle = both
    raw = search_rocchio(spark, idx, QUERY, k=K, n_fb=R_N_FB,
                         n_exp=R_N_EXP, alpha=R_ALPHA, beta=R_BETA)
    got = [(r.doc_id, round(r.score * 1e6)) for r in raw.collect()]
    want = _py_weighted_w2(oracle, _py_rocchio_weights(oracle, QUERY), K)
    assert got == want


def test_rocchio_expansion_actually_expands(spark, both):
    """The expanded bag strictly contains the original terms plus up
    to n_exp new ones with positive weights."""
    from ir_spark.operators.feedback import rocchio_weights

    idx, oracle = both
    got = rocchio_weights(spark, idx, QUERY, n_fb=R_N_FB, n_exp=R_N_EXP)
    orig = set(parse_query(QUERY))
    new = set(got) - orig
    assert orig <= set(got)
    assert 0 < len(new) <= R_N_EXP
    assert all(got[t] > 0 for t in new)


def test_rocchio_empty_query(spark, both):
    from ir_spark.operators.feedback import search_rocchio

    idx, _ = both
    assert search_rocchio(spark, idx, "the of and", k=5).count() == 0


# --- WIG / NQC post-retrieval QPP (feedback.py::qpp_wig_nqc) -----------------


def _py_qpp(oracle, queries, k):
    """Pure-Python WIG/NQC with the operator's integer contract."""
    import math

    out = {}
    for qid, q in enumerate(queries):
        bag = parse_query(q)
        corpus = 0
        n_terms = 0
        any_known = False
        for t, qtf in bag.items():
            df_t = oracle.df(t)
            if df_t == 0:
                continue  # |q| counts dictionary terms only (join sem.)
            n_terms += qtf
            any_known = True
            cf = sum(tf for _, tf in oracle.postings[t])
            idf = math.log(1.0 + (oracle.n_docs - df_t + 0.5) / (df_t + 0.5))
            partial = (1e6 * idf * (cf * 2.2)
                       / (cf + 1.2 * (0.25 + 0.75 * oracle.n_docs)) * qtf)
            corpus += int(round(partial))
        run = sorted(((d, round(s * 1e6)) for d, s in
                      search(oracle, q, k=oracle.n_docs, mode="bm25")),
                     key=lambda r: (-r[1], r[0]))[:k]
        if not run or not any_known:
            continue
        ku = len(run)
        s_sum = sum(s for _, s in run)
        s_sumsq = sum(s * s for _, s in run)
        wig = round((s_sum / ku - corpus) / math.sqrt(n_terms))
        nqc = round(1e9 * math.sqrt(ku * s_sumsq - s_sum * s_sum)
                    / (ku * corpus))
        out[qid] = (ku, n_terms, corpus, int(wig), int(nqc))
    return out


def test_qpp_wig_nqc_matches_pure_python(spark, both):
    from collections import Counter

    from ir_spark.operators.feedback import qpp_wig_nqc
    from ir_spark.operators.query import search as spark_search
    from ir_spark.text import STOPWORDS, tokenize

    index, oracle = both
    queries = [QUERY, "heat", "the of and", "zzznope boundary"]
    k = 5
    run_rows = []
    for qid, q in enumerate(queries):
        if not parse_query(q):
            continue
        raw = spark_search(spark, index, q, k=oracle.n_docs, mode="bm25")
        top = (raw.selectExpr(
            "doc_id", "CAST(ROUND(score * 1000000) AS LONG) AS score_micro")
            .orderBy("score_micro", ascending=False).collect())
        top = sorted(top, key=lambda r: (-r["score_micro"], r["doc_id"]))[:k]
        run_rows += [(qid, r["score_micro"]) for r in top]
    run = spark.createDataFrame(run_rows, "query_id long, score_micro long")
    qd = [(qid, t, tf) for qid, q in enumerate(queries)
          for t, tf in sorted(Counter(
              t for t in tokenize(q) if t not in STOPWORDS).items())]
    qterms = spark.createDataFrame(qd, "query_id long, term string, qtf long")
    got = {r["query_id"]: (r["k_used"], r["n_terms"], r["corpus_micro"],
                           r["wig_micro"], r["nqc_nano"])
           for r in qpp_wig_nqc(run, qterms, index).collect()}
    assert got == _py_qpp(oracle, queries, k)
    # semantic floor: single very-selective term ("heat") should look
    # BETTER (higher wig) than the partly-unseen query's residual
    assert 1 in got and 3 in got
    # all-stopword query emits nothing
    assert 2 not in got


def test_qpp_single_doc_run_has_zero_variance(spark, both):
    from ir_spark.operators.feedback import qpp_wig_nqc

    index, _ = both
    run = spark.createDataFrame([(0, 1_000_000)],
                                "query_id long, score_micro long")
    qterms = spark.createDataFrame([(0, "boundary", 1)],
                                   "query_id long, term string, qtf long")
    rows = qpp_wig_nqc(run, qterms, index).collect()
    assert len(rows) == 1 and rows[0]["nqc_nano"] == 0
