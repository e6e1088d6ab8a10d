"""Driver-mirror parity for the analytics gates: every gate's Spark
result must equal its DuckDB oracle on the driver testdata (sf0.001),
as row sets — the same comparison the per-round harness runs."""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(rows):
    out = []
    for r in rows:
        row = []
        for v in r:
            if isinstance(v, float):
                assert float(v).is_integer() or math.isnan(v), (
                    "gates must emit integer-quantized values")
                v = int(v)
            row.append(v)
        out.append(tuple(row))
    return sorted(out)


def _gate_names():
    from ir_spark import gates_analytics

    return sorted(gates_analytics.analytics_queries())


@pytest.mark.parametrize("name", _gate_names())
def test_gate_matches_oracle(spark, duck, name):
    from ir_spark import gates_analytics

    q = gates_analytics.analytics_queries()[name]
    sql = gates_analytics.analytics_oracle_sql()[name]

    sdf = q(spark, SF_DIR)
    spark_rows = _norm([tuple(r) for r in sdf.collect()])
    duck_rows = _norm(duck.sql(sql).fetchall())

    assert len(spark_rows) > 0, f"{name}: empty result weakens the gate"
    assert [f.lower() for f in sdf.columns] == [
        d[0].lower() for d in duck.sql(sql).description]
    assert spark_rows == duck_rows, (
        f"{name}: first diff "
        f"{next((a, b) for a, b in zip(spark_rows, duck_rows) if a != b)}"
        if len(spark_rows) == len(duck_rows)
        else f"{name}: row counts {len(spark_rows)} vs {len(duck_rows)}"
    )


# --- corpus curation operator semantics (beyond oracle parity) -------------

def test_decontaminate_flags_copied_ngram(spark):
    from ir_spark.operators import corpus as C

    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            (1, "x y alpha beta gamma delta z"),      # shares a bench 4-gram
            (2, "totally unrelated words go here ok"),
            (3, "alpha beta gamma"),                  # 3 tokens: no 4-gram
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in C.decontaminate(corpus, bench, n=4).collect()}
    assert out[1].contaminated == 1 and out[1].n_contaminated_grams == 1
    assert out[2].contaminated == 0 and out[2].n_grams > 0
    # too short for any 4-gram: trivially uncontaminated, but the row
    # must EXIST — a missing row falls out of contaminated=0 keep sets
    assert out[3].contaminated == 0 and out[3].n_grams == 0


def test_host_profile_and_blocklist(spark):
    """Host-level curation: dup mass, mean tokens, majority language,
    and the blocklist thresholds."""
    from ir_spark.operators.corpus import host_blocklist, host_profile

    docs = spark.createDataFrame(
        [(1, "same spam page", "en", "spam.example"),
         (2, "same spam page", "en", "spam.example"),
         (3, "same spam page", "zh", "spam.example"),
         (4, "a real article with many words here", "en", "ok.example"),
         (5, "another real article some words", "fr", "ok.example"),
         (6, "x", "en", "short.example")],
        "doc_id long, text string, lang string, source string")
    prof = {r.host: r for r in host_profile(docs).collect()}
    assert prof["spam.example"].n_docs == 3
    assert prof["spam.example"].n_dup_docs == 2
    assert prof["spam.example"].dup_frac_micro == 666667
    assert prof["spam.example"].top_lang == "en"
    assert prof["ok.example"].n_dup_docs == 0
    # majority tie (1 en, 1 fr) -> lang ASC
    assert prof["ok.example"].top_lang == "en"
    assert prof["short.example"].mean_tokens_micro == 1000000

    blocked = {r.host for r in host_blocklist(
        host_profile(docs), max_dup_frac=0.5,
        min_mean_tokens=2.0).collect()}
    assert blocked == {"spam.example", "short.example"}


def test_weighted_sample_is_deterministic_and_weight_biased(spark):
    """A-ES sampling: reruns give identical membership; heavier docs
    are sampled more often (inclusion prob ∝ weight)."""
    from ir_spark.operators.corpus import weighted_sample

    docs = spark.createDataFrame(
        [(i, 100 if i % 2 == 0 else 1) for i in range(400)],
        "doc_id long, w long")
    a = sorted(r.doc_id for r in
               weighted_sample(docs, weight_col="w", n=50).collect())
    b = sorted(r.doc_id for r in
               weighted_sample(docs, weight_col="w", n=50).collect())
    assert a == b and len(a) == 50
    heavy = sum(1 for d in a if d % 2 == 0)
    assert heavy >= 40, heavy  # 100:1 weights dominate the sample

    # zero/negative weights are excluded outright
    z = weighted_sample(
        spark.createDataFrame([(1, 0), (2, -3), (3, 5)],
                              "doc_id long, w long"),
        weight_col="w", n=10).collect()
    assert [r.doc_id for r in z] == [3]


def test_decontaminate_bloom_no_false_negatives(spark):
    """Bloom decontamination flags every truly contaminated doc (no
    false negatives) and at a comfortable bitmap size introduces no
    false positives either on this corpus."""
    from ir_spark.operators import corpus as C

    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "x y alpha beta gamma delta z"),
         (2, "totally unrelated words go here ok"),
         (3, "alpha beta gamma")],
        ["doc_id", "text"])
    out = {r.doc_id: r for r in C.decontaminate_bloom(
        corpus, bench, n=4, n_bits=1 << 16).collect()}
    assert out[1].contaminated == 1 and out[1].n_bloom_hits == 1
    assert out[2].contaminated == 0
    assert 3 not in out

    # a saturated 64-bit / 3-hash filter over a larger bench MUST
    # still catch doc 1 (the no-false-negative guarantee) — and at
    # these exact deterministic hash values it false-positives doc 2,
    # the safe direction
    big_bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lam mu nu xi omicron pi rho sigma tau upsilon "
             "phi chi psi omega one two three four five six seven "
             "eight nine ten")],
        ["doc_id", "text"])
    tiny = {r.doc_id: r for r in C.decontaminate_bloom(
        corpus, big_bench, n=4, n_bits=64, n_hashes=3).collect()}
    assert tiny[1].contaminated == 1
    assert tiny[2].contaminated == 1


def test_repetition_profile_flags_repetitive_doc(spark):
    from ir_spark.operators import corpus as C

    docs = spark.createDataFrame(
        [
            (1, "spam ham spam ham spam ham spam ham"),
            (2, "one two three four five six seven eight"),
            (3, "xy"),                                 # single token: no grams
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in C.repetition_profile(docs).collect()}
    # doc 1: 7 bigrams, "spam ham" occurs 4x -> 4/7 > 0.20; 6 trigrams all
    # duplicated ("spam ham spam" x3 / "ham spam ham" x3) -> 6/6 > 0.30
    assert out[1].top_bigram_frac_micro == round(4 / 7 * 1e6)
    assert out[1].dup_trigram_frac_micro == 1_000_000
    assert out[1].keep == 0
    # doc 2: all bigrams unique -> top = 1/7, no duplicate trigram
    assert out[2].top_bigram_frac_micro == round(1 / 7 * 1e6)
    assert out[2].dup_trigram_frac_micro == 0
    assert out[2].keep == 1
    # doc 3: nothing to repeat -> fractions 0, kept
    assert out[3].top_bigram_frac_micro == 0 and out[3].keep == 1


def test_stratified_sample_deterministic_and_thresholded(spark):
    from ir_spark.operators import corpus as C

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rates = {"en": 0.5, "zh": 0.8}
    a = sorted(tuple(r) for r in C.stratified_sample(docs, rates).collect())
    b = sorted(tuple(r) for r in C.stratified_sample(docs, rates).collect())
    assert a == b and len(a) > 0  # pure function of doc_id: rerun-identical
    for _doc_id, lang, key_micro in a:
        limit = rates.get(lang, 1.0) * 1e6
        assert key_micro <= limit  # kept rows are under their stratum rate


def test_mix_report_shares_sum_to_whole(spark):
    from ir_spark.operators import corpus as C

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = C.mix_report(docs).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    # micro-shares sum to 1e6 up to rounding (half a micro per stratum)
    assert abs(sum(r.token_share_micro for r in rows) - 1_000_000) <= len(rows)


# --- skew-resistance invariants (100-TB design guarantees) -----------------

def test_head_term_run_sharding_bounds_segment_rows(spark, tmp_path):
    """A Zipf-head term occurring in EVERY doc must never concentrate in
    one reducer/segment row: posting runs are doc-range sharded, so no
    (term, run) row holds more than range_width postings, and queries
    on the head term still rank correctly."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ir_spark.operators.segment_query import SegmentIndex, search_segments
    from ir_spark.operators.segments import build_segment_index, decode_segments

    n_docs, rw = 2000, 256
    rows = [{"url": f"doc://{i:012d}",
             "text": ("everywhere " * 3) + f"unique{i} filler{i % 7}"}
            for i in range(n_docs)]
    pages = spark.createDataFrame(pd.DataFrame(rows))
    d = str(tmp_path / "skew_idx")
    build_segment_index(spark, pages, d, source="skew", range_width=rw)

    seg = spark.read.parquet(f"{d}/segments")
    head = seg.filter(F.col("term") == "everywhere")
    per_row = head.select("run", "run_df").collect()
    # spread over every doc range (ids are 1-based: assign_doc_ids)
    assert len(per_row) == len({i // rw for i in range(1, n_docs + 1)})
    assert all(r["run_df"] <= rw for r in per_row)
    # and the decoded head-term postings cover every doc exactly once
    dec = decode_segments(head)
    assert dec.count() == n_docs
    assert dec.select("doc_id").distinct().count() == n_docs

    # ranking still exact: every doc ties on the head term (same tf);
    # unique terms break ties -> query mixing both must put the
    # matching unique doc first
    sidx = SegmentIndex.load(spark, d)
    top = search_segments(spark, sidx, "everywhere unique42", k=3,
                          mode="bm25").collect()
    dm = {r["doc_id"]: r["url"]
          for r in spark.read.parquet(f"{d}/doc_map").collect()}
    assert dm[top[0]["doc_id"]] == "doc://000000000042"


def test_lsh_degenerate_bucket_cap(spark):
    """Identical boilerplate pages at web scale form one giant LSH
    bucket whose quadratic pair expansion no join strategy can absorb;
    max_bucket drops it (routing to exact dedup) while normal-sized
    buckets still produce pairs."""
    import pandas as pd

    from ir_spark.operators.dedup import (
        lsh_bands, lsh_candidate_pairs, minhash_signatures, word_shingles)

    boiler = [{"doc_id": i, "text": "same boilerplate page body here okay"}
              for i in range(50)]
    near = [{"doc_id": 100 + i,
             "text": f"distinct{i} alpha beta gamma delta epsilon zeta"}
            for i in range(2)]
    docs = spark.createDataFrame(pd.DataFrame(boiler + near))
    bands = lsh_bands(minhash_signatures(word_shingles(docs, n=3)), 4, 4)
    capped = lsh_candidate_pairs(bands, max_bucket=10).collect()
    uncapped = lsh_candidate_pairs(bands, max_bucket=1000).collect()
    boiler_ids = set(range(50))
    # cap kills the 50-doc boilerplate bucket (would be 1225 pairs)...
    assert not any(r["a"] in boiler_ids for r in capped)
    assert any(r["a"] in boiler_ids for r in uncapped)
    # ...but keeps the small near-dup bucket
    assert {(r["a"], r["b"]) for r in capped} == {(100, 101)}


def test_ivf_index_build_probe_and_pruning(spark, tmp_path):
    """Materialized IVF index: cell-partitioned store, directory-level
    partition pruning on probes, probe-all == exact brute force, and a
    member query's own vector is found with a single probe."""
    import io
    import os as _os
    from contextlib import redirect_stdout

    from ir_spark.operators.similarity import (
        build_ivf_index, cosine_topk, ivf_index_topk)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    d = str(tmp_path / "ivf")
    man = build_ivf_index(emb, d, n_cells=4, max_iter=5, seed=42)
    assert man["n_vectors"] == emb.count()
    cells = [p for p in _os.listdir(_os.path.join(d, "vectors"))
             if p.startswith("cell=")]
    assert len(cells) == 4  # one directory per codebook cell

    qv = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]

    # partial probe: the scan must carry a directory-level
    # PartitionFilter on cell (no full-index read)
    probe = ivf_index_topk(spark, d, qv, k=5, n_probe=1)
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan
    # the query vector is a member -> its own cell contains it
    assert probe.head()["vec_id"] == 0

    # probe-all over the partitioned store == brute force on the source
    exact = [(r["vec_id"], round(r["score"], 9))
             for r in cosine_topk(emb, qv, k=10).collect()]
    via_index = [(r["vec_id"], round(r["score"], 9))
                 for r in ivf_index_topk(spark, d, qv, k=10,
                                         n_probe=4).collect()]
    assert via_index == exact


def test_ivf_multi_assignment_recall_and_dedupe(spark, tmp_path):
    """Multi-assignment IVF (replicas > 1): each vector is spilled into
    its R nearest cells.  (a) the store holds exactly R copies of every
    vector, (b) probed results never contain a duplicate vec_id,
    (c) probe-all still equals exact brute force, (d) recall at a fixed
    n_probe is >= the single-assignment index's (the point of
    spilling)."""
    from ir_spark.operators.similarity import (
        build_ivf_index, cosine_topk, ivf_index_topk)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    d1 = str(tmp_path / "ivf_r1")
    d3 = str(tmp_path / "ivf_r3")
    build_ivf_index(emb, d1, n_cells=4, max_iter=5, seed=42)
    man = build_ivf_index(emb, d3, n_cells=4, max_iter=5, seed=42,
                          replicas=3)
    assert man["replicas"] == 3
    store = spark.read.parquet(f"{d3}/vectors")
    assert store.count() == 3 * n
    # every vector present exactly R times, in R distinct cells
    from pyspark.sql import functions as F
    per = store.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("c"),
        F.countDistinct("cell").alias("dc")).collect()
    assert all(r["c"] == 3 and r["dc"] == 3 for r in per)

    qv = [float(x) for x in emb.filter("vec_id = 1").head()["embedding"]]
    got = ivf_index_topk(spark, d3, qv, k=10, n_probe=2).collect()
    ids = [r["vec_id"] for r in got]
    assert len(ids) == len(set(ids))  # deduped

    exact = [(r["vec_id"], round(r["score"], 9))
             for r in cosine_topk(emb, qv, k=10).collect()]
    allprobe = [(r["vec_id"], round(r["score"], 9))
                for r in ivf_index_topk(spark, d3, qv, k=10,
                                        n_probe=4).collect()]
    assert allprobe == exact

    truth = {t[0] for t in exact}
    r1 = {r["vec_id"] for r in ivf_index_topk(spark, d1, qv, k=10,
                                              n_probe=2).collect()}
    r3 = {r["vec_id"] for r in ivf_index_topk(spark, d3, qv, k=10,
                                              n_probe=2).collect()}
    assert len(r3 & truth) >= len(r1 & truth)


def test_pq_refined_two_phase(spark):
    """pq_topk_refined: (a) returned scores are the EXACT cosine of the
    candidate rows (bit-equal to cosine_scores on those ids), (b) the
    refine join reads at most k*overfetch rows, (c) recall@10 is >= the
    raw ADC ranking's (rerank can only fix candidate ordering)."""
    from ir_spark.operators.similarity import (
        cosine_scores, cosine_topk, pq_encode, pq_topk, pq_topk_refined,
        pq_train_kmeans)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_train_kmeans(emb, m=8, ksub=16, sample=10_000, seed=7)
    codes = pq_encode(emb, books)
    qv = [float(x) for x in emb.filter("vec_id = 2").head()["embedding"]]

    k, of = 10, 5
    refined = pq_topk_refined(codes, books, emb, qv, k=k,
                              overfetch=of).collect()
    assert 0 < len(refined) <= k
    exact_by_id = {r["vec_id"]: r["score"]
                   for r in cosine_scores(emb, qv).collect()}
    for r in refined:
        assert r["score"] == exact_by_id[r["vec_id"]]  # exact rerank

    truth = {r["vec_id"] for r in cosine_topk(emb, qv, k=k).collect()}
    raw = {r["vec_id"] for r in pq_topk(codes, books, qv, k=k).collect()}
    ref = {r["vec_id"] for r in refined}
    assert len(ref & truth) >= len(raw & truth)


def test_pq_kmeans_recall_and_determinism(spark, tmp_path):
    """PQ with the real k-means codebook: (a) encode is deterministic
    across runs, (b) ADC top-10 recall vs exact cosine is usable at
    32x compression, (c) more centroids never hurt on this fixture."""
    import numpy as np

    from ir_spark.operators.similarity import (cosine_topk, pq_encode,
                                               pq_topk, pq_train_kmeans)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0")
          .collect()[0]["embedding"]]
    exact = {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    recalls, mses = {}, {}
    for ksub in (16, 64):
        books = pq_train_kmeans(emb, m=8, ksub=ksub, sample=500, seed=7)
        codes = pq_encode(emb, books)
        got = {r["vec_id"] for r in pq_topk(codes, books, qv, k=10).collect()}
        recalls[ksub] = len(got & exact) / 10
        # determinism: same books + same data -> identical codes
        c1 = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
        c2 = {r["vec_id"]: list(r["codes"])
              for r in pq_encode(emb, books).collect()}
        assert c1 == c2
        # reconstruction MSE (the quantity more centroids provably help)
        err = 0.0
        for vid, cs in c1.items():
            rec = np.concatenate([books[j, c] for j, c in enumerate(cs)])
            err += float(((vecs[vid] - rec) ** 2).mean())
        mses[ksub] = err / len(c1)
    assert recalls[16] >= 0.5, recalls
    assert recalls[64] >= 0.3, recalls          # sanity floor: ADC top-10
    #                                             recall is NOT monotone in
    #                                             ksub, quantization error is
    assert mses[64] < mses[16], mses
    # compression: m bytes vs 4*D
    assert 8 / (4 * 64) < 0.05


def test_pq_rejects_bad_shapes(spark):
    import numpy as np

    from ir_spark.operators.similarity import (pq_sampled_codebook,
                                               pq_topk, pq_train_kmeans)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError):
        pq_train_kmeans(emb, m=7, ksub=16)     # 64 % 7 != 0
    books = pq_sampled_codebook(emb, m=8, ksub=16)
    assert books.shape == (8, 16, 8)
    with pytest.raises(ValueError):
        pq_topk(None, books, [0.0] * 63)        # query dim mismatch


def test_rrf_fuse_semantics(spark):
    """RRF: score = sum 1/(c+rank) with 0 for missing lists; ties break
    by id ascending."""
    from ir_spark.operators.hybrid import rrf_fuse

    lex = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], ["doc_id", "rank"])
    dense = spark.createDataFrame([(20, 1), (40, 2)], ["doc_id", "rank"])
    out = {r["doc_id"]: (r["rrf_micro"], r["rank"])
           for r in rrf_fuse([lex, dense], k=10, c=60).collect()}
    assert out[20] == (round((1 / 61 + 1 / 62) * 1e6), 1)  # in both lists
    assert out[10][0] == round(1 / 61 * 1e6)
    assert out[40][0] == round(1 / 62 * 1e6)
    # 10 (rank 1 lexical-only) beats 40 (rank 2 dense-only); doc 30 last
    assert out[10][1] == 2 and out[40][1] == 3 and out[30][1] == 4
    # same-rank singletons tie on score -> id-asc order
    a = spark.createDataFrame([(7, 1)], ["doc_id", "rank"])
    b = spark.createDataFrame([(3, 1)], ["doc_id", "rank"])
    rows = rrf_fuse([a, b], k=2).collect()
    assert [r["doc_id"] for r in rows] == [3, 7]


def test_combsum_fuse_semantics(spark):
    """CombSUM/CombMNZ: per-list min-max normalization, 0 for missing,
    MNZ multiplies by the number of containing lists; id-asc ties."""
    from ir_spark.operators.hybrid import combsum_fuse

    lex = spark.createDataFrame(
        [(10, 900), (20, 500), (30, 100)], ["doc_id", "score_micro"])
    dense = spark.createDataFrame(
        [(20, 80), (40, 20)], ["doc_id", "score_micro"])
    # norms: lex 10->1.0 20->0.5 30->0.0 ; dense 20->1.0 40->0.0
    out = {r["doc_id"]: (r["fused_micro"], r["rank"])
           for r in combsum_fuse([lex, dense], k=10).collect()}
    assert out[20] == (round(1.5e6), 1)
    assert out[10] == (round(1.0e6), 2)
    assert out[30][0] == 0 and out[40][0] == 0
    assert (out[30][1], out[40][1]) == (3, 4)  # id-asc tie

    mnz = {r["doc_id"]: r["fused_micro"]
           for r in combsum_fuse([lex, dense], k=10, mnz=True).collect()}
    assert mnz[20] == round(3.0e6)      # 1.5 * 2 lists
    assert mnz[10] == round(1.0e6)      # 1.0 * 1 list
    # constant list -> all 1.0
    const = spark.createDataFrame([(1, 7), (2, 7)], ["doc_id", "score_micro"])
    c = {r["doc_id"]: r["fused_micro"]
         for r in combsum_fuse([const], k=5).collect()}
    assert c == {1: round(1e6), 2: round(1e6)}


def test_duplicate_span_coverage_brute_force(spark):
    """Coverage == union of length-n intervals over positions whose
    gram occurs in >=2 docs, verified against a pure-Python oracle."""
    from ir_spark.operators.dedup import duplicate_span_coverage

    n = 3
    docs = [
        # 1 and 2 share "a b c d e" (positions overlap/merge); 3 unique
        (1, "a b c d e x y z"),
        (2, "q q a b c d e"),
        (3, "totally different words here now"),
        (4, ""),                      # empty doc -> all zeros
        (5, "one two"),               # shorter than n -> no grams
    ]
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict()
           for r in duplicate_span_coverage(sdf, n=n).collect()}

    # pure-Python oracle
    from collections import defaultdict
    gram_docs = defaultdict(set)
    per_doc = {}
    for did, text in docs:
        w = [t for t in text.split(" ") if t]
        grams = [tuple(w[i:i + n]) for i in range(len(w) - n + 1)]
        per_doc[did] = (w, grams)
        for g in grams:
            gram_docs[g].add(did)
    for did, text in docs:
        w, grams = per_doc[did]
        dup_pos = [i for i, g in enumerate(grams) if len(gram_docs[g]) >= 2]
        covered = set()
        for i in dup_pos:
            covered.update(range(i, i + n))
        r = got[did]
        assert r["n_tokens"] == len(w)
        assert r["n_grams"] == len(grams)
        assert r["n_dup_positions"] == len(dup_pos)
        assert r["covered_tokens"] == len(covered)
        exp_frac = (len(covered) * 1000000) // len(w) if w else 0
        assert r["dup_token_frac_micro"] == exp_frac


def test_cap_per_source_deterministic(spark):
    from ir_spark.operators.corpus import cap_per_source

    rows = [(i, f"s{i % 3}") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out1 = sorted((r["source"], r["host_rank"], r["doc_id"])
                  for r in cap_per_source(docs, cap=5).collect())
    out2 = sorted((r["source"], r["host_rank"], r["doc_id"])
                  for r in cap_per_source(docs, cap=5).collect())
    assert out1 == out2                       # rerun-stable membership
    per_src = {}
    for src, rk, _ in out1:
        per_src.setdefault(src, []).append(rk)
    assert set(per_src) == {"s0", "s1", "s2"}
    for ranks in per_src.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]   # exactly cap kept
    # a source under the cap keeps everything
    small = spark.createDataFrame([(1, "x"), (2, "x")], ["doc_id", "source"])
    assert cap_per_source(small, cap=5).count() == 2
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cap_per_source(small, cap=0)


def test_ivf_recall_monotone_in_probes(spark, tmp_path):
    """Retrieval QUALITY evidence for the IVF index (the pruning test
    above proves plan shape only): recall@10 vs exact brute force is
    monotone non-decreasing in n_probe (probe sets are nested) and
    exactly 1.0 at n_probe = n_cells."""
    from ir_spark.operators.similarity import (
        build_ivf_index, cosine_topk, ivf_index_topk)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    d = str(tmp_path / "ivf8")
    build_ivf_index(emb, d, n_cells=8, max_iter=5, seed=42)
    probes = (1, 2, 4, 8)
    per_probe = {p: 0.0 for p in probes}
    qids = [0, 17, 123]
    for qid in qids:
        qv = [float(x)
              for x in emb.filter(f"vec_id = {qid}").head()["embedding"]]
        truth = {r.vec_id for r in cosine_topk(emb, qv, k=10).collect()}
        for p in probes:
            got = {r.vec_id
                   for r in ivf_index_topk(spark, d, qv, k=10,
                                           n_probe=p).collect()}
            per_probe[p] += len(truth & got) / 10.0
    recalls = [per_probe[p] / len(qids) for p in probes]
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0, recalls


def test_dsir_importance_matches_pure_python(spark):
    """dsir_importance vs an independent single-process reimplementation
    (hashlib md5 bucketing, Counter distributions, add-1 smoothing)."""
    import hashlib
    import math
    from collections import Counter

    from ir_spark.operators.corpus import dsir_importance

    B = 64
    rows = [
        (0, "the quick brown fox"),
        (1, "the quick quick fox"),
        (2, "pack my box with jugs"),
        (3, "sphinx of black quartz"),
        (4, "the lazy dog sleeps"),
    ]
    target_ids = {0, 1}

    def buckets(text):
        toks = text.split(" ")
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return Counter(
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B
            for g in grams)

    per_doc = {d: buckets(t) for d, t in rows}
    tgt = Counter()
    raw = Counter()
    for d, c in per_doc.items():
        raw.update(c)
        if d in target_ids:
            tgt.update(c)
    tt, rt = sum(tgt.values()), sum(raw.values())
    want = {}
    for d, c in per_doc.items():
        want[d] = sum(
            n * (math.log((tgt.get(b, 0) + 1.0) / (tt + B))
                 - math.log((raw[b] + 1.0) / (rt + B)))
            for b, n in c.items())

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter(F.col("doc_id").isin(sorted(target_ids)))
    got = {r.doc_id: r.dsir_logw
           for r in dsir_importance(docs, target, n_buckets=B).collect()}
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])
    # target-like docs score higher than off-distribution ones
    assert min(got[0], got[1]) > max(got[2], got[3])


def test_ivf_build_idempotent_resume(spark, tmp_path):
    """Re-running build_ivf_index over a completed index is a no-op
    (the manifest is written last, so its presence certifies the
    build); a changed shape rebuilds."""
    import os as _os

    from ir_spark.operators.similarity import build_ivf_index

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    d = str(tmp_path / "ivf")
    m1 = build_ivf_index(emb, d, n_cells=4, max_iter=3, seed=42)
    mtime = _os.path.getmtime(_os.path.join(d, "ivf_manifest.json"))
    m2 = build_ivf_index(emb, d, n_cells=4, max_iter=3, seed=42)
    assert m2 == m1
    assert _os.path.getmtime(_os.path.join(d, "ivf_manifest.json")) == mtime
    m3 = build_ivf_index(emb, d, n_cells=8, max_iter=3, seed=42)
    assert m3["n_cells"] == 8


def test_nfc_normalize_semantics(spark):
    from pyspark.sql import functions as F

    from ir_spark.operators.textstats import nfc_normalize

    rows = spark.createDataFrame(
        [(1, "café"),        # combining acute -> shrinks to café
         (2, "café"),          # already NFC
         (3, "Å"),            # combining ring -> Å
         (4, "plain ascii")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in nfc_normalize(rows).collect()}
    assert [got[i]["was_nfc"] for i in (1, 2, 3, 4)] == [0, 1, 0, 1]
    assert got[1]["norm_text"] == "café"
    assert got[1]["bytes_before"] == 6 and got[1]["bytes_after"] == 5
    assert got[3]["norm_text"] == "Å"
    # idempotent: normalizing the output is the identity
    again = nfc_normalize(
        nfc_normalize(rows).select(
            "doc_id", F.col("norm_text").alias("text"))).collect()
    assert all(r["was_nfc"] == 1 for r in again)


# --- paragraph dedup / chunking / C4 line filter (round 3) -------------------


def _para_oracle(rows, delim="\n"):
    """Pure-python first-seen paragraph dedup oracle."""
    import hashlib

    occs = []  # (doc_id, idx, para)
    for doc_id, text in rows:
        for idx, para in enumerate(text.split(delim)):
            if para.strip():
                occs.append((doc_id, idx, para))
    first = {}
    for doc_id, idx, para in sorted(occs):
        first.setdefault(para, (doc_id, idx))
    out = {}
    for doc_id, idx, para in occs:
        n_paras, kept = out.setdefault(doc_id, [0, []])
        out[doc_id][0] += 1
        if first[para] == (doc_id, idx):
            out[doc_id][1].append((idx, para))
    return {
        d: (n, len(k),
            hashlib.md5(delim.join(p for _, p in sorted(k)).encode()).hexdigest())
        for d, (n, k) in out.items()
    }


def test_dedup_paragraphs_first_seen_wins(spark):
    from ir_spark.operators.dedup import dedup_paragraphs

    header = "subscribe to our newsletter"
    rows = [
        (1, f"{header}\nalpha beta gamma\ndelta epsilon"),
        (2, f"{header}\nzeta eta theta\n\n  \nalpha beta gamma"),
        (3, "iota kappa\niota kappa\nunique line here"),  # within-doc dup
        (4, header),                                       # loses everything
    ]
    got = {r["doc_id"]: (r["n_paras"], r["n_kept"], r["kept_md5"])
           for r in dedup_paragraphs(
               spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert got == _para_oracle(rows)
    # doc 4's only para was first seen in doc 1 -> nothing kept
    assert got[4][1] == 0
    # doc 3 keeps its first "iota kappa" occurrence but not the second
    assert got[3] == (3, 2, _para_oracle(rows)[3][2])


def test_dedup_paragraphs_no_cross_dups_is_identity(spark):
    from ir_spark.operators.dedup import dedup_paragraphs

    rows = [(i, f"only doc {i} line one\nonly doc {i} line two")
            for i in range(5)]
    got = dedup_paragraphs(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()
    assert all(r["n_paras"] == r["n_kept"] == 2 for r in got)


def test_chunk_documents_windows(spark):
    import hashlib

    from ir_spark.operators.corpus import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    rows = [(1, text), (2, "a b"), (3, "")]
    got = chunk_documents(
        spark.createDataFrame(rows, "doc_id long, text string"),
        chunk=4, stride=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 tokens, chunk 4 stride 3 -> 1 + ceil(6/3) = 3 windows
    w1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [(r["start"], r["n_chunk_tokens"]) for r in w1] == [
        (0, 4), (3, 4), (6, 4)]
    toks = text.split(" ")
    for r in w1:
        expect = " ".join(toks[r["start"]:r["start"] + 4])
        assert r["chunk_md5"] == hashlib.md5(expect.encode()).hexdigest()
    # doc 2: shorter than one chunk -> exactly one short window
    assert [(r["start"], r["n_chunk_tokens"]) for r in by_doc[2]] == [(0, 2)]
    # doc 3: empty -> no rows
    assert 3 not in by_doc


def test_chunk_documents_full_coverage_no_empty_tail(spark):
    from ir_spark.operators.corpus import chunk_documents

    # n = 9, chunk 4, stride 4 -> starts 0,4,8 (tail window length 1);
    # n = 8 -> starts 0,4 only (no empty start-at-8 window)
    for n, starts in [(9, [0, 4, 8]), (8, [0, 4])]:
        rows = [(1, " ".join(f"t{i}" for i in range(n)))]
        got = chunk_documents(
            spark.createDataFrame(rows, "doc_id long, text string"),
            chunk=4, stride=4).collect()
        assert sorted(r["start"] for r in got) == starts
        assert sum(r["n_chunk_tokens"] for r in got) == n


def test_c4_line_filter_rules(spark):
    import hashlib

    from ir_spark.operators.corpus import c4_line_filter

    rows = [
        # keeps 3 lines -> keep=1
        (1, "this line ends well.\nshort.\nuses JavaScript heavily today.\n"
            "another good line here!\nis this kept?\nno terminal punct"),
        # lorem ipsum page -> keep=0 even with enough good lines
        (2, "lorem ipsum dolor sit amet.\ngood line number two.\n"
            "good line number three."),
        # curly brace page -> keep=0
        (3, "var x = {a: 1}.\ngood line number two.\ngood line three."),
        # too few kept lines -> keep=0
        (4, "only one good line here."),
    ]
    got = {r["doc_id"]: r for r in c4_line_filter(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    d1 = got[1]
    # kept: "this line ends well.", "another good line here!", "is this kept?"
    assert (d1["n_lines"], d1["n_kept_lines"], d1["keep"]) == (6, 3, 1)
    kept = "this line ends well.\nanother good line here!\nis this kept?"
    assert d1["kept_md5"] == hashlib.md5(kept.encode()).hexdigest()
    assert got[2]["keep"] == 0 and got[2]["n_kept_lines"] == 3
    assert got[3]["keep"] == 0
    assert got[4]["keep"] == 0 and got[4]["n_kept_lines"] == 1


# --- simhash Hamming-ball near-dup pairs (round 3) ---------------------------


def _hamming_pairs_oracle(fps, k):
    """Brute-force all-pairs Hamming <= k over (doc_id, simhash)."""
    out = set()
    for i, (a, sa) in enumerate(fps):
        for b, sb in fps[i + 1:]:
            lo, hi = min(a, b), max(a, b)
            d = bin(sa ^ sb).count("1")
            if d <= k:
                out.add((lo, hi, d))
    return out


def test_simhash_near_dup_pairs_crafted(spark):
    from ir_spark.operators.dedup import simhash_near_dup_pairs

    base = 0b10110010101001011100101010010110
    fps = [
        (1, base),
        (2, base),                    # dist 0
        (3, base ^ 0b1),              # dist 1
        (4, base ^ 0b11000000000000), # dist 2
        (5, base ^ (1 << 31) ^ (1 << 15) ^ (1 << 7)),  # dist 3, spread bands
        (6, base ^ 0b1111),           # dist 4 -> excluded at k=3
        (7, 0),                       # far from everything
    ]
    got = {(r["a"], r["b"], r["dist"]) for r in simhash_near_dup_pairs(
        spark.createDataFrame(fps, "doc_id long, simhash long"),
        k=3).collect()}
    assert got == _hamming_pairs_oracle(fps, 3)
    assert (1, 2, 0) in got and (1, 5, 3) in got
    # doc 6 is dist 4 from docs 1/2 (excluded) but dist 3 from doc 3
    assert (1, 6, 4) not in got and (2, 6, 4) not in got
    assert (3, 6, 3) in got


def test_simhash_near_dup_pairs_random_recall_is_exact(spark):
    """Pigeonhole blocking must find EVERY pair at dist <= k (no
    probabilistic miss): operator == brute force on clustered-random
    fingerprints."""
    import random

    from ir_spark.operators.dedup import simhash_near_dup_pairs

    rng = random.Random(1234)
    fps = []
    doc = 0
    for _ in range(40):  # 40 clusters of 1-3 near variants
        center = rng.getrandbits(32)
        for _ in range(rng.randint(1, 3)):
            v = center
            for _ in range(rng.randint(0, 4)):  # some exceed k
                v ^= 1 << rng.randrange(32)
            fps.append((doc, v))
            doc += 1
    got = {(r["a"], r["b"], r["dist"]) for r in simhash_near_dup_pairs(
        spark.createDataFrame(fps, "doc_id long, simhash long"),
        k=2).collect()}
    assert got == _hamming_pairs_oracle(fps, 2)


def test_simhash_near_dup_pairs_bucket_cap_and_validation(spark):
    from ir_spark.operators.dedup import simhash_near_dup_pairs

    same = [(i, 12345) for i in range(10)]
    df = spark.createDataFrame(same, "doc_id long, simhash long")
    # identical fingerprints overflow every band bucket past the cap
    assert simhash_near_dup_pairs(df, k=1, max_bucket=5).count() == 0
    # and are all found when the cap allows
    assert simhash_near_dup_pairs(df, k=1, max_bucket=100).count() == 45
    import pytest as _pt
    with _pt.raises(ValueError):
        simhash_near_dup_pairs(df, k=4, n_tables=4)
    with _pt.raises(ValueError):
        simhash_near_dup_pairs(df, n_tables=5)


# --- Gopher document-level quality filter (round 3) ---------------------------


def test_gopher_quality_filter_rules(spark):
    from ir_spark.operators.corpus import gopher_quality_filter

    good = " ".join(["the", "of", "and"] + ["wordy"] * 60)
    docs = [
        (1, good),                                    # passes every rule
        (2, " ".join(["the", "of"] + ["word"] * 10)),  # < 50 words
        (3, good + " " + " ".join(["#"] * 10)),        # hash ratio > 0.1
        (4, "\n".join(["• " + good, "• the of more here"])),  # all bullets
        (5, "\n".join([good + " ...", "the of a ...", "b c ..."])),  # ell lines
        (6, " ".join(["the", "of"] + ["12345"] * 60)),  # alpha frac < 0.8
        (7, " ".join(["zz"] * 60)),                    # mean len 2 + no stops
        (8, ""),                                       # empty
        (9, good + "\nthe of tail line"),              # 2 lines, none flagged
        (10, good.replace("the of and", "the")),       # only 1 stopword kind
    ]
    got = {r["doc_id"]: r for r in gopher_quality_filter(
        spark.createDataFrame(docs, "doc_id long, text string")).collect()}
    assert len(got) == len(docs)
    assert got[1]["keep"] == 1 and got[1]["n_stop_kinds"] == 3
    assert got[2]["keep"] == 0 and got[2]["n_words"] < 50
    assert got[3]["keep"] == 0 and got[3]["hash_ratio_micro"] > 100_000
    assert got[4]["keep"] == 0 and got[4]["bullet_line_frac_micro"] == 1_000_000
    assert got[5]["keep"] == 0 and got[5]["ellipsis_line_frac_micro"] == 1_000_000
    assert got[6]["keep"] == 0 and got[6]["alpha_frac_micro"] < 800_000
    assert got[7]["keep"] == 0 and got[7]["mean_word_len_micro"] == 2_000_000
    assert got[7]["n_stop_kinds"] == 0
    assert got[8]["keep"] == 0 and got[8]["n_words"] == 0
    assert got[9]["keep"] == 1
    assert got[10]["keep"] == 0 and got[10]["n_stop_kinds"] == 1


def test_gopher_quality_single_char_ellipsis_and_mixed_bullets(spark):
    from ir_spark.operators.corpus import gopher_quality_filter

    base = " ".join(["the", "of"] + ["token"] * 58)
    docs = [
        # one '…' char: counts toward ellipsis ratio AND line fraction
        (1, base + " …"),
        # 1 of 4 lines bulleted (0.25 <= 0.9) and 1 of 4 ellipsis-ended
        # (0.25 <= 0.3): both fractions nonzero but passing
        (2, "\n".join(["- " + base, base, base, base + " ..."])),
    ]
    got = {r["doc_id"]: r for r in gopher_quality_filter(
        spark.createDataFrame(docs, "doc_id long, text string")).collect()}
    assert got[1]["ellipsis_ratio_micro"] > 0
    assert got[1]["ellipsis_line_frac_micro"] == 1_000_000  # its only line
    assert got[1]["keep"] == 0
    assert got[2]["bullet_line_frac_micro"] == 250_000
    assert got[2]["ellipsis_line_frac_micro"] == 250_000
    assert got[2]["keep"] == 1


# --- Count-Min / Bloom sketches (round 3) -------------------------------------


def _py_bucket(term, seed, modulus):
    import hashlib

    h = hashlib.md5(f"{seed}:{term}".encode()).hexdigest()
    return int(h[:8], 16) % modulus


def test_count_min_upper_bound_and_exact_recompute(spark):
    from ir_spark.operators.sketch import count_min_build, count_min_estimate

    counts = [("alpha", 100), ("beta", 40), ("gamma", 7), ("delta", 1),
              ("epsilon", 3), ("zeta", 12)]
    depth, width = 3, 16  # narrow width forces collisions
    tc = spark.createDataFrame(counts, "term string, cnt long")
    cms = count_min_build(tc, depth=depth, width=width)
    # the table never exceeds depth*width rows
    assert cms.count() <= depth * width
    probes = spark.createDataFrame(
        [(t,) for t, _ in counts] + [("absent",)], "term string")
    got = {r["term"]: r["est"] for r in count_min_estimate(
        cms, probes, depth=depth, width=width).collect()}
    # python recompute of the exact same sketch
    table = {}
    for t, c in counts:
        for r in range(depth):
            key = (r, _py_bucket(t, r, width))
            table[key] = table.get(key, 0) + c
    for t, c in counts + [("absent", 0)]:
        want = min(table.get((r, _py_bucket(t, r, width)), 0)
                   for r in range(depth))
        assert got[t] == want
        assert got[t] >= c  # CMS never underestimates


def test_bloom_no_false_negatives_and_exact_recompute(spark):
    from ir_spark.operators.sketch import bloom_build, bloom_might_contain

    members = ["alpha", "beta", "gamma", "delta"]
    k, m = 4, 64  # small m so some false positive is plausible
    t = spark.createDataFrame([(x,) for x in members], "term string")
    bloom = bloom_build(t, n_hashes=k, n_bits=m)
    assert bloom.count() <= min(k * len(members), m)
    probes = members + ["absent1", "absent2", "absent3"]
    got = {r["term"]: r["might_contain"] for r in bloom_might_contain(
        bloom, spark.createDataFrame([(x,) for x in probes], "term string"),
        n_hashes=k, n_bits=m).collect()}
    bits = {_py_bucket(x, i, m) for x in members for i in range(k)}
    for x in probes:
        want = int(all(_py_bucket(x, i, m) in bits for i in range(k)))
        assert got[x] == want
    for x in members:
        assert got[x] == 1  # no false negatives, ever


def test_hll_registers_exact_recompute_and_estimate(spark):
    import hashlib

    from ir_spark.operators.sketch import hll_build, hll_estimate

    b = 6  # m = 64 buckets
    terms = [f"term_{i}" for i in range(500)]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {r["bucket"]: r["register"]
           for r in hll_build(df, b=b).collect()}
    # python recompute of the identical construction
    want = {}
    tail = 32 - b
    for t in terms:
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        bucket, w = h >> tail, h % (1 << tail)
        rho = (tail - (w.bit_length() - 1)) if w > 0 else tail + 1
        want[bucket] = max(want.get(bucket, 0), rho)
    assert got == want
    # estimator lands near the true cardinality (sigma ~ 1.04/sqrt(64)
    # = 13%; allow 3 sigma)
    est = hll_estimate(hll_build(df, b=b), b=b)
    assert abs(est - 500) / 500 < 0.39
    # duplicates do not move the registers: union of 5 copies == once
    df5 = df.union(df).union(df).union(df).union(df)
    est5 = hll_estimate(hll_build(df5, b=b), b=b)
    assert est5 == est
    # small-range correction path: 3 distinct values
    tiny = spark.createDataFrame([("a",), ("b",), ("c",)], "term string")
    est_tiny = hll_estimate(hll_build(tiny, b=b), b=b)
    assert 1 <= est_tiny <= 6
    import pytest as _pt
    with _pt.raises(ValueError):
        hll_build(df, b=2)


def test_srp_signature_hamming_tracks_cosine(spark):
    """Charikar SRP: identical vectors -> identical signatures;
    similar vectors (cosine ~0.5) have systematically smaller Hamming
    distance than unrelated ones (E[dist] = bits * angle / pi)."""
    import math
    import random

    from ir_spark.operators.similarity import srp_signatures

    rng = random.Random(11)
    base = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(20)]
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v))
        rows.append((100 + i, list(v)))                      # exact copy
        rows.append((200 + i, [x + rng.gauss(0, 1) for x in v]))  # ~0.7 cos
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sig = {r.vec_id: r.simhash
           for r in srp_signatures(df, dim=64, n_bits=32).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert all(sig[i] == sig[100 + i] for i in range(20))
    noisy = sum(ham(sig[i], sig[200 + i]) for i in range(20)) / 20
    unrelated = sum(ham(sig[i], sig[(i + 7) % 20]) for i in range(20)) / 20
    # cos ~0.7 -> angle ~0.25*pi -> E[dist] ~ 8; unrelated ~ 16
    assert noisy < unrelated - 3, (noisy, unrelated)
    assert noisy < 12, noisy


def test_pretoken_stats_matches_python_re(spark):
    """BPE-style pre-tokenizer counts equal a brute-force Python re
    pass over strings mixing every class, incl. unicode, empty, and
    whitespace-only docs."""
    import re

    from ir_spark.operators.textstats import BPE_PRETOKEN_RE, pretoken_stats

    texts = [
        "Hello, world!  42x -3.5 test_case",
        "它是 unicode 2024!!! ...",
        "",
        "   \t\n  ",
        "a1b2c3",
        "!!!???...",
        "plain words only here",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: (r.n_pretokens, r.n_alpha, r.n_num, r.n_punct)
           for r in pretoken_stats(df).collect()}
    rx = re.compile(BPE_PRETOKEN_RE)
    for i, t in enumerate(texts):
        toks = rx.findall(t)
        want = (len(toks),
                sum(1 for x in toks if re.fullmatch("[A-Za-z]+", x)),
                sum(1 for x in toks if re.fullmatch("[0-9]+", x)),
                sum(1 for x in toks if re.fullmatch(r"[^A-Za-z0-9\s]+", x)))
        assert got[i] == want, (i, t, got[i], want)


def test_mmr_rerank_matches_bruteforce_and_diversifies(spark):
    """mmr_rerank == an independent pure-python greedy MMR on the same
    micro-quantized sims, and a planted exact duplicate of the best hit
    is deferred below a less-relevant-but-diverse vector."""
    import math

    import pandas as pd

    from ir_spark.operators.similarity import mmr_rerank

    # 8-dim fixture: vec 1 = near-query, vec 2 = EXACT COPY of vec 1,
    # vec 3 = orthogonal-ish but still relevant, rest = noise.
    q = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    vecs = {
        1: [0.71, 0.70, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        2: [0.71, 0.70, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        3: [0.70, -0.70, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        4: [0.5, 0.0, 0.0, 0.85, 0.0, 0.0, 0.0, 0.0],
        5: [0.1, 0.2, 0.0, 0.0, 0.9, 0.0, 0.0, 0.0],
        6: [0.05, 0.0, 0.3, 0.0, 0.0, 0.9, 0.0, 0.0],
    }
    emb = spark.createDataFrame(
        pd.DataFrame({
            "vec_id": list(vecs),
            "embedding": [[float(x) for x in v] for v in vecs.values()],
            "label": [0] * len(vecs),
        }))
    got = {r["sel_rank"]: (r["vec_id"], r["obj_micro"])
           for r in mmr_rerank(emb, q, k=4, n_candidates=6).collect()}

    def cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        nu = math.sqrt(sum(a * a for a in u))
        nv = math.sqrt(sum(a * a for a in v))
        return d / nu / nv if nu > 0 and nv > 0 else 0.0

    rel = {i: round(cos(v, q) * 1e6) for i, v in vecs.items()}
    sim = {(i, j): round(cos(vi, vj) * 1e6)
           for i, vi in vecs.items() for j, vj in vecs.items() if i != j}
    chosen, expect = [], {}
    for rank in range(1, 5):
        best = None
        for v in vecs:
            if v in chosen:
                continue
            pen = max((sim[(v, s)] for s in chosen), default=0)
            obj = 7 * rel[v] - 3 * pen
            if best is None or (obj, -v) > (best[1], -best[0]):
                best = (v, obj)
        chosen.append(best[0])
        expect[rank] = best
    assert got == expect
    # first pick is the plain cosine argmax; its exact copy (sim 1.0,
    # penalty 3e6) must NOT be second — a diverse vector overtakes it.
    assert got[1][0] == 1
    assert got[2][0] != 2
    assert 2 in {v for v, _ in got.values()}  # ...but it still gets in


def test_vocab_growth_matches_python(spark):
    """vocab_growth equals a per-prefix brute-force recount, and
    heaps_fit recovers (k, beta) from exact Heaps data."""
    from ir_spark.operators.textstats import heaps_fit, vocab_growth

    docs = [(0, "aa bb cc"), (1, "aa dd"), (2, "bb ee ff aa"),
            (3, "gg"), (4, "aa aa hh")]
    toks = []
    for d, text in docs:
        from collections import Counter
        for t, tf in Counter(text.split()).items():
            toks.append((d, t, tf))
    tdf = spark.createDataFrame(toks, "doc_id long, term string, tf long")
    cps = [1, 3, 5]
    got = {r["n_docs"]: (r["n_tokens"], r["vocab_size"])
           for r in vocab_growth(tdf, cps).collect()}
    for c in cps:
        prefix = [t for d, text in docs[:c] for t in text.split()]
        assert got[c] == (len(prefix), len(set(prefix))), c

    # heaps_fit: exact synthetic V = 3 * n^0.55
    rows = [(n, round(3 * n ** 0.55)) for n in
            (10_000, 50_000, 200_000, 1_000_000)]
    k, beta = heaps_fit(rows)
    assert abs(beta - 0.55) < 0.01 and abs(k - 3) < 0.2

    import pytest as _pt
    with _pt.raises(ValueError):
        vocab_growth(tdf, [])
    with _pt.raises(ValueError):
        heaps_fit([(100, 10)])


class TestCorpusDrift:
    def test_identical_slices_zero_jsd(self, spark):
        from ir_spark.operators.corpus import corpus_drift

        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta", "a" if i % 2 else "b")
             for i in range(20)],
            "doc_id long, text string, lang string")
        rows = {r.slice: r for r in corpus_drift(docs).collect()}
        assert set(rows) == {"a", "b"}
        for r in rows.values():
            assert abs(r.jsd_bits) < 1e-12
            assert r.n_slice_tokens == 40

    def test_disjoint_slices_one_bit(self, spark):
        from ir_spark.operators.corpus import corpus_drift

        docs = spark.createDataFrame(
            [(0, "aa bb cc dd", "x"), (1, "ee ff gg hh", "y")],
            "doc_id long, text string, lang string")
        rows = {r.slice: r.jsd_bits for r in corpus_drift(docs).collect()}
        assert rows.keys() == {"x", "y"}
        for v in rows.values():
            assert abs(v - 1.0) < 1e-12

    def test_single_slice_empty(self, spark):
        from ir_spark.operators.corpus import corpus_drift

        docs = spark.createDataFrame(
            [(0, "aa bb", "only")], "doc_id long, text string, lang string")
        assert corpus_drift(docs).count() == 0


class TestHostBoilerplate:
    def test_template_stripped_per_host_only(self, spark):
        from ir_spark.operators.corpus import host_boilerplate

        # host A: banner on every page; host B: same banner on ONE page
        rows = [(i, f"banner\nbody {i}", "A") for i in range(5)]
        rows += [(10, "banner\nunique ten", "B"),
                 (11, "other\nunique eleven", "B"),
                 (12, "more\nunique twelve", "B")]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = {r.doc_id: r for r in host_boilerplate(
            docs, min_docs=3, min_frac=0.5).collect()}
        for i in range(5):                      # host A: banner stripped
            assert out[i].n_boiler == 1 and out[i].n_paras == 2
        for i in (10, 11, 12):                  # host B: nothing recurs
            assert out[i].n_boiler == 0

    def test_kept_md5_matches_joined_text(self, spark):
        import hashlib

        from ir_spark.operators.corpus import host_boilerplate

        docs = spark.createDataFrame(
            [(i, f"nav\nbody {i}\nfooter", "h") for i in range(4)],
            "doc_id long, text string, source string")
        out = {r.doc_id: r.kept_md5 for r in host_boilerplate(
            docs, min_docs=3, min_frac=0.5).collect()}
        for i in range(4):
            want = hashlib.md5(f"body {i}".encode()).hexdigest()
            assert out[i] == want


def test_word_shingles_whitespace_renormalization(spark):
    """A page and its double-spaced copy must produce IDENTICAL
    shingles (empty split tokens dropped, matching the SQL oracle) —
    otherwise near-dup Jaccard between them is deflated."""
    from ir_spark.operators.dedup import word_shingles

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha  beta gamma  delta")],
        "doc_id long, text string")
    sh = {d: set() for d in (1, 2)}
    for r in word_shingles(docs, n=3).collect():
        sh[r["doc_id"]].add(r["shingle"])
    assert sh[1] == sh[2] == {"alpha beta gamma", "beta gamma delta"}
