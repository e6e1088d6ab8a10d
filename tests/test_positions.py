"""Positional index + phrase / proximity search (operators/positions.py).

Ground truth is a driver-side pure-Python evaluation over the frozen
``tokenize`` stream — same texts, same pipeline — so the Spark side is
checked value-for-value including messy salted web text (the DuckDB
gate covers only the clean space-separated corpus).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ir_spark.operators.positions import (
    build_positional_store,
    phrase_search,
    phrase_search_store,
    proximity_search,
    read_positional_store,
    token_positions,
)
from ir_spark.text import tokenize


@pytest.fixture(scope="module")
def docs(spark, pages_small):
    path, pages = pages_small
    from ir_spark.operators.build import assign_doc_ids

    raw = spark.read.parquet(path)
    ids = assign_doc_ids(raw)
    df = raw.join(ids, "url").select("doc_id", "text")
    return df, {r["doc_id"]: r["text"] for r in df.collect()}


def _py_positions(texts: dict[int, str]) -> dict[tuple[int, str], list[int]]:
    out: dict[tuple[int, str], list[int]] = {}
    for doc_id, text in texts.items():
        for pos, term in enumerate(tokenize(text)):
            out.setdefault((doc_id, term), []).append(pos)
    return out


def _py_phrase(texts, terms):
    """(doc_id -> count of phrase START positions), overlaps allowed."""
    out = {}
    for doc_id, text in texts.items():
        toks = tokenize(text)
        n = sum(
            1
            for i in range(len(toks) - len(terms) + 1)
            if toks[i : i + len(terms)] == list(terms)
        )
        if n:
            out[doc_id] = n
    return out


def test_token_positions_matches_pure_python(docs):
    df, texts = docs
    got = {
        (r["doc_id"], r["term"]): list(r["positions"])
        for r in token_positions(df).collect()
    }
    assert got == _py_positions(texts)


def _pick_phrase(texts, k):
    """Most frequent k-gram in the fixture corpus (deterministic)."""
    from collections import Counter

    c: Counter = Counter()
    for text in texts.values():
        toks = tokenize(text)
        for i in range(len(toks) - k + 1):
            c[tuple(toks[i : i + k])] += 1
    (terms, n), = c.most_common(1)
    assert n >= 2
    return list(terms)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_phrase_search_matches_brute_force(docs, k):
    df, texts = docs
    terms = _pick_phrase(texts, k)
    rel = token_positions(df)
    got = {r["doc_id"]: r["phrase_tf"]
           for r in phrase_search(rel, terms).collect()}
    assert got == _py_phrase(texts, terms)


def test_phrase_overlapping_occurrences(spark):
    df = spark.createDataFrame(
        [(1, "batch batch batch end"), (2, "batch end batch batch")],
        "doc_id long, text string")
    rel = token_positions(df)
    got = {r["doc_id"]: r["phrase_tf"]
           for r in phrase_search(rel, ["batch", "batch"]).collect()}
    assert got == {1: 2, 2: 1}


def test_phrase_term_missing_everywhere(docs):
    df, _ = docs
    rel = token_positions(df)
    assert phrase_search(rel, ["zzz_unseen", "term"]).count() == 0


def test_proximity_matches_brute_force(docs):
    df, texts = docs
    # two mid-frequency terms guaranteed by the fixture vocabulary
    pos = _py_positions(texts)
    from collections import Counter

    term_df = Counter(t for (_, t) in pos)
    a, b = [t for t, _ in term_df.most_common(6)][4:6]
    window = 8
    want = {}
    for doc_id in {d for (d, t) in pos if t == a}:
        if (doc_id, b) not in pos:
            continue
        dist = min(
            abs(pa - pb)
            for pa in pos[(doc_id, a)]
            for pb in pos[(doc_id, b)]
        )
        if dist <= window:
            want[doc_id] = dist
    rel = token_positions(df)
    got = {r["doc_id"]: r["min_dist"]
           for r in proximity_search(rel, a, b, window).collect()}
    assert got == want


def test_positional_store_round_trip(spark, docs, tmp_path):
    """Compressed store decode == direct relation, for a term subset
    spanning several buckets; phrase via store == phrase via relation."""
    df, texts = docs
    store = str(tmp_path / "posidx")
    build_positional_store(spark, df, store)
    rel = token_positions(df)

    terms = _pick_phrase(texts, 2)
    probe = sorted({*terms, "the"} )
    direct = {
        (r["doc_id"], r["term"]): list(r["positions"])
        for r in rel.filter(F.col("term").isin(probe)).collect()
    }
    decoded = {
        (r["doc_id"], r["term"]): list(r["positions"])
        for r in read_positional_store(spark, store, probe).collect()
    }
    assert decoded == direct

    via_store = {r["doc_id"]: r["phrase_tf"]
                 for r in phrase_search_store(spark, store, terms).collect()}
    assert via_store == _py_phrase(texts, terms)


def test_store_scan_prunes_buckets(spark, docs, tmp_path):
    """The store read plan keeps only the queried terms' buckets (dir
    pruning) — the 100 TB property: a phrase query reads len(phrase)
    buckets, not the corpus."""
    df, _ = docs
    store = str(tmp_path / "posidx")
    build_positional_store(spark, df, store)
    plan = read_positional_store(
        spark, store, ["the"])._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"partition filters: \[[^\]]*bucket", plan, re.I)
    assert m or "PartitionFilters" in plan, plan[:2000]


def test_sloppy_phrase_matches_brute_force(docs):
    from collections import Counter

    from ir_spark.operators.positions import sloppy_phrase_search

    df, texts = docs
    pos = _py_positions(texts)
    term_df = Counter(t for (_, t) in pos)
    a, b = [t for t, _ in term_df.most_common(6)][4:6]
    slop = 3
    want = {}
    for doc_id in {d for (d, t) in pos if t == a}:
        if (doc_id, b) not in pos:
            continue
        gaps = [pb - pa
                for pa in pos[(doc_id, a)]
                for pb in pos[(doc_id, b)] if pb > pa]
        if gaps and min(gaps) <= slop + 1:
            want[doc_id] = min(gaps)
    rel = token_positions(df)
    got = {r["doc_id"]: r["min_gap"]
           for r in sloppy_phrase_search(rel, a, b, slop).collect()}
    assert got == want
    # ordered: b-before-a-only docs must NOT match (directional check)
    rev = {r["doc_id"] for r in sloppy_phrase_search(rel, b, a, slop).collect()}
    assert rev != set(got) or not got


def test_proximity_repeated_term_stress(spark):
    """A pathological doc repeating both terms thousands of times: the
    merged-adjacent-pair formulation stays linear per doc (the old
    pairwise flatten materialized |a|*|b| = 4M distances here) and
    still finds the exact min distance."""
    from ir_spark.operators.positions import proximity_search, token_positions

    # interleave: 'aa' at even word slots, 'bb' at odd -> min dist 1
    words = []
    for _ in range(2000):
        words.extend(["aa", "bb"])
    # one far-apart doc: min dist = 11
    docs = spark.createDataFrame(
        [(1, " ".join(words)),
         (2, "bb " + " ".join(["xx"] * 10) + " aa")],
        "doc_id long, text string")
    pos = token_positions(docs)
    got = {r.doc_id: r.min_dist
           for r in proximity_search(pos, "aa", "bb", window=100).collect()}
    assert got == {1: 1, 2: 11}


class TestSpanNear:
    """span_near_search: Lucene SpanNearQuery semantics over n
    single-term clauses — exact minimal window, ordered + unordered."""

    def _brute(self, texts, terms, slop, ordered):
        import itertools

        n = len(terms)
        want = {}
        for doc_id, text in texts:
            toks = tokenize(text)
            occ = [[p for p, w in enumerate(toks) if w == t] for t in terms]
            if any(not o for o in occ):
                continue
            widths = [
                max(c) - min(c) + 1
                for c in itertools.product(*occ)
                if len(set(c)) == n
                and (not ordered
                     or all(c[j] < c[j + 1] for j in range(n - 1)))
            ]
            if widths and min(widths) - n <= slop:
                want[doc_id] = min(widths)
        return want

    def test_matches_brute_force(self, spark):
        import random

        from ir_spark.operators.positions import span_near_search

        rng = random.Random(11)
        vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
        texts = [(i, " ".join(rng.choice(vocab)
                              for _ in range(rng.randint(3, 60))))
                 for i in range(60)]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        rel = token_positions(df)
        for terms, slop, ordered in [
            (["aa", "bb"], 2, True),
            (["aa", "bb"], 2, False),
            (["aa", "bb", "cc"], 3, True),
            (["aa", "bb", "cc"], 4, False),
            (["aa", "bb", "cc", "dd"], 6, True),
            (["aa", "bb", "cc", "dd"], 8, False),
            (["cc", "aa", "bb"], 0, True),   # exact adjacent triple
        ]:
            got = {r["doc_id"]: r["min_span"]
                   for r in span_near_search(rel, terms, slop,
                                             ordered).collect()}
            assert got == self._brute(texts, terms, slop, ordered), (
                terms, slop, ordered)

    def test_ordered_vs_unordered(self, spark):
        from ir_spark.operators.positions import span_near_search

        df = spark.createDataFrame(
            [(1, "cc xx bb xx aa"),          # reverse order only
             (2, "aa xx bb xx cc"),          # in order, span 5
             (3, "aa bb cc")],               # in order, span 3
            "doc_id long, text string")
        rel = token_positions(df)
        terms = ["aa", "bb", "cc"]
        ordered = {r["doc_id"]: r["min_span"]
                   for r in span_near_search(rel, terms, 2, True).collect()}
        assert ordered == {2: 5, 3: 3}
        unordered = {r["doc_id"]: r["min_span"]
                     for r in span_near_search(rel, terms, 2,
                                               False).collect()}
        assert unordered == {1: 5, 2: 5, 3: 3}
        # slop 0: only the adjacent run qualifies
        tight = {r["doc_id"]: r["min_span"]
                 for r in span_near_search(rel, terms, 0, True).collect()}
        assert tight == {3: 3}

    def test_rejects_degenerate_clauses(self, spark):
        from ir_spark.operators.positions import span_near_search

        df = spark.createDataFrame([(1, "aa bb")],
                                   "doc_id long, text string")
        rel = token_positions(df)
        with pytest.raises(ValueError):
            span_near_search(rel, ["aa"], 1)
        with pytest.raises(ValueError):
            span_near_search(rel, ["aa", "aa"], 1)

    def test_repeated_term_stress_linear(self, spark):
        """Pathological doc with thousands of occurrences of every
        clause: the single-pass scan stays linear (a pairwise product
        would be 1000^3 here) and still returns the exact min."""
        from ir_spark.operators.positions import span_near_search

        words = []
        for _ in range(1000):
            words.extend(["aa", "bb", "cc"])
        df = spark.createDataFrame(
            [(1, " ".join(words)),
             (2, "cc " + " ".join(["xx"] * 7) + " aa bb xx cc")],
            "doc_id long, text string")
        rel = token_positions(df)
        got = {r["doc_id"]: r["min_span"]
               for r in span_near_search(rel, ["aa", "bb", "cc"], 7,
                                         True).collect()}
        assert got == {1: 3, 2: 4}


class TestPhraseBoost:
    def test_boost_reranks_phrase_doc(self, spark):
        """Two docs with identical BM25 bags; only one has the exact
        phrase — it must win, by exactly boost*ln(2) (phrase_tf=1)."""
        import math

        from ir_spark.operators.build import build_dataframe_index
        from ir_spark.operators.positions import (search_phrase_boosted,
                                                  token_positions)
        from ir_spark.operators.query import search

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta"),
             (2, "beta alpha gamma delta")],
            "doc_id long, text string")
        idx = build_dataframe_index(docs)
        rel = token_positions(docs)
        base = {r.doc_id: r.score
                for r in search(spark, idx, "alpha beta", k=2).collect()}
        assert base[1] == pytest.approx(base[2])
        boosted = {r.doc_id: r.score for r in search_phrase_boosted(
            spark, idx, rel, "alpha beta", ["alpha", "beta"],
            k=2, boost=0.7).collect()}
        assert boosted[1] == pytest.approx(base[1] + 0.7 * math.log(2))
        assert boosted[2] == pytest.approx(base[2])

    def test_rejects_non_query_phrase(self, spark):
        from ir_spark.operators.build import build_dataframe_index
        from ir_spark.operators.positions import (search_phrase_boosted,
                                                  token_positions)

        docs = spark.createDataFrame([(1, "alpha beta")],
                                     "doc_id long, text string")
        idx = build_dataframe_index(docs)
        rel = token_positions(docs)
        with pytest.raises(ValueError):
            search_phrase_boosted(spark, idx, rel, "alpha",
                                  ["alpha", "zeta"], k=1)


class TestBestWindowSnippets:
    """best_window_snippets: exact max-weight window, earliest tie."""

    def _brute(self, texts, weights, W):
        want = {}
        for doc_id, text in texts:
            toks = tokenize(text)
            best = None
            for end in range(len(toks)):
                if toks[end] not in weights:
                    continue
                lo = max(0, end - W + 1)
                seen = {t for t in toks[lo:end + 1] if t in weights}
                sc = sum(weights[t] for t in seen)
                if best is None or sc > best[1]:
                    best = (max(0, end - W + 1), sc, len(seen))
            if best is not None:
                want[doc_id] = best
        return want

    def test_matches_brute_force(self, spark):
        import random

        from ir_spark.operators.positions import best_window_snippets

        rng = random.Random(23)
        vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
        texts = [(i, " ".join(rng.choice(vocab)
                              for _ in range(rng.randint(2, 50))))
                 for i in range(60)]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        rel = token_positions(df)
        weights = {"aa": 500000, "bb": 900000, "cc": 1500000}
        for W in (1, 3, 8):
            got = {r.doc_id: (r.win_start, r.score_micro, r.n_terms)
                   for r in best_window_snippets(rel, weights, W).collect()}
            assert got == self._brute(texts, weights, W), W

    def test_semantics_hand_case(self, spark):
        from ir_spark.operators.positions import best_window_snippets

        df = spark.createDataFrame(
            [(1, "aa xx xx bb cc xx aa bb"),   # best: [3,5] bb+cc? vs [6,7] aa+bb
             (2, "xx yy zz")],                  # no match -> absent
            "doc_id long, text string")
        rel = token_positions(df)
        w = {"aa": 10, "bb": 20, "cc": 70}
        out = {r.doc_id: (r.win_start, r.score_micro, r.n_terms)
               for r in best_window_snippets(rel, w, 3).collect()}
        # windows of 3: [2,4]=bb+cc=90 beats [5,7]=aa+bb=30
        assert out == {1: (2, 90, 2)}


def test_positional_store_incremental_append(spark, docs, tmp_path):
    """update_positional_store: batch store over the full corpus ==
    two incremental appends, for decode, phrase, and proximity."""
    from ir_spark.operators.positions import update_positional_store

    df, texts = docs
    full_store = str(tmp_path / "pos_full")
    incr_store = str(tmp_path / "pos_incr")
    build_positional_store(spark, df, full_store)
    ids = sorted(texts)
    cut = ids[len(ids) // 2]
    m0 = update_positional_store(
        spark, df.filter(F.col("doc_id") <= cut), incr_store)
    m1 = update_positional_store(
        spark, df.filter(F.col("doc_id") > cut), incr_store)
    assert m0["n_terms"] > 0 and m1["n_terms"] >= m0["n_terms"]

    terms = _pick_phrase(texts, 2)
    probe = sorted({*terms, "the"})

    def snap(store):
        return {
            (r["doc_id"], r["term"]): list(r["positions"])
            for r in read_positional_store(spark, store, probe).collect()}

    assert snap(incr_store) == snap(full_store)

    def phr(store):
        return {r["doc_id"]: r["phrase_tf"]
                for r in phrase_search_store(spark, store, terms).collect()}

    assert phr(incr_store) == phr(full_store) == _py_phrase(texts, terms)

    # crashed-append retry: re-running the SAME batch must be
    # idempotent (deterministic per-batch file names replace any
    # partial attempt) — duplicates would make the phrase reader's
    # map_from_entries throw on every query over the term
    m1b = update_positional_store(
        spark, df.filter(F.col("doc_id") > cut), incr_store)
    assert m1b["batch_id"] == m1["batch_id"]
    assert snap(incr_store) == snap(full_store)
    assert phr(incr_store) == phr(full_store)

    # upgrade repair (r5 ADVICE): a crashed append published by
    # PRE-content-hash code left files named append-b{lo}-{hi}-{i:05d}
    # (no hash segment).  Simulate one by copying batch-1's published
    # files under the legacy name; the retry must clear them (else the
    # store holds duplicate (term, doc) rows and the phrase reader
    # throws) while leaving other batches' files alone.
    import os
    import shutil

    span = "-".join(m1["batch_id"].split("-")[:2])  # "b{lo}-{hi}"
    store_root = os.path.join(incr_store, "store")
    planted = 0
    for bdir in os.listdir(store_root):
        for f in os.listdir(os.path.join(store_root, bdir)):
            if f.startswith(f"append-{m1['batch_id']}-"):
                i = int(f.rsplit("-", 1)[1].split(".")[0])
                shutil.copy(
                    os.path.join(store_root, bdir, f),
                    os.path.join(store_root, bdir,
                                 f"append-{span}-{i:05d}.parquet"))
                planted += 1
    assert planted > 0
    m1c = update_positional_store(
        spark, df.filter(F.col("doc_id") > cut), incr_store)
    assert m1c["batch_id"] == m1["batch_id"]
    leftovers = [
        f for bdir in os.listdir(store_root)
        for f in os.listdir(os.path.join(store_root, bdir))
        if f.startswith(f"append-{span}-") and f.count("-") == 3]
    assert leftovers == []  # legacy partials cleared
    assert snap(incr_store) == snap(full_store)
    assert phr(incr_store) == phr(full_store)
