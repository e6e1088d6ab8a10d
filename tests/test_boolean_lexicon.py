"""Boolean retrieval (operators/boolean.py) + lexicon helpers
(operators/lexicon.py), checked against driver-side pure-Python ground
truth over the frozen ``tokenize`` stream on salted web text (the
DuckDB gates cover the clean corpus)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ir_spark.operators.boolean import boolean_search
from ir_spark.operators.lexicon import prefix_terms, suggest_terms
from ir_spark.text import STOPWORDS, tokenize


@pytest.fixture(scope="module")
def idx(spark, pages_small):
    path, _ = pages_small
    from ir_spark.operators.build import assign_doc_ids, build_dataframe_index

    raw = spark.read.parquet(path)
    ids = assign_doc_ids(raw)
    df = raw.join(ids, "url").select("doc_id", "text")
    texts = {r["doc_id"]: r["text"] for r in df.collect()}
    return build_dataframe_index(df), texts


def _doc_terms(texts):
    return {
        d: {t for t in tokenize(x) if t not in STOPWORDS}
        for d, x in texts.items()
    }


def _pick_terms(texts):
    """Deterministic mid-frequency vocabulary picks."""
    from collections import Counter

    c = Counter(t for ts in _doc_terms(texts).values() for t in ts)
    common = [t for t, _ in c.most_common(12)]
    return common[0:2], [common[5]], common[8:10]  # must, not, should


def test_boolean_matches_brute_force(idx):
    index, texts = idx
    (must, must_not, should) = _pick_terms(texts)
    sets = _doc_terms(texts)
    want = {
        d: len(ts & set(should))
        for d, ts in sets.items()
        if set(must) <= ts and not (ts & set(must_not))
        and len(ts & set(should)) >= 1
    }
    got = {
        r["doc_id"]: r["n_should"]
        for r in boolean_search(index.postings, must=must,
                                must_not=must_not, should=should).collect()
    }
    assert got == want


def test_boolean_must_only_and_min_should(idx):
    index, texts = idx
    (must, _, should) = _pick_terms(texts)
    sets = _doc_terms(texts)
    # pure conjunction
    got = {r["doc_id"] for r in
           boolean_search(index.postings, must=must).collect()}
    assert got == {d for d, ts in sets.items() if set(must) <= ts}
    # min_should = 2 over two should terms == conjunction of both
    got2 = {r["doc_id"] for r in
            boolean_search(index.postings, should=should,
                           min_should=2).collect()}
    assert got2 == {d for d, ts in sets.items() if set(should) <= ts}


def test_boolean_rejects_bad_input(idx):
    index, _ = idx
    with pytest.raises(ValueError):
        boolean_search(index.postings, must_not=["only", "negative"])
    with pytest.raises(ValueError):
        boolean_search(index.postings, must=["x"], must_not=["x"])


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_suggest_matches_brute_force(idx):
    index, texts = idx
    dfs = {}
    for ts in _doc_terms(texts).values():
        for t in ts:
            dfs[t] = dfs.get(t, 0) + 1
    # probe: a real vocabulary term with one char swapped
    base = sorted(dfs)[len(dfs) // 2]
    probe = base[:-1] + ("x" if base[-1] != "x" else "y")
    want = sorted(
        ((t, _levenshtein(t, probe), df) for t, df in dfs.items()
         if abs(len(t) - len(probe)) <= 2
         and _levenshtein(t, probe) <= 2),
        key=lambda r: (r[1], -r[2], r[0]))[:5]
    got = [(r["term"], r["dist"], r["df"])
           for r in suggest_terms(index.dictionary, probe, k=5).collect()]
    assert got == want


def test_suggest_exact_match_ranks_first(idx):
    index, texts = idx
    term = max(
        ((t, n) for t, n in
         __import__("collections").Counter(
             t for ts in _doc_terms(texts).values() for t in ts).items()),
        key=lambda r: (r[1], r[0]))[0]
    got = suggest_terms(index.dictionary, term, k=3).collect()
    assert got[0]["term"] == term and got[0]["dist"] == 0


def test_prefix_matches_brute_force(idx):
    index, texts = idx
    dfs = {}
    for ts in _doc_terms(texts).values():
        for t in ts:
            dfs[t] = dfs.get(t, 0) + 1
    p = sorted(dfs)[0][:2]
    want = sorted(((t, df) for t, df in dfs.items() if t.startswith(p)),
                  key=lambda r: (-r[1], r[0]))[:10]
    got = [(r["term"], r["df"])
           for r in prefix_terms(index.dictionary, p, k=10).collect()]
    assert got == want


def test_wildcard_terms_permuterm(spark):
    """Permuterm probe equals brute-force fnmatch for leading,
    trailing, middle, and zero-width '*' positions."""
    import fnmatch

    from ir_spark.operators.lexicon import wildcard_terms

    vocab = [("table", 9, 9), ("tale", 5, 5), ("tile", 5, 6),
             ("stream", 7, 7), ("banner", 3, 3), ("er", 2, 2),
             ("tab", 1, 1)]
    d = spark.createDataFrame(vocab, "term string, df long, cf long")
    for pat in ["ta*le", "*er", "str*", "t*", "*", "ta*"]:
        got = [r["term"] for r in wildcard_terms(d, pat, k=10).collect()]
        want = [t for t, _, _ in vocab if fnmatch.fnmatchcase(t, pat)]
        want.sort(key=lambda t: (-dict((v, df) for v, df, _ in vocab)[t], t))
        assert got == want, pat

    import pytest as _pytest
    with _pytest.raises(ValueError):
        wildcard_terms(d, "a*b*c")
    with _pytest.raises(ValueError):
        wildcard_terms(d, "noglob")


def test_substring_terms_trigram_index(spark):
    """Infix search over the trigram index equals brute-force contains
    for mid-string, prefix-position, suffix-position, and whole-term
    patterns; short (<3) patterns take the verified-scan fallback."""
    from ir_spark.operators.lexicon import substring_terms

    vocab = [("customer", 9, 9), ("cluster", 8, 8), ("combustion", 7, 7),
             ("must", 6, 6), ("ust", 5, 5), ("trust", 4, 4),
             ("sort", 3, 3), ("u", 1, 1)]
    d = spark.createDataFrame(vocab, "term string, df long, cf long")
    for pat in ["ust", "usto", "omb", "sort", "customer", "us", "zzz"]:
        got = [r["term"] for r in substring_terms(d, pat, k=10).collect()]
        want = [t for t, _, _ in vocab if pat in t]
        want.sort(key=lambda t: (-dict((v, df) for v, df, _ in vocab)[t], t))
        assert got == want, pat

    import pytest as _pytest
    with _pytest.raises(ValueError):
        substring_terms(d, "  ")


def test_term_vectors_parity(idx):
    """term_vectors (the ES _termvectors shape) equals pure-python
    tf/doc_len/df over the frozen tokenize stream: doc_len counts ALL
    tokens (D2), tf/df indexed terms only."""
    from collections import Counter

    from ir_spark.operators.build import term_vectors

    index, texts = idx
    doc_ids = sorted(texts)[:3]
    got = {(r["doc_id"], r["term"]): (r["tf"], r["doc_len"], r["df"])
           for r in term_vectors(index, doc_ids).collect()}

    df_count = Counter()
    for ts in _doc_terms(texts).values():
        df_count.update(ts)
    want = {}
    for d in doc_ids:
        toks = tokenize(texts[d])
        tf = Counter(t for t in toks if t not in STOPWORDS)
        for t, n in tf.items():
            want[(d, t)] = (n, len(toks), df_count[t])
    assert got == want

    import pytest as _pytest
    with _pytest.raises(ValueError):
        term_vectors(index, [])


def test_regex_terms_full_match(spark):
    """Regex term search equals brute-force re.fullmatch, for
    prefixed patterns (literal-prefix prune path) and prefix-free
    ones (full-scan fallback); rank = df desc, term asc."""
    import re

    from ir_spark.operators.lexicon import _literal_prefix, regex_terms

    vocab = [("table", 9, 9), ("tale", 5, 5), ("tile", 5, 6),
             ("stream", 7, 7), ("spark", 6, 6), ("scan", 8, 8),
             ("sort", 3, 3), ("er", 2, 2)]
    d = spark.createDataFrame(vocab, "term string, df long, cf long")
    for pat in ["t(a|i)le", "s(c|t|p)[a-z]+", "ta.*", ".*le",
                "s[a-z]{3}", "table", "zzz+"]:
        got = [r["term"] for r in regex_terms(d, pat, k=10).collect()]
        want = [t for t, _, _ in vocab if re.fullmatch(pat, t)]
        want.sort(key=lambda t: (-dict((v, df) for v, df, _ in vocab)[t], t))
        assert got == want, pat

    # the prune never drops a match: every full-matching term starts
    # with the extracted literal prefix
    assert _literal_prefix("s(c|t|p)[a-z]+") == "s"
    assert _literal_prefix("ta.*") == "ta"
    assert _literal_prefix("ta*") == "t"       # '*' binds to the 'a'
    assert _literal_prefix(".*le") == ""
    assert _literal_prefix("table") == "table"

    import pytest as _pytest
    with _pytest.raises(ValueError):
        regex_terms(d, "  ")


def test_regex_terms_top_level_alternation_not_pruned(spark):
    """'cat|dog' must match BOTH branches: the literal head of the
    first branch is not a common prefix, so the prune must disable
    itself for top-level alternations (while 'cat(x|y)' keeps its
    correct 'cat' prefix)."""
    from ir_spark.operators.lexicon import _literal_prefix, regex_terms

    assert _literal_prefix("cat|dog") == ""
    assert _literal_prefix("color|colour") == ""
    assert _literal_prefix("cat(x|y)") == "cat"
    assert _literal_prefix(r"a\|b") == "a"  # escaped '|' is literal
    assert _literal_prefix("[a|b]x") == ""

    vocab = [("cat", 4, 4), ("dog", 6, 6), ("dogma", 2, 2), ("cow", 1, 1)]
    d = spark.createDataFrame(vocab, "term string, df long, cf long")
    got = [r["term"] for r in regex_terms(d, "cat|dog.*", k=10).collect()]
    assert got == ["dog", "cat", "dogma"]  # df desc, term asc


def test_fuzzy_terms_single_char_query(spark):
    """A 1-char query has exactly one padded trigram; min_shared must
    clamp or even the exact dictionary match is unreachable."""
    from ir_spark.operators.lexicon import fuzzy_terms

    vocab = [("a", 9, 9), ("at", 5, 5), ("zzz", 1, 1)]
    d = spark.createDataFrame(vocab, "term string, df long, cf long")
    got = [(r["term"], r["dist"]) for r in
           fuzzy_terms(d, "a", k=5, max_dist=1).collect()]
    assert got[0] == ("a", 0)


def test_fuzzy_terms_trigram_blocking(spark):
    """Trigram-blocked fuzzy lookup: candidates sharing >= 2 padded
    trigrams with the query, verified by edit distance; subset of the
    scan-everything suggest_terms result."""
    from ir_spark.operators.lexicon import fuzzy_terms, suggest_terms

    vocab = [("start", 9, 9), ("sort", 8, 8), ("smart", 7, 7),
             ("sart", 3, 3), ("art", 5, 5), ("zzz", 1, 1)]
    d = spark.createDataFrame(vocab, "term string, df long, cf long")
    got = [(r["term"], r["dist"]) for r in
           fuzzy_terms(d, "sart", k=10, max_dist=2).collect()]
    # exact match first; every hit shares >= 2 trigrams of '$sart$'
    assert got[0] == ("sart", 0)
    assert ("zzz", 3) not in got
    full = {r["term"] for r in
            suggest_terms(d, "sart", k=10, max_dist=2).collect()}
    assert {t for t, _ in got} <= full
    assert {"sart", "start", "art"} <= {t for t, _ in got}


@pytest.fixture(scope="module")
def docs_index(spark):
    """DataFrame index over the documents corpus (the vocabulary the
    spellfix fixtures reference: 'hash', 'vector', ...)."""
    from ir_spark import gates

    return gates._df_index(spark, "/root/testdata/sf0.001")


class TestSpellfix:
    def test_corrections_and_passthrough(self, spark, docs_index):
        from ir_spark.gates import SPELLFIX_QUERY
        from ir_spark.operators.lexicon import spellfix_query

        fixed, corr = spellfix_query(docs_index, SPELLFIX_QUERY)
        assert corr == {"hashh": "hash", "vectr": "vector"}
        assert "hashh" not in fixed and "hash" in fixed.split()

    def test_corrected_equals_clean_query(self, spark, docs_index):
        """The retry result must equal running the corrected query
        directly — the rewrite changes nothing but the bag."""
        from ir_spark.operators import query as Q
        from ir_spark.operators.lexicon import search_with_spellfix

        got, _ = search_with_spellfix(
            spark, docs_index, "fast hashh join", k=5)
        want = Q.search(spark, docs_index, "fast hash join", k=5)
        assert [(r.doc_id, round(r.score, 9)) for r in got.collect()] == \
               [(r.doc_id, round(r.score, 9)) for r in want.collect()]

    def test_hopeless_term_drops(self, spark, docs_index):
        from ir_spark.operators.lexicon import spellfix_query

        fixed, corr = spellfix_query(docs_index, "fast zzzzqqqqxxxx join")
        assert corr == {}
        assert sorted(fixed.split()) == ["fast", "join"]


class TestMinShouldMatch:
    def test_floor_prunes_low_coverage_docs(self, spark, docs_index):
        from ir_spark.gates import FLAGSHIP_QUERY
        from ir_spark.operators import query as Q
        from ir_spark.operators.query import search_min_should_match

        plain = {r.doc_id for r in Q.search(
            spark, docs_index, FLAGSHIP_QUERY, k=100).collect()}
        floored = {r.doc_id for r in search_min_should_match(
            spark, docs_index, FLAGSHIP_QUERY, min_should_match=7,
            k=100).collect()}
        assert floored - plain or plain - floored, \
            "floor must be live at this depth"
        # every floored doc scores identically to its plain score
        plain_all = {r.doc_id: r.score for r in Q.search(
            spark, docs_index, FLAGSHIP_QUERY, k=None).collect()}
        for r in search_min_should_match(
                spark, docs_index, FLAGSHIP_QUERY, min_should_match=7,
                k=20).collect():
            assert abs(r.score - plain_all[r.doc_id]) < 1e-12

    def test_floor_caps_at_query_size(self, spark, docs_index):
        from ir_spark.operators.query import search_min_should_match

        # msm beyond the distinct-term count caps to AND semantics
        out = search_min_should_match(
            spark, docs_index, "hash join", min_should_match=99,
            k=5).collect()
        assert out, "AND of two common terms must match something"


class TestSignificantTerms:
    """operators/boolean.py::significant_terms — JLH lift semantics."""

    def _relations(self, spark):
        # 6 docs; query term 'q' matches docs 0-2.  'sig' appears in
        # ALL candidates and NO background doc (max lift); 'common'
        # appears everywhere (no lift -> filtered out).
        rows = [
            (0, "q"), (0, "sig"), (0, "common"),
            (1, "q"), (1, "sig"), (1, "common"),
            (2, "q"), (2, "sig"), (2, "common"),
            (3, "common"), (4, "common"), (5, "common"),
        ]
        postings = spark.createDataFrame(
            [(d, t, 1) for d, t in rows], "doc_id long, term string, tf long")
        dictionary = postings.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf"))
        return postings, dictionary

    def test_jlh_values_and_filters(self, spark):
        from ir_spark.operators.boolean import significant_terms

        postings, dictionary = self._relations(spark)
        out = significant_terms(postings, dictionary, 6, ["q"], k=10)
        rows = {r["term"]: r for r in out.collect()}
        # the query term itself is excluded; 'common' has zero lift
        assert "q" not in rows
        assert "common" not in rows
        # 'sig': fg_rate = 3/3 = 1, bg_rate = 3/6 = 0.5
        # JLH = (1 - 0.5) * (1 / 0.5) = 1.0
        assert rows["sig"]["fg_df"] == 3
        assert rows["sig"]["bg_df"] == 3
        assert rows["sig"]["score_micro"] == 1_000_000

    def test_empty_candidates(self, spark):
        from ir_spark.operators.boolean import significant_terms

        postings, dictionary = self._relations(spark)
        out = significant_terms(postings, dictionary, 6, ["absent"], k=10)
        assert out.count() == 0


class TestCollapseTopk:
    """operators/query.py::collapse_topk — one winner per key."""

    def test_winner_tiebreak_and_topk(self, spark):
        from ir_spark.operators.query import collapse_topk

        scored = spark.createDataFrame(
            [(1, 500), (2, 900), (3, 900), (4, 100), (5, 700)],
            "doc_id long, score_micro long")
        keys = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "c")],
            "doc_id long, source string")
        out = collapse_topk(scored, keys, "source", k=2).collect()
        # host a: docs 2 and 3 tie at 900 -> lowest doc_id (2) wins;
        # global top-2 of winners (2:900, 5:700, 4:100) -> [2, 5]
        assert [(r["doc_id"], r["score_micro"], r["source"])
                for r in out] == [(2, 900, "a"), (5, 700, "c")]

    def test_exactly_one_per_key(self, spark):
        from ir_spark.operators.query import collapse_topk

        scored = spark.createDataFrame(
            [(i, i * 10) for i in range(20)], "doc_id long, score_micro long")
        keys = spark.createDataFrame(
            [(i, f"h{i % 3}") for i in range(20)],
            "doc_id long, source string")
        out = collapse_topk(scored, keys, "source", k=10)
        assert out.count() == 3  # one per host, all fit in k
        assert out.select("source").distinct().count() == 3


# --- noisy-channel phrase suggestion (lexicon.py::suggest_phrase) ------------


@pytest.fixture(scope="module")
def phrase_docs(spark):
    texts = ["the power cord is broken please replace the power cord now",
             "power cord replacement guide for your laptop power cord",
             "guitar chord chart with every open chord shape drawn",
             "learn guitar chord progressions chord by chord daily"] * 5
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _py_suggest(texts, query, *, m, max_dist, min_shared, pen):
    """Pure-Python mirror of suggest_phrase's integer lattice."""
    import math
    from collections import Counter

    toks = [[t for t in x.split() if len(t) > 1] for x in texts]
    c1 = Counter(t for doc in toks for t in doc)
    c2 = Counter((doc[i], doc[i + 1]) for doc in toks
                 for i in range(len(doc) - 1))
    v, tt = len(c1), sum(c1.values())

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    def grams(t):
        p = f"${t}$"
        return {p[i:i + 3] for i in range(len(p) - 2)}

    qtoks = [t for t in query.strip().lower().split() if len(t) > 1]
    cands = []
    for t in qtoks:
        qg = grams(t)
        cs = [(lev(w, t), -c1[w], w) for w in c1
              if len(qg & grams(w)) >= min_shared and lev(w, t) <= max_dist]
        cs.sort()
        cands.append([(w, d) for d, _, w in cs[:m]])
    if any(not c for c in cands):
        return None
    best = {w: (round(math.log((c1[w] + 1.0) / (tt + float(v))) * 1e6)
                - pen * d, (w,)) for w, d in cands[0]}
    for i in range(1, len(qtoks)):
        nxt = {}
        for w, d in cands[i]:
            opts = []
            for p, (s, path) in best.items():
                lp = math.log((c2[(p, w)] + 1.0) / (c1[p] + float(v)))
                opts.append((s + round(lp * 1e6) - pen * d, path + (w,)))
            nxt[w] = min(opts, key=lambda o: (-o[0], o[1]))
        best = nxt
    score, path = min(best.values(), key=lambda o: (-o[0], o[1]))
    return int(score), path


@pytest.mark.parametrize("query", ["power corrd", "guitar corrd",
                                   "powr cord", "guitar chord",
                                   "lern guitar chord"])
def test_phrase_suggest_matches_bruteforce(spark, phrase_docs, query):
    from ir_spark.operators.lexicon import suggest_phrase

    texts = [r["text"] for r in phrase_docs.collect()]
    want = _py_suggest(texts, query, m=4, max_dist=2, min_shared=1,
                       pen=2_000_000)
    rows = sorted(suggest_phrase(
        spark, phrase_docs, query, m_cands=4, max_dist=2, min_shared=1,
        pen_micro=2_000_000).collect(), key=lambda r: r["pos"])
    assert want is not None and rows
    assert tuple(r["suggested"] for r in rows) == want[1]
    assert rows[0]["score_micro"] == want[0]


def test_phrase_suggest_context_sensitivity(spark, phrase_docs):
    """The marquee noisy-channel behavior: the SAME typo corrects to
    different words depending on the preceding context word."""
    from ir_spark.operators.lexicon import suggest_phrase

    def fix(q):
        rows = sorted(suggest_phrase(
            spark, phrase_docs, q, m_cands=4, max_dist=2, min_shared=1,
            pen_micro=2_000_000).collect(), key=lambda r: r["pos"])
        return [r["suggested"] for r in rows]

    assert fix("power corrd") == ["power", "cord"]
    assert fix("guitar corrd") == ["guitar", "chord"]
    # clean in-vocabulary queries pass through unchanged
    assert fix("guitar chord") == ["guitar", "chord"]


def test_phrase_suggest_empty_cases(spark, phrase_docs):
    from ir_spark.operators.lexicon import suggest_phrase

    # no token survives the len>1 filter
    assert suggest_phrase(spark, phrase_docs, "a b").count() == 0
    # a position with zero candidates -> honest empty, no wild guess
    assert suggest_phrase(spark, phrase_docs,
                          "power zzzzqqqq").count() == 0


# --- search-box query language (boolean.py::search_querybox) -----------------


def test_parse_querybox():
    from ir_spark.operators.boolean import parse_querybox

    spec = parse_querybox('heat flow +layer -shock "boundary layer" '
                          '-"shock wave"')
    assert spec["must"] == ["layer"]
    assert spec["must_not"] == ["shock"]
    assert spec["should"] == ["heat", "flow"]
    assert spec["phrases"] == [["boundary", "layer"]]
    assert spec["not_phrases"] == [["shock", "wave"]]
    # stopwords drop from scoring clauses, stay in phrases
    spec2 = parse_querybox('+the "of the boundary"')
    assert spec2["must"] == [] and spec2["phrases"] == [
        ["of", "the", "boundary"]]
    assert parse_querybox('""') == {"must": [], "must_not": [],
                                    "should": [], "phrases": [],
                                    "not_phrases": []}


def test_querybox_matches_bruteforce(spark, idx):
    from collections import Counter

    from ir_spark.oracle import bm25_weight
    from ir_spark.operators.boolean import parse_querybox, search_querybox
    from ir_spark.operators.positions import token_positions

    index, texts = idx
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    rel = token_positions(df)
    q = 'heat transfer +flow -wing "boundary layer"'
    got = [(r["doc_id"], round(r["score"] * 1e6)) for r in
           search_querybox(spark, index, rel, q, k=10).collect()]

    spec = parse_querybox(q)
    bag = Counter(spec["must"] + spec["should"]
                  + [t for ph in spec["phrases"] for t in ph
                     if t not in STOPWORDS])
    toks = {d: tokenize(x) for d, x in texts.items()}
    n = len(texts)
    avg_dl = sum(len([t for t in v if len(t) > 1]) for v in
                 toks.values()) / n

    def ok(d):
        terms = {t for t in toks[d] if t not in STOPWORDS}
        if any(t not in terms for t in spec["must"]):
            return False
        if any(t in terms for t in spec["must_not"]):
            return False
        for ph in spec["phrases"]:
            seq = toks[d]
            if not any(seq[i:i + len(ph)] == ph
                       for i in range(len(seq) - len(ph) + 1)):
                return False
        return True

    from ir_spark.oracle import build_index, search

    oracle = build_index(sorted(texts.items()))
    scores = {}
    for t, qtf in bag.items():
        dft = oracle.df(t)
        for d, tf in oracle.postings.get(t, ()):
            dl = oracle.docinfo[d][0]
            scores[d] = scores.get(d, 0.0) + qtf * bm25_weight(
                tf, dl, dft, oracle.n_docs, oracle.avg_doc_len)
    want = sorted(((d, round(s * 1e6)) for d, s in scores.items() if ok(d)),
                  key=lambda r: (-r[1], r[0]))[:10]
    assert got == want
    assert got  # filters leave a non-empty result for this corpus


def test_querybox_empty_and_pure_negative(spark, idx):
    from ir_spark.operators.boolean import search_querybox
    from ir_spark.operators.positions import token_positions

    index, texts = idx
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    rel = token_positions(df)
    assert search_querybox(spark, index, rel, "-wing").count() == 0
    assert search_querybox(spark, index, rel, "the of").count() == 0


def test_querybox_stopword_phrase_with_scored_terms(spark):
    """A required all-stopword phrase is a MUST clause; loose terms
    only rank.  A doc containing the phrase but none of the scored
    terms is a match with score 0 — not a miss."""
    from ir_spark.operators.build import build_dataframe_index
    from ir_spark.operators.boolean import search_querybox
    from ir_spark.operators.positions import token_positions

    texts = {0: "zebra runs fast across plains",
             1: "songs of the old country echo softly",
             2: "zebra herds of the northern plains roam"}
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    index = build_dataframe_index(df)
    rel = token_positions(df)
    rows = search_querybox(spark, index, rel, 'zebra "of the"',
                           k=10).collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    assert set(got) == {1, 2}          # doc 0 lacks the phrase
    assert got[2] > 0.0                # ranked by the zebra hit
    assert got[1] == 0.0               # phrase-only doc kept, score 0
    order = [r["doc_id"] for r in rows]
    assert order == [2, 1]


def test_querybox_stopword_phrase_ranks_by_phrase_tf(spark, idx):
    """An all-stopword phrase has no BM25 signal but must still match
    via the positional store, ranked by phrase_tf."""
    from ir_spark.operators.boolean import search_querybox
    from ir_spark.operators.positions import token_positions

    index, texts = idx
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    rel = token_positions(df)
    # find a stopword bigram that actually occurs in the corpus
    from ir_spark.text import STOPWORDS, tokenize

    pair = None
    for d, x in sorted(texts.items()):
        toks = tokenize(x)
        for a, b2 in zip(toks, toks[1:]):
            if a in STOPWORDS and b2 in STOPWORDS:
                pair = (a, b2)
                break
        if pair:
            break
    assert pair, "corpus has no stopword bigram"
    q = f'"{pair[0]} {pair[1]}"'
    rows = search_querybox(spark, index, rel, q, k=5).collect()
    assert rows, q
    # every hit really contains the phrase; scores are the phrase tfs
    for r in rows:
        toks = tokenize(texts[r["doc_id"]])
        tf = sum(1 for i in range(len(toks) - 1)
                 if (toks[i], toks[i + 1]) == pair)
        assert tf == int(r["score"]) and tf >= 1
