"""Lexicon-level query helpers: spell suggestion, prefix lookup.

The reference engine has no tolerant retrieval: an unseen query term
simply contributes nothing (QueryParser.java drops terms with no
dictionary entry).  Real search front-ends want "did you mean" — the
standard IR answer is edit-distance candidates over the term
dictionary ranked by collection frequency (IIR ch. 3).

Scale shape: the dictionary is ~vocabulary-sized (millions of rows at
10^12 docs — tiny next to postings).  The candidate scan is pruned
JVM-side by the length band |len(t) - len(q)| <= max_dist *before*
the O(len^2) edit-distance kernel runs, and everything is built-in
Catalyst expressions (F.levenshtein) — no Python, no shuffle besides
the final top-k (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_terms(dictionary: DataFrame, query_term: str, k: int = 5,
                  max_dist: int = 2) -> DataFrame:
    """Top-k "did you mean" candidates for ``query_term`` from a
    (term, df, cf) dictionary -> (term, dist, df).

    Rank: edit distance ASC, then df DESC (prefer common terms), then
    term ASC — fully deterministic.  Exact matches (dist 0) rank
    first, so callers can use this unconditionally.
    """
    q = query_term.strip().lower()
    if not q:
        raise ValueError("empty query term")
    cand = (
        dictionary
        # cheap band prune before the quadratic edit-distance kernel
        .filter(F.abs(F.length("term") - F.lit(len(q))) <= max_dist)
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)))
        .filter(F.col("dist") <= max_dist)
    )
    return (
        cand.select("term", F.col("dist").cast("int").alias("dist"),
                    F.col("df").cast("long").alias("df"))
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def prefix_terms(dictionary: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """Top-k completions for ``prefix`` by df -> (term, df).

    A sorted/bucketed dictionary serves this from one row-group range
    scan (startswith pushes down as term >= p AND term < p+1).
    """
    p = prefix.strip().lower()
    if not p:
        raise ValueError("empty prefix")
    return (
        dictionary.filter(F.col("term").startswith(p))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def permuterm_rotations(dictionary: DataFrame) -> DataFrame:
    """(term, df) -> (rotation, term, df): all rotations of term+'$'
    (IIR ch. 3.2).  A wildcard query 'ta*le' becomes ONE prefix probe
    'le$ta' against this table — at scale a sorted/bucketed rotation
    table turns any single-'*' wildcard (including leading wildcards,
    which a plain dictionary scan cannot prune) into a row-group range
    scan instead of a full-vocabulary regex pass.

    Rotation count = term length + 1, so the table is
    O(total dictionary characters) — still tiny next to postings.
    Built entirely JVM-side (transform over a position sequence +
    explode)."""
    rots = F.expr(
        "transform(sequence(0, length(term)), "
        "i -> concat(substr(concat(term, '$'), i + 1), "
        "substr(concat(term, '$'), 1, i)))")
    return (
        dictionary.select("term", F.col("df").cast("long").alias("df"),
                          F.explode(rots).alias("rotation"))
        .select("rotation", "term", "df")
    )


def wildcard_terms(dictionary: DataFrame, pattern: str,
                   k: int = 10) -> DataFrame:
    """Top-k dictionary terms matching a single-'*' wildcard pattern
    (e.g. 'ta*le', '*tion', 'spar*') ranked by df desc, term asc ->
    (term, df).

    Implemented over the permuterm rotation table: pattern 'a*b'
    rotates to the prefix 'b$a', so the probe is a startswith filter —
    the same pushdown-able shape as prefix_terms, never a regex over
    the vocabulary.  For verification-sized inputs the rotation table
    is built inline; a long-lived engine materializes it once
    (sorted by rotation) next to the dictionary.
    """
    p = pattern.strip().lower()
    if p.count("*") != 1:
        raise ValueError("exactly one '*' supported")
    head, tail = p.split("*")
    probe = tail + "$" + head
    rot = permuterm_rotations(dictionary)
    return (
        rot.filter(F.col("rotation").startswith(probe))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def trigram_index(dictionary: DataFrame) -> DataFrame:
    """(term, df) -> (trigram, term, df): distinct boundary-padded
    character trigrams ('$term$') per dictionary term — the inverted
    character index that makes fuzzy lookup a candidate JOIN instead
    of a full-vocabulary edit-distance scan (suggest_terms' shape).
    O(total dictionary characters) rows; materialize sorted by trigram
    at scale, same layout argument as permuterm_rotations."""
    grams = F.array_distinct(F.expr(
        "transform(sequence(1, length(term)), "
        "i -> substr(concat('$', term, '$'), i, 3))"))
    return (dictionary
            .select("term", F.col("df").cast("long").alias("df"),
                    F.explode(grams).alias("trigram"))
            .select("trigram", "term", "df"))


def substring_terms(dictionary: DataFrame, pattern: str,
                    k: int = 10) -> DataFrame:
    """Top-k dictionary terms CONTAINING ``pattern`` anywhere (infix
    search — the pg_trgm / code-search shape) ranked by df desc, term
    asc -> (term, df).

    A substring's inner trigrams are a subset of the term's, so the
    candidate set is the trigram-index terms matching ALL of the
    pattern's trigrams (one pruned probe of the gram-sorted index +
    a count-distinct agg), verified by a real ``contains`` — never a
    LIKE '%..%' scan over the vocabulary.  Patterns shorter than 3
    chars cannot use the index and fall back to the verified scan
    (documented: engines bound this with a min-length or an n-gram
    sidecar at n=2).
    """
    q = pattern.strip().lower()
    if not q:
        raise ValueError("empty pattern")
    ranked = (F.desc("df"), F.asc("term"))
    if len(q) < 3:
        return (dictionary.filter(F.col("term").contains(q))
                .select("term", F.col("df").cast("long").alias("df"))
                .orderBy(*ranked).limit(k))
    qgrams = sorted({q[i:i + 3] for i in range(len(q) - 2)})
    tri = trigram_index(dictionary)
    cand = (tri.filter(F.col("trigram").isin(qgrams))
            .groupBy("term", "df")
            .agg(F.countDistinct("trigram").alias("n_hit"))
            .filter(F.col("n_hit") == len(qgrams)))
    return (cand.filter(F.col("term").contains(q))
            .select("term", "df")
            .orderBy(*ranked).limit(k))


# regex metachars; a literal char FOLLOWED by one of "*+?{" is also
# excluded from the extractable prefix (the quantifier binds to it).
_REGEX_META = set(".[](){}*+?|^$\\")


def _literal_prefix(pattern: str) -> str:
    """Longest literal prefix of a regex — the dictionary-range prune
    Lucene's RegexpQuery gets from intersecting the pattern automaton
    with the term FST (QueryParser.java has no tolerant retrieval at
    all; this is the standard engine answer)."""
    # a TOP-LEVEL alternation means the pattern's head literals are the
    # head of the FIRST branch only, not a common prefix — 'cat|dog'
    # must not prune to startswith('cat') or every 'dog' match is
    # silently dropped.  ('cat(x|y)' is fine: the loop below stops at
    # '(' before any branch-local literal leaks into the prefix.)
    depth, i = 0, 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if c == "[":  # char class: '|' inside is literal
            j = pattern.find("]", i + 1)
            i = len(pattern) if j < 0 else j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth = max(0, depth - 1)
        elif c == "|" and depth == 0:
            return ""
        i += 1
    out: list[str] = []
    for i, c in enumerate(pattern):
        if c in _REGEX_META:
            break
        if i + 1 < len(pattern) and pattern[i + 1] in "*+?{":
            break
        out.append(c)
    return "".join(out)


def regex_terms(dictionary: DataFrame, pattern: str, k: int = 10) -> DataFrame:
    """Top-k dictionary terms FULL-matching regex ``pattern``
    (Lucene/ES RegexpQuery semantics: the whole term must match, not a
    substring) ranked by df desc, term asc -> (term, df).

    Scale shape: the pattern's literal prefix prunes the sorted/
    bucketed dictionary to one row-group range (startswith pushes down
    as term >= p AND term < p+1) BEFORE the regex kernel runs, so a
    prefixed pattern never regex-scans the vocabulary; a prefix-free
    pattern degrades to one full dictionary pass — still O(vocabulary),
    never O(postings).  The full automaton-FST intersection is the
    further upgrade at 10^12-doc vocabularies.  Supported pattern
    subset = what Java regex and RE2/DuckDB agree on byte-for-byte
    (char classes, groups, alternation, greedy quantifiers) — callers
    must avoid backrefs/lookaround, which RE2 rejects anyway.
    """
    p = pattern.strip()
    if not p:
        raise ValueError("empty pattern")
    cand = dictionary
    prefix = _literal_prefix(p)
    if prefix:
        cand = cand.filter(F.col("term").startswith(prefix))
    return (
        cand.filter(F.col("term").rlike("^(?:" + p + ")$"))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def fuzzy_terms(dictionary: DataFrame, query_term: str, k: int = 5,
                max_dist: int = 2, min_shared: int = 2) -> DataFrame:
    """Trigram-blocked "did you mean": candidates = dictionary terms
    sharing >= ``min_shared`` padded trigrams with the query, verified
    by levenshtein <= ``max_dist``; rank (dist asc, df desc, term asc)
    -> (term, dist, df).

    Same contract as ``suggest_terms`` but the candidate set comes
    from a trigram-index join (vocabulary-local, pushdown-able) rather
    than scanning every length-banded term — at a 10^8-term web
    vocabulary the edit-distance kernel runs on hundreds of candidates
    instead of millions.
    """
    q = query_term.strip().lower()
    if not q:
        raise ValueError("empty query term")
    p = f"${q}$"
    qgrams = sorted({p[i:i + 3] for i in range(len(p) - 2)})
    # a 1-char query has exactly one padded trigram, so an uncapped
    # min_shared=2 would return nothing — not even the exact match
    min_shared = min(min_shared, len(qgrams))
    tri = trigram_index(dictionary)
    cand = (tri.filter(F.col("trigram").isin(qgrams))
            .groupBy("term", "df")
            .agg(F.count("*").alias("shared"))
            .filter(F.col("shared") >= min_shared))
    return (cand
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)))
            .filter(F.col("dist") <= max_dist)
            .select("term", F.col("dist").cast("int").alias("dist"), "df")
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(k))


def spellfix_query(index, query: str, *, max_dist: int = 2,
                   stem: bool = False) -> tuple[str, dict[str, str]]:
    """Elasticsearch-style "did you mean" RETRY rewrite: query terms
    present in the dictionary pass through; terms the corpus has never
    seen are replaced by their best suggestion (dist ASC, df DESC,
    term ASC — :func:`suggest_terms` order); unseen terms with no
    candidate within ``max_dist`` drop (they'd contribute nothing
    anyway).  Returns (corrected query string with qtf preserved by
    repetition, {typo: correction} map).

    Driver cost: ONE dictionary probe for presence (isin pushdown over
    the query's few terms) + one suggestion top-1 per missing term —
    the same bounded probes a query front-end makes; the corpus is
    never touched.
    """
    from ..oracle import parse_query

    bag = parse_query(query, stem=stem)
    if not bag:
        return "", {}
    present = {
        r["term"] for r in index.dictionary
        .filter(F.col("term").isin(sorted(bag))).select("term").collect()}
    corrections: dict[str, str] = {}
    out: list[str] = []
    for t in sorted(bag):
        if t in present:
            out.extend([t] * bag[t])
            continue
        sug = suggest_terms(index.dictionary, t,
                            k=1, max_dist=max_dist).collect()
        if sug:
            corrections[t] = sug[0]["term"]
            out.extend([sug[0]["term"]] * bag[t])
    return " ".join(out), corrections


def search_with_spellfix(spark, index, query: str, *, k: int = 5,
                         mode: str = "bm25", k1: float = 1.2,
                         b: float = 0.75, max_dist: int = 2
                         ) -> tuple[DataFrame, dict[str, str]]:
    """Search with automatic spell-corrected retry: rewrite via
    :func:`spellfix_query`, then run the ordinary engine — identical
    plan, identical semantics, only the query bag differs."""
    from .query import search

    fixed, corrections = spellfix_query(index, query, max_dist=max_dist)
    if not fixed:
        return (spark.createDataFrame([], "doc_id long, score double"),
                corrections)
    return (search(spark, index, fixed, k=k, mode=mode, k1=k1, b=b),
            corrections)


def phrase_candidates(docs, qtoks: list[str], *, m_cands: int = 4,
                      max_dist: int = 2, min_shared: int = 2,
                      text_col: str = "text"):
    """Batched per-position fuzzy candidates over the LM vocabulary.

    One distributed job for ALL query positions: the corpus unigram
    counts (the bigram LM's own token stream: whitespace tokens with
    len > 1, stopwords KEPT — context words carry the signal) feed one
    trigram index, every position's padded query trigrams join it at
    once, and survivors of the shared>=min_shared block run the edit-
    distance kernel and a per-position (dist ASC, c1 DESC, term ASC)
    top-m.  Returns ({pos: [(term, dist, c1), ...]}, V, T) with V =
    unigram vocabulary size and T = total tokens."""
    from pyspark.sql import Window

    w = F.filter(F.split(F.col(text_col), " "), lambda t: F.length(t) > 1)
    c1 = (docs.select(F.explode(w).alias("term"))
          .groupBy("term").agg(F.count("*").cast("long").alias("df"))
          .persist())
    vt = c1.agg(F.count("*"), F.sum("df")).collect()[0]
    v_size, t_total = int(vt[0]), int(vt[1] or 0)
    spark = docs.sparkSession
    qg_rows, qt_rows = [], []
    for pos, t in enumerate(qtoks):
        p = f"${t}$"
        qt_rows.append((pos, t))
        qg_rows += [(pos, g) for g in sorted(
            {p[i:i + 3] for i in range(len(p) - 2)})]
    qg = spark.createDataFrame(qg_rows, "pos int, gram string")
    qt = spark.createDataFrame(qt_rows, "pos int, qterm string")
    tri = trigram_index(c1)
    shared = (tri.join(F.broadcast(qg), tri.trigram == qg.gram)
              .groupBy("pos", "term", "df")
              .agg(F.count("*").alias("shared"))
              .filter(F.col("shared") >= min_shared))
    cand = (shared.join(F.broadcast(qt), "pos")
            .withColumn("dist", F.levenshtein(F.col("term"),
                                              F.col("qterm")))
            .filter(F.col("dist") <= max_dist))
    rank_w = Window.partitionBy("pos").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term"))
    top = (cand.withColumn("rn", F.row_number().over(rank_w))
           .filter(F.col("rn") <= m_cands)
           .select("pos", "term", "dist", "df").collect())
    c1.unpersist()
    out: dict[int, list[tuple[str, int, int]]] = {}
    for r in sorted(top, key=lambda r: (r["pos"], r["dist"], -r["df"],
                                        r["term"])):
        out.setdefault(r["pos"], []).append(
            (r["term"], int(r["dist"]), int(r["df"])))
    return out, v_size, t_total


PAIR_SEP = "\x01"


def suggest_phrase(spark, docs, query: str, *, m_cands: int = 4,
                   max_dist: int = 2, min_shared: int = 2,
                   pen_micro: int = 4_000_000,
                   text_col: str = "text"):
    """Noisy-channel "did you mean" over the WHOLE query phrase —
    context-aware where ``spellfix_query`` corrects terms one at a
    time: the classic power-cord/power-chord case needs bigram
    evidence.  Viterbi over per-position fuzzy candidates under an
    add-one-smoothed corpus bigram LM (the bigram_nll model) with a
    per-edit channel penalty:

        score(c_1..c_n) = ln P(c_1) + sum_i ln P(c_i | c_{i-1})
                          - pen * sum_i dist(c_i, t_i)
        P(c_1)          = (c1(c_1) + 1) / (T + V)
        P(b | a)        = (c2(a, b) + 1) / (c1(a) + V)

    Determinism contract: every edge weight is micro-quantized BEFORE
    the DP (integer additions thereafter), ties broken by the
    lexicographically smallest path — so an oracle can enumerate the
    same integer path sums.

    Scale shape: candidates ride ONE batched trigram join
    (:func:`phrase_candidates`); bigram counts are aggregated ONLY for
    the |q|*m^2 candidate pairs (isin pushdown on the pair key before
    the count agg); the Viterbi itself is driver-side over a |q|*m
    state lattice — constant work per query, the corpus is touched by
    exactly two aggregates.

    Returns a DataFrame (pos, original, suggested, dist,
    score_micro) — one row per query position, ``score_micro`` = the
    winning path total on every row; empty when some position has no
    candidate (nothing defensible to suggest)."""
    import math

    schema = ("pos int, original string, suggested string, dist int, "
              "score_micro long")
    qtoks = [t for t in query.strip().lower().split() if len(t) > 1]
    if not qtoks:
        return spark.createDataFrame([], schema)
    cands, v_size, t_total = phrase_candidates(
        docs, qtoks, m_cands=m_cands, max_dist=max_dist,
        min_shared=min_shared, text_col=text_col)
    if any(p not in cands for p in range(len(qtoks))):
        return spark.createDataFrame([], schema)

    # bigram counts for candidate pairs only
    pair_keys = sorted({
        a + PAIR_SEP + b
        for i in range(1, len(qtoks))
        for a, _, _ in cands[i - 1] for b, _, _ in cands[i]})
    c2: dict[str, int] = {}
    if pair_keys:
        w = F.filter(F.split(F.col(text_col), " "),
                     lambda t: F.length(t) > 1)
        d = docs.select(w.alias("w")).filter(F.size("w") >= 2)
        bi = d.select(F.explode(F.expr(
            "transform(sequence(1, size(w) - 1), "
            "i -> concat(w[i - 1], chr(1), w[i]))")).alias("k"))
        rows = (bi.filter(F.col("k").isin(pair_keys))
                .groupBy("k").agg(F.count("*").cast("long").alias("n"))
                .collect())
        c2 = {r["k"]: int(r["n"]) for r in rows}

    c1 = {t: df for plist in cands.values() for t, _, df in plist}

    def start_w(term, dist):
        lp = math.log((c1[term] + 1.0) / (t_total + float(v_size)))
        return round(lp * 1e6) - pen_micro * dist

    def edge_w(prev, term, dist):
        n2 = c2.get(prev + PAIR_SEP + term, 0)
        lp = math.log((n2 + 1.0) / (c1[prev] + float(v_size)))
        return round(lp * 1e6) - pen_micro * dist

    # Viterbi; an option sorts by (-score, path) so ties pick the
    # lexicographically smallest path
    best: dict[str, tuple[int, tuple[str, ...]]] = {
        t: (start_w(t, d), (t,)) for t, d, _ in cands[0]}
    for i in range(1, len(qtoks)):
        nxt: dict[str, tuple[int, tuple[str, ...]]] = {}
        for t, d, _ in cands[i]:
            opts = [(s + edge_w(p, t, d), path + (t,))
                    for p, (s, path) in best.items()]
            nxt[t] = min(opts, key=lambda o: (-o[0], o[1]))
        best = nxt
    score, path = min(best.values(), key=lambda o: (-o[0], o[1]))
    dists = {(i, t): d for i, plist in cands.items() for t, d, _ in plist}
    rows = [(i, qtoks[i], path[i], dists[(i, path[i])], int(score))
            for i in range(len(qtoks))]
    return spark.createDataFrame(rows, schema)
