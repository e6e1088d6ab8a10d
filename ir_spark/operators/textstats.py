"""Text-analysis operators for corpus curation: language ID, quality
scoring, token statistics, document fingerprinting.

All four are pure column pipelines over ``documents(doc_id, text)`` —
split/filter/aggregate higher-order functions on the token array, no
Python worker, no shuffle (fingerprints aggregate per doc over
exploded grams: one partial-agg shuffle of a few rows per doc).

These are curation heuristics, not models: language ID is a stopword-
hit-rate test (the classic cheap filter before a real classifier),
quality scoring is the Gopher/C4-style length + repetition + stopword
profile, fingerprints are content-defined k-gram hashes for
provenance/near-dup triage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..text import STOPWORDS

# frozen probe set: high-frequency English function words (subset of
# the engine stopword list, SPIMI.java:12-17 — see SURVEY D9)
LANG_PROBE_WORDS = sorted(STOPWORDS)

_STOP_ARR = "array({})".format(",".join(f"'{w}'" for w in LANG_PROBE_WORDS))


def _toks() -> str:
    return "filter(split(text, ' '), t -> length(t) > 0)"


def lang_id(docs: DataFrame, en_threshold: float = 0.05) -> DataFrame:
    """(doc_id, text) -> (doc_id, lang_pred, stop_ratio_micro).

    Predicts 'en' when the fraction of tokens that are English
    function words clears ``en_threshold``, else 'und'.
    """
    n_tok = F.expr(f"size({_toks()})")
    n_stop = F.expr(f"size(filter({_toks()}, t -> array_contains({_STOP_ARR}, t)))")
    ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        F.when(ratio >= en_threshold, F.lit("en")).otherwise(F.lit("und")).alias("lang_pred"),
        F.round(ratio * 1e6).cast("long").alias("stop_ratio_micro"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> per-doc quality profile + composite score.

    Features (all micro-quantized for cross-engine determinism):
      n_tokens, mean token length, stopword ratio, distinct-token
      (type/token) ratio; score = mean_len-in-[3,10] * stop-ratio-
      in-[0.01,0.5] * ttr-in-[0.2,1.0] gate product (1 = keep).
    """
    n_tok = F.expr(f"size({_toks()})").cast("double")
    mean_len = F.when(
        n_tok > 0,
        F.expr(f"aggregate({_toks()}, 0L, (a, t) -> a + length(t))").cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0,
        F.expr(f"size(filter({_toks()}, t -> array_contains({_STOP_ARR}, t)))").cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    ttr = F.when(
        n_tok > 0,
        F.expr(f"size(array_distinct({_toks()}))").cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    keep = (
        mean_len.between(3.0, 10.0)
        & stop_ratio.between(0.01, 0.5)
        & ttr.between(0.2, 1.0)
        & (n_tok >= 10)
    )
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_len * 1e6).cast("long").alias("mean_token_len_micro"),
        F.round(stop_ratio * 1e6).cast("long").alias("stop_ratio_micro"),
        F.round(ttr * 1e6).cast("long").alias("ttr_micro"),
        keep.cast("int").alias("keep"),
    )


def token_stats(docs: DataFrame, chunk: int = 4) -> DataFrame:
    """(doc_id, text) -> (doc_id, n_ws_tokens, n_chunks, n_chars).

    n_chunks is a BPE-ish upper bound: ceil(len/chunk) fixed-size
    pieces per whitespace token — the cheap token-budget estimator a
    training pipeline runs over every document.
    """
    return docs.select(
        "doc_id",
        F.expr(f"size({_toks()})").cast("long").alias("n_ws_tokens"),
        F.expr(
            f"aggregate({_toks()}, 0L, (a, t) -> a + cast(ceil(length(t) / {chunk}.0) as long))"
        ).alias("n_chunks"),
        F.length("text").cast("long").alias("n_chars"),
    )


# GPT-2-family pre-tokenizer classes, lookahead-free so Java regex
# (Spark) and RE2 (DuckDB) agree byte-for-byte: alphabetic runs,
# digit runs, and non-alnum-non-space runs.  (The real tiktoken
# pattern adds contraction lookaheads RE2 cannot express; for token
# BUDGETING the class split is what matters.)
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def pretoken_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, n_pretokens, n_alpha, n_num,
    n_punct): BPE-style pre-tokenizer counts — the token-budget
    estimator that tracks what a subword tokenizer will see (a
    whitespace count under-counts punctuation-heavy web text badly).

    ONE regexp_extract_all pass + three array filters, all
    whole-stage-codegen; the pattern must be passed as a lit() column
    (an SQL string literal would eat the backslash classes).
    """
    toks = F.regexp_extract_all("text", F.lit(BPE_PRETOKEN_RE), 0)

    def _n(cls: str):
        return F.size(F.filter(toks, lambda t: t.rlike(f"^{cls}$")))

    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_pretokens"),
        _n("[A-Za-z]+").cast("long").alias("n_alpha"),
        _n("[0-9]+").cast("long").alias("n_num"),
        _n("[^A-Za-z0-9\\s]+").cast("long").alias("n_punct"),
    )


def char_grams(docs: DataFrame, k: int = 8) -> DataFrame:
    """(doc_id, gram) — distinct rolling character k-grams."""
    # sequence(1, 0) counts down in Spark — short docs need an
    # explicit empty array
    grams = F.expr(
        f"CASE WHEN length(text) < {k} THEN array()"
        f" ELSE transform(sequence(1, length(text) - {k - 1}),"
        f" i -> substr(text, i, {k})) END"
    )
    return docs.select("doc_id", F.explode(grams).alias("gram")).distinct()


def fingerprints(docs: DataFrame, k: int = 8) -> DataFrame:
    """(doc_id, text) -> (doc_id, n_distinct_grams, min_gram_md5).

    Content fingerprint: the minimum md5 over all rolling k-grams (a
    1-permutation MinHash over character shingles) plus the distinct
    gram count.  Robust to small edits in proportion to doc length;
    portable (md5 string-min) so an SQL oracle reproduces it exactly.
    """
    g = char_grams(docs, k=k)
    return g.groupBy("doc_id").agg(
        F.count("*").alias("n_distinct_grams"),
        F.min(F.md5(F.col("gram").cast("binary"))).alias("min_gram_md5"),
    )


def keywords_tfidf(postings: DataFrame, dictionary: DataFrame,
                   n_docs: int, k: int = 3) -> DataFrame:
    """Per-document keyword extraction: top-k index terms by plain
    tf-idf (tf * ln(N/df)) — the classic document-labeling primitive
    (and the per-doc summary a training-data pipeline attaches as
    metadata).

    Weights are quantized to micro-units BEFORE ranking so the
    (weight desc, term asc) tie-break is deterministic across engines.
    Plan: postings >< dictionary on term (no broadcast assumption —
    both sides are vocabulary-sized), then one window rank partitioned
    by doc_id; the window shuffle is keyed on doc_id, which is
    unskewed by construction.

    Returns (doc_id, rank, term, w_micro), k rows per doc.
    """
    from pyspark.sql import Window

    w = (F.col("tf").cast("double")
         * F.log(F.lit(float(n_docs)) / F.col("df")))
    weighted = postings.join(dictionary.select("term", "df"), "term").select(
        "doc_id", "term",
        F.round(w * F.lit(1000000.0)).cast("long").alias("w_micro"))
    rank = F.row_number().over(
        Window.partitionBy("doc_id")
        .orderBy(F.desc("w_micro"), F.asc("term")))
    return (weighted.withColumn("rank", rank)
            .filter(F.col("rank") <= k)
            .select("doc_id", F.col("rank").cast("int").alias("rank"),
                    "term", "w_micro"))


def kwic_snippets(docs: DataFrame, terms: list[str],
                  window: int = 3) -> DataFrame:
    """Keyword-in-context snippet extraction: for every doc containing
    at least one query term, the earliest-occurring term and a
    +-window-token snippet around its first occurrence (the
    result-page snippet the reference renders only as a headline —
    Utils.java headline lookup; this is the generalized form).

    Entirely JVM-side: whitespace token array, per-term first-position
    probe (array_position), (pos, term)-lexicographic min for the
    deterministic earliest-match tie-break, one slice + join for the
    snippet.  Narrow except one doc_id-keyed agg over doc x |terms|
    rows; no Python, no window over raw tokens.

    Returns (doc_id, pos, term, snippet); pos is 1-based.
    """
    w = F.filter(F.split(F.col("text"), " "),
                 lambda t: F.length(t) > 0)
    d = docs.select("doc_id", w.alias("w"))
    probes = d.select(
        "doc_id",
        F.explode(F.array([F.lit(t) for t in terms])).alias("term"),
        F.col("w"),
    ).select(
        "doc_id", "term",
        F.expr("array_position(w, term)").alias("pos"),
    ).filter(F.col("pos") > 0)
    best = probes.groupBy("doc_id").agg(
        F.min(F.struct("pos", "term")).alias("b"))
    lo = F.greatest(F.lit(1), F.col("b.pos") - F.lit(window))
    length = F.col("b.pos") + F.lit(window) - lo + F.lit(1)
    return best.join(d, "doc_id").select(
        "doc_id",
        F.col("b.pos").cast("int").alias("pos"),
        F.col("b.term").alias("term"),
        F.array_join(F.slice("w", lo, length), " ").alias("snippet"),
    )


# PII patterns: ASCII-safe, identical semantics under Java regex
# (Spark) and RE2 (DuckDB) — keep to \b, classes, and bounded repeats.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction for training-data curation: replace emails, NANP
    phone numbers and IPv4 addresses with typed placeholders, and
    count what was redacted.  Email first (its domain would otherwise
    be visible to the IP pattern), then IP, then phone.

    Pure narrow map — regexp_count + three chained regexp_replace, all
    whole-stage-codegen; no shuffle, scales linearly with input bytes.

    Returns (doc_id, n_emails, n_phones, n_ips, scrubbed).
    """
    t = F.col(text_col)
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IP, "<IP>")
    scrubbed = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    # each count runs on the text the corresponding replace actually
    # saw, so counts == redactions performed (a substring consumed by
    # the email pass is not double-counted as an IP or phone)
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(after_ip, F.lit(PII_PHONE)).cast("long")
        .alias("n_phones"),
        F.regexp_count(after_email, F.lit(PII_IP)).cast("long")
        .alias("n_ips"),
        scrubbed.alias("scrubbed"),
    )


def nfc_normalize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode NFC normalization for crawled text (UAX #15): web pages
    mix precomposed and combining-sequence encodings of the same
    glyphs, which breaks exact dedup, tokenization and term matching.
    Emits per doc:
      (doc_id, was_nfc, bytes_before, bytes_after, norm_text)

    Arrow-batched ``mapInPandas`` over Python's ``unicodedata`` (the
    sanctioned slow path: Spark SQL has no normalization builtin);
    byte lengths (not code points) on both sides because length
    semantics differ across engines while UTF-8 bytes do not.  Narrow
    map, no shuffle; parity with DuckDB's ``nfc_normalize`` is gate-
    checked byte-for-byte via md5 in gates_analytics."""
    import pandas as pd  # noqa: F401  (kernel-side)

    def kernel(batches):
        import unicodedata

        import pandas as pd

        for pdf in batches:
            texts = pdf[text_col].astype(str)
            norm = texts.map(lambda s: unicodedata.normalize("NFC", s))
            b_before = texts.map(lambda s: len(s.encode("utf-8")))
            b_after = norm.map(lambda s: len(s.encode("utf-8")))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "was_nfc": (texts == norm).astype("int32"),
                "bytes_before": b_before.astype("int64"),
                "bytes_after": b_after.astype("int64"),
                "norm_text": norm,
            })

    return docs.select("doc_id", text_col).mapInPandas(
        kernel,
        "doc_id long, was_nfc int, bytes_before long, bytes_after long, "
        "norm_text string")


def bigram_nll(docs: DataFrame, tau: float = 6.0,
               text_col: str = "text") -> DataFrame:
    """Perplexity filtering under a self-trained add-one-smoothed
    bigram LM — the classic quality signal (KenLM-style perplexity
    filtering) with the model estimated ON the corpus being scored:

        P(w2|w1) = (c2(w1,w2) + 1) / (c1(w1) + V)
        nll(doc) = -mean over doc bigrams of ln P(w2|w1)

    Token stream: whitespace tokens with len > 1 (the clean-corpus
    stream contract; production swaps in the Arrow tokenizer kernel).
    Plan: bigram expansion is a JVM transform+explode; the model is
    two hash aggs over (bigram|unigram)-vocabulary-sized relations;
    scoring joins per-doc DISTINCT bigram counts (not raw occurrences)
    against the model, then one doc_id agg.  Shuffles are keyed on
    vocabulary or doc_id — nothing quadratic, no Python.

    Returns (doc_id, n_bigrams, nll_micro, keep) for docs with >= 1
    bigram; keep = 1 iff nll <= tau (INT house-style flag).
    """
    w = F.filter(F.split(F.col(text_col), " "),
                 lambda t: F.length(t) > 1)
    d = docs.select("doc_id", w.alias("w")).filter(F.size("w") >= 2)
    bi = d.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(w) - 1), "
            "i -> struct(w[i - 1] AS w1, w[i] AS w2))")).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    doc_bi = bi.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").cast("long").alias("n"))
    c2 = doc_bi.groupBy("w1", "w2").agg(F.sum("n").alias("c2"))
    uni = docs.select(F.explode(w).alias("t"))
    c1 = uni.groupBy("t").agg(F.count("*").alias("c1"))
    v = c1.count()
    lp = F.log((F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.lit(float(v))))
    scored = (doc_bi.join(c2, ["w1", "w2"])
              .join(c1.withColumnRenamed("t", "w1"), "w1")
              .select("doc_id", "n", (F.col("n") * lp).alias("nlp")))
    per = scored.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        (-F.sum("nlp") / F.sum("n")).alias("nll"))
    return per.select(
        "doc_id", "n_bigrams",
        F.round(F.col("nll") * F.lit(1000000.0)).cast("long")
        .alias("nll_micro"),
        (F.col("nll") <= F.lit(tau)).cast("int").alias("keep"))


def token_quantiles(docs: DataFrame, probs: list[float],
                    text_col: str = "text") -> DataFrame:
    """Per-language doc-length distribution: exact linear-interpolated
    (type-7) quantiles of whitespace token counts, plus doc count —
    the corpus-profiling report a mix designer reads before setting
    sampling weights.

    Exact percentile is a sort-based agg per group (fine for a
    bounded-cardinality group key like lang); at petabyte scale with
    high-cardinality keys swap in approx_percentile with a documented
    error bound — same plan shape.

    Returns (lang, n_docs, q_micro: array<long> aligned with probs).
    """
    n = F.size(F.filter(F.split(F.col(text_col), " "),
                        lambda t: F.length(t) > 0))
    per = docs.select("lang", n.alias("n_tokens")).groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.percentile("n_tokens", F.array(*[F.lit(p) for p in probs]))
        .alias("qs"))
    return per.select(
        "lang", "n_docs",
        F.transform("qs", lambda q: F.round(q * F.lit(1000000.0))
                    .cast("long")).alias("q_micro"))


def cjk_bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """CJK segmentation fallback (Lucene CJKAnalyzer analogue).

    The frozen reference tokenizer (T1-T12) is whitespace/Latin-
    oriented: unsegmented scripts carry no spaces to split on, so CJK
    content would be unsearchable.  The standard IR fallback indexes
    overlapping character BIGRAMS of each contiguous CJK run (an
    isolated single CJK character is indexed as a unigram).  Returns
    (doc_id, term, tf) — union with the Latin token table before the
    index build to make mixed-script pages searchable.

    Pure narrow map (regexp run extraction + per-run transform +
    explode) followed by one keyed count — same scale shape as the
    Latin tokenize pass.
    """
    runs = F.expr(
        f"regexp_extract_all({text_col}, '[\\\\u4e00-\\\\u9fff]+', 0)")
    grams_per_run = (
        "transform(runs, r -> CASE WHEN length(r) < 2 THEN array(r) "
        "ELSE transform(sequence(1, length(r) - 1), "
        "i -> substring(r, i, 2)) END)")
    return (
        docs.select("doc_id", runs.alias("runs"))
        .select("doc_id",
                F.explode(F.expr(f"flatten({grams_per_run})"))
                .alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def vocab_growth(tokens: DataFrame,
                 checkpoints: list[int]) -> DataFrame:
    """Vocabulary-growth profile (the Heaps'-law curve): for each
    prefix checkpoint c — "the first c documents in doc_id order" —
    the cumulative token mass and the number of DISTINCT terms seen.

    The profile is the standard corpus-health diagnostic for crawl
    pipelines (vocabulary growing faster than V = k * n^beta with
    beta ~ 0.5 flags boilerplate explosions, encoding noise, or spam
    floods mid-ingest) and sizes the term dictionary before an index
    build.

    Distribution: NO per-prefix rescan.  Each term's contribution to
    every checkpoint is determined by its FIRST occurrence — one
    groupBy(term).min(doc_id) over the token relation — and token
    mass by per-doc sums; both join the tiny broadcast checkpoint
    list (|checkpoints| rows) and reduce with plain integer aggs, so
    the cost is one pass over tokens regardless of how many
    checkpoints are profiled.

    ``tokens``: (doc_id, term, tf) with dense 0-based doc ids.
    Returns (n_docs, n_tokens, vocab_size), one row per checkpoint.
    """
    if not checkpoints or any(c <= 0 for c in checkpoints):
        raise ValueError("checkpoints must be positive doc counts")
    spark = tokens.sparkSession
    cp_plain = spark.createDataFrame(
        [(int(c),) for c in sorted(set(checkpoints))], "n_docs long")
    cp = F.broadcast(cp_plain)
    first = tokens.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    vocab = (first.join(cp, first["first_doc"] < cp["n_docs"])
             .groupBy("n_docs")
             .agg(F.count(F.lit(1)).cast("long").alias("vocab_size")))
    doclens = tokens.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    mass = (doclens.join(cp, doclens["doc_id"] < cp["n_docs"])
            .groupBy("n_docs")
            .agg(F.sum("dl").cast("long").alias("n_tokens")))
    return (cp_plain.join(mass, "n_docs", "left")
            .join(vocab, "n_docs", "left")
            .select("n_docs",
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("vocab_size", F.lit(0)).alias("vocab_size")))


def heaps_fit(rows: list[tuple[int, int]]) -> tuple[float, float]:
    """Driver-side Heaps'-law fit V = k * n^beta over (n_tokens,
    vocab_size) checkpoint rows: ordinary least squares on
    log V = log k + beta * log n.  Pure Python on the handful of
    checkpoints ``vocab_growth`` returns (the distributed work already
    happened); returns (k, beta)."""
    import math as _m

    pts = [(float(n), float(v)) for n, v in rows if n > 0 and v > 0]
    if len(pts) < 2:
        raise ValueError("need >= 2 non-empty checkpoints to fit")
    xs = [_m.log(n) for n, _ in pts]
    ys = [_m.log(v) for _, v in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    if sxx == 0.0:
        raise ValueError("degenerate checkpoints (all same token mass)")
    beta = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx
    k = _m.exp(my - beta * mx)
    return k, beta
