"""Corpus-level curation operators for training-data pipelines:
benchmark decontamination, Gopher-style repetition filtering,
deterministic stratified sampling, and the training-mix report.

The reference engine stops at indexing; these are the standard steps a
100 TB webtext pipeline runs between crawling and training (C4/Gopher/
RefinedWeb lineage), built Spark-first:

- decontamination: word n-grams of the (small) benchmark set are
  broadcast; the corpus side explodes grams and semi-joins — no
  shuffle of corpus text, the broadcast join prunes in the scan stage.
- repetition profile: two partial-aggregated shuffles per corpus
  ((doc, gram) counts, then per-doc rollup); all expressions stay in
  whole-stage codegen (split/transform/slice higher-order functions).
- stratified sampling: a *deterministic* per-row md5 threshold — no
  RNG, no driver state, identical output on any cluster layout, and
  a pure narrow map (no shuffle at all).  This is the sampling shape
  that survives re-runs and audits at 100 TB: membership is a pure
  function of (doc_id, stratum policy).
- mix report: one partial-agg shuffle to a tiny per-stratum table,
  then a broadcast of the grand total for shares.

Portability contract (same as dedup.py): hashes are md5 over explicit
utf-8 strings so the DuckDB oracle reproduces them bit-for-bit, and
ratios are micro-quantized to BIGINT before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles

# Gopher-style keep thresholds (token-level analogues of the published
# character-fraction rules)
TOP_BIGRAM_MAX = 0.20       # most frequent 2-gram <= 20% of 2-grams
DUP_TRIGRAM_MAX = 0.30      # 3-grams occurring >1x <= 30% of 3-grams


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 5) -> DataFrame:
    """Flag corpus docs sharing any word n-gram with a benchmark set.

    (doc_id, text) x (doc_id, text) -> (doc_id, n_contaminated_grams,
    n_grams, contaminated) for EVERY corpus doc — a doc too short to
    form one n-gram gets (0, 0, 0), it is trivially uncontaminated
    (dropping it instead would lose the doc from any downstream kept
    set keyed on contaminated = 0).

    The benchmark side is tiny relative to the corpus (eval suites are
    KBs, corpora are TBs) — its distinct grams are broadcast, so the
    corpus side never shuffles: explode -> broadcast semi-count ->
    per-doc partial agg.
    """
    bench_grams = word_shingles(bench.select("doc_id", "text"), n=n).select(
        "shingle").distinct()
    corpus_grams = word_shingles(docs.select("doc_id", "text"), n=n)
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    sizes = corpus_grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (
        docs.select("doc_id").distinct()
        .join(sizes, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated_grams", F.lit(0)).cast("long").alias(
                "n_contaminated_grams"),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).cast("int").alias(
                "contaminated"),
        )
    )


def host_profile(docs: DataFrame, host_col: str = "source") -> DataFrame:
    """Host-level curation profile — the aggregation behind host
    blocklists (UT1-style) and FineWeb's host-granularity filters:
    spam/SEO farms are host phenomena, so pipelines score HOSTS, not
    just documents.

    (doc_id, text, lang, host) -> one row per host:
      n_docs, n_dup_docs (docs minus distinct text fingerprints —
      within-host exact-duplicate mass), dup_frac_micro,
      mean_tokens_micro (mean whitespace token count), top_lang
      (majority language, count DESC then lang ASC tie-break).

    Two keyed aggregations, both partial-aggregable: one over
    (host, lang) for the majority language, one over host for the
    counters — at 10^12 docs this is the cheapest shape that exists.
    """
    toks = F.size(F.expr("filter(split(text, ' '), t -> length(t) > 0)"))
    base = docs.select(
        F.col(host_col).alias("host"), "lang",
        F.md5(F.col("text").cast("binary")).alias("_h"),
        toks.cast("double").alias("_nt"))
    lang_counts = (base.groupBy("host", "lang")
                   .agg(F.count(F.lit(1)).alias("_c")))
    # deterministic majority: min of (-count, lang)
    top_lang = (lang_counts.select(
        "host", F.struct((-F.col("_c")).alias("nc"),
                         F.col("lang").alias("lang")).alias("_s"))
        .groupBy("host").agg(F.min("_s").alias("_s"))
        .select("host", F.col("_s.lang").alias("top_lang")))
    prof = base.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct("_h")).cast("long")
        .alias("n_dup_docs"),
        F.round(F.avg("_nt") * F.lit(1000000.0)).cast("long")
        .alias("mean_tokens_micro"))
    return (prof.join(top_lang, "host")
            .select("host", "n_docs", "n_dup_docs",
                    F.round(F.col("n_dup_docs") * F.lit(1000000.0)
                            / F.col("n_docs")).cast("long")
                    .alias("dup_frac_micro"),
                    "mean_tokens_micro", "top_lang"))


def host_blocklist(profile: DataFrame, *, max_dup_frac: float = 0.5,
                   min_mean_tokens: float = 5.0) -> DataFrame:
    """Hosts failing the profile thresholds: duplicate-heavy (SEO spam
    mills) or degenerate-short content.  Join the result back as an
    anti-join to drop every doc from a blocked host."""
    return profile.where(
        (F.col("dup_frac_micro") > int(max_dup_frac * 1_000_000))
        | (F.col("mean_tokens_micro")
           < int(min_mean_tokens * 1_000_000))).select("host")


def weighted_sample(docs: DataFrame, *, weight_col: str, n: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, algorithm A-ES) — the corpus-mixing primitive: draw n docs
    with inclusion probability proportional to ``weight_col`` (token
    counts, DSIR importance, quality scores ...).

    Each row gets key = ln(u) / w, a monotone transform of the paper's
    u^(1/w) (same ordering, no float pow), with u derived
    DETERMINISTICALLY from md5(id) — membership is reproducible across
    reruns and engines, the property every training-data audit needs.
    The sample is the global top-n by key.

    Scale shape: the key is a pure narrow expression; top-n is ONE
    TakeOrderedAndProject (per-partition heaps + driver merge of n
    rows) — no shuffle, no sort of the corpus.  Keys are
    micro-quantized before ranking so engines can't disagree at the
    boundary; ties break by id ASC.  Rows with weight <= 0 are
    excluded (zero weight = zero inclusion probability).
    """
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
               16, 10).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float((1 << 32) + 1))
    key = F.round(F.log(u) / F.col(weight_col).cast("double")
                  * F.lit(1000000.0)).cast("long")
    return (docs.where(F.col(weight_col) > 0)
            .withColumn("sample_key_micro", key)
            .orderBy(F.col("sample_key_micro").desc(),
                     F.col(id_col).asc())
            .limit(n))


def decontaminate_bloom(docs: DataFrame, bench: DataFrame, *,
                        n: int = 5, n_hashes: int = 5,
                        n_bits: int = 1 << 16) -> DataFrame:
    """Bounded-memory decontamination: the benchmark n-grams become an
    ``n_bits`` Bloom bitmap instead of a broadcast gram set.

    Output (doc_id, n_bloom_hits, n_grams, contaminated) over DISTINCT
    per-doc grams.  No false negatives — a truly contaminated doc is
    ALWAYS flagged; false positives at the configured rate flag a few
    clean docs, the safe direction for eval hygiene (drop, never keep).
    Same hash idiom as sketch.py::_bucket, so flags are deterministic
    and engine-reproducible.

    Scale shape — strictly better than :func:`decontaminate` when the
    benchmark gram set outgrows a comfortable broadcast: the bitmap is
    collected ONCE (<= n_bits set positions; n_bits/4 hex chars ride
    the plan as a literal, the same idea as Spark's runtime bloom
    pruning) and the corpus side is then a PURE NARROW MAP — grams,
    k hash probes, and the bitmap test are all higher-order column
    expressions; zero joins, zero shuffles, zero Python on the corpus.
    """
    from .sketch import bloom_build

    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    bench_grams = word_shingles(bench.select("doc_id", "text"), n=n) \
        .select(F.col("shingle").alias("term"))
    bits = [int(r["bit"]) for r in
            bloom_build(bench_grams, n_hashes=n_hashes,
                        n_bits=n_bits).collect()]
    # pack into an array<long> literal: constant-folded ONCE by
    # Catalyst, probed with element_at + shiftright — a 16 KB string
    # literal in the same position costs ~13x (per-call UTF8 copying)
    words = [0] * (n_bits // 64)
    for b in bits:
        words[b // 64] |= 1 << (b % 64)

    def _as_long(w: int) -> int:  # two's-complement into signed 64
        return w - (1 << 64) if w >= (1 << 63) else w

    bitmap = "array(" + ",".join(
        f"{_as_long(w)}L" for w in words) + ")"

    # _sw is projected once per row first: a split inlined in the
    # transform lambda is re-evaluated per gram position — O(words^2)
    # per doc (same fix as dedup.word_shingles)
    grams = (
        f"array_distinct(CASE WHEN size(_sw) < {n} THEN "
        f"array() ELSE transform(sequence(1, size(_sw) - "
        f"{n - 1}), i -> array_join(slice(_sw, i, {n}), ' ')) "
        f"END)")
    # k md5 bucket positions per gram (lockstep with sketch._bucket)
    positions = (
        f"transform(sequence(0, {n_hashes - 1}), i -> "
        f"CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', g)), "
        f"1, 8), 16, 10) AS BIGINT) % {n_bits})")
    bit_clear = (
        f"(shiftright(element_at({bitmap}, CAST(p / 64 AS INT) + 1), "
        f"CAST(p % 64 AS INT)) & 1) = 0")
    member = f"size(filter({positions}, p -> {bit_clear})) = 0"
    out = docs.select(
        "doc_id", F.expr("split(text, ' ')").alias("_sw")).select(
        "doc_id",
        F.expr(grams).alias("_dg")).select(
        "doc_id",
        F.expr(f"size(filter(_dg, g -> {member}))").cast("long")
        .alias("n_bloom_hits"),
        F.size("_dg").cast("long").alias("n_grams"))
    # docs too short to form one gram are out of scope, matching
    # :func:`decontaminate` (they cannot be contaminated)
    return out.where(F.col("n_grams") > 0).select(
        "doc_id", "n_bloom_hits", "n_grams",
        (F.col("n_bloom_hits") > 0).cast("int").alias("contaminated"))


def _gram_counts(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, gram, cnt) — NON-distinct word n-gram counts per doc.

    The split array is projected once per row (_sw): inlined in the
    transform lambda it re-evaluates per gram position — O(words^2)
    per doc (same fix as dedup.word_shingles)."""
    grams = F.expr(
        f"CASE WHEN size(_sw) < {n} THEN array()"
        f" ELSE transform(sequence(1, size(_sw) - {n - 1}),"
        f" i -> array_join(slice(_sw, i, {n}), ' ')) END"
    )
    return (
        docs.select("doc_id", F.expr("split(text, ' ')").alias("_sw"))
        .select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )


def repetition_profile(docs: DataFrame) -> DataFrame:
    """Gopher-style intra-document repetition features.

    (doc_id, text) -> (doc_id, top_bigram_frac_micro,
    dup_trigram_frac_micro, keep) where

    - top_bigram_frac  = count(most frequent 2-gram) / count(2-grams)
    - dup_trigram_frac = count(3-gram occurrences in 3-grams seen >1x
      within the doc) / count(3-grams)
    - keep             = both under the published-style thresholds.

    Docs too short for a 3-gram keep fraction 0 (nothing to repeat).
    Two aggregations, both with map-side partial combine; no Python.
    """
    bi = (
        _gram_counts(docs, 2)
        .groupBy("doc_id")
        .agg(
            F.max("cnt").alias("top_cnt"),
            F.sum("cnt").alias("n_bi"),
        )
        .select(
            "doc_id",
            (F.col("top_cnt").cast("double") / F.col("n_bi")).alias("top_bigram_frac"),
        )
    )
    tri = (
        _gram_counts(docs, 3)
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias("dup_occ"),
            F.sum("cnt").alias("n_tri"),
        )
        .select(
            "doc_id",
            (F.col("dup_occ").cast("double") / F.col("n_tri")).alias("dup_trigram_frac"),
        )
    )
    return (
        docs.select("doc_id")
        .join(bi, "doc_id", "left")
        .join(tri, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce("top_bigram_frac", F.lit(0.0)) * 1e6).cast("long").alias(
                "top_bigram_frac_micro"),
            F.round(F.coalesce("dup_trigram_frac", F.lit(0.0)) * 1e6).cast("long").alias(
                "dup_trigram_frac_micro"),
            (
                (F.coalesce("top_bigram_frac", F.lit(0.0)) <= TOP_BIGRAM_MAX)
                & (F.coalesce("dup_trigram_frac", F.lit(0.0)) <= DUP_TRIGRAM_MAX)
            ).cast("int").alias("keep"),
        )
    )


def sample_key(doc_id_col) -> F.Column:
    """Deterministic uniform-in-[0,1) key: the first 8 hex digits of
    md5(doc_id-as-string), as a fraction of 16^8.  A pure narrow
    projection — membership never depends on partitioning, ordering,
    or an RNG seed, so a 100 TB re-run (or a per-partition audit)
    reproduces the exact sample."""
    h = F.md5(doc_id_col.cast("string").cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(float(16 ** 8))


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      default_rate: float = 1.0) -> DataFrame:
    """Deterministic per-stratum downsampling by language.

    ``rates`` maps lang -> keep fraction (e.g. ``{"en": 0.5}`` halves
    the English share of the training mix).  Keeps a doc iff its md5
    sample key is under its stratum's rate.  Returns the kept rows
    with the key exposed for audit (micro-quantized).
    """
    rate = F.lit(float(default_rate))
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(float(r))).otherwise(rate)
    key = sample_key(F.col("doc_id"))
    return (
        docs.withColumn("_key", key)
        .filter(F.col("_key") < rate)
        .select(
            "doc_id", "lang",
            F.round(F.col("_key") * 1e6).cast("long").alias("sample_key_micro"),
        )
    )


def cap_per_source(docs: DataFrame, cap: int,
                   source_col: str = "source") -> DataFrame:
    """Per-host document capping (CCNet/RefinedWeb-style host quota):
    keep at most ``cap`` docs per source/host, selected by a
    DETERMINISTIC pseudo-random order (md5 sample key, doc_id
    tie-break) so re-runs and audits reproduce the exact kept set and
    no crawl-order bias leaks into the sample.

    (doc_id, source, ...) -> kept (doc_id, source, host_rank).

    Scale shape: one shuffle on source + a per-source window.  The
    window only needs ranks up to ``cap``: at 100 TB, pre-filter the
    giant hosts first (count per source, broadcast the over-cap host
    list, window only those — the under-cap long tail, which is most
    of the web, never enters the window) and let AQE split the
    remaining skewed host partitions.
    """
    from pyspark.sql import Window

    if cap <= 0:
        raise ValueError("cap must be positive")
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id")
    return (
        docs.select("doc_id", source_col)
        .withColumn("host_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("host_rank") <= cap)
    )


def mix_report(docs: DataFrame) -> DataFrame:
    """Training-mix report: per-(lang) doc/token/char totals and the
    corpus share of each stratum.

    ONE corpus scan + one partial-agg shuffle down to ~#languages
    rows; the grand total is a window over that tiny aggregate (a
    crossJoin(per.agg(...)) instead would re-scan the whole corpus —
    Catalyst does not reuse the shared lineage there; verified via
    .explain, PLANS.md §7).
    """
    from pyspark.sql import Window

    n_tok = F.expr("size(filter(split(text, ' '), t -> length(t) > 0))")
    per = (
        docs.select("lang", n_tok.alias("n_tok"), F.length("text").alias("n_chars"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return per.select(
        "lang", "n_docs", "n_tokens", "n_chars",
        F.round(F.col("n_tokens").cast("double") / total * 1e6)
        .cast("long").alias("token_share_micro"),
    )


def pack_sequences(doc_tokens: DataFrame, budget: int,
                   caches: list | None = None) -> DataFrame:
    """Sequence packing for training-data assembly: lay documents
    end-to-end (in doc_id order) into a global token stream and assign
    each doc its starting bin of ``budget`` tokens — the planning step
    of LLM-pretraining sequence packing (docs spanning a bin boundary
    continue into the next bin; the materializer later splits them).

    The global running token total is a DISTRIBUTED prefix sum (the
    assign_doc_ids pattern, build.py): range-partition by doc_id,
    window-cumsum within each partition (parallel), collect only the
    P per-partition totals to the driver, broadcast the per-partition
    offsets back.  No single-partition global window at any point.

    Input (doc_id, n_tokens); returns (doc_id, n_tokens, start,
    bin_id, bin_offset) where start is the doc's position in the
    stream, bin_id = start // budget, bin_offset = start % budget.

    Pass ``caches`` to receive the internal persist for release after
    materialization (same contract as assign_doc_ids).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = doc_tokens.sparkSession
    from pyspark.sql import Window

    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    parted = (
        doc_tokens.select("doc_id", "n_tokens")
        .repartitionByRange(n_parts, "doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (Window.partitionBy("_pid").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    local = parted.withColumn(
        "_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))).persist()
    if caches is not None:
        caches.append(local)
    totals = sorted(
        (r["_pid"], r["t"]) for r in
        local.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect())
    offsets, running = [], 0
    for pid, t in totals:
        offsets.append((pid, running))
        running += int(t or 0)
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "_pid int, _off long"))
    start = (F.col("_before") + F.col("_off")).cast("long")
    return local.join(off_df, "_pid").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        start.alias("start"),
        F.floor(start / F.lit(budget)).cast("long").alias("bin_id"),
        F.pmod(start, F.lit(budget)).cast("long").alias("bin_offset"),
    )


# --- DSIR: data selection via importance resampling -------------------------

def hashed_gram_buckets(docs: DataFrame, n_buckets: int = 8192) -> DataFrame:
    """(doc_id, b, cnt) — whitespace unigram + bigram counts hashed
    into ``n_buckets`` via the first 8 hex chars of md5 (portable:
    the DuckDB oracle reproduces the bucketing bit-for-bit).

    All JVM expressions (split / transform / explode) — one shuffle
    for the (doc, bucket) count; output is at most min(doc grams,
    n_buckets) rows per doc."""
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    uni = toks.select("doc_id", F.explode("t").alias("gram"))
    bi_expr = F.expr(
        "CASE WHEN size(t) < 2 THEN array() "
        "ELSE transform(sequence(1, size(t) - 1), "
        "i -> concat(t[i - 1], ' ', t[i])) END")
    bi = toks.select("doc_id", F.explode(bi_expr).alias("gram"))
    b = (F.conv(F.substring(F.md5(F.col("gram").cast("binary")), 1, 8),
                16, 10).cast("long") % F.lit(n_buckets))
    return (uni.unionByName(bi)
            .select("doc_id", b.alias("b"))
            .groupBy("doc_id", "b")
            .agg(F.count(F.lit(1)).alias("cnt")))


def dsir_importance(raw: DataFrame, target: DataFrame, *,
                    n_buckets: int = 8192, alpha: float = 1.0) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw doc
    by log p_target(features) - log p_raw(features) under hashed
    unigram+bigram multinomial models with add-``alpha`` smoothing.
    Docs that look like the (small, curated) ``target`` distribution
    get high weights; selection keeps the top weights (or Gumbel-top-k
    resamples — deterministic top-k here).

    (raw: (doc_id, text), target: (doc_id, text)) ->
    (doc_id, dsir_logw:double) for every raw doc.

    Scale shape: both distributions are ``n_buckets``-row tables
    (bounded, independent of corpus size) built with one partial-agg
    shuffle each; the per-bucket log-ratio table broadcasts; per-doc
    weights are one broadcast join + one groupBy(doc_id) over the
    already-bucketed counts.  Nothing driver-side but two scalar
    totals.
    """
    rawb = hashed_gram_buckets(raw, n_buckets)
    tgtb = hashed_gram_buckets(target, n_buckets)
    raw_dist = rawb.groupBy("b").agg(F.sum("cnt").alias("rc"))
    tgt_dist = tgtb.groupBy("b").agg(F.sum("cnt").alias("tc"))
    raw_tot = raw_dist.agg(F.coalesce(F.sum("rc"), F.lit(0))).collect()[0][0]
    tgt_tot = tgt_dist.agg(F.coalesce(F.sum("tc"), F.lit(0))).collect()[0][0]
    lr = (F.log((F.coalesce(F.col("tc"), F.lit(0)) + F.lit(alpha))
                / F.lit(float(tgt_tot) + alpha * n_buckets))
          - F.log((F.col("rc") + F.lit(alpha))
                  / F.lit(float(raw_tot) + alpha * n_buckets)))
    # every bucket with any raw gram is in raw_dist, so a left join
    # from the raw side is total; the ratio table is <= n_buckets rows
    ratio = (raw_dist.join(tgt_dist, "b", "left")
             .select("b", lr.alias("lr")))
    return (rawb.join(F.broadcast(ratio), "b")
            .groupBy("doc_id")
            .agg(F.sum(F.col("cnt") * F.col("lr")).alias("dsir_logw")))


def chunk_documents(docs: DataFrame, chunk: int = 128,
                    stride: int = 64) -> DataFrame:
    """Sliding-window document chunking — the long-document splitting
    step of a training pipeline (and of passage-level retrieval):
    each doc's token stream becomes overlapping windows of ``chunk``
    tokens advancing by ``stride``.

    (doc_id, text) -> one row per window: (doc_id, chunk_id, start,
    n_chunk_tokens, chunk_md5) where start is the 0-based token
    offset, the last window may be short, and ``chunk_md5``
    fingerprints the window's tokens re-joined by ' ' (value-checking
    the exact slice without shipping it).  Tokens are whitespace
    words; a doc with no tokens yields no rows.  Window count is
    1 + ceil(max(n - chunk, 0) / stride): every token is covered and
    no window starts at-or-past the end.

    Scale shape: pure narrow map — split, sequence, explode, slice —
    no shuffle at all; each input partition writes its own chunk rows
    (the explode fan-out is bounded by ~n_tokens/stride per doc).
    Whole-stage codegen end to end, no Python.
    """
    rows = chunk_windows(docs, chunk=chunk, stride=stride)
    return rows.select(
        "doc_id", "chunk_id", "start",
        F.size("win").cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join("win", " ").cast("binary")).alias("chunk_md5"),
    )


def chunk_windows(docs: DataFrame, chunk: int = 128,
                  stride: int = 64) -> DataFrame:
    """The window derivation behind :func:`chunk_documents`, with the
    token arrays kept: (doc_id, chunk_id, start, win) — the input to
    passage-level retrieval (operators/passages.py).  Same narrow-map
    plan: split, sequence, explode, slice; no shuffle."""
    if chunk <= 0 or stride <= 0 or stride > chunk:
        raise ValueError("need 0 < stride <= chunk")
    words = F.expr("filter(split(text, ' '), t -> length(t) > 0)")
    n = F.size(F.col("_w"))
    n_chunks = F.when(n <= 0, F.lit(0)).when(n <= chunk, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - chunk) / F.lit(float(stride))).cast("int"))
    based = docs.select("doc_id", words.alias("_w"))
    # sequence(0, -1) would DESCEND, not be empty — guard the no-token case
    ids = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
                 ).otherwise(F.array().cast("array<int>"))
    return (
        based.select("doc_id", "_w", F.explode(ids).alias("chunk_id"))
        .withColumn("start", (F.col("chunk_id") * stride).cast("long"))
        # slice() is 1-based; the final window is clipped by slice itself
        .withColumn("win", F.slice(F.col("_w"), (F.col("chunk_id") * stride) + 1, chunk))
        .select("doc_id", F.col("chunk_id").cast("long").alias("chunk_id"),
                "start", "win")
    )


# C4-style line filter thresholds (Raffel et al. 2020, public rules)
C4_MIN_LINE_WORDS = 3       # drop lines with fewer words
C4_MIN_KEPT_LINES = 3       # drop pages keeping fewer lines ("sentences")
C4_TERMINALS = (".", "!", "?", '"')


def c4_line_filter(docs: DataFrame, *, min_line_words: int = C4_MIN_LINE_WORDS,
                   min_kept_lines: int = C4_MIN_KEPT_LINES) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020): keep only
    lines that end in terminal punctuation, have at least
    ``min_line_words`` words, and do not mention "javascript"; then
    keep only pages that retain at least ``min_kept_lines`` lines and
    contain neither "lorem ipsum" nor a curly brace anywhere.

    (doc_id, text) -> (doc_id, n_lines, n_kept_lines, kept_md5, keep)
    with ``kept_md5`` the md5 of surviving lines re-joined by '\\n' in
    original order (md5('') when none survive) and ``keep`` the page
    verdict as 0/1.  Pages with no lines at all still get a row
    (n_lines = 0, keep = 0): the filter's report covers the corpus.

    Scale shape: one narrow split pass + one groupBy(doc_id) — line
    verdicts are pure column expressions inside the aggregate's
    projection, so the only shuffle carries (doc_id, line verdicts),
    partial-aggregated map-side.  No Python anywhere.
    """
    lower = F.lower(F.col("line"))
    terminal = F.lit(False)
    for t in C4_TERMINALS:
        terminal = terminal | F.col("line").endswith(t)
    n_words = F.size(F.expr("filter(split(line, ' '), t -> length(t) > 0)"))
    line_keep = (terminal & (n_words >= min_line_words)
                 & ~lower.contains("javascript"))
    lines = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), "\n")).alias("idx", "line"))
        .filter(F.trim(F.col("line")) != "")
        .withColumn("_lk", line_keep)
    )
    kept_sorted = F.transform(
        F.array_sort(F.collect_list(
            F.when(F.col("_lk"), F.struct("idx", "line")))),
        lambda s: s["line"])
    per_doc = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("_lk").cast("long")).cast("long").alias("n_kept_lines"),
        F.md5(F.concat_ws("\n", kept_sorted).cast("binary")).alias("kept_md5"),
    )
    all_docs = docs.select("doc_id", F.lower(F.col("text")).alias("_lt"))
    return (
        all_docs.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_kept_lines", F.lit(0)).cast("long")
            .alias("n_kept_lines"),
            F.coalesce("kept_md5", F.md5(F.lit("").cast("binary")))
            .alias("kept_md5"),
            ((F.coalesce("n_kept_lines", F.lit(0)) >= min_kept_lines)
             & ~F.col("_lt").contains("lorem ipsum")
             & ~F.col("_lt").contains("{")
             & ~F.col("_lt").contains("}"))
            .cast("int").alias("keep"),
        )
    )


# Gopher document-level quality rules (Rae et al. 2021, appendix A —
# public thresholds; the repetition rules live in repetition_profile)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_SYMBOL_RATIO_MAX = 0.1       # hash-to-word AND ellipsis-to-word
GOPHER_BULLET_LINE_MAX = 0.90       # > 90% bullet-started lines -> drop
GOPHER_ELLIPSIS_LINE_MAX = 0.30     # > 30% ellipsis-ended lines -> drop
GOPHER_ALPHA_WORD_MIN = 0.80        # >= 80% words contain a letter
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_KINDS = 2           # >= 2 distinct required stopwords
_BULLETS = ("•", "-", "*")


def gopher_quality_filter(docs: DataFrame) -> DataFrame:
    """Gopher document-level quality filter (Rae et al. 2021): the
    published word-count / mean-word-length / symbol-ratio / bullet
    and ellipsis line-fraction / alphabetic-word / required-stopword
    rules, as one narrow projection.

    (doc_id, text) -> (doc_id, n_words, mean_word_len_micro,
    alpha_frac_micro, hash_ratio_micro, ellipsis_ratio_micro,
    bullet_line_frac_micro, ellipsis_line_frac_micro, n_stop_kinds,
    keep) — ratios micro-quantized for cross-engine determinism,
    ``keep`` the page verdict as 0/1.  Words are whitespace runs;
    ellipses count both ``...`` and the single-char ``…``; bullet
    chars are •, -, *.

    Scale shape: every feature is an array/string expression over the
    row's own text — pure narrow map, zero shuffle, whole-stage
    codegen, no Python.  At 10^12 docs this filter costs exactly one
    pass over the text column.
    """
    words = F.expr(r"filter(split(text, '\\s+'), w -> length(w) > 0)")
    lns = F.expr(
        r"filter(transform(split(text, '\n'), l -> trim(l)), l -> l != '')")
    d = docs.select(
        "doc_id",
        F.col("text"),
        words.alias("_w"),
        lns.alias("_l"),
    )
    n_words = F.size("_w").cast("double")
    n_lines = F.size("_l").cast("double")
    has_words = n_words > 0
    has_lines = n_lines > 0
    mean_len = F.when(has_words, F.expr(
        "aggregate(_w, 0L, (a, w) -> a + length(w))").cast("double")
        / n_words).otherwise(F.lit(0.0))
    alpha_frac = F.when(has_words, F.expr(
        "size(filter(_w, w -> w rlike '[A-Za-z]'))").cast("double")
        / n_words).otherwise(F.lit(0.0))
    n_hash = (F.length("text")
              - F.length(F.regexp_replace("text", "#", ""))).cast("double")
    n_ell = (
        (F.length("text") - F.length(F.regexp_replace("text", "…", "")))
        + F.floor((F.length(F.regexp_replace("text", "…", ""))
                   - F.length(F.regexp_replace(
                       F.regexp_replace("text", "…", ""),
                       r"\.\.\.", ""))) / F.lit(3))
    ).cast("double")
    hash_ratio = F.when(has_words, n_hash / n_words).otherwise(F.lit(0.0))
    ell_ratio = F.when(has_words, n_ell / n_words).otherwise(F.lit(0.0))
    bullet_cond = " or ".join(
        f"startswith(l, '{b}')" for b in _BULLETS)
    bullet_frac = F.when(has_lines, F.expr(
        f"size(filter(_l, l -> {bullet_cond}))").cast("double")
        / n_lines).otherwise(F.lit(0.0))
    ell_line_frac = F.when(has_lines, F.expr(
        "size(filter(_l, l -> endswith(l, '...') "
        "or endswith(l, '…')))").cast("double")
        / n_lines).otherwise(F.lit(0.0))
    stop_arr = "array(" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + ")"
    n_stop = F.expr(
        f"size(array_intersect(array_distinct(transform(_w, "
        f"w -> lower(w))), {stop_arr}))").cast("long")
    keep = (
        n_words.between(float(GOPHER_MIN_WORDS), float(GOPHER_MAX_WORDS))
        & mean_len.between(GOPHER_MIN_MEAN_WORD_LEN,
                           GOPHER_MAX_MEAN_WORD_LEN)
        & (hash_ratio <= GOPHER_SYMBOL_RATIO_MAX)
        & (ell_ratio <= GOPHER_SYMBOL_RATIO_MAX)
        & (bullet_frac <= GOPHER_BULLET_LINE_MAX)
        & (ell_line_frac <= GOPHER_ELLIPSIS_LINE_MAX)
        & (alpha_frac >= GOPHER_ALPHA_WORD_MIN)
        & (n_stop >= GOPHER_MIN_STOP_KINDS)
    )
    micro = lambda c: F.round(c * 1e6).cast("long")  # noqa: E731
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        micro(mean_len).alias("mean_word_len_micro"),
        micro(alpha_frac).alias("alpha_frac_micro"),
        micro(hash_ratio).alias("hash_ratio_micro"),
        micro(ell_ratio).alias("ellipsis_ratio_micro"),
        micro(bullet_frac).alias("bullet_line_frac_micro"),
        micro(ell_line_frac).alias("ellipsis_line_frac_micro"),
        n_stop.alias("n_stop_kinds"),
        keep.cast("int").alias("keep"),
    )


def corpus_drift(docs: DataFrame, slice_col: str = "lang", *,
                 n_buckets: int = 4096) -> DataFrame:
    """Distribution-drift monitor: Jensen-Shannon divergence (bits)
    between each corpus slice's hashed-unigram distribution and the
    pooled REST of the corpus (leave-one-out).

    (doc_id, text, <slice_col>) -> (slice, n_slice_tokens,
    jsd_bits:double) per distinct slice value; slices that ARE the
    whole corpus (rest empty) are dropped.  A slice whose language /
    crawl-batch / host mix silently changes shows up as a JSD step —
    the standard pre-training telemetry for "did this source drift".

    Scale shape: one partial-agg shuffle to (slice, bucket) counts
    (bounded by n_slices x n_buckets regardless of corpus size); the
    per-bucket global totals derive from THAT aggregate, not from a
    second corpus scan; everything after operates on the tiny bounded
    table.  No driver state, no UDFs — log/when arithmetic stays in
    whole-stage codegen.  Hashing is the portable first-8-hex-chars-of-
    md5 scheme shared with dsir_importance so the DuckDB oracle
    reproduces the bucketing bit-for-bit.
    """
    toks = docs.select(
        F.col(slice_col).alias("slice"),
        F.explode(F.filter(F.split("text", " "),
                           lambda t: t != "")).alias("tok"))
    b = (F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 8),
                16, 10).cast("long") % F.lit(n_buckets))
    sb = (toks.select("slice", b.alias("b"))
          .groupBy("slice", "b").agg(F.count(F.lit(1)).alias("cnt")))
    gb = sb.groupBy("b").agg(F.sum("cnt").alias("gcnt"))
    stot = sb.groupBy("slice").agg(F.sum("cnt").alias("stot"))
    gtot = gb.agg(F.coalesce(F.sum("gcnt"), F.lit(0))).collect()[0][0]
    # every (slice, bucket) pair that could contribute: slice-present
    # buckets plus rest-present buckets == all (slice x global-bucket)
    # pairs with either side non-zero.  Build it from the bounded
    # aggregates: cross the slice list with the global bucket table,
    # then left-join the slice counts.
    grid = (stot.crossJoin(F.broadcast(gb))
            .join(sb, ["slice", "b"], "left")
            .select("slice", "b", "stot", "gcnt",
                    F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")))
    p = F.col("cnt") / F.col("stot")
    rest = F.col("gcnt") - F.col("cnt")
    rest_tot = F.lit(gtot) - F.col("stot")
    q = rest / rest_tot
    m = (p + q) / F.lit(2.0)
    term = (F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
            + F.when(q > 0, q * F.log(q / m)).otherwise(F.lit(0.0)))
    ln2 = 0.6931471805599453
    return (grid.filter(rest_tot > 0)
            .groupBy("slice")
            .agg(F.max("stot").cast("long").alias("n_slice_tokens"),
                 (F.sum(term) / F.lit(2.0 * ln2)).alias("jsd_bits")))


def host_boilerplate(docs: DataFrame, host_col: str = "source", *,
                     min_docs: int = 3, min_frac: float = 0.1,
                     delim: str = "\n") -> DataFrame:
    """Host-level boilerplate stripping — the CCNet/RefinedWeb template
    filter: a paragraph that recurs across many pages OF THE SAME HOST
    (nav bars, cookie banners, footers) is boilerplate and is removed
    from every page; cross-host repeats are left alone (that is
    content duplication, ``dedup_paragraphs``'s job, not template
    noise).

    (doc_id, text, <host_col>) -> (doc_id, n_paras, n_boiler,
    kept_md5): a paragraph is boilerplate on host h when it appears in
    >= max(``min_docs``, ``min_frac`` * docs(h)) DISTINCT docs of h.
    ``kept_md5`` fingerprints the surviving paragraphs re-joined by
    ``delim`` in original order (md5('') if everything was template).

    Scale shape: paragraphs travel the shuffle as md5 keys + ints,
    never resident text; the per-(host, para) doc count is a distinct
    + partial-agg'd groupBy (hot template keys combine map-side); the
    boilerplate key table is tiny (per-host templates) and joins back
    equi-keyed on (host, hash) so AQE skew-join covers hot buckets;
    reassembly is one groupBy(doc_id).  All expressions whole-stage
    codegen, no Python.
    """
    paras = (
        docs.select(
            F.col(host_col).alias("host"), "doc_id",
            F.posexplode(F.split(F.col("text"), delim)).alias("idx", "para"))
        .filter(F.trim(F.col("para")) != "")
        .withColumn("h", F.md5(F.col("para").cast("binary")))
    )
    host_docs = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct("doc_id").alias("hdocs"))
    per_key = (paras.select("host", "h", "doc_id").distinct()
               .groupBy("host", "h").agg(F.count(F.lit(1)).alias("ndocs")))
    boiler = (per_key.join(host_docs, "host")
              .filter((F.col("ndocs") >= min_docs)
                      & (F.col("ndocs") >= F.col("hdocs") * min_frac))
              .select("host", "h", F.lit(True).alias("is_boiler")))
    tagged = (paras.join(boiler, ["host", "h"], "left")
              .withColumn("keep_para", F.col("is_boiler").isNull()))
    kept_sorted = F.transform(
        F.array_sort(F.collect_list(
            F.when(F.col("keep_para"), F.struct("idx", "para")))),
        lambda s: s["para"])
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum((~F.col("keep_para")).cast("long")).cast("long").alias(
            "n_boiler"),
        F.md5(F.concat_ws(delim, kept_sorted).cast("binary")).alias(
            "kept_md5"),
    )
