"""Driver-contract gates: Spark queries + DuckDB oracle SQL pairs.

Each gate is one operator family from SURVEY §2, run over the driver's
test tables (documents / embeddings) at a given sf_dir.  The Spark side
exercises the REAL engine code (tokenize kernel, build aggregations,
weighting expressions, segment index); the oracle side is plain ANSI
SQL DuckDB can run on the same parquet.

Determinism contract (driver compares row count + schema + value hash):
- every float is emitted as micro-units: CAST(ROUND(x * 1e6) AS BIGINT)
  — integer outputs hash identically across engines regardless of
  last-ulp double differences;
- every ranking orders by (score_micro DESC, id ASC) — exact tie-break;
- top-k gates over-fetch from the engine (k*5 raw candidates), then
  re-rank on the quantized score, so an oracle and the engine can never
  disagree inside a quantization tie.

The documents corpus is clean lowercase [a-z ] text, on which the full
reference tokenizer provably equals "split on spaces, keep len>1"
(tests/test_text.py::test_simple_equals_full_on_clean_prose), so the
SQL oracle tokenizes with string_split while the Spark side runs the
real Arrow kernel.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import build as B
from .operators import query as Q
from .text import STOPWORDS, tokenize

# --- shared SQL fragments (DuckDB dialect; Spark side uses engine code) ------

STOP_SQL = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))

# tokens incl. stopwords (doc_len semantics D2); len>1 == full tokenizer here


def _toks_cte(corpus_where: str = "") -> str:
    """The shared token/postings/docinfo/stats/dict CTE, optionally
    over a RESTRICTED corpus (``corpus_where`` filters documents before
    anything is derived) — used by the post-compaction delete gate,
    whose collection stats must come from the live docs only."""
    where = f"WHERE {corpus_where}" if corpus_where else ""
    return f"""
toks AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents {where}) u
  WHERE LENGTH(term) > 1
  GROUP BY doc_id, term
),
postings AS (SELECT * FROM toks WHERE term NOT IN ({STOP_SQL})),
docinfo AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS doc_len,
         COALESCE(MAX(CASE WHEN term NOT IN ({STOP_SQL}) THEN tf END), 0)
           AS max_tf
  FROM toks GROUP BY doc_id
),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(doc_len) AS avg_dl FROM docinfo),
dict AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
         FROM postings GROUP BY term)
"""


TOKS_CTE = _toks_cte()

# the flagship query: mixed-df corpus vocabulary
FLAGSHIP_QUERY = "fast hash join with big vector table scan"
K_FLAGSHIP = 10

_STEM_CTE_MEMO: str | None = None


def _toks_cte_stem() -> str:
    """Stemmed variant of TOKS_CTE (T9 end-to-end): DuckDB can't run
    Porter, so the mapping {raw token -> stem} is pre-computed with the
    frozen pure-Python porter_stem over the gate corpora vocabularies
    (sf0.001 + sf0.01 + $IR_SPARK_GATE_SF) and inlined as a VALUES
    list; identity stems are omitted (COALESCE falls through).  Matches
    engine semantics: stem applied per-token after the length filter,
    stopwords removed on the STEMMED term (oracle.py build_index),
    doc_len still counts all tokens (D2)."""
    global _STEM_CTE_MEMO
    if _STEM_CTE_MEMO is not None:
        return _STEM_CTE_MEMO
    import duckdb

    from .text import porter_stem

    dirs = {"/root/testdata/sf0.001", "/root/testdata/sf0.01",
            os.environ.get("IR_SPARK_GATE_SF", "")}
    vocab: set[str] = set()
    con = duckdb.connect()
    for d in sorted(dirs):
        p = os.path.join(d, "documents.parquet") if d else ""
        if p and os.path.exists(p):
            rows = con.sql(
                "SELECT DISTINCT UNNEST(string_split(text, ' ')) AS t "
                f"FROM read_parquet('{p}')").fetchall()
            vocab.update(r[0] for r in rows if r[0])
    con.close()
    pairs = [(t, porter_stem(t)) for t in sorted(vocab)
             if len(t) > 1 and "'" not in t]
    vals = ", ".join(f"('{t}', '{s}')" for t, s in pairs if s != t)
    if not vals:
        vals = "('', '')"
    _STEM_CTE_MEMO = f"""
stemmap AS (SELECT * FROM (VALUES {vals}) AS m(term, stem)),
rawtoks AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents) u
  WHERE LENGTH(term) > 1
),
toks AS (
  SELECT doc_id, COALESCE(m.stem, r.term) AS term,
         CAST(COUNT(*) AS BIGINT) AS tf
  FROM rawtoks r LEFT JOIN stemmap m USING (term)
  GROUP BY doc_id, COALESCE(m.stem, r.term)
),
postings AS (SELECT * FROM toks WHERE term NOT IN ({STOP_SQL})),
docinfo AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS doc_len,
         COALESCE(MAX(CASE WHEN term NOT IN ({STOP_SQL}) THEN tf END), 0)
           AS max_tf
  FROM toks GROUP BY doc_id
),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(doc_len) AS avg_dl FROM docinfo),
dict AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
         FROM postings GROUP BY term)
"""
    return _STEM_CTE_MEMO


def _read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


_INDEX_MEMO: dict[tuple, B.DataFrameIndex] = {}


def _df_index(spark: SparkSession, sf_dir: str,
              stem: bool = False) -> B.DataFrameIndex:
    """Memoized DataFrame index over documents (doc_id, text)."""
    key = (id(spark), sf_dir, stem)
    if key not in _INDEX_MEMO:
        docs = _read_documents(spark, sf_dir).select("doc_id", "text")
        _INDEX_MEMO[key] = B.build_dataframe_index(docs, stem=stem)
    return _INDEX_MEMO[key]


def _micro(col):
    return F.round(col * F.lit(1000000.0)).cast("long")


# ---------------------------------------------------------------------------
# core IR gates
# ---------------------------------------------------------------------------

def q_tokens_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-doc term frequencies from the real tokenize kernel."""
    docs = _read_documents(spark, sf_dir).select("doc_id", "text")
    return B.token_counts(docs).select(
        "doc_id", "term", F.col("tf").cast("long").alias("tf"))


def sql_tokens_tf() -> str:
    return f"WITH {TOKS_CTE} SELECT doc_id, term, tf FROM toks"


def q_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _df_index(spark, sf_dir)
    return idx.dictionary.select("term", "df", F.col("cf").cast("long").alias("cf"))


def sql_dictionary() -> str:
    return f"WITH {TOKS_CTE} SELECT term, df, cf FROM dict"


def q_dictionary_frontcoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/C5 end-to-end: the dictionary round-tripped through the
    blocked front-coded bucket store (operators/dictionary.py) must
    reproduce the exact (term, df, cf) relation the oracle computes —
    proving the REAL compression codecs, not just plumbing."""
    from .operators.dictionary import decode_dictionary, encode_dictionary

    idx = _df_index(spark, sf_dir)
    d = idx.dictionary.select("term", "df", F.col("cf").cast("long").alias("cf"))
    return decode_dictionary(encode_dictionary(d, n_buckets=16))


def q_ltr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTR feature extraction (operators/ltr.py): one feature row per
    OR-candidate of the flagship query — the candidate-featurization
    table a learned re-ranker trains on."""
    from .operators.ltr import ltr_features

    idx = _df_index(spark, sf_dir)
    feats = ltr_features(spark, idx, FLAGSHIP_QUERY)
    return feats.select(
        "doc_id",
        _micro(F.col("bm25")).alias("bm25_micro"),
        "tf_sum", "n_matched",
        _micro(F.col("idf_sum")).alias("idf_sum_micro"),
        "doc_len", "max_tf")


def sql_ltr_features(k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
feat AS (
  SELECT p.doc_id,
         SUM(LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
             * p.tf * ({k1} + 1.0)
             / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
             * q.qtf) AS bm25,
         CAST(SUM(p.tf) AS BIGINT) AS tf_sum,
         CAST(COUNT(*) AS BIGINT) AS n_matched,
         SUM(LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))) AS idf_sum,
         MIN(d.doc_len) AS doc_len,
         MIN(d.max_tf) AS max_tf
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id,
       CAST(ROUND(bm25 * 1000000) AS BIGINT) AS bm25_micro,
       tf_sum, n_matched,
       CAST(ROUND(idf_sum * 1000000) AS BIGINT) AS idf_sum_micro,
       doc_len, max_tf
FROM feat
"""


def q_docinfo(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _df_index(spark, sf_dir)
    return idx.docinfo.select(
        "doc_id", "doc_len", F.col("max_tf").cast("long").alias("max_tf"))


def sql_docinfo() -> str:
    return f"WITH {TOKS_CTE} SELECT doc_id, doc_len, max_tf FROM docinfo"


def q_collection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _df_index(spark, sf_dir)
    # quantize with Spark's HALF_UP round (matches the oracle), not
    # Python's banker's rounding
    return spark.createDataFrame(
        [(idx.n_docs, idx.avg_doc_len)], "n_docs long, avg double"
    ).select("n_docs", _micro(F.col("avg")).alias("avg_doc_len_micro"))


def sql_collection_stats() -> str:
    return (f"WITH {TOKS_CTE} SELECT n AS n_docs, "
            f"CAST(ROUND(avg_dl * 1000000) AS BIGINT) AS avg_doc_len_micro FROM stats")


# --- top-k retrieval gates ----------------------------------------------------

def _rerank_quantized(res: DataFrame, k: int) -> DataFrame:
    """Quantize scores to micro-units, re-rank deterministically."""
    return (
        res.select("doc_id", _micro(F.col("score")).alias("score_micro"))
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(k)
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _df_index(spark, sf_dir)
    raw = Q.search(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5, mode="bm25")
    return _rerank_quantized(raw, K_FLAGSHIP)


def _sql_query_terms(stem: bool = False) -> str:
    """The flagship query through the same tokenizer + stopword filter,
    as a VALUES list (term, qtf)."""
    from collections import Counter

    bag = Counter(t for t in tokenize(FLAGSHIP_QUERY, stem=stem)
                  if t not in STOPWORDS)
    vals = ", ".join(f"('{t}', {tf})" for t, tf in sorted(bag.items()))
    return f"qterms AS (SELECT * FROM (VALUES {vals}) AS q(term, qtf))"


def sql_bm25_topk(k1: float = 1.2, b: float = 0.75,
                  stem: bool = False, doc_where: str = "") -> str:
    where = f"WHERE {doc_where}" if doc_where else ""
    return f"""
WITH {_toks_cte_stem() if stem else TOKS_CTE},
{_sql_query_terms(stem=stem)},
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
  {where}
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


def q_tokens_tf_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 end-to-end: per-doc term frequencies from the real tokenize
    kernel with Porter stemming on (reference stem-index variant,
    Stemmer.java:17-590, toggled at Driver.java:19)."""
    docs = _read_documents(spark, sf_dir).select("doc_id", "text")
    return B.token_counts(docs, stem=True).select(
        "doc_id", "term", F.col("tf").cast("long").alias("tf"))


def sql_tokens_tf_stem() -> str:
    return f"WITH {_toks_cte_stem()} SELECT doc_id, term, tf FROM toks"


CHAMP_M = 20


def q_champion_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static index pruning: BM25 top-k over champion lists (top-m
    postings per term by tf; operators/champions.py).  Scoring math
    and collection stats stay global — only the candidate set is
    pruned, which the oracle reproduces with a ROW_NUMBER window."""
    from .operators.champions import build_champion_lists, search_champions

    idx = _df_index(spark, sf_dir)
    champs = build_champion_lists(idx, m=CHAMP_M)
    raw = search_champions(spark, idx, champs, FLAGSHIP_QUERY,
                           k=K_FLAGSHIP * 5, mode="bm25")
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_champion_bm25_topk(k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
champ AS (
  SELECT term, doc_id, tf FROM (
    SELECT p.*, ROW_NUMBER() OVER (
        PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rn
    FROM postings p)
  WHERE rn <= {CHAMP_M}
),
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM champ p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


TWO_PHASE_N1 = K_FLAGSHIP * 2


def q_bm25_two_phase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase retrieval (operators/champions.py::search_two_phase):
    champion-list first phase proposes TWO_PHASE_N1 candidates on
    micro-quantized scores, the exact engine rescores only those over
    the full postings — returned scores exact, recall governed by
    (m, n_candidates).  The oracle reproduces both phases."""
    from .operators.champions import build_champion_lists, search_two_phase

    idx = _df_index(spark, sf_dir)
    champs = build_champion_lists(idx, m=CHAMP_M)
    raw = search_two_phase(spark, idx, champs, FLAGSHIP_QUERY,
                           k=K_FLAGSHIP * 5, n_candidates=TWO_PHASE_N1,
                           mode="bm25")
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_bm25_two_phase_topk(k1: float = 1.2, b: float = 0.75) -> str:
    bm25 = f"""LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf"""
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
champ AS (
  SELECT term, doc_id, tf FROM (
    SELECT p.*, ROW_NUMBER() OVER (
        PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rn
    FROM postings p)
  WHERE rn <= {CHAMP_M}
),
p1 AS (
  SELECT p.doc_id,
         CAST(ROUND(SUM({bm25}) * 1000000) AS BIGINT) AS s
  FROM champ p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
  GROUP BY p.doc_id
),
cand AS (SELECT doc_id FROM p1 ORDER BY s DESC, doc_id ASC
         LIMIT {TWO_PHASE_N1}),
hits2 AS (
  SELECT p.doc_id, {bm25} AS partial
  FROM postings p
  JOIN cand USING (doc_id)
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits2 GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


IMPACT_LEVELS = 64

_IMPACT_MEMO: dict = {}


def _impact_index(spark: SparkSession, sf_dir: str):
    """Memoized impact index (both impact gates derive from it; the
    quantization pass is index-time work, paid once per session)."""
    from .operators.impact import build_impact_index

    key = (id(spark), sf_dir)
    if key not in _IMPACT_MEMO:
        _IMPACT_MEMO[key] = build_impact_index(
            _df_index(spark, sf_dir), levels=IMPACT_LEVELS)
    return _IMPACT_MEMO[key]


def q_impact_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impact-ordered SAAT retrieval (operators/impact.py, Anh &
    Moffat 2006): per-posting BM25 micro-quantized, then mapped to
    IMPACT_LEVELS uniform integer impacts by pure integer arithmetic;
    query score = qtf-weighted integer impact sum.  Deterministic
    end-to-end (per-posting micro reproducibility is the same contract
    score_explain already proves), so the oracle recomputes the whole
    quantization in SQL."""
    from .operators.impact import search_impacts

    idx = _df_index(spark, sf_dir)
    imp = _impact_index(spark, sf_dir)
    return (search_impacts(spark, imp, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP)
            .select("doc_id", F.col("score").alias("score_micro")))


def q_impact_pruned_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRUNED impact path (search_impacts_pruned): candidates from
    impact >= cutoff postings only, full-list rescore, accepted only
    under the losslessness certificate — so the oracle is the SAME
    unpruned SQL; a hash match proves the pruning lost nothing."""
    from .operators.impact import search_impacts_pruned

    idx = _df_index(spark, sf_dir)
    imp = _impact_index(spark, sf_dir)
    df, _cutoff = search_impacts_pruned(spark, imp, idx, FLAGSHIP_QUERY,
                                        k=K_FLAGSHIP)
    return df.select("doc_id", F.col("score").alias("score_micro"))


def sql_impact_bm25_topk(k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
scored AS (
  SELECT p.term, p.doc_id,
         CAST(ROUND((LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl)))
           * 1000000) AS BIGINT) AS m
  FROM postings p
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
mx AS (SELECT MAX(m) AS mm FROM scored),
imp AS (
  SELECT term, doc_id, 1 + (m * {IMPACT_LEVELS - 1}) // mx.mm AS impact
  FROM scored CROSS JOIN mx
),
hits AS (
  SELECT i.doc_id, i.impact * q.qtf AS partial
  FROM imp i JOIN qterms q USING (term)
)
SELECT doc_id, CAST(SUM(partial) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


def q_bm25_topk_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stemmed index + stemmed query, BM25 top-k — the reference's stem
    variant (stats.md:10,22-24) as a full-value gate."""
    idx = _df_index(spark, sf_dir, stem=True)
    raw = Q.search(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                   mode="bm25", stem=True)
    return _rerank_quantized(raw, K_FLAGSHIP)


def q_w1_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _df_index(spark, sf_dir)
    raw = Q.search(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5, mode="w1")
    return _rerank_quantized(raw, K_FLAGSHIP)


def q_w2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _df_index(spark, sf_dir)
    raw = Q.search(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5, mode="w2")
    return _rerank_quantized(raw, K_FLAGSHIP)


def _sql_cosine_topk(mode: str) -> str:
    """W1/W2 reference vector-space model in SQL, integer-division idf
    (D5), idempotent norms (D4), cosine normalization (W4)."""
    if mode == "w1":
        w_doc = """CASE WHEN p.tf = 0 OR d.max_tf = 0 OR t.df = 0 THEN 0.0
         ELSE (0.4 + 0.6 * LN(p.tf + 0.5) / LN(d.max_tf + 1.0))
              * LN(CAST(s.n // t.df AS DOUBLE)) / LN(s.n) END"""
    else:
        w_doc = """CASE WHEN p.tf = 0 OR d.doc_len = 0 OR t.df = 0 THEN 0.0
         ELSE 0.4 + 0.6 * (p.tf / (p.tf + 0.5 + 1.5 * (d.doc_len / s.avg_dl)))
              * LN(CAST(s.n // t.df AS DOUBLE)) / LN(s.n) END"""
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
qmax AS (SELECT MAX(qtf) AS mq FROM qterms),
weighted AS (
  SELECT p.doc_id, p.term, {w_doc} AS w
  FROM postings p JOIN dict t USING (term) JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
norms AS (SELECT doc_id, SQRT(SUM(w * w)) AS norm FROM weighted GROUP BY doc_id),
qw AS (
  SELECT q.term,
         CASE WHEN q.qtf = 0 OR m.mq = 0 OR COALESCE(t.df, 0) = 0 THEN 0.0
              ELSE (0.4 + 0.6 * LN(q.qtf + 0.5) / LN(m.mq + 1.0))
                   * LN(CAST(s.n // t.df AS DOUBLE)) / LN(s.n) END AS w_tq
  FROM qterms q LEFT JOIN dict t USING (term) CROSS JOIN qmax m CROSS JOIN stats s
),
qnorm AS (SELECT SQRT(SUM(w_tq * w_tq)) AS qn FROM qw),
dots AS (
  SELECT w.doc_id, SUM(w.w * qw.w_tq) AS dot
  FROM weighted w JOIN qw USING (term)
  GROUP BY w.doc_id
)
SELECT d.doc_id,
       CAST(ROUND(CASE WHEN n.norm > 0 AND q.qn > 0
                       THEN d.dot / n.norm / q.qn ELSE 0.0 END * 1000000)
            AS BIGINT) AS score_micro
FROM dots d JOIN norms n USING (doc_id) CROSS JOIN qnorm q
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


def q_search_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/S9: top-k + headline lookup (join back to the source table) +
    S10 external id formatting."""
    idx = _df_index(spark, sf_dir)
    top = _rerank_quantized(
        Q.search(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5, mode="bm25"),
        K_FLAGSHIP,
    )
    docs = _read_documents(spark, sf_dir)
    return (
        top.join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "score_micro",
            F.format_string("doc%08d", F.col("doc_id")).alias("external_id"),
            F.substring(F.col("text"), 1, 40).alias("headline"),
        )
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
    )


def sql_search_results() -> str:
    inner = sql_bm25_topk().strip()
    return f"""
WITH topk AS ({inner})
SELECT t.doc_id, t.score_micro,
       printf('doc%08d', t.doc_id) AS external_id,
       SUBSTRING(d.text, 1, 40) AS headline
FROM topk t JOIN documents d USING (doc_id)
ORDER BY t.score_micro DESC, t.doc_id ASC
"""


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2 extraction invariant as a gate: wrap each doc in HTML,
    run the real extract_text kernel, verify byte-identity."""
    import pandas as pd

    from .text import extract_text

    docs = _read_documents(spark, sf_dir).select(
        "doc_id",
        "text",
        F.concat(
            F.lit("<html><title></title><body><p>"), F.col("text"),
            F.lit("</p></body></html>"),
        ).cast("binary").alias("html"),
    )

    def kernel(batches):
        for pdf in batches:
            extracted = [
                extract_text(h) for h in pdf["html"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "extracted_len": [len(e) for e in extracted],
                "is_identical": [e == t for e, t in
                                 zip(extracted, pdf["text"])],
            })

    return docs.mapInPandas(
        kernel, "doc_id long, extracted_len int, is_identical boolean")


def sql_html_extract() -> str:
    # all tags strip away (empty title), so on clean [a-z ] text the
    # extraction is byte-identical to the text column
    return """
SELECT doc_id, CAST(LENGTH(text) AS INT) AS extracted_len,
       TRUE AS is_identical
FROM documents
"""


_SEG_MEMO: dict[tuple, str] = {}


def _seg_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Memoized compressed segment index over documents (built once per
    session per sf_dir, in a temp dir)."""
    import tempfile

    from .operators.segments import build_segment_index

    key = (id(spark), sf_dir)
    if key not in _SEG_MEMO:
        pages = _read_documents(spark, sf_dir).select(
            F.format_string("doc://%012d", "doc_id").alias("url"), "text")
        d = tempfile.mkdtemp(prefix="ir_spark_gate_seg_")
        build_segment_index(spark, pages, d, source=sf_dir)
        _SEG_MEMO[key] = d
    return _SEG_MEMO[key]


def q_segment_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C3/S7 as a value gate: posting lists for the flagship-query
    terms, decoded back out of the delta+varbyte compressed segments
    (bucket-pruned scan -> numpy decode -> doc_map id mapping).  The
    oracle is the plain (term, doc_id, tf) relation — proving the
    compressed round trip end-to-end (reference intent:
    Compression.java:121-197 / compressed_index.py:11-84, per SURVEY
    D6)."""
    import pandas as pd

    from . import codec
    from .operators.segment_query import SegmentIndex
    from .sources import storage as _st

    sidx = SegmentIndex.load(spark, _seg_index_dir(spark, sf_dir))
    terms = sorted(
        t for t in set(tokenize(FLAGSHIP_QUERY)) if t not in STOPWORDS)
    buckets = sorted({_st.term_bucket_py(t, sidx.n_buckets) for t in terms})
    hits = sidx.segments.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms))

    def decode(batches):
        for pdf in batches:
            ts, ids, tfs = [], [], []
            for row in pdf.itertuples(index=False):
                d_ids = codec.delta_decode(row.doc_gaps_vb)
                d_tfs = codec.varbyte_decode(row.tfs_vb)
                ts.extend([row.term] * len(d_ids))
                ids.extend(d_ids.tolist())
                tfs.extend(d_tfs.tolist())
            yield pd.DataFrame({"term": ts, "internal_id": ids, "tf": tfs})

    decoded = hits.select("term", "doc_gaps_vb", "tfs_vb").mapInPandas(
        decode, "term string, internal_id long, tf long")
    doc_map = spark.read.parquet(
        os.path.join(_seg_index_dir(spark, sf_dir), "doc_map"))
    orig = doc_map.select(
        F.col("doc_id").alias("internal_id"),
        F.substring("url", 7, 12).cast("long").alias("doc_id"))
    return decoded.join(F.broadcast(orig), "internal_id").select(
        "term", "doc_id", "tf")


def sql_segment_postings() -> str:
    terms = sorted(
        t for t in set(tokenize(FLAGSHIP_QUERY)) if t not in STOPWORDS)
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {TOKS_CTE}
SELECT term, doc_id, tf FROM postings WHERE term IN ({in_list})
"""


def q_bm25_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered retrieval: BM25 top-k restricted to documents
    with lang = 'en' (global collection stats, candidate semi-join
    before top-k — the standard filtered-search convention)."""
    idx = _df_index(spark, sf_dir)
    allowed = _read_documents(spark, sf_dir).filter(
        F.col("lang") == "en").select("doc_id")
    raw = Q.search(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                   mode="bm25", doc_filter=allowed)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_bm25_filtered_topk() -> str:
    return sql_bm25_topk(
        doc_where="p.doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')")


BATCH_QUERIES = [
    FLAGSHIP_QUERY,
    "window sort merge batch data",
    "the a of",                       # all stopwords -> no rows either side
    "slow value zzzunseen scan",      # unseen term contributes nothing
]
K_BATCH = 5


def _to_original_ids(spark: SparkSession, index_dir: str,
                     df: DataFrame) -> DataFrame:
    """Map a result frame's internal ``doc_id`` back to the original
    corpus doc id via the index's doc_map (urls are
    ``doc://%012d`` over the original id — single place that knows the
    format).  All other columns pass through."""
    doc_map = spark.read.parquet(os.path.join(index_dir, "doc_map"))
    orig = doc_map.select(
        F.col("doc_id").alias("_internal_id"),
        F.substring("url", 7, 12).cast("long").alias("_orig_id"))
    other = [c for c in df.columns if c != "doc_id"]
    return (df.withColumnRenamed("doc_id", "_internal_id")
            .join(F.broadcast(orig), "_internal_id")
            .select(F.col("_orig_id").alias("doc_id"), *other))


def q_bm25_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query retrieval over the COMPRESSED segment index
    (segment_query.search_segments_batch): the whole query workload is
    scored in ONE pass — union-pruned scan, each posting row decoded
    once — and ranked per query.  The offline/throughput counterpart
    of the per-query bm25_topk gate."""
    from pyspark.sql import Window

    from .operators.segment_query import SegmentIndex, search_segments_batch

    sidx = SegmentIndex.load(spark, _seg_index_dir(spark, sf_dir))
    raw = search_segments_batch(spark, sidx, BATCH_QUERIES,
                                k=K_BATCH * 5, mode="bm25")
    mapped = _to_original_ids(
        spark, _seg_index_dir(spark, sf_dir),
        raw.select("query_id", "doc_id",
                   _micro(F.col("score")).alias("score_micro")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id"))
    return (
        mapped
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K_BATCH)
        .select("query_id", "rank", "doc_id", "score_micro")
    )


def sql_bm25_batch_topk(k1: float = 1.2, b: float = 0.75) -> str:
    from collections import Counter

    vals = []
    for qid, q in enumerate(BATCH_QUERIES):
        bag = Counter(t for t in tokenize(q) if t not in STOPWORDS)
        vals.extend(f"({qid}, '{t}', {tf})" for t, tf in sorted(bag.items()))
    values = ", ".join(vals)
    return f"""
WITH {TOKS_CTE},
qterms AS (SELECT * FROM (VALUES {values}) AS q(query_id, term, qtf)),
hits AS (
  SELECT q.query_id, p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id,
         CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
  FROM hits GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score_micro,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, doc_id) AS rnk
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS INT) AS rank,
       doc_id, score_micro
FROM ranked WHERE rnk <= {K_BATCH}
"""


def q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking evaluation (operators/evalir.py::ranking_metrics): P@k /
    MRR / nDCG@k of the batched BM25 run against deterministic
    term-overlap qrels (rel = min(3, #distinct query terms in doc) —
    graded, derivable identically in SQL)."""
    from .operators.evalir import ranking_metrics

    # Both inputs are tiny (k rows/query; qrels ~ judged pairs) but
    # their SUBTREES are not: the run re-executes the whole batched
    # segment search and qrels re-scans postings, and ranking_metrics
    # references qrels twice (hits + ideal DCG).  Materialize each
    # once (localCheckpoint) so the metric plan is joins over k-row
    # inputs — this was the r3 bench regression on this gate (the
    # batch-search subtree re-ran inside the metrics action).
    run = q_bm25_batch_topk(spark, sf_dir).select(
        "query_id", "rank", "doc_id").localCheckpoint(eager=True)
    idx = _df_index(spark, sf_dir)
    qd = [(qid, t) for qid, q in enumerate(BATCH_QUERIES)
          for t in sorted(set(tokenize(q)) - STOPWORDS)]
    qterms = spark.createDataFrame(qd, "query_id long, term string")
    # postings is unique on (term, doc_id) and qterms on (query_id,
    # term), so count(*) IS countDistinct(term) — a map-side-combined
    # sum instead of a two-phase hash distinct
    qrels = (
        idx.postings.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.least(F.lit(3), F.count(F.lit(1))).cast("int")
             .alias("rel"))
    ).localCheckpoint(eager=True)
    m = ranking_metrics(run, qrels, k=K_BATCH)
    return m.select(
        "query_id", "n_rel",
        _micro(F.col("p_at_k")).alias("p_at_k_micro"),
        _micro(F.col("rr")).alias("mrr_micro"),
        _micro(F.col("ndcg")).alias("ndcg_micro"),
    )


def sql_eval_metrics(k1: float = 1.2, b: float = 0.75) -> str:
    from collections import Counter

    k = K_BATCH
    vals = []
    for qid, q in enumerate(BATCH_QUERIES):
        bag = Counter(t for t in tokenize(q) if t not in STOPWORDS)
        vals.extend(f"({qid}, '{t}', {tf})" for t, tf in sorted(bag.items()))
    values = ", ".join(vals)
    return f"""
WITH {TOKS_CTE},
qterms AS (SELECT * FROM (VALUES {values}) AS q(query_id, term, qtf)),
hits AS (
  SELECT q.query_id, p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id,
         CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
  FROM hits GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, doc_id) AS rnk
  FROM scored
),
qd AS (SELECT DISTINCT query_id, term FROM qterms),
qrels AS (
  SELECT q.query_id, p.doc_id,
         LEAST(3, COUNT(DISTINCT p.term)) AS rel
  FROM postings p JOIN qd q USING (term)
  GROUP BY q.query_id, p.doc_id
),
topk AS (SELECT query_id, rnk AS rank, doc_id FROM ranked WHERE rnk <= {k}),
judged AS (
  SELECT t.query_id, t.rank, COALESCE(r.rel, 0) AS rel
  FROM topk t LEFT JOIN qrels r
    ON r.query_id = t.query_id AND r.doc_id = t.doc_id
),
per AS (
  SELECT query_id,
         SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) / {float(k)} AS p_at_k,
         MIN(CASE WHEN rel > 0 THEN rank END) AS first_rel,
         SUM((POW(2.0, rel) - 1.0) / LOG2(rank + 1.0)) AS dcg
  FROM judged GROUP BY query_id
),
ideal AS (
  SELECT query_id, rel,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, doc_id ASC) AS irank
  FROM qrels WHERE rel > 0
),
ideals AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel,
         SUM(CASE WHEN irank <= {k}
             THEN (POW(2.0, rel) - 1.0) / LOG2(irank + 1.0) END) AS idcg
  FROM ideal GROUP BY query_id
)
SELECT CAST(p.query_id AS BIGINT) AS query_id,
       COALESCE(i.n_rel, 0) AS n_rel,
       CAST(ROUND(p.p_at_k * 1000000) AS BIGINT) AS p_at_k_micro,
       CAST(ROUND(COALESCE(1.0 / p.first_rel, 0.0) * 1000000) AS BIGINT)
         AS mrr_micro,
       CAST(ROUND(CASE WHEN i.idcg > 0 THEN p.dcg / i.idcg ELSE 0.0 END
                  * 1000000) AS BIGINT) AS ndcg_micro
FROM per p LEFT JOIN ideals i USING (query_id)
"""


# --- positional index / phrase / proximity (beyond-reference surface) --------

# DuckDB-side kept-token position stream: 0-based index among tokens
# surviving the length filter, numbered in original order (matches
# positions.token_positions on the clean space-separated gate corpus,
# the same equivalence tokenize_simple() rests on).
SEQ_CTE = """
seq AS (
  SELECT doc_id, term,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ord) - 1
              AS INT) AS pos
  FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents)
  WHERE LENGTH(term) > 1
)
"""

PHRASE_TERMS = ["table", "hash"]
PROX_A, PROX_B, PROX_WINDOW = "hash", "join", 5

_POS_STORE_MEMO: dict[tuple, str] = {}


def _pos_store_dir(spark: SparkSession, sf_dir: str) -> str:
    """Memoized term-bucketed positional store (built once per session
    per sf_dir, in a temp dir)."""
    import tempfile

    from .operators.positions import build_positional_store

    key = (id(spark), sf_dir)
    if key not in _POS_STORE_MEMO:
        docs = _read_documents(spark, sf_dir).select("doc_id", "text")
        d = tempfile.mkdtemp(prefix="ir_spark_gate_pos_")
        build_positional_store(spark, docs, d)
        _POS_STORE_MEMO[key] = d
    return _POS_STORE_MEMO[key]


def q_positional_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional relation as a full-value gate: (doc_id, term, pos)
    exploded from the Arrow kernel's (doc_id, term, positions) rows.
    Beyond-reference surface — the reference discards token order
    (SPIMI.java:111-117)."""
    from .operators.positions import token_positions

    docs = _read_documents(spark, sf_dir).select("doc_id", "text")
    rel = token_positions(docs)
    return rel.select(
        "doc_id", "term", F.explode("positions").alias("pos")
    ).select("doc_id", "term", F.col("pos").cast("int").alias("pos"))


def sql_positional_postings() -> str:
    return f"WITH {SEQ_CTE} SELECT doc_id, term, pos FROM seq"


def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over the COMPRESSED positional store
    (bucket-pruned scan -> delta+varbyte decode of only the phrase
    terms -> array-intersect fold): (doc_id, phrase_tf)."""
    from .operators.positions import phrase_search_store

    return phrase_search_store(spark, _pos_store_dir(spark, sf_dir),
                               PHRASE_TERMS)


def sql_phrase_match() -> str:
    joins = " ".join(
        f"JOIN seq t{i} ON t{i}.doc_id = t0.doc_id"
        f" AND t{i}.pos = t0.pos + {i}"
        for i in range(1, len(PHRASE_TERMS)))
    conds = " AND ".join(
        f"t{i}.term = '{t}'" for i, t in enumerate(PHRASE_TERMS))
    return f"""
WITH {SEQ_CTE}
SELECT t0.doc_id, CAST(COUNT(*) AS BIGINT) AS phrase_tf
FROM seq t0 {joins}
WHERE {conds}
GROUP BY t0.doc_id
"""


def q_proximity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered proximity search: docs where min |pos_a - pos_b| <=
    window, with the min distance.  Runs over the COMPRESSED store
    (shared with phrase_match) — a proximity query decodes exactly two
    terms' position blobs, never re-tokenizes the corpus."""
    from .operators.positions import proximity_search, read_positional_store

    rel = read_positional_store(spark, _pos_store_dir(spark, sf_dir),
                                [PROX_A, PROX_B])
    return proximity_search(rel, PROX_A, PROX_B, PROX_WINDOW)


def sql_proximity_match() -> str:
    return f"""
WITH {SEQ_CTE}
SELECT a.doc_id, CAST(MIN(ABS(a.pos - b.pos)) AS INT) AS min_dist
FROM seq a JOIN seq b ON b.doc_id = a.doc_id
WHERE a.term = '{PROX_A}' AND b.term = '{PROX_B}'
GROUP BY a.doc_id
HAVING MIN(ABS(a.pos - b.pos)) <= {PROX_WINDOW}
"""


SLOP = 4


def q_sloppy_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered sloppy phrase ("a ... b" within SLOP tokens) over the
    compressed positional store
    (operators/positions.py::sloppy_phrase_search)."""
    from .operators.positions import read_positional_store, sloppy_phrase_search

    rel = read_positional_store(spark, _pos_store_dir(spark, sf_dir),
                                [PROX_A, PROX_B])
    return sloppy_phrase_search(rel, PROX_A, PROX_B, SLOP)


def sql_sloppy_phrase() -> str:
    return f"""
WITH {SEQ_CTE}
SELECT a.doc_id, CAST(MIN(b.pos - a.pos) AS INT) AS min_gap
FROM seq a JOIN seq b ON b.doc_id = a.doc_id AND b.pos > a.pos
WHERE a.term = '{PROX_A}' AND b.term = '{PROX_B}'
GROUP BY a.doc_id
HAVING MIN(b.pos - a.pos) <= {SLOP + 1}
"""


SPAN_TERMS = ["hash", "join", "merge"]
SPAN_SLOP = 4  # at sf0.01: 16 docs ordered / 58 unordered of 264
#              containing all three clauses — the window constraint is
#              live in both directions


def q_span_near_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-term ORDERED span query (Lucene SpanNearQuery,
    operators/positions.py::span_near_search): minimal window holding
    'hash' < 'join' < 'merge' in order with width - 3 <= 4, over the
    compressed positional store."""
    from .operators.positions import read_positional_store, span_near_search

    rel = read_positional_store(spark, _pos_store_dir(spark, sf_dir),
                                SPAN_TERMS)
    return span_near_search(rel, SPAN_TERMS, SPAN_SLOP, ordered=True)


def sql_span_near_ordered() -> str:
    t0, t1, t2 = SPAN_TERMS
    return f"""
WITH {SEQ_CTE}
SELECT a.doc_id, CAST(MIN(c.pos - a.pos + 1) AS INT) AS min_span
FROM seq a
JOIN seq b ON b.doc_id = a.doc_id AND b.pos > a.pos
JOIN seq c ON c.doc_id = a.doc_id AND c.pos > b.pos
WHERE a.term = '{t0}' AND b.term = '{t1}' AND c.term = '{t2}'
GROUP BY a.doc_id
HAVING MIN(c.pos - a.pos + 1) - 3 <= {SPAN_SLOP}
"""


def q_span_near_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-term UNORDERED span query: minimal window holding all of
    'hash', 'join', 'merge' in any order, width - 3 <= 4."""
    from .operators.positions import read_positional_store, span_near_search

    rel = read_positional_store(spark, _pos_store_dir(spark, sf_dir),
                                SPAN_TERMS)
    return span_near_search(rel, SPAN_TERMS, SPAN_SLOP, ordered=False)


def sql_span_near_unordered() -> str:
    t0, t1, t2 = SPAN_TERMS
    width = "GREATEST(a.pos, b.pos, c.pos) - LEAST(a.pos, b.pos, c.pos) + 1"
    return f"""
WITH {SEQ_CTE}
SELECT a.doc_id, CAST(MIN({width}) AS INT) AS min_span
FROM seq a
JOIN seq b ON b.doc_id = a.doc_id
JOIN seq c ON c.doc_id = a.doc_id
WHERE a.term = '{t0}' AND b.term = '{t1}' AND c.term = '{t2}'
GROUP BY a.doc_id
HAVING MIN({width}) - 3 <= {SPAN_SLOP}
"""


SDM_MU, SDM_WINDOW = 1000.0, 8
SDM_LAMBDAS = (0.85, 0.1, 0.05)


def _sdm_pairs() -> list[tuple[str, str]]:
    seq = [t for t in tokenize(FLAGSHIP_QUERY) if t not in STOPWORDS]
    return [(a, b) for a, b in zip(seq, seq[1:]) if a != b]


def q_sdm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential dependence model top-k (operators/sdm.py::
    search_sdm — Metzler & Croft 2005): unigram + ordered-bigram +
    unordered-window-8 Dirichlet features over one pruned positional
    scan."""
    from .operators.positions import read_positional_store
    from .operators.sdm import search_sdm

    idx = _df_index(spark, sf_dir)
    terms = sorted(
        t for t in set(tokenize(FLAGSHIP_QUERY)) if t not in STOPWORDS)
    rel = read_positional_store(spark, _pos_store_dir(spark, sf_dir), terms)
    raw = search_sdm(spark, idx, rel, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                     mu=SDM_MU, window=SDM_WINDOW, lambdas=SDM_LAMBDAS)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_sdm_topk() -> str:
    lt, lo, lu = SDM_LAMBDAS
    mu, w = SDM_MU, SDM_WINDOW
    pairs = _sdm_pairs()
    ctes, score_terms, join_sql = [], [f"{lt} * u.s"], []
    for i, (a, b) in enumerate(pairs):
        ctes.append(f"""po{i} AS (
  SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM seq a
  JOIN seq b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = '{a}' AND b.term = '{b}' GROUP BY a.doc_id)""")
        ctes.append(f"""pu{i} AS (
  SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM seq a
  JOIN seq b ON b.doc_id = a.doc_id AND ABS(b.pos - a.pos) < {w}
  WHERE a.term = '{a}' AND b.term = '{b}' GROUP BY a.doc_id)""")
        ctes.append(f"cfo{i} AS (SELECT CAST(COALESCE(SUM(tf), 0) AS DOUBLE)"
                    f" AS v FROM po{i})")
        ctes.append(f"cfu{i} AS (SELECT CAST(COALESCE(SUM(tf), 0) AS DOUBLE)"
                    f" AS v FROM pu{i})")
        join_sql.append(f"LEFT JOIN po{i} ON po{i}.doc_id = u.doc_id")
        join_sql.append(f"LEFT JOIN pu{i} ON pu{i}.doc_id = u.doc_id")
        join_sql.append(f"CROSS JOIN cfo{i}")
        join_sql.append(f"CROSS JOIN cfu{i}")
        score_terms.append(
            f"CASE WHEN cfo{i}.v > 0 THEN {lo} * LN((COALESCE(po{i}.tf, 0)"
            f" + {mu} * cfo{i}.v / coll.c) / (d.doc_len + {mu}))"
            f" ELSE 0.0 END")
        score_terms.append(
            f"CASE WHEN cfu{i}.v > 0 THEN {lu} * LN((COALESCE(pu{i}.tf, 0)"
            f" + {mu} * cfu{i}.v / coll.c) / (d.doc_len + {mu}))"
            f" ELSE 0.0 END")
    nl = ",\n"
    return f"""
WITH {TOKS_CTE},
{SEQ_CTE.strip()},
{_sql_query_terms()},
qd AS (SELECT q.term, q.qtf, t.cf FROM qterms q JOIN dict t USING (term)),
coll AS (SELECT CAST(SUM(cf) AS DOUBLE) AS c FROM dict),
cand AS (SELECT DISTINCT p.doc_id AS doc_id FROM postings p JOIN qd USING (term)),
{nl.join(ctes)},
u AS (
  SELECT cand.doc_id,
         SUM(q.qtf * LN((COALESCE(p.tf, 0) + {mu} * q.cf / coll.c)
                        / (d.doc_len + {mu}))) AS s
  FROM cand
  CROSS JOIN qd q
  CROSS JOIN coll
  LEFT JOIN postings p ON p.doc_id = cand.doc_id AND p.term = q.term
  JOIN docinfo d ON d.doc_id = cand.doc_id
  GROUP BY cand.doc_id
)
SELECT u.doc_id,
       CAST(ROUND(({" + ".join(score_terms)}) * 1000000) AS BIGINT)
         AS score_micro
FROM u
JOIN docinfo d ON d.doc_id = u.doc_id
CROSS JOIN coll
{" ".join(join_sql)}
ORDER BY score_micro DESC, u.doc_id ASC LIMIT {K_FLAGSHIP}
"""


SNIPPET_BW_WINDOW = 8


def q_snippet_best_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-window snippet selection (positions.py::
    best_window_snippets — the Lucene unified-highlighter passage
    scorer): per doc, the 8-token window maximizing the sum of
    distinct matched flagship terms' micro-quantized Lucene idfs."""
    from .operators.positions import (best_window_snippets,
                                      read_positional_store)

    idx = _df_index(spark, sf_dir)
    terms = sorted(
        t for t in set(tokenize(FLAGSHIP_QUERY)) if t not in STOPWORDS)
    rows = idx.dictionary.filter(
        F.col("term").isin(terms)).select("term", "df").collect()
    n = idx.n_docs
    weights = {
        r["term"]: int(math.floor(
            math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5)) * 1e6
            + 0.5))
        for r in rows if r["df"]}
    rel = read_positional_store(spark, _pos_store_dir(spark, sf_dir),
                                sorted(weights))
    return best_window_snippets(rel, weights, SNIPPET_BW_WINDOW)


def sql_snippet_best_window() -> str:
    w1 = SNIPPET_BW_WINDOW - 1
    return f"""
WITH {TOKS_CTE},
{SEQ_CTE.strip()},
{_sql_query_terms()},
qw AS (
  SELECT t.term,
         CAST(ROUND(LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5)) * 1000000)
              AS BIGINT) AS w
  FROM dict t JOIN qterms q USING (term) CROSS JOIN stats s
),
anchors AS (SELECT s.doc_id, s.pos FROM seq s JOIN qw ON qw.term = s.term),
inwin AS (
  SELECT DISTINCT a.doc_id, a.pos, b.term
  FROM anchors a
  JOIN seq b ON b.doc_id = a.doc_id
       AND b.pos BETWEEN a.pos - {w1} AND a.pos
  JOIN qw ON qw.term = b.term
),
scored AS (
  SELECT i.doc_id, i.pos, CAST(SUM(qw.w) AS BIGINT) AS score,
         CAST(COUNT(*) AS INT) AS n_terms
  FROM inwin i JOIN qw ON qw.term = i.term
  GROUP BY i.doc_id, i.pos
),
best AS (
  SELECT doc_id, pos, score, n_terms,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, pos ASC) AS rn
  FROM scored
)
SELECT doc_id, CAST(GREATEST(0, pos - {w1}) AS INT) AS win_start,
       score AS score_micro, n_terms
FROM best WHERE rn = 1
"""


PHRASE_BOOST = 0.5


def q_bm25_phrase_boost_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase-boosted BM25 (positions.py::search_phrase_boosted):
    flagship OR scoring + 0.5*ln(1+phrase_tf) for docs containing the
    exact phrase 'table hash' — the Lucene query OR "phrase"^boost
    composite; base relation un-truncated so the fuse is lossless."""
    from .operators.positions import (read_positional_store,
                                      search_phrase_boosted)

    idx = _df_index(spark, sf_dir)
    rel = read_positional_store(spark, _pos_store_dir(spark, sf_dir),
                                PHRASE_TERMS)
    raw = search_phrase_boosted(
        spark, idx, rel, FLAGSHIP_QUERY, PHRASE_TERMS,
        k=K_FLAGSHIP * 5, boost=PHRASE_BOOST)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_bm25_phrase_boost_topk(k1: float = 1.2, b: float = 0.75) -> str:
    joins = " ".join(
        f"JOIN seq t{i} ON t{i}.doc_id = t0.doc_id"
        f" AND t{i}.pos = t0.pos + {i}"
        for i in range(1, len(PHRASE_TERMS)))
    conds = " AND ".join(
        f"t{i}.term = '{t}'" for i, t in enumerate(PHRASE_TERMS))
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
{SEQ_CTE.strip().rstrip()},
ph AS (
  SELECT t0.doc_id, CAST(COUNT(*) AS BIGINT) AS phrase_tf
  FROM seq t0 {joins}
  WHERE {conds}
  GROUP BY t0.doc_id
),
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
base AS (SELECT doc_id, SUM(partial) AS score FROM hits GROUP BY doc_id)
SELECT base.doc_id,
       CAST(ROUND((base.score
                   + {PHRASE_BOOST} * LN(1.0 + COALESCE(ph.phrase_tf, 0)))
                  * 1000000) AS BIGINT) AS score_micro
FROM base LEFT JOIN ph ON ph.doc_id = base.doc_id
ORDER BY score_micro DESC, base.doc_id ASC LIMIT {K_FLAGSHIP}
"""


# --- boolean retrieval + lexicon helpers (beyond-reference surface) ----------

BOOL_MUST = ["hash", "join"]
BOOL_NOT = ["vector"]
BOOL_SHOULD = ["fast", "scan"]
SPELL_TERM, SPELL_K, SPELL_DIST = "sart", 5, 2

MSM_REQUIRED, MSM_K = 7, 100  # at this (floor, depth) the result
#                               PROVABLY differs from plain bm25 top-k
#                               at both gate SFs — the floor is live


def q_bm25_msm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-should-match retrieval (operators/query.py::
    search_min_should_match): flagship BM25 but docs matching fewer
    than 7 of the query's 8 distinct terms are pruned BEFORE top-k —
    the Elasticsearch minimum_should_match coverage floor.  Scores of
    qualifying docs are unchanged (pinned by the shared oracle score
    expression + the HAVING floor)."""
    from .operators.query import search_min_should_match

    idx = _df_index(spark, sf_dir)
    raw = search_min_should_match(spark, idx, FLAGSHIP_QUERY,
                                  min_should_match=MSM_REQUIRED,
                                  k=MSM_K * 5, mode="bm25")
    return _rerank_quantized(raw, MSM_K)


def sql_bm25_msm_topk(k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
hits AS (
  SELECT p.doc_id, p.term,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
HAVING COUNT(DISTINCT term) >= {MSM_REQUIRED}
ORDER BY score_micro DESC, doc_id ASC LIMIT {MSM_K}
"""


# the flagship query with two out-of-vocabulary typos — the retry path
# must correct both ('hashh' -> 'hash', 'vectr' -> 'vector') and score
# identically to the corrected bag
SPELLFIX_QUERY = "fast hashh join with big vectr table scan"


def q_spellfix_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spell-corrected retry (operators/lexicon.py::search_with_
    spellfix): unseen query terms are replaced by their best
    did-you-mean candidate, then the ordinary BM25 plan runs.  The
    oracle resolves the corrections independently in SQL (same
    (dist, df, term) precedence) and scores the corrected bag."""
    from .operators.lexicon import search_with_spellfix

    idx = _df_index(spark, sf_dir)
    raw, _ = search_with_spellfix(spark, idx, SPELLFIX_QUERY,
                                  k=K_FLAGSHIP * 5, mode="bm25",
                                  max_dist=SPELL_DIST)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_spellfix_bm25_topk(k1: float = 1.2, b: float = 0.75) -> str:
    from collections import Counter

    bag = Counter(t for t in tokenize(SPELLFIX_QUERY)
                  if t not in STOPWORDS)
    vals = ", ".join(f"('{t}', {c})" for t, c in sorted(bag.items()))
    return f"""
WITH {TOKS_CTE},
typos(term, qtf) AS (SELECT * FROM (VALUES {vals}) AS v(term, qtf)),
present AS (
  SELECT t.term, t.qtf FROM typos t JOIN dict d ON d.term = t.term
),
missing AS (
  SELECT t.term AS typo, t.qtf FROM typos t
  LEFT JOIN dict d ON d.term = t.term WHERE d.term IS NULL
),
cand AS (
  SELECT m.typo, m.qtf, d.term,
         ROW_NUMBER() OVER (PARTITION BY m.typo
                            ORDER BY levenshtein(d.term, m.typo) ASC,
                                     d.df DESC, d.term ASC) AS rn
  FROM missing m
  JOIN dict d ON ABS(LENGTH(d.term) - LENGTH(m.typo)) <= {SPELL_DIST}
  WHERE levenshtein(d.term, m.typo) <= {SPELL_DIST}
),
qterms AS (
  SELECT term, SUM(qtf) AS qtf FROM (
    SELECT term, qtf FROM present
    UNION ALL
    SELECT term, qtf FROM cand WHERE rn = 1
  ) GROUP BY term
),
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""
PREFIX, PREFIX_K = "s", 10


_MERGE_MEMO: dict[tuple, str] = {}


def _merged_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Memoized: two half-corpus segment indexes merged into one
    (operators/merge.py) — the distributed k-way merge of partial
    indexes the north star calls for, built once per session."""
    import tempfile

    from .operators.merge import merge_indexes
    from .operators.segments import build_segment_index

    key = (id(spark), sf_dir)
    if key not in _MERGE_MEMO:
        docs = _read_documents(spark, sf_dir).select(
            F.format_string("doc://%012d", "doc_id").alias("url"),
            "text", "doc_id")
        n = docs.count()
        base = tempfile.mkdtemp(prefix="ir_spark_gate_merge_")
        half_a = docs.filter(F.col("doc_id") < n // 2).select("url", "text")
        half_b = docs.filter(F.col("doc_id") >= n // 2).select("url", "text")
        # one segment group per half: gate-sized builds don't need the
        # 4-group resume granularity, and it halves the gate's job
        # count; norms=False because the merge must recompute norms
        # against the merged global stats anyway (merge.py)
        build_segment_index(spark, half_a, os.path.join(base, "a"),
                            source=sf_dir + ":a", segment_groups=1,
                            norms=False)
        build_segment_index(spark, half_b, os.path.join(base, "b"),
                            source=sf_dir + ":b", segment_groups=1,
                            norms=False)
        merged = os.path.join(base, "merged")
        merge_indexes(spark, [os.path.join(base, "a"),
                              os.path.join(base, "b")], merged)
        _MERGE_MEMO[key] = merged
    return _MERGE_MEMO[key]


def q_merged_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k over a MERGED index (two independent half-corpus
    builds re-based and combined blob-preservingly by
    operators/merge.py::merge_indexes) vs the plain full-corpus
    oracle — proves merge correctness end-to-end including global
    stats (df, N, avgDocLen) reconstruction."""
    from .operators.segment_query import SegmentIndex, search_segments

    merged = _merged_index_dir(spark, sf_dir)
    sidx = SegmentIndex.load(spark, merged)
    raw = search_segments(spark, sidx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                          mode="bm25")
    mapped = _to_original_ids(spark, merged, raw)
    return _rerank_quantized(mapped, K_FLAGSHIP)


def q_sharded_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated two-phase search over the two half-corpus shard
    indexes (operators/shards.py::search_sharded — per-shard df/N/
    avgDocLen summed into GLOBAL statistics, every shard scored with
    the global weights, lossless k-per-shard gather) vs the flat
    single-index BM25 oracle: proves cross-shard score comparability
    (the dfs_query_then_fetch semantics) value-for-value.  Reuses the
    memoized half builds of the merge gate — this is the OTHER way to
    serve partial indexes: merge them (merged_bm25_topk) or federate
    them (here)."""
    from .operators.segment_query import SegmentIndex
    from .operators.shards import search_sharded

    merged = _merged_index_dir(spark, sf_dir)  # halves live beside it
    base = os.path.dirname(merged)
    shards = [SegmentIndex.load(spark, os.path.join(base, h))
              for h in ("a", "b")]
    raw = search_sharded(spark, shards, FLAGSHIP_QUERY,
                         k=K_FLAGSHIP * 5, mode="bm25")
    ids = raw.select(
        F.substring("url", 7, 12).cast("long").alias("doc_id"), "score")
    return _rerank_quantized(ids, K_FLAGSHIP)


UPSERT_MOD = 9  # recrawl every doc with orig_id % UPSERT_MOD == 0
_UPSERT_SEG_MEMO: dict[tuple, str] = {}


def _upsert_seg_dir(spark: SparkSession, sf_dir: str) -> str:
    """Copy of the memoized segment index with every UPSERT_MOD-th doc
    RECRAWLED through streaming/incremental.py::upsert_documents: the
    new version appends ' zzrecrawled zzrecrawled' to the old text, the
    superseded ids are tombstoned (maxDoc stats until compaction)."""
    from .streaming.incremental import upsert_documents

    key = (id(spark), sf_dir)
    if key not in _UPSERT_SEG_MEMO:
        d = _copy_index(_seg_index_dir(spark, sf_dir),
                        "ir_spark_gate_upsertseg_")
        docs = _read_documents(spark, sf_dir).filter(
            F.col("doc_id") % UPSERT_MOD == 0)
        victims = docs.select(
            F.format_string("doc://%012d", "doc_id").alias("url"),
            F.concat(F.col("text"),
                     F.lit(" zzrecrawled zzrecrawled")).alias("text"))
        upsert_documents(spark, victims, d, batch_tag="gate-recrawl")
        _UPSERT_SEG_MEMO[key] = d
    return _UPSERT_SEG_MEMO[key]


def q_bm25_topk_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k after a recrawl UPSERT (streaming/incremental.py::
    upsert_documents — last-wins replace-by-url: superseded ids
    tombstoned, new versions appended under fresh ids): results carry
    exactly one live version per url, stats follow maxDoc semantics
    over old+new rows, df/N shifts from the appended versions included.
    Runs WAND so pruning correctness under upsert is value-checked;
    results map back to original corpus ids via the doc_map urls."""
    from .operators.segment_query import SegmentIndex, search_segments

    d = _upsert_seg_dir(spark, sf_dir)
    sidx = SegmentIndex.load(spark, d)
    raw = search_segments(spark, sidx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                          mode="bm25", strategy="wand")
    return _rerank_quantized(_to_original_ids(spark, d, raw), K_FLAGSHIP)


def sql_bm25_topk_upsert(k1: float = 1.2, b: float = 0.75) -> str:
    """Oracle corpus = originals (victims tombstoned but still counted
    in N/avg_dl/df — maxDoc semantics) UNION the recrawled versions;
    results keyed by the ORIGINAL doc id both sides."""
    return f"""
WITH corpus2 AS (
  SELECT doc_id, doc_id AS result_id, text,
         doc_id % {UPSERT_MOD} <> 0 AS live
  FROM documents
  UNION ALL
  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id,
         doc_id AS result_id,
         text || ' zzrecrawled zzrecrawled' AS text,
         TRUE AS live
  FROM documents WHERE doc_id % {UPSERT_MOD} = 0
),
toks AS (
  SELECT doc_id, result_id, live, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, result_id, live,
               UNNEST(string_split(text, ' ')) AS term
        FROM corpus2) u
  WHERE LENGTH(term) > 1
  GROUP BY doc_id, result_id, live, term
),
postings AS (SELECT * FROM toks WHERE term NOT IN ({STOP_SQL})),
docinfo AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS doc_len
  FROM toks GROUP BY doc_id
),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(doc_len) AS avg_dl
          FROM docinfo),
dict AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
         FROM postings GROUP BY term),
{_sql_query_terms()},
hits AS (
  SELECT p.result_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
  WHERE p.live
)
SELECT result_id AS doc_id,
       CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY result_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


def q_cori_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORI resource selection over the two half-corpus shards
    (operators/shards.py::cori_shard_scores) — dictionary-statistics-
    only shard ranking, the lossy static complement of the WAND-bound
    pruning the sharded_pruned gate proves lossless."""
    from .operators.segment_query import SegmentIndex
    from .operators.shards import cori_shard_scores

    merged = _merged_index_dir(spark, sf_dir)  # halves live beside it
    base = os.path.dirname(merged)
    shards = [SegmentIndex.load(spark, os.path.join(base, h))
              for h in ("a", "b")]
    return cori_shard_scores(shards, FLAGSHIP_QUERY)


def sql_cori_shards() -> str:
    from .operators.shards import CORI_B, CORI_DF_BASE, CORI_DF_FACTOR

    b, one_b = CORI_B, 1.0 - CORI_B
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
halfn AS (SELECT COUNT(*) // 2 AS h FROM documents),
shardmap AS (
  SELECT doc_id,
         CASE WHEN doc_id < (SELECT h FROM halfn) THEN 0 ELSE 1 END
           AS shard_id
  FROM documents),
sdf AS (
  SELECT m.shard_id, p.term, CAST(COUNT(*) AS DOUBLE) AS df
  FROM postings p JOIN shardmap m USING (doc_id)
  WHERE p.term IN (SELECT term FROM qterms)
  GROUP BY m.shard_id, p.term),
cw AS (
  SELECT m.shard_id, CAST(SUM(p.tf) AS BIGINT) AS cw
  FROM postings p JOIN shardmap m USING (doc_id)
  GROUP BY m.shard_id),
scw AS (SELECT SUM(CAST(cw AS DOUBLE)) / 2.0 AS avg_cw FROM cw),
live AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS cf
  FROM sdf WHERE df > 0 GROUP BY term),
nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_terms FROM live),
grid AS (
  SELECT c.shard_id, c.cw, l.term, l.cf, COALESCE(s.df, 0.0) AS df
  FROM cw c CROSS JOIN live l
  LEFT JOIN sdf s ON s.shard_id = c.shard_id AND s.term = l.term),
belief AS (
  SELECT shard_id, cw,
         CAST(ROUND(({b} + {one_b}
           * (df / ((df + {CORI_DF_BASE})
                    + {CORI_DF_FACTOR} * cw / (SELECT avg_cw FROM scw)))
           * (LN((2 + 0.5) / cf) / LN(2 + 1.0))) * 1000000000)
         AS BIGINT) AS nano
  FROM grid)
SELECT CAST(shard_id AS INT) AS shard_id,
       CAST(SUM(nano) AS BIGINT) AS belief_nano,
       (SELECT n_terms FROM nl) AS n_terms,
       cw
FROM belief GROUP BY shard_id, cw
"""


def q_sharded_pruned_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-pruned federated search (operators/shards.py::
    search_sharded_pruned — distributed WAND at shard granularity:
    metadata skyline bounds order the shards, theta from gathered
    candidates skips shards that provably cannot contribute) vs the
    same flat single-index BM25 oracle as sharded_bm25_topk: proves
    the pruning is lossless end-to-end on the driver's harness."""
    from .operators.segment_query import SegmentIndex
    from .operators.shards import search_sharded_pruned

    merged = _merged_index_dir(spark, sf_dir)  # halves live beside it
    base = os.path.dirname(merged)
    shards = [SegmentIndex.load(spark, os.path.join(base, h))
              for h in ("a", "b")]
    raw = search_sharded_pruned(spark, shards, FLAGSHIP_QUERY,
                                k=K_FLAGSHIP * 5)
    ids = raw.select(
        F.substring("url", 7, 12).cast("long").alias("doc_id"), "score")
    return _rerank_quantized(ids, K_FLAGSHIP)


# --- query clarity (operators/feedback.py::clarity_score) ---------------------

CLARITY_N_FB = 10


def q_clarity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-performance prediction: Cronen-Townsend clarity score for
    every BATCH_QUERIES entry -> (query_id, clarity_micro,
    n_model_terms).  The all-stopword query yields no row on either
    engine; the unseen-term query still scores (its known terms carry
    the model)."""
    from .operators.feedback import clarity_score

    idx = _df_index(spark, sf_dir)
    out = None
    for qid, q in enumerate(BATCH_QUERIES):
        part = clarity_score(spark, idx, q, n_fb=CLARITY_N_FB).select(
            F.lit(qid).cast("long").alias("query_id"),
            "clarity_micro", "n_model_terms")
        out = part if out is None else out.unionByName(part)
    return out


def sql_clarity_scores(n_fb: int = CLARITY_N_FB, k1: float = 1.2,
                       b: float = 0.75) -> str:
    """Per-query clarity recurrence: fb docs by micro-quantized BM25,
    RM1 term weights as BIGINT micros, KL contributions rounded to
    BIGINT micros BEFORE the final sum (order-independent; matches
    operators/feedback.py::clarity_score exactly)."""
    from collections import Counter

    bm25 = (f"LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))"
            f" * p.tf * ({k1} + 1.0)"
            f" / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))")
    ctes = [TOKS_CTE,
            "coll AS (SELECT CAST(SUM(cf) AS DOUBLE) AS c_total FROM dict)"]
    arms = []
    for qid, q in enumerate(BATCH_QUERIES):
        bag = Counter(t for t in tokenize(q) if t not in STOPWORDS)
        if not bag:
            continue  # engine side emits no row for an empty bag
        vals = ", ".join(f"('{t}', {tf})" for t, tf in sorted(bag.items()))
        ctes.append(
            f"qt_{qid} AS (SELECT * FROM (VALUES {vals}) AS q(term, qtf))")
        ctes.append(f"""hits_{qid} AS (
  SELECT p.doc_id, {bm25} * q.qtf AS partial
  FROM postings p
  JOIN qt_{qid} q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
)""")
        ctes.append(f"""fb_{qid} AS (
  SELECT doc_id, score_micro FROM (
    SELECT doc_id,
           CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
    FROM hits_{qid} GROUP BY doc_id)
  ORDER BY score_micro DESC, doc_id ASC LIMIT {n_fb}
)""")
        ctes.append(f"""model_{qid} AS (
  SELECT term, w_micro FROM (
    SELECT p.term,
           CAST(ROUND(1000000.0 * SUM(CAST(p.tf AS DOUBLE) / d.doc_len
                                      * f.score_micro / 1000000.0))
                AS BIGINT) AS w_micro
    FROM postings p JOIN fb_{qid} f USING (doc_id)
    JOIN docinfo d USING (doc_id)
    GROUP BY p.term)
  WHERE w_micro > 0
)""")
        ctes.append(f"""tot_{qid} AS (
  SELECT CAST(SUM(w_micro) AS DOUBLE) AS w_total FROM model_{qid}
)""")
        ctes.append(f"""contrib_{qid} AS (
  SELECT CAST(ROUND(1000000.0 * (m.w_micro / w.w_total)
              * LN((m.w_micro * c.c_total) / (w.w_total * dd.cf)))
         AS BIGINT) AS contrib_micro
  FROM model_{qid} m JOIN dict dd USING (term)
  CROSS JOIN tot_{qid} w CROSS JOIN coll c
)""")
        arms.append(f"""SELECT CAST({qid} AS BIGINT) AS query_id,
       CAST(SUM(contrib_micro) AS BIGINT) AS clarity_micro,
       CAST(COUNT(*) AS BIGINT) AS n_model_terms
FROM contrib_{qid} HAVING COUNT(*) > 0""")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(arms)


# --- WIG / NQC query-performance prediction (feedback.py::qpp_wig_nqc) -------


def q_qpp_wig_nqc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-retrieval QPP over the batched BM25 run: WIG (Zhou & Croft
    2007) and NQC (Shtok et al. 2012) per BATCH_QUERIES entry ->
    (query_id, k_used, n_terms, corpus_micro, wig_micro, nqc_nano).
    The all-stopword query drops (no query terms); the unseen-term
    query keeps its known terms."""
    from collections import Counter

    from .operators.feedback import qpp_wig_nqc

    idx = _df_index(spark, sf_dir)
    run = q_bm25_batch_topk(spark, sf_dir).select("query_id", "score_micro")
    qd = [(qid, t, tf) for qid, q in enumerate(BATCH_QUERIES)
          for t, tf in sorted(Counter(
              t for t in tokenize(q) if t not in STOPWORDS).items())]
    qterms = spark.createDataFrame(qd, "query_id long, term string, qtf long")
    return qpp_wig_nqc(run, qterms, idx)


def sql_qpp_wig_nqc(k1: float = 1.2, b: float = 0.75) -> str:
    """Same derivation: the batch-run CTE feeds exact BIGINT top-k
    statistics; the corpus mega-document score is a BIGINT sum of
    per-term micro partials (length ratio EXACTLY n — see
    operators/feedback.py::qpp_wig_nqc); the two predictors are single
    double expressions over those integers."""
    from collections import Counter

    vals = []
    for qid, q in enumerate(BATCH_QUERIES):
        bag = Counter(t for t in tokenize(q) if t not in STOPWORDS)
        vals.extend(f"({qid}, '{t}', {tf})" for t, tf in sorted(bag.items()))
    values = ", ".join(vals)
    return f"""
WITH {TOKS_CTE},
qterms AS (SELECT * FROM (VALUES {values}) AS q(query_id, term, qtf)),
hits AS (
  SELECT q.query_id, p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id,
         CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
  FROM hits GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, score_micro,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, doc_id) AS rnk
  FROM scored
),
runagg AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k_used,
         CAST(SUM(score_micro) AS BIGINT) AS s_sum,
         CAST(SUM(score_micro * score_micro) AS BIGINT) AS s_sumsq
  FROM ranked WHERE rnk <= {K_BATCH} GROUP BY query_id
),
corpus AS (
  SELECT q.query_id,
         CAST(SUM(CAST(ROUND(
             1000000.0
             * LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
             * (t.cf * ({k1} + 1.0))
             / (t.cf + {k1} * (1.0 - {b} + {b} * s.n))
             * q.qtf) AS BIGINT)) AS BIGINT) AS corpus_micro,
         CAST(SUM(q.qtf) AS BIGINT) AS n_terms
  FROM qterms q JOIN dict t USING (term) CROSS JOIN stats s
  GROUP BY q.query_id
)
SELECT CAST(r.query_id AS BIGINT) AS query_id, r.k_used, c.n_terms,
       c.corpus_micro,
       CAST(ROUND((CAST(r.s_sum AS DOUBLE) / r.k_used - c.corpus_micro)
                  / SQRT(CAST(c.n_terms AS DOUBLE))) AS BIGINT)
         AS wig_micro,
       CAST(ROUND(1000000000.0
                  * SQRT(CAST(r.k_used * r.s_sumsq - r.s_sum * r.s_sum
                              AS DOUBLE))
                  / (r.k_used * c.corpus_micro)) AS BIGINT) AS nqc_nano
FROM runagg r JOIN corpus c USING (query_id)
WHERE c.corpus_micro > 0
"""


# --- selective PRF (clarity-gated RM3, operators/feedback.py) -----------------

# threshold sits between the two arms' sf0.01 clarities (77,183 and
# 80,890 micro) so the driver run exercises BOTH branches; the oracle
# recomputes the decision, so parity holds at any SF regardless
PRF_THRESHOLD_MICRO = 80_000
PRF_QUERIES = [FLAGSHIP_QUERY, "batch small scan"]


def q_selective_prf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clarity-gated pseudo-relevance feedback
    (operators/feedback.py::search_selective_prf): expand a query with
    RM3 only when its clarity predicts vocabulary mismatch ->
    (query_id, expanded, doc_id, score_micro)."""
    from .operators.feedback import search_selective_prf

    idx = _df_index(spark, sf_dir)
    out = None
    for qid, q in enumerate(PRF_QUERIES):
        raw, expanded = search_selective_prf(
            spark, idx, q, clarity_threshold_micro=PRF_THRESHOLD_MICRO,
            k=K_FLAGSHIP * 5)
        part = _rerank_quantized(raw, K_FLAGSHIP).select(
            F.lit(qid).cast("long").alias("query_id"),
            F.lit(1 if expanded else 0).cast("long").alias("expanded"),
            "doc_id", "score_micro")
        out = part if out is None else out.unionByName(part)
    return out


def sql_selective_prf_topk(threshold: int | None = None,
                           n_fb: int = 10, n_exp: int = 5,
                           alpha: float = 0.6, k1: float = 1.2,
                           b: float = 0.75) -> str:
    """Per-arm recurrence: shared fb CTE feeds BOTH the clarity model
    and the RM3 expansion mine; the branch is one scalar predicate the
    oracle recomputes, so it always takes the same branch as the
    engine."""
    from collections import Counter

    if threshold is None:
        threshold = PRF_THRESHOLD_MICRO
    bm25 = (f"LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))"
            f" * p.tf * ({k1} + 1.0)"
            f" / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))")
    ctes = [TOKS_CTE]
    arms = []
    for qid, q in enumerate(PRF_QUERIES):
        bag = Counter(t for t in tokenize(q) if t not in STOPWORDS)
        s = f"p{qid}"
        vals = ", ".join(f"('{t}', {tf})" for t, tf in sorted(bag.items()))
        ctes.append(
            f"qt_{s} AS (SELECT * FROM (VALUES {vals}) AS q(term, qtf))")
        ctes.append(f"""hits_{s} AS (
  SELECT p.doc_id, {bm25} * q.qtf AS partial
  FROM postings p JOIN qt_{s} q USING (term) JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id) CROSS JOIN stats s)""")
        ctes.append(f"""fbs_{s} AS (
  SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT)
         AS score_micro
  FROM hits_{s} GROUP BY doc_id)""")
        ctes.append(f"""fb_{s} AS (
  SELECT doc_id, score_micro FROM fbs_{s}
  ORDER BY score_micro DESC, doc_id ASC LIMIT {n_fb})""")
        ctes.append(f"""model_{s} AS (
  SELECT term, w_micro FROM (
    SELECT p.term,
           CAST(ROUND(1000000.0 * SUM(CAST(p.tf AS DOUBLE) / d.doc_len
                                      * f.score_micro / 1000000.0))
                AS BIGINT) AS w_micro
    FROM postings p JOIN fb_{s} f USING (doc_id)
    JOIN docinfo d USING (doc_id) GROUP BY p.term)
  WHERE w_micro > 0)""")
        ctes.append(f"""clar_{s} AS (
  SELECT CAST(SUM(CAST(ROUND(1000000.0 * (m.w_micro / w.w_total)
              * LN((m.w_micro * c.c_total) / (w.w_total * dd.cf)))
              AS BIGINT)) AS BIGINT) AS c, COUNT(*) AS n
  FROM model_{s} m JOIN dict dd USING (term)
  CROSS JOIN (SELECT CAST(SUM(w_micro) AS DOUBLE) AS w_total
              FROM model_{s}) w
  CROSS JOIN (SELECT CAST(SUM(cf) AS DOUBLE) AS c_total FROM dict) c)""")
        ctes.append(f"""expterms_{s} AS (
  SELECT term, w_micro FROM model_{s}
  WHERE term NOT IN (SELECT term FROM qt_{s})
  ORDER BY w_micro DESC, term ASC LIMIT {n_exp})""")
        ctes.append(f"""allq_{s} AS (
  SELECT term, {alpha} * qtf AS w_tq FROM qt_{s}
  UNION ALL
  SELECT term, (1.0 - {alpha}) * w_micro
               / (SELECT MAX(w_micro) FROM expterms_{s})
  FROM expterms_{s})""")
        ctes.append(f"""rm3top_{s} AS (
  SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT)
         AS score_micro
  FROM (SELECT p.doc_id, {bm25} * a.w_tq AS partial
        FROM postings p JOIN allq_{s} a USING (term)
        JOIN dict t USING (term) JOIN docinfo d USING (doc_id)
        CROSS JOIN stats s) GROUP BY doc_id
  ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP})""")
        ctes.append(f"""plaintop_{s} AS (
  SELECT doc_id, score_micro FROM fbs_{s}
  ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP})""")
        expand = (f"(SELECT n FROM clar_{s}) > 0 "
                  f"AND (SELECT c FROM clar_{s}) < {threshold}")
        arms.append(f"""SELECT CAST({qid} AS BIGINT) AS query_id,
       CAST(1 AS BIGINT) AS expanded, doc_id, score_micro
FROM rm3top_{s} WHERE {expand}
UNION ALL
SELECT CAST({qid} AS BIGINT) AS query_id,
       CAST(0 AS BIGINT) AS expanded, doc_id, score_micro
FROM plaintop_{s} WHERE NOT ({expand})""")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(arms)


# --- document deletion lifecycle (operators/deletes.py) ----------------------

DELETE_MOD = 7  # tombstone every doc with orig_id % DELETE_MOD == 0

_DEL_SEG_MEMO: dict[tuple, str] = {}
_COMPACT_SEG_MEMO: dict[tuple, str] = {}


def _copy_index(src: str, prefix: str) -> str:
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    shutil.rmtree(d)
    shutil.copytree(src, d)
    return d


def _deleted_seg_dir(spark: SparkSession, sf_dir: str) -> str:
    """Copy of the memoized segment index with every DELETE_MOD-th doc
    tombstoned (NOT compacted — tombstones live)."""
    from .operators.deletes import delete_docs

    key = (id(spark), sf_dir)
    if key not in _DEL_SEG_MEMO:
        d = _copy_index(_seg_index_dir(spark, sf_dir), "ir_spark_gate_delseg_")
        doc_map = spark.read.parquet(os.path.join(d, "doc_map"))
        victims = doc_map.filter(
            F.substring("url", 7, 12).cast("long") % DELETE_MOD == 0
        ).select("url")
        delete_docs(spark, d, victims)
        _DEL_SEG_MEMO[key] = d
    return _DEL_SEG_MEMO[key]


def _compacted_seg_dir(spark: SparkSession, sf_dir: str) -> str:
    """Copy of the TOMBSTONED index after compact_segments(purge) —
    deletes physically applied, stats over live docs only."""
    from .operators.segments import compact_segments

    key = (id(spark), sf_dir)
    if key not in _COMPACT_SEG_MEMO:
        d = _copy_index(_deleted_seg_dir(spark, sf_dir),
                        "ir_spark_gate_compactseg_")
        compact_segments(spark, d, purge_deletes=True)
        _COMPACT_SEG_MEMO[key] = d
    return _COMPACT_SEG_MEMO[key]


def q_bm25_topk_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k on an index with LIVE tombstones: deleted docs are
    excluded from results immediately, but collection stats (N, avgdl,
    df) keep their pre-delete values until compaction — Lucene's
    maxDoc/numDocs semantics exactly (operators/deletes.py; the scoring
    kernels mask a broadcast liveDocs array before their run-local
    top-k).  Runs the block-max WAND path so pruning correctness under
    deletion is what's being value-checked."""
    from .operators.segment_query import SegmentIndex, search_segments

    d = _deleted_seg_dir(spark, sf_dir)
    sidx = SegmentIndex.load(spark, d)
    raw = search_segments(spark, sidx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                          mode="bm25", strategy="wand")
    return _rerank_quantized(_to_original_ids(spark, d, raw), K_FLAGSHIP)


def sql_bm25_topk_deleted() -> str:
    # global stats, results restricted to live docs — the hits CTE
    # filter leaves `stats`/`dict` over the FULL corpus
    return sql_bm25_topk(doc_where=f"p.doc_id % {DELETE_MOD} <> 0")


def q_bm25_topk_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k AFTER compact_segments(purge_deletes=True): the
    tombstoned docs are physically gone, so the oracle's collection
    stats and df come from the live corpus only — proving the purge
    rewrites postings/dictionary/docinfo/stats value-identically to a
    fresh build over the survivors."""
    from .operators.segment_query import SegmentIndex, search_segments

    d = _compacted_seg_dir(spark, sf_dir)
    sidx = SegmentIndex.load(spark, d)
    raw = search_segments(spark, sidx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                          mode="bm25", strategy="wand")
    return _rerank_quantized(_to_original_ids(spark, d, raw), K_FLAGSHIP)


def sql_bm25_topk_compacted(k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH {_toks_cte(f"doc_id % {DELETE_MOD} <> 0")},
{_sql_query_terms()},
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


SNIPPET_WINDOW = 3


def q_snippet_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC snippets around the first flagship-term occurrence
    (operators/textstats.py::kwic_snippets)."""
    from .operators.textstats import kwic_snippets

    terms = sorted(
        t for t in set(tokenize(FLAGSHIP_QUERY)) if t not in STOPWORDS)
    docs = _read_documents(spark, sf_dir).select("doc_id", "text")
    return kwic_snippets(docs, terms, window=SNIPPET_WINDOW)


def sql_snippet_extract(window: int = SNIPPET_WINDOW) -> str:
    terms = sorted(
        t for t in set(tokenize(FLAGSHIP_QUERY)) if t not in STOPWORDS)
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> length(t) > 0) AS w
  FROM documents
),
probes AS (
  SELECT d.doc_id, q.term,
         COALESCE(list_position(d.w, q.term), 0) AS pos
  FROM d CROSS JOIN (VALUES {vals}) AS q(term)
),
best AS (
  SELECT doc_id, term, pos,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY pos ASC, term ASC) AS rn
  FROM probes WHERE pos > 0
)
SELECT b.doc_id, CAST(b.pos AS INT) AS pos, b.term,
       array_to_string(
         list_slice(d.w, GREATEST(1, b.pos - {window}), b.pos + {window}),
         ' ') AS snippet
FROM best b JOIN d USING (doc_id)
WHERE b.rn = 1
"""


KEYWORDS_K = 3


def q_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 tf-idf keywords over the index relations
    (operators/textstats.py::keywords_tfidf)."""
    from .operators.textstats import keywords_tfidf

    idx = _df_index(spark, sf_dir)
    return keywords_tfidf(idx.postings, idx.dictionary, idx.n_docs,
                          k=KEYWORDS_K)


def sql_keywords_tfidf(k: int = KEYWORDS_K) -> str:
    return f"""
WITH {TOKS_CTE},
w AS (
  SELECT p.doc_id, p.term,
         CAST(ROUND(p.tf * LN(CAST(s.n AS DOUBLE) / t.df) * 1000000)
              AS BIGINT) AS w_micro
  FROM postings p JOIN dict t USING (term) CROSS JOIN stats s
),
r AS (
  SELECT doc_id, term, w_micro,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY w_micro DESC, term ASC) AS rnk
  FROM w
)
SELECT doc_id, CAST(rnk AS INT) AS rank, term, w_micro
FROM r WHERE rnk <= {k}
"""


MLT_DOC_ID = 42
MLT_N_TERMS = 5


def q_mlt_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-Like-This: the top tf-idf terms of one document run as a
    unit-weight BM25 query, source doc excluded
    (operators/feedback.py::search_more_like_this — Lucene's MLT; the
    reference engine has no document-as-query facility)."""
    from .operators.feedback import search_more_like_this

    idx = _df_index(spark, sf_dir)
    raw = search_more_like_this(spark, idx, MLT_DOC_ID,
                                k=K_FLAGSHIP * 5, n_terms=MLT_N_TERMS)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_mlt_topk(k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH {TOKS_CTE},
srcw AS (
  SELECT p.term,
         CAST(ROUND(p.tf * LN(CAST(s.n AS DOUBLE) / t.df) * 1000000)
              AS BIGINT) AS w_micro
  FROM postings p JOIN dict t USING (term) CROSS JOIN stats s
  WHERE p.doc_id = {MLT_DOC_ID}
),
qterms AS (
  SELECT term, 1 AS qtf FROM srcw WHERE w_micro > 0
  ORDER BY w_micro DESC, term ASC LIMIT {MLT_N_TERMS}
),
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
  WHERE p.doc_id <> {MLT_DOC_ID}
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


RECENCY_EPOCH = "2026-01-01"   # synthetic warc_ts = epoch + (doc_id % 365) d
RECENCY_NOW = "2026-12-31"     # fixed reference date (never a wall clock)
RECENCY_HALF_LIFE = 30.0


def q_bm25_recency_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-boosted BM25 for time-stamped web pages: relevance
    decayed by capture age, boosted = score / (1 + age_days/half_life)
    (operators/query.py::boost_by_recency — the input-hint page schema
    carries warc_ts; freshness ranking is standard for web search).
    warc_ts is synthesized deterministically from doc_id so the DuckDB
    oracle sees the identical corpus."""
    idx = _df_index(spark, sf_dir)
    raw = Q.search(spark, idx, FLAGSHIP_QUERY, k=None, mode="bm25")
    doc_ts = _read_documents(spark, sf_dir).select(
        "doc_id",
        F.date_add(F.lit(RECENCY_EPOCH).cast("date"),
                   (F.col("doc_id") % 365).cast("int")).alias("ts"))
    boosted = Q.boost_by_recency(raw, doc_ts, now=RECENCY_NOW,
                                 half_life_days=RECENCY_HALF_LIFE)
    return _rerank_quantized(boosted, K_FLAGSHIP)


def sql_bm25_recency_topk(k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
raw AS (SELECT doc_id, SUM(partial) AS score FROM hits GROUP BY doc_id),
aged AS (
  SELECT doc_id,
         score / (1.0 + CAST(GREATEST(0, datediff('day',
                    DATE '{RECENCY_EPOCH}'
                      + CAST(doc_id % 365 AS INT) * INTERVAL 1 DAY,
                    DATE '{RECENCY_NOW}')) AS DOUBLE)
                  / {RECENCY_HALF_LIFE}) AS boosted
  FROM raw
)
SELECT doc_id, CAST(ROUND(boosted * 1000000) AS BIGINT) AS score_micro
FROM aged ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


def q_bm25_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset pagination (operators/query.py::page_after,
    Elasticsearch search_after): page 2 of the flagship BM25 ranking —
    cursor = page 1's last (score_micro, doc_id), predicate prunes
    before top-k so deep pages cost the same as page 1.  Oracle ranks
    globally and takes rows k+1..2k — proving the keyset predicate
    equivalent to the rank window on the deterministic total order."""
    from .operators.query import page_after

    idx = _df_index(spark, sf_dir)
    raw = Q.search(spark, idx, FLAGSHIP_QUERY, k=None, mode="bm25")
    quant = raw.select("doc_id", _micro(F.col("score")).alias("score_micro"))
    page1 = (quant.orderBy(F.desc("score_micro"), F.asc("doc_id"))
             .limit(K_FLAGSHIP).collect())
    cursor = page1[-1]
    return page_after(quant, cursor["score_micro"], cursor["doc_id"],
                      K_FLAGSHIP)


def sql_bm25_page2(k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
ranked AS (
  SELECT doc_id,
         CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro,
         ROW_NUMBER() OVER (
           ORDER BY CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) DESC,
                    doc_id ASC) AS rnk
  FROM hits GROUP BY doc_id
)
SELECT doc_id, score_micro FROM ranked
WHERE rnk > {K_FLAGSHIP} AND rnk <= {2 * K_FLAGSHIP}
"""


QLD_MU = 1000.0


def q_qld_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood (Dirichlet-smoothed LM) top-k — the standard
    LM ranking alternative to BM25 (operators/query.py::search_qld);
    same pruned-postings plan, distributed decomposition vs the
    oracle's textbook per-(candidate, query-term) formula."""
    idx = _df_index(spark, sf_dir)
    raw = Q.search_qld(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                       mu=QLD_MU)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_qld_topk(mu: float = QLD_MU) -> str:
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
qd AS (SELECT q.term, q.qtf, t.cf FROM qterms q JOIN dict t USING (term)),
coll AS (SELECT CAST(SUM(cf) AS DOUBLE) AS c FROM dict),
cand AS (SELECT DISTINCT p.doc_id AS doc_id FROM postings p JOIN qd USING (term)),
hits AS (
  SELECT cand.doc_id,
         q.qtf * LN((COALESCE(p.tf, 0) + {mu} * q.cf / coll.c)
                    / (d.doc_len + {mu})) AS partial
  FROM cand
  CROSS JOIN qd q
  CROSS JOIN coll
  LEFT JOIN postings p ON p.doc_id = cand.doc_id AND p.term = q.term
  JOIN docinfo d ON d.doc_id = cand.doc_id
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


LMJM_LAMBDA = 0.1


def q_lmjm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer smoothed LM top-k (operators/query.py::
    search_lmjm) — the linear-interpolation companion to Dirichlet
    QLD; matched-postings decomposition vs the oracle's textbook
    per-(candidate, query-term) formula."""
    idx = _df_index(spark, sf_dir)
    raw = Q.search_lmjm(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                        lam=LMJM_LAMBDA)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_lmjm_topk(lam: float = LMJM_LAMBDA) -> str:
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
qd AS (SELECT q.term, q.qtf, t.cf FROM qterms q JOIN dict t USING (term)),
coll AS (SELECT CAST(SUM(cf) AS DOUBLE) AS c FROM dict),
cand AS (SELECT DISTINCT p.doc_id AS doc_id FROM postings p JOIN qd USING (term)),
hits AS (
  SELECT cand.doc_id,
         q.qtf * LN((1.0 - {lam}) * COALESCE(p.tf, 0) / d.doc_len
                    + {lam} * q.cf / coll.c) AS partial
  FROM cand
  CROSS JOIN qd q
  CROSS JOIN coll
  LEFT JOIN postings p ON p.doc_id = cand.doc_id AND p.term = q.term
  JOIN docinfo d ON d.doc_id = cand.doc_id
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


PL2_C = 1.0
_LN2 = "0.6931471805599453"          # repr(math.log(2.0)) on both engines
_LOG2E = "1.4426950408889634"        # repr(math.log2(math.e))
_TWO_PI = "6.283185307179586"        # repr(2*math.pi)


def q_pl2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PL2 divergence-from-randomness top-k (operators/query.py::
    search_pl2) — Terrier's default DFR model; matched-only
    contributions make the plan the plain pruned BM25 join."""
    idx = _df_index(spark, sf_dir)
    raw = Q.search_pl2(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                       c=PL2_C)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_pl2_topk(c: float = PL2_C) -> str:
    # both engines compute log2 as LN(x)/ln2 with the SAME double
    # constant, keeping the float paths operation-identical
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
qd AS (SELECT q.term, q.qtf, t.cf FROM qterms q JOIN dict t USING (term)),
tn AS (
  SELECT p.doc_id, q.qtf,
         p.tf * LN(1.0 + {c} * s.avg_dl / d.doc_len) / {_LN2} AS tfn,
         CAST(q.cf AS DOUBLE) / s.n AS lam
  FROM postings p
  JOIN qd q USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
hits AS (
  SELECT doc_id,
         qtf / (tfn + 1.0)
           * (tfn * LN(tfn / lam) / {_LN2}
              + (lam - tfn) * {_LOG2E}
              + 0.5 * LN({_TWO_PI} * tfn) / {_LN2}) AS partial
  FROM tn
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


BM25PLUS_DELTA = 1.0
BM25L_DELTA = 0.5


def q_bm25plus_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25+ top-k (operators/query.py::search_bm25plus, Lv & Zhai
    2011 lower-bounded saturation) — matched-only contributions, plan
    identical to plain BM25 plus one literal add."""
    idx = _df_index(spark, sf_dir)
    raw = Q.search_bm25plus(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                            delta=BM25PLUS_DELTA)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_bm25plus_topk(k1: float = 1.2, b: float = 0.75,
                      delta: float = BM25PLUS_DELTA) -> str:
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
hits AS (
  SELECT p.doc_id,
         q.qtf * LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * (p.tf * ({k1} + 1.0)
              / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
              + {delta}) AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


PIV_SLOPE = 0.2


def q_pivoted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivoted length normalization top-k (operators/query.py::
    search_pivoted — Singhal et al. 1996 / Fang-Zhai PIV), the
    pre-BM25 VSM baseline; matched-only single-join plan."""
    idx = _df_index(spark, sf_dir)
    raw = Q.search_pivoted(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                           slope=PIV_SLOPE)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_pivoted_topk(slope: float = PIV_SLOPE) -> str:
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
hits AS (
  SELECT p.doc_id,
         q.qtf * (1.0 + LN(1.0 + LN(p.tf)))
           / (1.0 - {slope} + {slope} * d.doc_len / s.avg_dl)
           * LN((s.n + 1.0) / t.df) AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


def q_bm25l_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25L top-k (operators/query.py::search_bm25l — the shifted
    normalized-tf long-doc fix)."""
    idx = _df_index(spark, sf_dir)
    raw = Q.search_bm25l(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                         delta=BM25L_DELTA)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_bm25l_topk(k1: float = 1.2, b: float = 0.75,
                   delta: float = BM25L_DELTA) -> str:
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
hits AS (
  SELECT p.doc_id,
         q.qtf * LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * ({k1} + 1.0)
           * (p.tf / (1.0 - {b} + {b} * d.doc_len / s.avg_dl) + {delta})
           / ({k1} + (p.tf / (1.0 - {b} + {b} * d.doc_len / s.avg_dl)
                      + {delta})) AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


RBO_P = 0.9


def q_rank_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap between the engine's own BM25 and BM25+
    top-k for the flagship query (operators/evalir.py::rbo_overlap) —
    the judgment-free ranker-similarity measure a nightly scoring A/B
    needs.  Ranks derive from micro-quantized scores on both engines
    (gate convention), so the compared rankings are identical inputs.
    """
    from .operators.evalir import rbo_overlap
    from pyspark.sql import Window

    rank_w = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))

    def run_of(df: DataFrame) -> DataFrame:
        # K_FLAGSHIP rows — the global window is gate plumbing on an
        # already-top-k result, not an operator scale path
        return df.select(
            F.lit("q0").alias("query_id"),
            F.row_number().over(rank_w).cast("long").alias("rank"),
            "doc_id")

    a = run_of(q_bm25_topk(spark, sf_dir))
    b = run_of(q_bm25plus_topk(spark, sf_dir))
    return rbo_overlap(a, b, p=RBO_P, k=K_FLAGSHIP)


def sql_rank_rbo(k1: float = 1.2, b: float = 0.75, p: float = RBO_P,
                 delta: float = BM25PLUS_DELTA) -> str:
    """Both rankings recomputed in SQL (formulas in lockstep with
    sql_bm25_topk / sql_bm25plus_topk), then the telescoped per-doc
    RBO weights as nano-quantized VALUES from the SAME Python table
    the operator broadcasts (evalir.rbo_weights) — integer sums, no
    float-order exposure."""
    from .operators.evalir import rbo_weights

    wvals = ", ".join(f"({m}, {w})" for m, w in rbo_weights(p, K_FLAGSHIP))
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
hits_a AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
run_a AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           ORDER BY CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) DESC,
                    doc_id ASC) AS ra
  FROM hits_a GROUP BY doc_id
  ORDER BY CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) DESC, doc_id ASC
  LIMIT {K_FLAGSHIP}
),
hits_b AS (
  SELECT p.doc_id,
         q.qtf * LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * (p.tf * ({k1} + 1.0)
              / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
              + {delta}) AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
run_b AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           ORDER BY CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) DESC,
                    doc_id ASC) AS rb
  FROM hits_b GROUP BY doc_id
  ORDER BY CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) DESC, doc_id ASC
  LIMIT {K_FLAGSHIP}
),
weights AS (SELECT * FROM (VALUES {wvals}) AS w(m, w_nano)),
joint AS (
  SELECT GREATEST(a.ra, b.rb) AS m
  FROM run_a a JOIN run_b b USING (doc_id)
)
SELECT 'q0' AS query_id,
       CAST(ROUND(COALESCE(SUM(w.w_nano), 0) / 1000.0) AS BIGINT)
         AS rbo_micro,
       CAST(COUNT(w.m) AS BIGINT) AS overlap_at_k
FROM joint j LEFT JOIN weights w ON w.m = j.m
"""


# --- team-draft interleaving (operators/evalir.py) ----------------------------

TDI_SALT = "tdi"


def _tdi_runs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    from pyspark.sql import Window

    rank_w = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))

    def run_of(df: DataFrame) -> DataFrame:
        return df.select(
            F.lit("q0").alias("query_id"),
            F.row_number().over(rank_w).cast("long").alias("rank"),
            "doc_id")

    return (run_of(q_bm25_topk(spark, sf_dir)),
            run_of(q_bm25plus_topk(spark, sf_dir)))


def q_tdi_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Team-draft interleave of the engine's BM25 and BM25+ flagship
    rankings (operators/evalir.py::team_draft_interleave) — the online
    ranker-A/B serving list, with the deterministic md5 draft coin
    reproduced in SQL."""
    from .operators.evalir import team_draft_interleave

    a, b = _tdi_runs(spark, sf_dir)
    return team_draft_interleave(a, b, salt=TDI_SALT)


def _tdi_click(col):
    """Deterministic synthetic click model (~25% CTR): first md5 hex
    digit of 'q0#<doc_id>' in 0-3.  Same rule in SQL."""
    return F.substring(
        F.md5(F.concat(F.col("query_id"), F.lit("#"), col.cast("string"))),
        1, 1).isin("0", "1", "2", "3")


def q_tdi_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-credit over the interleaved list
    (operators/evalir.py::interleave_credit): clicks from the
    deterministic md5 click model, per-query team totals + winner."""
    from .operators.evalir import interleave_credit

    inter = q_tdi_interleave(spark, sf_dir)
    clicks = inter.filter(_tdi_click(F.col("doc_id"))).select(
        "query_id", "doc_id")
    return interleave_credit(inter, clicks)


def _sql_tdi_core(k1: float = 1.2, b: float = 0.75,
                  delta: float = BM25PLUS_DELTA) -> str:
    """WITH-body reproducing the draft in a recursive CTE: both runs in
    lockstep with sql_bm25_topk/sql_bm25plus_topk, then one step per
    recursion level — fewer-picks team drafts, md5(salt||qid||':'||step)
    low-bit coin on ties, stop when either side has no unpicked doc."""
    return f"""WITH RECURSIVE {TOKS_CTE},
{_sql_query_terms()},
hits_a AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
run_a AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           ORDER BY CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) DESC,
                    doc_id ASC) AS ra
  FROM hits_a GROUP BY doc_id
  ORDER BY CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) DESC, doc_id ASC
  LIMIT {K_FLAGSHIP}
),
hits_b AS (
  SELECT p.doc_id,
         q.qtf * LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * (p.tf * ({k1} + 1.0)
              / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
              + {delta}) AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
run_b AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           ORDER BY CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) DESC,
                    doc_id ASC) AS rb
  FROM hits_b GROUP BY doc_id
  ORDER BY CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) DESC, doc_id ASC
  LIMIT {K_FLAGSHIP}
),
lists AS (
  SELECT (SELECT list(doc_id ORDER BY ra) FROM run_a) AS la,
         (SELECT list(doc_id ORDER BY rb) FROM run_b) AS lb
),
rec AS (
  SELECT CAST([] AS BIGINT[]) AS picked, CAST([] AS VARCHAR[]) AS teams,
         0 AS na, 0 AS nb
  UNION ALL
  SELECT list_append(picked, CASE WHEN team = 'a' THEN rem_a[1]
                                  ELSE rem_b[1] END),
         list_append(teams, team),
         na + CASE WHEN team = 'a' THEN 1 ELSE 0 END,
         nb + CASE WHEN team = 'b' THEN 1 ELSE 0 END
  FROM (
    SELECT picked, teams, na, nb, rem_a, rem_b,
           CASE WHEN na < nb THEN 'a' WHEN na > nb THEN 'b'
                WHEN strpos('13579bdf',
                            substr(md5('{TDI_SALT}' || 'q0' || ':'
                                       || CAST(len(picked) AS VARCHAR)),
                                   1, 1)) > 0 THEN 'a'
                ELSE 'b' END AS team
    FROM (
      SELECT picked, teams, na, nb,
             list_filter((SELECT la FROM lists),
                         x -> NOT list_contains(picked, x)) AS rem_a,
             list_filter((SELECT lb FROM lists),
                         x -> NOT list_contains(picked, x)) AS rem_b
      FROM rec) r
    WHERE len(rem_a) > 0 AND len(rem_b) > 0) s
),
drafted AS (
  SELECT picked, teams FROM rec ORDER BY len(picked) DESC LIMIT 1
),
interleaved AS (
  SELECT 'q0' AS query_id, CAST(i + 1 AS BIGINT) AS pos,
         picked[i + 1] AS doc_id, teams[i + 1] AS team
  FROM drafted, UNNEST(range(len(picked))) AS t(i)
)"""


def sql_tdi_interleave() -> str:
    return (_sql_tdi_core()
            + "\nSELECT query_id, pos, doc_id, team FROM interleaved")


def sql_tdi_credit() -> str:
    # every interleaved query emits a row (clicks_a = clicks_b = 0 ->
    # 'tie'), matching interleave_credit's left-join semantics
    return _sql_tdi_core() + """,
flagged AS (
  SELECT query_id, team,
         CASE WHEN strpos('0123',
                          substr(md5(query_id || '#'
                                     || CAST(doc_id AS VARCHAR)), 1, 1)) > 0
              THEN 1 ELSE 0 END AS is_click
  FROM interleaved
)
SELECT query_id,
       CAST(SUM(CASE WHEN team = 'a' THEN is_click ELSE 0 END) AS BIGINT)
         AS clicks_a,
       CAST(SUM(CASE WHEN team = 'b' THEN is_click ELSE 0 END) AS BIGINT)
         AS clicks_b,
       CASE WHEN SUM(CASE WHEN team = 'a' THEN is_click ELSE 0 END)
               > SUM(CASE WHEN team = 'b' THEN is_click ELSE 0 END) THEN 'a'
            WHEN SUM(CASE WHEN team = 'b' THEN is_click ELSE 0 END)
               > SUM(CASE WHEN team = 'a' THEN is_click ELSE 0 END) THEN 'b'
            ELSE 'tie' END AS winner
FROM flagged GROUP BY query_id
"""


def q_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang facet counts of the flagship query's candidate set
    (operators/boolean.py::facet_counts)."""
    from .operators.boolean import facet_counts

    idx = _df_index(spark, sf_dir)
    terms = sorted(
        t for t in set(tokenize(FLAGSHIP_QUERY)) if t not in STOPWORDS)
    facets = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", "lang")
    return facet_counts(idx.postings, terms, facets, "lang")


def q_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Results-over-time facet (operators/boolean.py::date_histogram):
    weekly candidate counts for the flagship query over the synthetic
    warc_ts = epoch + (doc_id % 365) days (the recency gate's scheme),
    integer day-bucket arithmetic on both engines."""
    from .operators.boolean import date_histogram

    idx = _df_index(spark, sf_dir)
    terms = sorted(
        t for t in set(tokenize(FLAGSHIP_QUERY)) if t not in STOPWORDS)
    doc_ts = _read_documents(spark, sf_dir).select(
        "doc_id",
        F.date_add(F.lit(RECENCY_EPOCH).cast("date"),
                   (F.col("doc_id") % 365).cast("int")).alias("ts"))
    return date_histogram(idx.postings, terms, doc_ts,
                          epoch=RECENCY_EPOCH, interval_days=7)


def sql_date_histogram() -> str:
    terms = sorted(
        t for t in set(tokenize(FLAGSHIP_QUERY)) if t not in STOPWORDS)
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {TOKS_CTE},
cand AS (SELECT DISTINCT doc_id FROM postings WHERE term IN ({in_list})),
b AS (
  SELECT CAST(FLOOR((doc_id % 365) / 7.0) AS BIGINT) AS bucket
  FROM cand
)
SELECT bucket, bucket * 7 AS bucket_start_day,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM b GROUP BY bucket
"""


def sql_facet_counts() -> str:
    terms = sorted(
        t for t in set(tokenize(FLAGSHIP_QUERY)) if t not in STOPWORDS)
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {TOKS_CTE},
cand AS (SELECT DISTINCT doc_id FROM postings WHERE term IN ({in_list}))
SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM cand c JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


SIGTERMS_K = 20


def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Significant-terms aggregation over the flagship query's
    candidate set (operators/boolean.py::significant_terms — the ES
    significant_terms analogue, JLH lift scoring): which terms
    characterize the matching documents relative to the corpus."""
    from .operators.boolean import significant_terms

    idx = _df_index(spark, sf_dir)
    terms = sorted(
        t for t in set(tokenize(FLAGSHIP_QUERY)) if t not in STOPWORDS)
    return significant_terms(idx.postings, idx.dictionary, idx.n_docs,
                             terms, k=SIGTERMS_K)


def sql_significant_terms() -> str:
    terms = sorted(
        t for t in set(tokenize(FLAGSHIP_QUERY)) if t not in STOPWORDS)
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {TOKS_CTE},
cand AS (SELECT DISTINCT doc_id FROM postings WHERE term IN ({in_list})),
fg AS (
  SELECT p.term, CAST(COUNT(*) AS BIGINT) AS fg_df
  FROM postings p JOIN cand c USING (doc_id)
  WHERE p.term NOT IN ({in_list})
  GROUP BY p.term
),
sizes AS (
  SELECT CAST((SELECT COUNT(*) FROM cand) AS DOUBLE) AS fg_size,
         CAST((SELECT n FROM stats) AS DOUBLE) AS n
)
SELECT f.term, f.fg_df, CAST(d.df AS BIGINT) AS bg_df,
       CAST(ROUND(((CAST(f.fg_df AS DOUBLE) / s.fg_size)
                   - (CAST(d.df AS DOUBLE) / s.n))
                  * ((CAST(f.fg_df AS DOUBLE) / s.fg_size)
                     / (CAST(d.df AS DOUBLE) / s.n)) * 1000000)
            AS BIGINT) AS score_micro
FROM fg f JOIN dict d USING (term) CROSS JOIN sizes s
WHERE (CAST(f.fg_df AS DOUBLE) / s.fg_size) > (CAST(d.df AS DOUBLE) / s.n)
ORDER BY score_micro DESC, term ASC
LIMIT {SIGTERMS_K}
"""


def q_qld_segment_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet QLD over the COMPRESSED segment index
    (segment_query.search_segments mode='qld') — same oracle as the
    DataFrame-engine qld_topk gate, proving both backends score the
    LM identically."""
    from .operators.segment_query import SegmentIndex, search_segments

    sidx = SegmentIndex.load(spark, _seg_index_dir(spark, sf_dir))
    raw = search_segments(spark, sidx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                          mode="qld", mu=QLD_MU)
    mapped = _to_original_ids(spark, _seg_index_dir(spark, sf_dir), raw)
    return _rerank_quantized(mapped, K_FLAGSHIP)


def q_bm25_topk_maxscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k over the compressed segment index under MaxScore
    dynamic pruning (segment_query._make_maxscore_partition_kernel,
    Turtle & Flood essential/non-essential split) — same oracle as the
    exhaustive bm25_topk gate, proving the pruned path rank-identical
    end-to-end on the driver's harness, not just in pytest."""
    from .operators.segment_query import SegmentIndex, search_segments

    d = _seg_index_dir(spark, sf_dir)
    sidx = SegmentIndex.load(spark, d)
    raw = search_segments(spark, sidx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                          mode="bm25", strategy="maxscore")
    return _rerank_quantized(_to_original_ids(spark, d, raw), K_FLAGSHIP)


def q_score_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term score breakdown for the flagship query's top-k page
    (operators/query.py::explain_score, the Lucene explain analogue):
    one row per (doc_id, matched term) with posting evidence and the
    exact contribution; the oracle recomputes every row, and per-doc
    contribution sums are the bm25_topk gate's scores by construction
    (same expressions — asserted in pytest)."""
    idx = _df_index(spark, sf_dir)
    top = q_bm25_topk(spark, sf_dir).select("doc_id")
    rows = Q.explain_score(spark, idx, FLAGSHIP_QUERY, mode="bm25",
                           doc_filter=top)
    return rows.select(
        "doc_id", "term", "tf", "df", "doc_len",
        _micro(F.col("contribution")).alias("contribution_micro"))


def sql_score_explain(k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
topk AS (
  SELECT doc_id FROM hits GROUP BY doc_id
  ORDER BY CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) DESC, doc_id ASC
  LIMIT {K_FLAGSHIP}
)
SELECT p.doc_id, p.term, p.tf, t.df, d.doc_len,
       CAST(ROUND(LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf * 1000000) AS BIGINT) AS contribution_micro
FROM postings p
JOIN topk USING (doc_id)
JOIN qterms q USING (term)
JOIN dict t USING (term)
JOIN docinfo d USING (doc_id)
CROSS JOIN stats s
"""


# corpus-aware synonym table for the expansion gate: some targets exist
# in the synthetic vocabulary (stream/sort/merge/small), some don't
# (quick/large) — both paths exercised (absent synonyms contribute 0)
SYNONYMS = {
    "fast": ["quick", "stream"],
    "scan": ["sort"],
    "join": ["merge"],
    "big": ["large", "small"],
}
SYN_WEIGHT = 0.5


def _expanded_bag() -> dict[str, float]:
    """The flagship query bag after synonym expansion — computed ONCE
    here and shared verbatim by the Spark gate and the SQL oracle so
    the two can never drift."""
    from collections import Counter

    bag = Counter(t for t in tokenize(FLAGSHIP_QUERY) if t not in STOPWORDS)
    weights = {t: float(tf) for t, tf in bag.items()}
    for t, tf in bag.items():
        for s in SYNONYMS.get(t, ()):
            if s in bag:
                continue
            weights[s] = max(weights.get(s, 0.0), SYN_WEIGHT * tf)
    return weights


def q_synonym_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time synonym expansion (operators/query.py::
    search_with_synonyms): original terms keep full weight, synonyms
    join at SYN_WEIGHT, absent synonyms contribute nothing."""
    idx = _df_index(spark, sf_dir)
    raw = Q.search_with_synonyms(spark, idx, FLAGSHIP_QUERY, SYNONYMS,
                                 syn_weight=SYN_WEIGHT, k=K_FLAGSHIP * 5,
                                 mode="bm25")
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_synonym_bm25_topk(k1: float = 1.2, b: float = 0.75) -> str:
    vals = ", ".join(f"('{t}', {w!r})"
                     for t, w in sorted(_expanded_bag().items()))
    return f"""
WITH {TOKS_CTE},
qterms AS (SELECT * FROM (VALUES {vals}) AS q(term, qtf)),
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


RM3_N_FB, RM3_N_EXP, RM3_ALPHA = 10, 5, 0.6


def q_rm3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback: RM3-expanded BM25 top-k (see
    operators/feedback.py — reference scores only the literal bag,
    QueryParser.java:141-174)."""
    from .operators.feedback import search_rm3

    idx = _df_index(spark, sf_dir)
    raw = search_rm3(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                     n_fb=RM3_N_FB, n_exp=RM3_N_EXP, alpha=RM3_ALPHA)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_rm3_topk(k1: float = 1.2, b: float = 0.75) -> str:
    bm25 = (f"LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))"
            f" * p.tf * ({k1} + 1.0)"
            f" / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))")
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
hits AS (
  SELECT p.doc_id, {bm25} * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
fbs AS (
  SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
  FROM hits GROUP BY doc_id),
fb AS (SELECT doc_id, score_micro FROM fbs
       ORDER BY score_micro DESC, doc_id ASC LIMIT {RM3_N_FB}),
expw AS (
  SELECT p.term,
         CAST(ROUND(1000000.0 * SUM(CAST(p.tf AS DOUBLE) / d.doc_len
                                    * f.score_micro / 1000000.0))
              AS BIGINT) AS w_micro
  FROM postings p JOIN fb f USING (doc_id) JOIN docinfo d USING (doc_id)
  WHERE p.term NOT IN (SELECT term FROM qterms)
  GROUP BY p.term),
expterms AS (SELECT term, w_micro FROM expw WHERE w_micro > 0
             ORDER BY w_micro DESC, term ASC LIMIT {RM3_N_EXP}),
allq AS (
  SELECT term, {RM3_ALPHA} * qtf AS w_tq FROM qterms
  UNION ALL
  SELECT term, (1.0 - {RM3_ALPHA}) * w_micro
               / (SELECT MAX(w_micro) FROM expterms) FROM expterms),
hits2 AS (
  SELECT p.doc_id, {bm25} * a.w_tq AS partial
  FROM postings p
  JOIN allq a USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits2 GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


ROCCHIO_N_FB = 10
ROCCHIO_N_EXP = 5
ROCCHIO_ALPHA = 1.0
ROCCHIO_BETA = 0.75


def q_rocchio_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-feedback in the reference's W2 vector space
    (operators/feedback.py::search_rocchio, IIR §9.1.1 with gamma=0):
    q' = alpha*q + beta*centroid(top-n_fb doc vectors), centroid
    components micro-quantized before selection/weighting (the RM3
    determinism contract), final ranking = the ordinary W2 cosine over
    the expanded bag.  The oracle replays the whole pipeline in SQL."""
    from .operators.feedback import search_rocchio

    idx = _df_index(spark, sf_dir)
    raw = search_rocchio(spark, idx, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
                         n_fb=ROCCHIO_N_FB, n_exp=ROCCHIO_N_EXP,
                         alpha=ROCCHIO_ALPHA, beta=ROCCHIO_BETA)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_rocchio_topk() -> str:
    w_doc = """CASE WHEN p.tf = 0 OR d.doc_len = 0 OR t.df = 0 THEN 0.0
         ELSE 0.4 + 0.6 * (p.tf / (p.tf + 0.5 + 1.5 * (d.doc_len / s.avg_dl)))
              * LN(CAST(s.n // t.df AS DOUBLE)) / LN(s.n) END"""
    return f"""
WITH {TOKS_CTE},
{_sql_query_terms()},
qmax AS (SELECT MAX(qtf) AS mq FROM qterms),
weighted AS (
  SELECT p.doc_id, p.term, {w_doc} AS w
  FROM postings p JOIN dict t USING (term) JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
norms AS (SELECT doc_id, SQRT(SUM(w * w)) AS norm FROM weighted GROUP BY doc_id),
qw AS (
  SELECT q.term,
         CASE WHEN q.qtf = 0 OR m.mq = 0 OR COALESCE(t.df, 0) = 0 THEN 0.0
              ELSE (0.4 + 0.6 * LN(q.qtf + 0.5) / LN(m.mq + 1.0))
                   * LN(CAST(s.n // t.df AS DOUBLE)) / LN(s.n) END AS w_tq
  FROM qterms q LEFT JOIN dict t USING (term) CROSS JOIN qmax m CROSS JOIN stats s
),
qnorm AS (SELECT SQRT(SUM(w_tq * w_tq)) AS qn FROM qw),
dots AS (
  SELECT w.doc_id, SUM(w.w * qw.w_tq) AS dot
  FROM weighted w JOIN qw USING (term) GROUP BY w.doc_id
),
fbs AS (
  SELECT d.doc_id,
         CAST(ROUND(CASE WHEN n.norm > 0 AND q.qn > 0
                         THEN d.dot / n.norm / q.qn ELSE 0.0 END * 1000000)
              AS BIGINT) AS score_micro
  FROM dots d JOIN norms n USING (doc_id) CROSS JOIN qnorm q
),
fb AS (SELECT doc_id FROM fbs
       ORDER BY score_micro DESC, doc_id ASC LIMIT {ROCCHIO_N_FB}),
fbn AS (SELECT COUNT(*) AS n_dr FROM fb),
cent AS (
  SELECT w.term,
         CAST(ROUND(1000000.0 * SUM(w.w) / ANY_VALUE(f.n_dr)) AS BIGINT)
           AS c_micro
  FROM weighted w JOIN fb USING (doc_id) CROSS JOIN fbn f
  GROUP BY w.term
  HAVING CAST(ROUND(1000000.0 * SUM(w.w) / ANY_VALUE(f.n_dr)) AS BIGINT) > 0
),
expt AS (SELECT term, c_micro FROM cent
         WHERE term NOT IN (SELECT term FROM qterms)
         ORDER BY c_micro DESC, term ASC LIMIT {ROCCHIO_N_EXP}),
allq AS (
  SELECT q.term,
         {ROCCHIO_ALPHA} * q.w_tq
           + {ROCCHIO_BETA} * COALESCE(c.c_micro, 0) / 1000000.0 AS w_tq
  FROM qw q LEFT JOIN cent c USING (term)
  UNION ALL
  SELECT term, {ROCCHIO_BETA} * c_micro / 1000000.0 FROM expt
),
qnorm2 AS (SELECT SQRT(SUM(w_tq * w_tq)) AS qn FROM allq),
dots2 AS (
  SELECT w.doc_id, SUM(w.w * a.w_tq) AS dot
  FROM weighted w JOIN allq a USING (term) GROUP BY w.doc_id
)
SELECT d.doc_id,
       CAST(ROUND(CASE WHEN n.norm > 0 AND q.qn > 0
                       THEN d.dot / n.norm / q.qn ELSE 0.0 END * 1000000)
            AS BIGINT) AS score_micro
FROM dots2 d JOIN norms n USING (doc_id) CROSS JOIN qnorm2 q
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


def q_boolean_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean retrieval: (hash AND join) AND NOT vector AND (fast OR
    scan) -> (doc_id, n_should).  Reference is ranked-only; see
    operators/boolean.py docstring."""
    from .operators.boolean import boolean_search

    idx = _df_index(spark, sf_dir)
    return boolean_search(idx.postings, must=BOOL_MUST, must_not=BOOL_NOT,
                          should=BOOL_SHOULD, min_should=1)


def sql_boolean_match() -> str:
    vocab = sorted({*BOOL_MUST, *BOOL_NOT, *BOOL_SHOULD})
    in_list = ", ".join(f"'{t}'" for t in vocab)
    must = ", ".join(f"'{t}'" for t in BOOL_MUST)
    mnot = ", ".join(f"'{t}'" for t in BOOL_NOT)
    should = ", ".join(f"'{t}'" for t in BOOL_SHOULD)
    return f"""
WITH {TOKS_CTE}
SELECT doc_id, CAST(n_should AS INT) AS n_should FROM (
  SELECT doc_id,
    COUNT(DISTINCT CASE WHEN term IN ({must}) THEN term END) AS n_must,
    COUNT(DISTINCT CASE WHEN term IN ({mnot}) THEN term END) AS n_not,
    COUNT(DISTINCT CASE WHEN term IN ({should}) THEN term END) AS n_should
  FROM postings WHERE term IN ({in_list}) GROUP BY doc_id)
WHERE n_must = {len(BOOL_MUST)} AND n_not = 0 AND n_should >= 1
"""


# --- search-box query language (operators/boolean.py::search_querybox) -------

QB_QUERY = 'fast scan +table -join "table hash"'


def q_querybox_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user-facing query language executed by composition
    (operators/boolean.py::search_querybox): BM25 over the positive
    bag, +term must-filter pushed under the scorer, -term anti-join,
    quoted phrase semi-join against the compressed positional store."""
    from .operators.boolean import parse_querybox, search_querybox
    from .operators.positions import read_positional_store

    idx = _df_index(spark, sf_dir)
    spec = parse_querybox(QB_QUERY)
    ph_terms = sorted({t for ph in spec["phrases"] + spec["not_phrases"]
                       for t in ph})
    rel = read_positional_store(spark, _pos_store_dir(spark, sf_dir),
                                ph_terms)
    raw = search_querybox(spark, idx, rel, QB_QUERY, k=K_FLAGSHIP * 5)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_querybox_topk(k1: float = 1.2, b: float = 0.75) -> str:
    """Same composition in SQL: the scoring bag, must/not EXISTS
    clauses, and the phrase positional self-joins all derive from the
    SAME parse_querybox output."""
    from collections import Counter

    from .operators.boolean import parse_querybox
    from .text import STOPWORDS

    spec = parse_querybox(QB_QUERY)
    bag = Counter(spec["must"] + spec["should"]
                  + [t for ph in spec["phrases"] for t in ph
                     if t not in STOPWORDS])
    qvals = ", ".join(f"('{t}', {n})" for t, n in sorted(bag.items()))
    conds = []
    for t in sorted(set(spec["must"])):
        conds.append("s.doc_id IN (SELECT doc_id FROM postings "
                     f"WHERE term = '{t}')")
    if spec["must_not"]:
        bad = ", ".join(f"'{t}'" for t in sorted(set(spec["must_not"])))
        conds.append("s.doc_id NOT IN (SELECT doc_id FROM postings "
                     f"WHERE term IN ({bad}))")

    def phrase_sql(ph: list[str]) -> str:
        joins = " ".join(
            f"JOIN seq t{i} ON t{i}.doc_id = t0.doc_id"
            f" AND t{i}.pos = t0.pos + {i}" for i in range(1, len(ph)))
        where = " AND ".join(
            f"t{i}.term = '{t}'" for i, t in enumerate(ph))
        return f"SELECT DISTINCT t0.doc_id FROM seq t0 {joins} WHERE {where}"

    for ph in spec["phrases"]:
        conds.append(f"s.doc_id IN ({phrase_sql(ph)})")
    for ph in spec["not_phrases"]:
        conds.append(f"s.doc_id NOT IN ({phrase_sql(ph)})")
    where = "WHERE " + "\n  AND ".join(conds) if conds else ""
    return f"""
WITH {TOKS_CTE},
{SEQ_CTE.strip().rstrip()}
,
qterms AS (SELECT * FROM (VALUES {qvals}) AS q(term, qtf)),
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.doc_len / s.avg_dl))
           * q.qtf AS partial
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dict t USING (term)
  JOIN docinfo d USING (doc_id)
  CROSS JOIN stats s
),
scored AS (
  SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT)
           AS score_micro
  FROM hits GROUP BY doc_id
)
SELECT s.doc_id, s.score_micro FROM scored s
{where}
ORDER BY s.score_micro DESC, s.doc_id ASC LIMIT {K_FLAGSHIP}
"""


# --- noisy-channel phrase suggestion (lexicon.py::suggest_phrase) -------------

PHRASE_TYPO_QUERY = "fast hasj join"
PHRASE_M, PHRASE_DIST, PHRASE_SHARED = 3, 2, 2
PHRASE_PEN = 2_000_000


def q_phrase_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-aware "did you mean" over the whole query
    (operators/lexicon.py::suggest_phrase): Viterbi over per-position
    fuzzy candidates under the corpus bigram LM with a per-edit
    channel penalty."""
    from .operators.lexicon import suggest_phrase

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return suggest_phrase(spark, docs.select("doc_id", "text"),
                          PHRASE_TYPO_QUERY, m_cands=PHRASE_M,
                          max_dist=PHRASE_DIST, min_shared=PHRASE_SHARED,
                          pen_micro=PHRASE_PEN)


def sql_phrase_suggest() -> str:
    """Full-path enumeration of the same integer-quantized lattice:
    unigram/bigram counts from the identical token stream, trigram-
    blocked candidates with the identical (dist, c1 DESC, term) top-m,
    every m^n path summed in BIGINT micros, argmax with the
    lexicographically-smallest tie-break."""
    qtoks = [t for t in PHRASE_TYPO_QUERY.split() if len(t) > 1]
    n = len(qtoks)
    qg_vals, qt_vals = [], []
    for pos, t in enumerate(qtoks):
        p = f"${t}$"
        qt_vals.append(f"({pos}, '{t}')")
        qg_vals += [f"({pos}, '{g}')"
                    for g in sorted({p[i:i + 3] for i in range(len(p) - 2)})]
    sel_cols = ", ".join(
        f"p{i}.term AS t{i}, p{i}.dist AS d{i}, p{i}.c1 AS c1_{i}"
        for i in range(n))
    froms = " CROSS JOIN ".join(
        f"(SELECT term, dist, c1 FROM top WHERE pos = {i}) p{i}"
        for i in range(n))
    bjoins = "\n".join(
        f"LEFT JOIN bi b{i} ON b{i}.k = x.t{i - 1} || chr(1) || x.t{i}"
        for i in range(1, n))
    score = (f"CAST(ROUND(LN((x.c1_0 + 1.0) / (vt.t + vt.v)) * 1000000) "
             f"AS BIGINT) - {PHRASE_PEN} * x.d0")
    for i in range(1, n):
        score += (f"\n      + CAST(ROUND(LN((COALESCE(b{i}.c2, 0) + 1.0)"
                  f" / (x.c1_{i - 1} + vt.v)) * 1000000) AS BIGINT)"
                  f" - {PHRASE_PEN} * x.d{i}")
    arms = "\nUNION ALL\n".join(
        f"SELECT {i} AS pos, '{qtoks[i]}' AS original, t{i} AS suggested, "
        f"CAST(d{i} AS INT) AS dist, score AS score_micro FROM best"
        for i in range(n))
    order = ", ".join(f"t{i} ASC" for i in range(n))
    qg_list = ", ".join(qg_vals)
    qt_list = ", ".join(qt_vals)
    return f"""
WITH uni AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
    SELECT UNNEST(string_split(text, ' ')) AS term FROM documents) u
  WHERE LENGTH(term) > 1 GROUP BY term
),
vt AS (SELECT CAST(COUNT(*) AS BIGINT) AS v, CAST(SUM(c1) AS BIGINT) AS t
       FROM uni),
grams AS (
  SELECT term, c1, g FROM (
    SELECT term, c1, substr('$' || term || '$', CAST(i AS INT), 3) AS g
    FROM uni, UNNEST(range(1, length(term) + 1)) r(i)) x
  GROUP BY term, c1, g
),
qg AS (SELECT * FROM (VALUES {qg_list}) AS q(pos, gram)),
qt AS (SELECT * FROM (VALUES {qt_list}) AS q(pos, qterm)),
shared AS (
  SELECT q.pos, g.term, g.c1, COUNT(*) AS n_shared
  FROM grams g JOIN qg q ON g.g = q.gram
  GROUP BY q.pos, g.term, g.c1
  HAVING COUNT(*) >= {PHRASE_SHARED}
),
cand AS (
  SELECT s.pos, s.term, s.c1, levenshtein(s.term, t.qterm) AS dist
  FROM shared s JOIN qt t USING (pos)
  WHERE levenshtein(s.term, t.qterm) <= {PHRASE_DIST}
),
top AS (
  SELECT pos, term, c1, dist FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY pos ORDER BY dist, c1 DESC, term) AS rn
    FROM cand) WHERE rn <= {PHRASE_M}
),
bi AS (
  SELECT w1 || chr(1) || w2 AS k, CAST(COUNT(*) AS BIGINT) AS c2 FROM (
    SELECT l[CAST(i AS INT)] AS w1, l[CAST(i AS INT) + 1] AS w2 FROM (
      SELECT list_filter(string_split(text, ' '),
                         x -> length(x) > 1) AS l
      FROM documents) d, UNNEST(range(1, len(l))) r(i)
    WHERE len(l) >= 2)
  GROUP BY k
),
paths AS (
  SELECT {sel_cols} FROM {froms}
),
scored AS (
  SELECT x.*, {score} AS score
  FROM paths x CROSS JOIN vt
{bjoins}
),
best AS (
  SELECT * FROM scored ORDER BY score DESC, {order} LIMIT 1
)
{arms}
"""


def q_spell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did-you-mean: top-k dictionary terms by (edit distance, df)."""
    from .operators.lexicon import suggest_terms

    idx = _df_index(spark, sf_dir)
    return suggest_terms(idx.dictionary, SPELL_TERM, k=SPELL_K,
                         max_dist=SPELL_DIST)


def sql_spell_suggest() -> str:
    return f"""
WITH {TOKS_CTE}
SELECT term, CAST(levenshtein(term, '{SPELL_TERM}') AS INT) AS dist, df
FROM dict
WHERE ABS(LENGTH(term) - {len(SPELL_TERM)}) <= {SPELL_DIST}
  AND levenshtein(term, '{SPELL_TERM}') <= {SPELL_DIST}
ORDER BY dist ASC, df DESC, term ASC LIMIT {SPELL_K}
"""


def q_prefix_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix completion: top-k terms starting with PREFIX by df."""
    from .operators.lexicon import prefix_terms

    idx = _df_index(spark, sf_dir)
    return prefix_terms(idx.dictionary, PREFIX, k=PREFIX_K)


def q_fuzzy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-index fuzzy lookup (operators/lexicon.py::fuzzy_terms)
    for the same misspelling as spell_suggest — the scale path (edit
    distance only on trigram-blocked candidates); the oracle
    brute-forces the same candidate rule + verify over the
    vocabulary."""
    from .operators.lexicon import fuzzy_terms

    idx = _df_index(spark, sf_dir)
    return fuzzy_terms(idx.dictionary, SPELL_TERM, k=SPELL_K,
                       max_dist=SPELL_DIST)


def sql_fuzzy_terms(min_shared: int = 2) -> str:
    p = f"${SPELL_TERM}$"
    qgrams = sorted({p[i:i + 3] for i in range(len(p) - 2)})
    vals = ", ".join(f"('{g}')" for g in qgrams)
    return f"""
WITH {TOKS_CTE},
tri AS (
  SELECT term, df,
         unnest(list_distinct(list_transform(
           range(1, length(term) + 1),
           i -> substr('$' || term || '$', i, 3)))) AS trigram
  FROM dict
),
qg AS (SELECT * FROM (VALUES {vals}) AS q(g)),
cand AS (
  SELECT t.term, t.df, COUNT(*) AS shared
  FROM tri t JOIN qg ON qg.g = t.trigram
  GROUP BY t.term, t.df
  HAVING COUNT(*) >= {min_shared}
)
SELECT term, CAST(levenshtein(term, '{SPELL_TERM}') AS INT) AS dist, df
FROM cand
WHERE levenshtein(term, '{SPELL_TERM}') <= {SPELL_DIST}
ORDER BY dist ASC, df DESC, term ASC LIMIT {SPELL_K}
"""


def sql_prefix_terms() -> str:
    return f"""
WITH {TOKS_CTE}
SELECT term, df FROM dict WHERE term LIKE '{PREFIX}%'
ORDER BY df DESC, term ASC LIMIT {PREFIX_K}
"""


WILDCARD_PATTERN, WILDCARD_K = "*er", 10


def q_wildcard_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard term lookup via the permuterm rotation table
    (operators/lexicon.py::wildcard_terms): the pattern is a LEADING
    wildcard, the case a plain dictionary scan cannot prune — the
    engine answers it with a single rotation-prefix probe; the oracle
    brute-forces LIKE over the vocabulary."""
    from .operators.lexicon import wildcard_terms

    idx = _df_index(spark, sf_dir)
    return wildcard_terms(idx.dictionary, WILDCARD_PATTERN, k=WILDCARD_K)


def sql_wildcard_terms() -> str:
    like = WILDCARD_PATTERN.replace("*", "%")
    return f"""
WITH {TOKS_CTE}
SELECT term, df FROM dict WHERE term LIKE '{like}'
ORDER BY df DESC, term ASC LIMIT {WILDCARD_K}
"""


TERMVEC_DOC_IDS = (0, 1, 2)


def q_term_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc term vectors (operators/build.py::term_vectors — the
    Lucene TermVectors / ES _termvectors document API): doc-pruned
    postings slice broadcast to the dictionary join; the oracle
    recomputes tf/doc_len/df relationally."""
    from .operators.build import term_vectors

    idx = _df_index(spark, sf_dir)
    return term_vectors(idx, list(TERMVEC_DOC_IDS))


def sql_term_vectors() -> str:
    ids = ", ".join(str(i) for i in TERMVEC_DOC_IDS)
    return f"""
WITH {TOKS_CTE}
SELECT p.doc_id, p.term, p.tf, d.doc_len, t.df
FROM postings p
JOIN docinfo d USING (doc_id)
JOIN dict t USING (term)
WHERE p.doc_id IN ({ids})
"""


REGEX_PATTERN, REGEX_K = "s(c|t|p)[a-z]+", 10


def q_regex_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex term search (operators/lexicon.py::regex_terms, the
    Lucene RegexpQuery shape): full-match semantics, with the
    pattern's literal prefix ('s') pruning the sorted dictionary
    before the regex kernel; the oracle brute-forces
    regexp_full_match over the vocabulary."""
    from .operators.lexicon import regex_terms

    idx = _df_index(spark, sf_dir)
    return regex_terms(idx.dictionary, REGEX_PATTERN, k=REGEX_K)


def sql_regex_terms() -> str:
    return f"""
WITH {TOKS_CTE}
SELECT term, df FROM dict WHERE regexp_full_match(term, '{REGEX_PATTERN}')
ORDER BY df DESC, term ASC LIMIT {REGEX_K}
"""


INFIX_PATTERN, INFIX_K = "ust", 10


def q_substring_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Infix term search via the character-trigram index
    (operators/lexicon.py::substring_terms, the pg_trgm shape):
    candidates match ALL pattern trigrams in one pruned index probe,
    then a real contains() verifies; the oracle brute-forces the
    contains over the vocabulary."""
    from .operators.lexicon import substring_terms

    idx = _df_index(spark, sf_dir)
    return substring_terms(idx.dictionary, INFIX_PATTERN, k=INFIX_K)


def sql_substring_terms() -> str:
    return f"""
WITH {TOKS_CTE}
SELECT term, df FROM dict WHERE position('{INFIX_PATTERN}' IN term) > 0
ORDER BY df DESC, term ASC LIMIT {INFIX_K}
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

BM25F_TITLE_TOKENS = 6
BM25F_W_TITLE = 2.0
BM25F_W_BODY = 1.0


def q_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified BM25F (operators/fields.py): title = first 6 tokens
    weighted 2x, weighted tf combined BEFORE the saturation curve."""
    from .operators.fields import search_bm25f

    docs = _read_documents(spark, sf_dir).select("doc_id", "text")
    raw = search_bm25f(
        spark, docs, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
        k1=1.2, b=0.75,
        field_weights={"title": BM25F_W_TITLE, "body": BM25F_W_BODY},
        title_tokens=BM25F_TITLE_TOKENS)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_bm25f_topk(k1: float = 1.2, b: float = 0.75) -> str:
    tt, wt, wb = BM25F_TITLE_TOKENS, BM25F_W_TITLE, BM25F_W_BODY
    return f"""
WITH raw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
ftoks AS (
  SELECT doc_id, {wt} AS fw, UNNEST(w[1:{tt}]) AS term FROM raw
  UNION ALL
  SELECT doc_id, {wb} AS fw, UNNEST(w[{tt + 1}:]) AS term FROM raw
),
ft AS (SELECT * FROM ftoks WHERE LENGTH(term) > 1),
merged AS (
  SELECT doc_id, term, SUM(fw) AS wtf FROM ft GROUP BY doc_id, term
),
fdocinfo AS (SELECT doc_id, SUM(wtf) AS wdl FROM merged GROUP BY doc_id),
fpost AS (SELECT * FROM merged WHERE term NOT IN ({STOP_SQL})),
fstats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(wdl) AS avg_wdl
           FROM fdocinfo),
fdict AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
          FROM fpost GROUP BY term),
{_sql_query_terms()},
hits AS (
  SELECT p.doc_id,
         LN(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * p.wtf * ({k1} + 1.0)
           / (p.wtf + {k1} * (1.0 - {b} + {b} * d.wdl / s.avg_wdl))
           * q.qtf AS partial
  FROM fpost p
  JOIN qterms q USING (term)
  JOIN fdict t USING (term)
  JOIN fdocinfo d USING (doc_id)
  CROSS JOIN fstats s
)
SELECT doc_id, CAST(ROUND(SUM(partial) * 1000000) AS BIGINT) AS score_micro
FROM hits GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


DISMAX_TIE = 0.3  # exercises BOTH the max and the tie-broken sum


def q_dismax_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction-max field retrieval (operators/fields.py::
    search_dismax): per query term, the BEST single field's BM25 score
    plus tie * the rest — the ES best_fields multi_match, semantic
    complement of BM25F's joint saturation."""
    from .operators.fields import search_dismax

    docs = _read_documents(spark, sf_dir).select("doc_id", "text")
    raw = search_dismax(
        spark, docs, FLAGSHIP_QUERY, k=K_FLAGSHIP * 5,
        k1=1.2, b=0.75, tie=DISMAX_TIE,
        title_tokens=BM25F_TITLE_TOKENS)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_dismax_topk(k1: float = 1.2, b: float = 0.75) -> str:
    tt, tie = BM25F_TITLE_TOKENS, DISMAX_TIE
    return f"""
WITH raw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
ftoks AS (
  SELECT doc_id, 'title' AS field, UNNEST(w[1:{tt}]) AS term FROM raw
  UNION ALL
  SELECT doc_id, 'body' AS field, UNNEST(w[{tt + 1}:]) AS term FROM raw
),
ft AS (SELECT * FROM ftoks WHERE LENGTH(term) > 1),
tc AS (SELECT doc_id, field, term, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM ft GROUP BY doc_id, field, term),
fdocinfo AS (SELECT doc_id, field, SUM(tf) AS fdl
             FROM tc GROUP BY doc_id, field),
fstats AS (SELECT field, CAST(COUNT(*) AS DOUBLE) AS n_f,
                  AVG(fdl) AS avg_fdl
           FROM fdocinfo GROUP BY field),
fpost AS (SELECT * FROM tc WHERE term NOT IN ({STOP_SQL})),
fdict AS (SELECT field, term, CAST(COUNT(*) AS DOUBLE) AS df
          FROM fpost GROUP BY field, term),
{_sql_query_terms()},
hits AS (
  SELECT p.doc_id, p.term, q.qtf,
         LN(1.0 + (s.n_f - t.df + 0.5) / (t.df + 0.5))
           * p.tf * ({k1} + 1.0)
           / (p.tf + {k1} * (1.0 - {b} + {b} * d.fdl / s.avg_fdl)) AS s
  FROM fpost p
  JOIN qterms q USING (term)
  JOIN fdict t ON t.field = p.field AND t.term = p.term
  JOIN fdocinfo d ON d.doc_id = p.doc_id AND d.field = p.field
  JOIN fstats s ON s.field = p.field
),
perterm AS (
  SELECT doc_id, term,
         (MAX(s) + {tie} * (SUM(s) - MAX(s))) * MAX(qtf) AS dmax
  FROM hits GROUP BY doc_id, term
)
SELECT doc_id, CAST(ROUND(SUM(dmax) * 1000000) AS BIGINT) AS score_micro
FROM perterm GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


def core_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tokens_tf": q_tokens_tf,
        "dictionary": q_dictionary,
        "docinfo": q_docinfo,
        "collection_stats": q_collection_stats,
        "bm25_topk": q_bm25_topk,
        "tokens_tf_stem": q_tokens_tf_stem,
        "bm25_topk_stem": q_bm25_topk_stem,
        "champion_bm25_topk": q_champion_bm25_topk,
        "bm25_two_phase_topk": q_bm25_two_phase_topk,
        "impact_bm25_topk": q_impact_bm25_topk,
        "impact_pruned_bm25_topk": q_impact_pruned_bm25_topk,
        "score_explain": q_score_explain,
        "synonym_bm25_topk": q_synonym_bm25_topk,
        "date_histogram": q_date_histogram,
        "dictionary_frontcoded": q_dictionary_frontcoded,
        "ltr_features": q_ltr_features,
        "w1_topk": q_w1_topk,
        "w2_topk": q_w2_topk,
        "search_results": q_search_results,
        "html_extract": q_html_extract,
        "segment_postings": q_segment_postings,
        "bm25_batch_topk": q_bm25_batch_topk,
        "bm25_filtered_topk": q_bm25_filtered_topk,
        "positional_postings": q_positional_postings,
        "phrase_match": q_phrase_match,
        "proximity_match": q_proximity_match,
        "sloppy_phrase": q_sloppy_phrase,
        "span_near_ordered": q_span_near_ordered,
        "bm25_phrase_boost_topk": q_bm25_phrase_boost_topk,
        "snippet_best_window": q_snippet_best_window,
        "span_near_unordered": q_span_near_unordered,
        "rm3_topk": q_rm3_topk,
        "rocchio_topk": q_rocchio_topk,
        "qld_topk": q_qld_topk,
        "lmjm_topk": q_lmjm_topk,
        "pl2_topk": q_pl2_topk,
        "bm25plus_topk": q_bm25plus_topk,
        "bm25l_topk": q_bm25l_topk,
        "rank_rbo": q_rank_rbo,
        "cori_shards": q_cori_shards,
        "bm25_topk_upsert": q_bm25_topk_upsert,
        "sdm_topk": q_sdm_topk,
        "keywords_tfidf": q_keywords_tfidf,
        "qld_segment_topk": q_qld_segment_topk,
        "bm25_topk_maxscore": q_bm25_topk_maxscore,
        "mlt_topk": q_mlt_topk,
        "bm25_recency_topk": q_bm25_recency_topk,
        "bm25_page2": q_bm25_page2,
        "facet_counts": q_facet_counts,
        "significant_terms": q_significant_terms,
        "snippet_extract": q_snippet_extract,
        "merged_bm25_topk": q_merged_bm25_topk,
        "sharded_bm25_topk": q_sharded_bm25_topk,
        "sharded_pruned_bm25_topk": q_sharded_pruned_bm25_topk,
        "clarity_scores": q_clarity_scores,
        "qpp_wig_nqc": q_qpp_wig_nqc,
        "querybox_topk": q_querybox_topk,
        "pivoted_topk": q_pivoted_topk,
        "tdi_interleave": q_tdi_interleave,
        "tdi_credit": q_tdi_credit,
        "selective_prf_topk": q_selective_prf_topk,
        "bm25_topk_deleted": q_bm25_topk_deleted,
        "bm25_topk_compacted": q_bm25_topk_compacted,
        "eval_metrics": q_eval_metrics,
        "boolean_match": q_boolean_match,
        "spell_suggest": q_spell_suggest,
        "phrase_suggest": q_phrase_suggest,
        "spellfix_bm25_topk": q_spellfix_bm25_topk,
        "bm25_msm_topk": q_bm25_msm_topk,
        "prefix_terms": q_prefix_terms,
        "wildcard_terms": q_wildcard_terms,
        "substring_terms": q_substring_terms,
        "regex_terms": q_regex_terms,
        "term_vectors": q_term_vectors,
        "fuzzy_terms": q_fuzzy_terms,
        "bm25f_topk": q_bm25f_topk,
        "dismax_topk": q_dismax_topk,
    }


def core_oracle_sql() -> dict[str, str]:
    return {
        "tokens_tf": sql_tokens_tf(),
        "dictionary": sql_dictionary(),
        "docinfo": sql_docinfo(),
        "collection_stats": sql_collection_stats(),
        "bm25_topk": sql_bm25_topk(),
        "tokens_tf_stem": sql_tokens_tf_stem(),
        "bm25_topk_stem": sql_bm25_topk(stem=True),
        "champion_bm25_topk": sql_champion_bm25_topk(),
        "bm25_two_phase_topk": sql_bm25_two_phase_topk(),
        "impact_bm25_topk": sql_impact_bm25_topk(),
        # pruning is certified lossless -> the unpruned oracle applies
        "impact_pruned_bm25_topk": sql_impact_bm25_topk(),
        "score_explain": sql_score_explain(),
        "synonym_bm25_topk": sql_synonym_bm25_topk(),
        "date_histogram": sql_date_histogram(),
        "dictionary_frontcoded": sql_dictionary(),
        "ltr_features": sql_ltr_features(),
        "w1_topk": _sql_cosine_topk("w1"),
        "w2_topk": _sql_cosine_topk("w2"),
        "search_results": sql_search_results(),
        "html_extract": sql_html_extract(),
        "segment_postings": sql_segment_postings(),
        "bm25_batch_topk": sql_bm25_batch_topk(),
        "bm25_filtered_topk": sql_bm25_filtered_topk(),
        "positional_postings": sql_positional_postings(),
        "phrase_match": sql_phrase_match(),
        "proximity_match": sql_proximity_match(),
        "sloppy_phrase": sql_sloppy_phrase(),
        "span_near_ordered": sql_span_near_ordered(),
        "bm25_phrase_boost_topk": sql_bm25_phrase_boost_topk(),
        "snippet_best_window": sql_snippet_best_window(),
        "span_near_unordered": sql_span_near_unordered(),
        "rm3_topk": sql_rm3_topk(),
        "rocchio_topk": sql_rocchio_topk(),
        "qld_topk": sql_qld_topk(),
        "lmjm_topk": sql_lmjm_topk(),
        "pl2_topk": sql_pl2_topk(),
        "bm25plus_topk": sql_bm25plus_topk(),
        "bm25l_topk": sql_bm25l_topk(),
        "rank_rbo": sql_rank_rbo(),
        "cori_shards": sql_cori_shards(),
        "bm25_topk_upsert": sql_bm25_topk_upsert(),
        "sdm_topk": sql_sdm_topk(),
        "keywords_tfidf": sql_keywords_tfidf(),
        "qld_segment_topk": sql_qld_topk(),
        "bm25_topk_maxscore": sql_bm25_topk(),
        "mlt_topk": sql_mlt_topk(),
        "bm25_recency_topk": sql_bm25_recency_topk(),
        "bm25_page2": sql_bm25_page2(),
        "facet_counts": sql_facet_counts(),
        "significant_terms": sql_significant_terms(),
        "snippet_extract": sql_snippet_extract(),
        "merged_bm25_topk": sql_bm25_topk(),
        "sharded_bm25_topk": sql_bm25_topk(),
        "sharded_pruned_bm25_topk": sql_bm25_topk(),
        "clarity_scores": sql_clarity_scores(),
        "qpp_wig_nqc": sql_qpp_wig_nqc(),
        "querybox_topk": sql_querybox_topk(),
        "pivoted_topk": sql_pivoted_topk(),
        "tdi_interleave": sql_tdi_interleave(),
        "tdi_credit": sql_tdi_credit(),
        "selective_prf_topk": sql_selective_prf_topk(),
        "bm25_topk_deleted": sql_bm25_topk_deleted(),
        "bm25_topk_compacted": sql_bm25_topk_compacted(),
        "eval_metrics": sql_eval_metrics(),
        "boolean_match": sql_boolean_match(),
        "spell_suggest": sql_spell_suggest(),
        "phrase_suggest": sql_phrase_suggest(),
        "spellfix_bm25_topk": sql_spellfix_bm25_topk(),
        "bm25_msm_topk": sql_bm25_msm_topk(),
        "prefix_terms": sql_prefix_terms(),
        "wildcard_terms": sql_wildcard_terms(),
        "substring_terms": sql_substring_terms(),
        "regex_terms": sql_regex_terms(),
        "term_vectors": sql_term_vectors(),
        "fuzzy_terms": sql_fuzzy_terms(),
        "bm25f_topk": sql_bm25f_topk(),
        "dismax_topk": sql_dismax_topk(),
    }
