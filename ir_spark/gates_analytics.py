"""Driver-contract gates for the training-data-pipeline operators:
deduplication, similarity/ANN search, text analysis, multimodal
plumbing.  Companion to gates.py (core IR); same determinism contract
(micro-quantized floats, explicit tie-breaks, md5-portable hashing).

Spark sides call the real operators in ir_spark.operators.{dedup,
similarity, textstats, multimodal}; oracle sides are DuckDB SQL over
the same parquet views.  MinHash/SimHash/fingerprints are exactly
reproducible cross-engine because every hash is md5 of an explicit
string and MinHash minimizes the hex string (lexicographic == numeric
on the 128-bit value).

Derived corpora (dedup gates need duplicates; the synthetic corpus has
none): exact copies of every 10th doc and drop-first-word variants of
every 7th doc, appended with doc_id + 10_000_000 — pure column
expressions, identical in both engines, no external data.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .gates import TOKS_CTE
from .operators import build as B
from .operators import dedup as D
from .operators import multimodal as M
from .operators import similarity as S
from .operators import textstats as X
from .text import STOPWORDS

DUP_OFFSET = 10_000_000
N_HASHES, N_BANDS, BAND_ROWS = 16, 4, 4
JACCARD_MIN_MICRO = 300_000  # 0.3
ANN_K = 10
ANN_QUERY_VEC_ID = 0
IVF_PROBES = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# --- derived dedup corpora (identical construction in SQL below) -----------

def _with_exact_dups(docs: DataFrame) -> DataFrame:
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"), "text")
    return docs.unionByName(copies)


def _with_near_dups(docs: DataFrame) -> DataFrame:
    variants = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"))
    return docs.unionByName(variants)


_SQL_EXACT_CORPUS = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET} AS doc_id, text FROM documents WHERE doc_id % 10 = 0
)"""

_SQL_NEAR_CORPUS = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET} AS doc_id,
         substr(text, strpos(text, ' ') + 1) AS text
  FROM documents WHERE doc_id % 7 = 0
)"""

# distinct word 3-gram shingles over `corpus` (matches D.word_shingles)
_SQL_SHINGLES = """
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> array_to_string(w[i:i+2], ' '))) AS shingle
  FROM (SELECT doc_id, list_filter(string_split(text, ' '),
                                   t -> length(t) > 0) AS w FROM corpus)
  WHERE len(w) >= 3
)"""


def _sql_minhash_bands() -> str:
    mins = ", ".join(
        f"MIN(md5('{i}:' || shingle)) AS h{i}" for i in range(N_HASHES))
    bands = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band, md5(concat_ws('|', {cols})) AS band_hash FROM mh".format(
            b=b, cols=", ".join(f"h{b * BAND_ROWS + r}" for r in range(BAND_ROWS)))
        for b in range(N_BANDS))
    return f"mh AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),\nbands AS ({bands})"


# ---------------------------------------------------------------------------
# dedup gates
# ---------------------------------------------------------------------------

_VERIFIED_PAIRS_MEMO: dict[tuple, DataFrame] = {}


def _verified_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH pipeline output (verified near-dup pairs), memoized per
    session: `lsh_near_dup_pairs` and `dedup_clusters` share the exact
    same shingle -> minhash -> band -> verify derivation, and its
    OUTPUT is tiny (thousands of (a, b, jaccard) rows), so the memo
    materializes it driver-side once instead of persisting the large
    shingle intermediates on executors (a leaked persist was the r2
    `curation_pipeline` bench regression)."""
    key = (id(spark), sf_dir)
    if key not in _VERIFIED_PAIRS_MEMO:
        corpus = _with_near_dups(_docs(spark, sf_dir))
        sh = D.word_shingles(corpus, n=3)
        bands = D.lsh_bands(D.minhash_signatures(sh, N_HASHES), N_BANDS,
                            BAND_ROWS)
        pairs = D.lsh_candidate_pairs(bands)
        verified = D.jaccard_for_pairs(pairs, sh).filter(
            F.col("jaccard_micro") >= JACCARD_MIN_MICRO)
        _VERIFIED_PAIRS_MEMO[key] = spark.createDataFrame(
            verified.collect(), verified.schema)
    return _VERIFIED_PAIRS_MEMO[key]


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dup_groups(_with_exact_dups(_docs(spark, sf_dir)))


def sql_dedup_exact() -> str:
    return f"""
WITH {_SQL_EXACT_CORPUS}
SELECT md5(text) AS text_md5, CAST(COUNT(*) AS BIGINT) AS n_copies,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1
"""


def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) band signatures (4 bands x 4 rows) per document."""
    sh = D.word_shingles(_docs(spark, sf_dir), n=3)
    return D.lsh_bands(D.minhash_signatures(sh, N_HASHES), N_BANDS, BAND_ROWS)


def sql_minhash_bands() -> str:
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
{_SQL_SHINGLES.lstrip()},
{_sql_minhash_bands()}
SELECT doc_id, band, band_hash FROM bands
"""


def q_lsh_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs verified by exact shingle Jaccard >= 0.3.
    (Within one derivation, shingles feed four consumers — measured:
    Spark's ReusedExchange already dedupes the distinct shuffle and an
    explicit persist() is net slower; ACROSS gates the tiny verified
    output is memoized, see _verified_lsh_pairs.)"""
    return _verified_lsh_pairs(spark, sf_dir)


def sql_lsh_near_dup_pairs() -> str:
    return f"""
WITH {_SQL_NEAR_CORPUS},
{_SQL_SHINGLES.lstrip()},
{_sql_minhash_bands()},
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
),
inter AS (
  SELECT c.a, c.b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id)
SELECT c.a, c.b,
       CAST(ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                  / (za.sz + zb.sz - COALESCE(i.n_inter, 0)) * 1000000.0)
            AS BIGINT) AS jaccard_micro
FROM cand c
LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN sz za ON za.doc_id = c.a
JOIN sz zb ON zb.doc_id = c.b
WHERE CAST(ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                 / (za.sz + zb.sz - COALESCE(i.n_inter, 0)) * 1000000.0)
           AS BIGINT) >= {JACCARD_MIN_MICRO}
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: LSH-verified pairs -> connected components
    (operators/dedup.py::connected_components, iterative min-label
    propagation) with canonical-doc selection.  The oracle computes
    the same components via a recursive-CTE transitive closure."""
    verified = _verified_lsh_pairs(spark, sf_dir)
    return D.connected_components(verified.select("a", "b"))


def sql_dedup_clusters() -> str:
    return f"""
WITH RECURSIVE edges AS ({sql_lsh_near_dup_pairs()}),
sym AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges),
reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
),
lab AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
  FROM reach GROUP BY u
)
SELECT doc_id, cluster_id,
       CAST(doc_id = cluster_id AS INT) AS is_canonical
FROM lab
"""


CURATE_MIN_WORDS = 5


def _with_all_dups(docs: DataFrame) -> DataFrame:
    """Curation-gate corpus: base + exact copies (every 10th doc) +
    drop-first-word near variants (every 7th doc)."""
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"), "text")
    variants = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2 * DUP_OFFSET).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"))
    return docs.unionByName(copies).unionByName(variants)


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: exact dedup -> LSH near-dup drop ->
    quality floor; emits the kept (doc_id, n_words)."""
    corpus = _with_all_dups(_docs(spark, sf_dir))
    caches: list = []
    kept = D.curate(corpus, jaccard_threshold=0.3,
                    min_words=CURATE_MIN_WORDS, caches=caches)
    n_words = F.size(F.filter(F.split("text", " "),
                              lambda w: F.length(w) > 0)).cast("long")
    # Materialize the (small) result eagerly so curate()'s stage-1
    # corpus cache can be released before the gate returns — leaving it
    # persisted for the session starved every later gate of storage
    # memory in the serial bench (r2 regression: 5.7s -> 25.8s).
    out = kept.select("doc_id", n_words.alias("n_words")).localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out


def sql_curation_pipeline() -> str:
    return f"""
WITH corpus0 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET}, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + {2 * DUP_OFFSET}, substr(text, strpos(text, ' ') + 1)
  FROM documents WHERE doc_id % 7 = 0
),
keep_exact AS (
  SELECT MIN(doc_id) AS doc_id FROM corpus0 GROUP BY md5(text)
),
corpus AS (SELECT c.doc_id, c.text FROM corpus0 c JOIN keep_exact USING (doc_id)),
{_SQL_SHINGLES.lstrip()},
{_sql_minhash_bands()},
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
),
inter AS (
  SELECT c.a, c.b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
drop_near AS (
  SELECT DISTINCT c.b AS doc_id
  FROM cand c
  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
  JOIN sz za ON za.doc_id = c.a
  JOIN sz zb ON zb.doc_id = c.b
  WHERE CAST(ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                   / (za.sz + zb.sz - COALESCE(i.n_inter, 0)) * 1000000.0)
             AS BIGINT) >= {JACCARD_MIN_MICRO}
)
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '),
                            t -> length(t) > 0)) AS BIGINT) AS n_words
FROM corpus
WHERE doc_id NOT IN (SELECT doc_id FROM drop_near)
  AND len(list_filter(string_split(text, ' '), t -> length(t) > 0))
      >= {CURATE_MIN_WORDS}
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over the real tokenize kernel's (term, tf)."""
    tokens = B.token_counts(_docs(spark, sf_dir))
    return D.simhash32(tokens)


def sql_simhash() -> str:
    return f"""
WITH {TOKS_CTE},
bits AS (
  SELECT doc_id, r.pos,
         SUM(CASE WHEN (((strpos('0123456789abcdef',
                                 substr(md5(term), r.pos // 4 + 1, 1)) - 1)
                         >> (3 - r.pos % 4)) % 2) = 1
                  THEN tf ELSE -tf END) AS s
  FROM toks CROSS JOIN (SELECT unnest(range(0, 32)) AS pos) r
  GROUP BY doc_id, r.pos
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << (31 - pos)
                     ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-ball SimHash pairing (Manku et al. 2007,
    dedup.py::simhash_near_dup_pairs) over the near-dup corpus: every
    pair at Hamming distance <= 3 via pigeonhole band blocking.  The
    cap is lifted for the gate so the oracle is the clean all-pairs
    Hamming predicate (pigeonhole makes blocking lossless at k=3 with
    4 bands).  Gated on a 1/5 doc sample: the synthetic corpus draws
    every doc from one vocabulary, so 32-bit fingerprints cluster far
    more tightly than real web text — unsampled, ~0.6% of ALL pairs
    qualify at k=3 and the gate's row count is quadratic noise, not
    signal."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
    fp = D.simhash32(B.token_counts(_with_near_dups(docs)))
    return D.simhash_near_dup_pairs(fp, k=3, n_tables=4, max_bucket=100_000)


def sql_simhash_near_dup() -> str:
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + {DUP_OFFSET} AS doc_id,
         substr(text, strpos(text, ' ') + 1) AS text
  FROM documents WHERE doc_id % 5 = 0 AND doc_id % 7 = 0
),
toks AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM corpus) u
  WHERE LENGTH(term) > 1
  GROUP BY doc_id, term
),
bits AS (
  SELECT doc_id, r.pos,
         SUM(CASE WHEN (((strpos('0123456789abcdef',
                                 substr(md5(term), r.pos // 4 + 1, 1)) - 1)
                         >> (3 - r.pos % 4)) % 2) = 1
                  THEN tf ELSE -tf END) AS s
  FROM toks CROSS JOIN (SELECT unnest(range(0, 32)) AS pos) r
  GROUP BY doc_id, r.pos
),
fp AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << (31 - pos)
                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS dist
FROM fp x JOIN fp y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard for all sampled-doc pairs sharing a
    source partition (the blocked all-pairs pattern: block key bounds
    the quadratic join)."""
    full = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sample = full.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text", "source")
    pairs = (
        sample.select(F.col("doc_id").alias("a"), F.col("source").alias("src"))
        .join(sample.select(F.col("doc_id").alias("b"), F.col("source").alias("src")), "src")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    sh = D.word_shingles(sample.select("doc_id", "text"), n=3)
    return D.jaccard_for_pairs(pairs, sh)


def sql_ngram_jaccard_pairs() -> str:
    return """
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
sample AS (SELECT doc_id, source FROM documents WHERE doc_id % 10 = 0),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> array_to_string(w[i:i+2], ' '))) AS shingle
  FROM (SELECT doc_id, list_filter(string_split(text, ' '),
                                   t -> length(t) > 0) AS w FROM corpus)
  WHERE len(w) >= 3
),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM sample x JOIN sample y ON x.source = y.source AND x.doc_id < y.doc_id
),
inter AS (
  SELECT c.a, c.b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id)
SELECT c.a, c.b,
       CAST(ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                  / (za.sz + zb.sz - COALESCE(i.n_inter, 0)) * 1000000.0)
            AS BIGINT) AS jaccard_micro
FROM cand c
LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN sz za ON za.doc_id = c.a
JOIN sz zb ON zb.doc_id = c.b
"""


# ---------------------------------------------------------------------------
# similarity / ANN gates
# ---------------------------------------------------------------------------

def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") == ANN_QUERY_VEC_ID)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row.embedding]


def _rerank_vec(res: DataFrame, k: int) -> DataFrame:
    return (
        res.select("vec_id", F.round(F.col("score") * 1e6).cast("long").alias("score_micro"))
        .orderBy(F.desc("score_micro"), F.asc("vec_id"))
        .limit(k)
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k (the ANN correctness baseline)."""
    qv = _query_vec(spark, sf_dir)
    raw = S.cosine_topk(_emb(spark, sf_dir), qv, k=ANN_K * 5)
    return _rerank_vec(
        raw.select("vec_id", "score"), ANN_K)


_SQL_EMB_COMPS = f"""
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {ANN_QUERY_VEC_ID}),
qcomps AS (SELECT CAST(unnest(qe) AS DOUBLE) AS e,
                  generate_subscripts(qe, 1) AS pos FROM q),
qn AS (SELECT SQRT(SUM(e * e)) AS n FROM qcomps),
comps AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS e,
                 generate_subscripts(embedding, 1) AS pos FROM embeddings)"""


def sql_ann_cosine_topk() -> str:
    return f"""
WITH {_SQL_EMB_COMPS},
dots AS (
  SELECT a.vec_id, SUM(a.e * b.e) AS dot, SQRT(SUM(a.e * a.e)) AS dn
  FROM comps a JOIN qcomps b USING (pos) GROUP BY a.vec_id
)
SELECT vec_id,
       CAST(ROUND(CASE WHEN dn > 0 AND qn.n > 0 THEN dot / dn / qn.n
                       ELSE 0.0 END * 1000000) AS BIGINT) AS score_micro
FROM dots CROSS JOIN qn
ORDER BY score_micro DESC, vec_id ASC LIMIT {ANN_K}
"""


EMB_DUP_OFFSET_EXACT = 100_000
EMB_DUP_OFFSET_MIXED = 200_000
EMB_NEAR_DUP_MIN = 0.4


def _with_vector_dups(emb: DataFrame) -> DataFrame:
    """Planted embedding near-dups, arithmetic-free (slices/copies of
    existing float values — bit-identical across engines): exact copies
    of vec_id<10, and half-spliced vectors (first half of v, second
    half of v+1, cosine ~0.5 vs the parent) for vec_id<30."""
    base = emb.select("vec_id", "embedding", "label")
    exact = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + EMB_DUP_OFFSET_EXACT).alias("vec_id"),
        "embedding", "label")
    nxt = emb.select((F.col("vec_id") - 1).alias("vec_id"),
                     F.col("embedding").alias("emb_next"))
    mixed = (
        emb.filter(F.col("vec_id") < 30).join(nxt, "vec_id")
        .select(
            (F.col("vec_id") + EMB_DUP_OFFSET_MIXED).alias("vec_id"),
            F.concat(F.slice("embedding", 1, 32),
                     F.slice("emb_next", 33, 32)).alias("embedding"),
            "label",
        )
    )
    return base.unionByName(exact).unionByName(mixed)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: exact cosine >= 0.4 within each
    label block (blocked-exact — the IVF-bucket pattern at scale)."""
    emb = _with_vector_dups(_emb(spark, sf_dir))
    return S.embedding_near_dup_pairs(emb, threshold=EMB_NEAR_DUP_MIN)


SRP_BITS = 32
SRP_K, SRP_TABLES = 3, 4


def q_srp_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP cosine sketch (similarity.py::srp_signatures, Charikar
    2002) + the Manku pigeonhole blocker (dedup.py::
    simhash_near_dup_pairs) over the dup-injected embeddings — the
    all-float-free embedding near-dup path.  Exact vector copies have
    identical signatures (dist 0) and MUST pair; the oracle recomputes
    the md5-parity projections, the signatures, and the all-pairs
    Hamming filter in SQL."""
    from .operators.dedup import simhash_near_dup_pairs
    from .operators.similarity import srp_signatures

    emb = _with_vector_dups(spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")))
    sigs = srp_signatures(emb, dim=64, n_bits=SRP_BITS)
    return simhash_near_dup_pairs(
        sigs.select(F.col("vec_id").alias("doc_id"), "simhash"),
        k=SRP_K, n_tables=SRP_TABLES, bits=SRP_BITS)


def sql_srp_near_dup() -> str:
    return f"""
WITH emb2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {EMB_DUP_OFFSET_EXACT}, embedding
  FROM embeddings WHERE vec_id < 10
  UNION ALL
  SELECT a.vec_id + {EMB_DUP_OFFSET_MIXED},
         a.embedding[1:32] || b.embedding[33:64]
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id < 30
),
comps AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS e,
                 generate_subscripts(embedding, 1) - 1 AS d FROM emb2),
bits AS (
  SELECT c.vec_id, r.i,
         CASE WHEN SUM(c.e * (CASE WHEN ('0x' || substr(md5(
                    CAST(r.i AS VARCHAR) || ':' || CAST(c.d AS VARCHAR)),
                    1, 8))::BIGINT % 2 = 0 THEN 1 ELSE -1 END)) >= 0
              THEN 1 ELSE 0 END AS b
  FROM comps c CROSS JOIN (SELECT unnest(range(0, {SRP_BITS})) AS i) r
  GROUP BY c.vec_id, r.i
),
sig AS (
  SELECT vec_id,
         CAST(SUM(b * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS simhash
  FROM bits GROUP BY vec_id
)
SELECT x.vec_id AS a, y.vec_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS dist
FROM sig x JOIN sig y ON x.vec_id < y.vec_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {SRP_K}
"""


def sql_embedding_near_dup() -> str:
    return f"""
WITH emb2 AS (
  SELECT vec_id, embedding, label FROM embeddings
  UNION ALL
  SELECT vec_id + {EMB_DUP_OFFSET_EXACT}, embedding, label
  FROM embeddings WHERE vec_id < 10
  UNION ALL
  SELECT a.vec_id + {EMB_DUP_OFFSET_MIXED},
         a.embedding[1:32] || b.embedding[33:64], a.label
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id < 30
),
comps AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS e,
                 generate_subscripts(embedding, 1) AS pos FROM emb2),
norms AS (SELECT vec_id, SQRT(SUM(e * e)) AS n FROM comps GROUP BY vec_id),
dots AS (
  SELECT x.vec_id AS a, y.vec_id AS b, SUM(x.e * y.e) AS dot
  FROM comps x JOIN comps y ON x.pos = y.pos AND x.label = y.label
                           AND x.vec_id < y.vec_id
  GROUP BY x.vec_id, y.vec_id
)
SELECT d.a, d.b,
       CAST(ROUND(CASE WHEN na.n > 0 AND nb.n > 0
                       THEN d.dot / na.n / nb.n ELSE 0.0 END * 1000000)
            AS BIGINT) AS cosine_micro
FROM dots d JOIN norms na ON na.vec_id = d.a JOIN norms nb ON nb.vec_id = d.b
WHERE CAST(ROUND(CASE WHEN na.n > 0 AND nb.n > 0
                      THEN d.dot / na.n / nb.n ELSE 0.0 END * 1000000)
           AS BIGINT) >= {int(EMB_NEAR_DUP_MIN * 1e6)}
"""


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe the 3 nearest label-partition centroids,
    exact cosine within probed partitions only."""
    qv = _query_vec(spark, sf_dir)
    raw = S.ivf_topk(_emb(spark, sf_dir), qv, k=ANN_K * 5, n_probe=IVF_PROBES)
    return _rerank_vec(raw.select("vec_id", "score"), ANN_K)


def sql_ann_ivf_topk() -> str:
    return f"""
WITH {_SQL_EMB_COMPS},
cent AS (SELECT label, pos, AVG(e) AS c FROM comps GROUP BY label, pos),
cdots AS (
  SELECT label, CAST(ROUND(SUM(cent.c * b.e) * 1000000) AS BIGINT) AS dot_micro
  FROM cent JOIN qcomps b USING (pos) GROUP BY label
),
probes AS (SELECT label FROM cdots ORDER BY dot_micro DESC, label ASC LIMIT {IVF_PROBES}),
dots AS (
  SELECT a.vec_id, SUM(a.e * b.e) AS dot, SQRT(SUM(a.e * a.e)) AS dn
  FROM comps a JOIN qcomps b USING (pos)
  WHERE a.label IN (SELECT label FROM probes)
  GROUP BY a.vec_id
)
SELECT vec_id,
       CAST(ROUND(CASE WHEN dn > 0 AND qn.n > 0 THEN dot / dn / qn.n
                       ELSE 0.0 END * 1000000) AS BIGINT) AS score_micro
FROM dots CROSS JOIN qn
ORDER BY score_micro DESC, vec_id ASC LIMIT {ANN_K}
"""


MMR_K, MMR_N = 5, 25
MMR_LAM_NUM, MMR_LAM_DEN = 7, 10


def q_ann_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-k (similarity.py::mmr_rerank, Carbonell &
    Goldstein 1998) over the exact-cosine top-25 candidates, lam=0.7.
    The oracle unrolls the greedy integer-objective selection step by
    step, so a hash match proves the full pick SEQUENCE (ranks and
    objective values), not just the final set."""
    qv = _query_vec(spark, sf_dir)
    return S.mmr_rerank(_emb(spark, sf_dir), qv, k=MMR_K,
                        n_candidates=MMR_N, lam_num=MMR_LAM_NUM,
                        lam_den=MMR_LAM_DEN)


def sql_ann_mmr_topk() -> str:
    diff = MMR_LAM_DEN - MMR_LAM_NUM
    steps = [f"""s1 AS (SELECT vec_id, {MMR_LAM_NUM} * rel_micro AS obj_micro
  FROM cand ORDER BY rel_micro DESC, vec_id ASC LIMIT 1),
sel1 AS (SELECT vec_id FROM s1)"""]
    for i in range(2, MMR_K + 1):
        steps.append(f"""r{i} AS (
  SELECT c.vec_id,
         {MMR_LAM_NUM} * c.rel_micro - {diff} * (
           SELECT MAX(p.sim_micro) FROM pairs p
           WHERE p.a = c.vec_id
             AND p.b IN (SELECT vec_id FROM sel{i - 1})
         ) AS obj_micro
  FROM cand c
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})),
s{i} AS (SELECT vec_id, obj_micro FROM r{i}
  ORDER BY obj_micro DESC, vec_id ASC LIMIT 1),
sel{i} AS (SELECT vec_id FROM sel{i - 1}
  UNION ALL SELECT vec_id FROM s{i})""")
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS sel_rank, vec_id, obj_micro FROM s{i}"
        for i in range(1, MMR_K + 1))
    joined_steps = ",\n".join(steps)
    return f"""
WITH {_SQL_EMB_COMPS},
rdots AS (
  SELECT a.vec_id, SUM(a.e * b.e) AS dot, SQRT(SUM(a.e * a.e)) AS dn
  FROM comps a JOIN qcomps b USING (pos) GROUP BY a.vec_id),
cand AS (
  SELECT vec_id,
         CAST(ROUND(CASE WHEN dn > 0 AND qn.n > 0 THEN dot / dn / qn.n
                         ELSE 0.0 END * 1000000) AS BIGINT) AS rel_micro
  FROM rdots CROSS JOIN qn
  ORDER BY rel_micro DESC, vec_id ASC LIMIT {MMR_N}),
ccomps AS (SELECT comps.vec_id, e, pos FROM comps JOIN cand USING (vec_id)),
norms AS (SELECT vec_id, SQRT(SUM(e * e)) AS n FROM ccomps GROUP BY vec_id),
pdots AS (
  SELECT x.vec_id AS a, y.vec_id AS b, SUM(x.e * y.e) AS dot
  FROM ccomps x JOIN ccomps y ON x.pos = y.pos AND x.vec_id <> y.vec_id
  GROUP BY x.vec_id, y.vec_id),
pairs AS (
  SELECT a, b,
         CAST(ROUND(CASE WHEN na.n > 0 AND nb.n > 0
                         THEN dot / na.n / nb.n ELSE 0.0 END * 1000000)
              AS BIGINT) AS sim_micro
  FROM pdots JOIN norms na ON na.vec_id = a JOIN norms nb ON nb.vec_id = b),
{joined_steps}
{union}
"""


# ---------------------------------------------------------------------------
# text-analysis gates
# ---------------------------------------------------------------------------

_SQL_STOPLIST = "[{}]".format(", ".join(f"'{w}'" for w in sorted(STOPWORDS)))
_SQL_W = "list_filter(string_split(text, ' '), t -> length(t) > 0)"


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.lang_id(_docs(spark, sf_dir))


# deterministic non-NFC suffixes injected per doc_id residue: combining
# acute (café), combining ring (Å), and an already-NFC
# control group — byte-identical literals on both engines
_NFC_RAW = "café Å"
_NFC_PRE = "café Å"


def q_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (operators/textstats.py::
    nfc_normalize): docs get deterministic combining-sequence suffixes
    (doc_id % 3 == 0) or precomposed ones (% 3 == 1); normalization
    must agree with DuckDB's nfc_normalize byte-for-byte (md5)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"), F.lit(" " + _NFC_RAW)))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.col("text"), F.lit(" " + _NFC_PRE)))
        .otherwise(F.col("text")).alias("text"))
    out = X.nfc_normalize(docs)
    return out.select(
        "doc_id", "was_nfc", "bytes_before", "bytes_after",
        F.md5(F.col("norm_text").cast("binary")).alias("norm_md5"))


def sql_unicode_nfc() -> str:
    return f"""
WITH salted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || ' {_NFC_RAW}'
              WHEN doc_id % 3 = 1 THEN text || ' {_NFC_PRE}'
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(text = nfc_normalize(text) AS INT) AS was_nfc,
       CAST(strlen(text) AS BIGINT) AS bytes_before,
       CAST(strlen(nfc_normalize(text)) AS BIGINT) AS bytes_after,
       md5(nfc_normalize(text)) AS norm_md5
FROM salted
"""


def sql_lang_id() -> str:
    return f"""
WITH feats AS (
  SELECT doc_id, len(w) AS n_tok,
         len(list_filter(w, t -> list_contains({_SQL_STOPLIST}, t))) AS n_stop
  FROM (SELECT doc_id, {_SQL_W} AS w FROM documents)
)
SELECT doc_id,
       CASE WHEN n_tok > 0 AND CAST(n_stop AS DOUBLE) / n_tok >= 0.05
            THEN 'en' ELSE 'und' END AS lang_pred,
       CAST(ROUND(CASE WHEN n_tok > 0 THEN CAST(n_stop AS DOUBLE) / n_tok
                       ELSE 0.0 END * 1000000) AS BIGINT) AS stop_ratio_micro
FROM feats
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.quality_scores(_docs(spark, sf_dir))


def sql_quality_score() -> str:
    return f"""
WITH feats AS (
  SELECT doc_id,
         CAST(len(w) AS DOUBLE) AS n_tok,
         CASE WHEN len(w) > 0
              THEN CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / len(w)
              ELSE 0.0 END AS mean_len,
         CASE WHEN len(w) > 0
              THEN CAST(len(list_filter(w, t -> list_contains({_SQL_STOPLIST}, t))) AS DOUBLE) / len(w)
              ELSE 0.0 END AS stop_ratio,
         CASE WHEN len(w) > 0
              THEN CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
              ELSE 0.0 END AS ttr
  FROM (SELECT doc_id, {_SQL_W} AS w FROM documents)
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(ROUND(mean_len * 1000000) AS BIGINT) AS mean_token_len_micro,
       CAST(ROUND(stop_ratio * 1000000) AS BIGINT) AS stop_ratio_micro,
       CAST(ROUND(ttr * 1000000) AS BIGINT) AS ttr_micro,
       CAST(mean_len BETWEEN 3.0 AND 10.0
            AND stop_ratio BETWEEN 0.01 AND 0.5
            AND ttr BETWEEN 0.2 AND 1.0
            AND n_tok >= 10 AS INT) AS keep
FROM feats
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.token_stats(_docs(spark, sf_dir))


def sql_token_stats() -> str:
    return f"""
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_ws_tokens,
       CAST(COALESCE(list_sum(list_transform(w, t -> CAST(CEIL(length(t) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_chunks,
       CAST(LENGTH(text) AS BIGINT) AS n_chars
FROM (SELECT doc_id, text, {_SQL_W} AS w FROM documents)
"""


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth profile at quartile prefixes of
    the corpus (textstats.py::vocab_growth) over the full index token
    relation — one pass over tokens for all checkpoints."""
    from .gates import _read_documents
    from .operators import build as B

    docs = _read_documents(spark, sf_dir).select("doc_id", "text")
    n = docs.count()
    cps = sorted({max(1, (n * i) // 4) for i in (1, 2, 3, 4)})
    toks = B.token_counts(docs)
    return X.vocab_growth(toks, cps)


def sql_vocab_growth() -> str:
    return f"""
WITH {TOKS_CTE},
cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
cp AS (SELECT DISTINCT GREATEST(1, (cnt.n * v.i) // 4) AS n_docs
       FROM cnt, (VALUES (1), (2), (3), (4)) v(i)),
first_seen AS (SELECT term, MIN(doc_id) AS first_doc FROM toks GROUP BY term),
vocab AS (
  SELECT cp.n_docs, CAST(COUNT(*) AS BIGINT) AS vocab_size
  FROM first_seen f JOIN cp ON f.first_doc < cp.n_docs
  GROUP BY cp.n_docs),
doclens AS (SELECT doc_id, SUM(tf) AS dl FROM toks GROUP BY doc_id),
mass AS (
  SELECT cp.n_docs, CAST(SUM(d.dl) AS BIGINT) AS n_tokens
  FROM doclens d JOIN cp ON d.doc_id < cp.n_docs
  GROUP BY cp.n_docs)
SELECT cp.n_docs,
       COALESCE(m.n_tokens, 0) AS n_tokens,
       COALESCE(v.vocab_size, 0) AS vocab_size
FROM cp LEFT JOIN mass m USING (n_docs) LEFT JOIN vocab v USING (n_docs)
"""


def q_pretoken_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenizer counts (textstats.py::pretoken_stats):
    alphabetic / digit / punctuation run counts from ONE
    regexp_extract_all pass — the subword token-budget estimator.
    Java regex and DuckDB RE2 agree on the lookahead-free classes
    (parity probed before the pattern was frozen)."""
    return X.pretoken_stats(_docs(spark, sf_dir))


def sql_pretoken_stats() -> str:
    from .operators.textstats import BPE_PRETOKEN_RE

    # DuckDB string literals do NOT process backslash escapes — the
    # raw pattern goes in verbatim (parity-probed)
    pat = BPE_PRETOKEN_RE
    return f"""
SELECT doc_id,
       CAST(len(p) AS BIGINT) AS n_pretokens,
       CAST(len(list_filter(p, t -> regexp_full_match(t, '[A-Za-z]+'))) AS BIGINT) AS n_alpha,
       CAST(len(list_filter(p, t -> regexp_full_match(t, '[0-9]+'))) AS BIGINT) AS n_num,
       CAST(len(list_filter(p, t -> regexp_full_match(t, '[^A-Za-z0-9\\s]+'))) AS BIGINT) AS n_punct
FROM (SELECT doc_id, regexp_extract_all(text, '{pat}') AS p FROM documents)
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.fingerprints(_docs(spark, sf_dir))


def sql_doc_fingerprint() -> str:
    return """
WITH grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, length(text) - 6),
                               i -> substr(text, i, 8))) AS gram
  FROM documents WHERE length(text) >= 8
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
       MIN(md5(gram)) AS min_gram_md5
FROM grams GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# multimodal plumbing gates
# ---------------------------------------------------------------------------

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing: documents' text bytes stand in
    for an image payload; the Arrow kernel extracts metadata (decode
    itself stubbed — see operators/multimodal.py)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.col("text").cast("binary").alias("payload"))
    return M.decode_image_meta(docs)


def sql_multimodal_meta() -> str:
    # mirrors _fake_decode: width = n%640+1, height = (n*7)%480+1
    return """
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_bytes,
       CAST(LENGTH(text) % 640 + 1 AS INT) AS width,
       CAST((LENGTH(text) * 7) % 480 + 1 AS INT) AS height,
       'fake' AS format
FROM documents
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing: payload -> pseudo-embedding (STUB
    encoder), exploded to (doc_id, pos, feature_micro)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.col("text").cast("binary").alias("payload"))
    feats = M.extract_features(docs)
    return feats.select(
        "doc_id", F.posexplode("features").alias("pos", "v")
    ).select("doc_id", "pos",
             F.round(F.col("v") * 1e6).cast("long").alias("feature_micro"))


def sql_multimodal_features() -> str:
    return f"""
SELECT doc_id, CAST(j AS INT) AS pos,
       ((('0x' || substr(md5(text || ':' || j), 1, 8))::BIGINT % 2000001)
        - 1000000) AS feature_micro
FROM documents CROSS JOIN (SELECT unnest(range(0, {M.FEATURE_DIM})) AS j)
"""


def _synth_image_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic spec-conformant 24-bpp BMP per doc (geometry a
    pure function of doc_id) — REAL binary fixtures for the real
    decoder."""
    import pandas as pd

    docs = _docs(spark, sf_dir).select("doc_id")

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [M.synth_bmp(int(d) % 64 + 1, int(d) % 48 + 1,
                                        seed=int(d))
                            for d in pdf["doc_id"]],
            })

    return docs.mapInPandas(synth, "doc_id long, payload binary")


def _synth_png_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 8-bit PNG per doc — REAL zlib-compressed,
    filter-cycled binary fixtures (multimodal.py::synth_png).  Width/
    height/color type are pure functions of doc_id; h >= 5 guarantees
    every scanline filter type (None/Sub/Up/Average/Paeth) occurs in
    every file."""
    import pandas as pd

    docs = _docs(spark, sf_dir).select("doc_id")
    cts = (0, 2, 4, 6)

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [M.synth_png(int(d) % 13 + 3, int(d) % 9 + 5,
                                        seed=int(d),
                                        color_type=cts[int(d) % 4])
                            for d in pdf["doc_id"]],
            })

    return docs.mapInPandas(synth, "doc_id long, payload binary")


def q_multimodal_png_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG pixel decode: zlib inflate + Sub/Up/Average/Paeth
    unfiltering of actual bytes (multimodal.py::decode_png_pixels),
    reduced to per-channel statistics.  The oracle never sees the
    PNG — it recomputes the stats from the closed-form pixel formula,
    so a match proves the decode inverts the encode bit-for-bit."""
    return M.image_pixel_stats(_synth_png_payloads(spark, sf_dir))


def sql_multimodal_png_pixels() -> str:
    # pixel(c, x, y) = (doc_id*7 + cc*11 + x*3 + y*5) % 256 with
    # cc = min(c, channels-1); grayscale repeats across mean_r/g/b
    return """
WITH geo AS (
  SELECT doc_id, doc_id % 13 + 3 AS w, doc_id % 9 + 5 AS h,
         CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 3
              WHEN 2 THEN 2 ELSE 4 END AS ch
  FROM documents
),
px AS (
  -- c ranges 0..3 so the RGBA alpha channel reaches min/max
  -- (v_all); the mean column maps onto COLOR channels only —
  -- gray/gray-alpha repeat channel 0 across r/g/b (alpha must not
  -- leak into mean_g/mean_b for 2-channel images)
  SELECT g.doc_id, g.w, g.h, g.ch, c.c,
         (g.doc_id * 7
          + least(c.c, CASE WHEN g.ch <= 2 THEN 0 ELSE 2 END) * 11
          + x.x * 3 + y.y * 5) % 256 AS v_mean,
         (g.doc_id * 7 + least(c.c, g.ch - 1) * 11 + x.x * 3 + y.y * 5)
           % 256 AS v_all
  FROM geo g
  CROSS JOIN (SELECT unnest(range(0, 4)) AS c) c
  JOIN LATERAL (SELECT unnest(range(0, g.w)) AS x) x ON true
  JOIN LATERAL (SELECT unnest(range(0, g.h)) AS y) y ON true
),
chan AS (
  SELECT doc_id, w, h, ch, c,
         CAST(FLOOR(CAST(SUM(v_mean) AS DOUBLE) / (w * h) * 1000000 + 0.5)
              AS BIGINT) AS mean_micro,
         MIN(v_all) AS mn, MAX(v_all) AS mx
  FROM px GROUP BY doc_id, w, h, ch, c
)
SELECT doc_id,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(MAX(ch) AS INT) AS channels,
       MAX(CASE WHEN c = 0 THEN mean_micro END) AS mean_r_micro,
       MAX(CASE WHEN c = 1 THEN mean_micro END) AS mean_g_micro,
       MAX(CASE WHEN c = 2 THEN mean_micro END) AS mean_b_micro,
       CAST(MIN(mn) AS INT) AS min_px,
       CAST(MAX(mx) AS INT) AS max_px
FROM chan GROUP BY doc_id
"""


_WARC_MEMO: dict[tuple, str] = {}
_WARC_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _warc_gate_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write the documents table as REAL WARC files (4 files, half of
    them gzipped) into a memoized temp dir.  The driver-side collect
    is gate plumbing over the 500-row gate corpus — the SCALE path
    under test is the read side (sources/warc.py::read_warc, one task
    per file)."""
    import datetime
    import tempfile

    from .sources.warc import synth_warc

    key = (id(spark), sf_dir)
    if key not in _WARC_MEMO:
        d = tempfile.mkdtemp(prefix="ir_spark_warc_gate_")
        rows = (spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "source", "text").collect())
        base = datetime.datetime(2024, 1, 1)
        files: dict[int, list] = {}
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            did = int(r["doc_id"])
            ts = (base + datetime.timedelta(days=did % 365, hours=did % 24)
                  ).strftime("%Y-%m-%dT%H:%M:%SZ")
            files.setdefault(did % 4, []).append((
                f"https://{r['source']}.example/d/{did}", ts,
                f"<html><body>{r['text']}</body></html>".encode()))
        for part, recs in files.items():
            gz = part % 2 == 1
            name = f"part-{part}.warc" + (".gz" if gz else "")
            with open(os.path.join(d, name), "wb") as f:
                f.write(synth_warc(recs, gzip_file=gz))
        _WARC_MEMO[key] = d
    return _WARC_MEMO[key]


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl container source: documents written as REAL WARC
    files (incl. gzipped), read back through sources/warc.py::read_warc
    — url, capture timestamp, and the exact html bytes must all
    survive the container roundtrip (oracle recomputes them from the
    synthesis formula)."""
    from .sources.warc import read_warc

    w = read_warc(spark, _warc_gate_dir(spark, sf_dir))
    return w.select(
        "url",
        F.unix_timestamp("warc_ts").cast("long").alias("ts_epoch"),
        F.md5("html").alias("html_md5"),
    )


def sql_warc_roundtrip() -> str:
    return f"""
SELECT 'https://' || source || '.example/d/' || doc_id AS url,
       CAST({_WARC_EPOCH} + (doc_id % 365) * 86400
            + (doc_id % 24) * 3600 AS BIGINT) AS ts_epoch,
       md5('<html><body>' || text || '</body></html>') AS html_md5
FROM documents
"""


def q_multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode: synthesize a spec-conformant BMP per doc,
    then parse geometry back out of the actual bytes
    (operators/multimodal.py::decode_image — struct parsing, no codec
    lib).  The oracle recomputes the expected geometry and exact file
    size analytically from doc_id."""
    return M.decode_image_meta(_synth_image_payloads(spark, sf_dir))


def sql_multimodal_image_meta() -> str:
    # BMP file size: 54-byte headers + 4-byte-aligned 24bpp rows
    return """
SELECT doc_id,
       CAST(54 + ((3 * w + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       'bmp' AS format
FROM (SELECT doc_id, doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h
      FROM documents)
"""


def q_multimodal_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: synthesize a PCM16 RIFF/WAVE file per doc
    (alternating +/-amplitude samples), then walk the chunk list and
    compute numpy sample statistics from the actual PCM bytes
    (operators/multimodal.py::decode_wav).  Alternating samples make
    every statistic analytic: RMS = amplitude exactly, zero crossings
    = n_samples - 1."""
    import pandas as pd

    docs = _docs(spark, sf_dir).select("doc_id")

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [M.synth_wav(int(d) % 100 + 2,
                                        int(d) % 30000 + 1)
                            for d in pdf["doc_id"]],
            })

    payloads = docs.mapInPandas(synth, "doc_id long, payload binary")
    return M.decode_wav_meta(payloads).select(
        "doc_id", "n_bytes", "sample_rate", "n_samples", "duration_us",
        "rms_micro", "peak", "zero_crossings")


def sql_multimodal_wav_stats() -> str:
    return """
SELECT doc_id,
       CAST(44 + 2 * n AS BIGINT) AS n_bytes,
       CAST(16000 AS INT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000000 // 16000 AS BIGINT) AS duration_us,
       CAST(a * 1000000 AS BIGINT) AS rms_micro,
       CAST(a AS INT) AS peak,
       CAST(n - 1 AS BIGINT) AS zero_crossings
FROM (SELECT doc_id, doc_id % 100 + 2 AS n, doc_id % 30000 + 1 AS a
      FROM documents)
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan over the binary payload (every 256 bytes)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.col("text").cast("binary").alias("payload"))
    return M.frame_sample_plan(docs, every_n_bytes=256)


def sql_frame_sample() -> str:
    return """
SELECT doc_id, CAST(i AS INT) AS frame_no, CAST(i * 256 AS INT) AS byte_offset
FROM (SELECT doc_id, unnest(range(0, GREATEST(CAST(CEIL(LENGTH(text) / 256.0) AS BIGINT), 1))) AS i
      FROM documents)
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

IVF_INDEX_CELLS = 8
_IVF_MEMO: dict[tuple, str] = {}


def _ivf_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Memoized materialized IVF index (KMeans codebook + cell-
    partitioned vector store) over the embeddings table."""
    import tempfile

    key = (id(spark), sf_dir)
    if key not in _IVF_MEMO:
        d = tempfile.mkdtemp(prefix="ir_spark_ivf_")
        S.build_ivf_index(_emb(spark, sf_dir), d, n_cells=IVF_INDEX_CELLS,
                          max_iter=10, seed=42)
        _IVF_MEMO[key] = d
    return _IVF_MEMO[key]


def q_ann_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized IVF index end-to-end: KMeans codebook + cell-
    partitioned parquet store built once (memoized), then a probe.
    Probing ALL cells is exact brute force over the partitioned store,
    so the DuckDB brute-force oracle value-checks the whole
    build+assign+store+probe path; partial-probe directory pruning is
    plan-verified in pytest (PLANS.md §8)."""
    d = _ivf_index_dir(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    raw = S.ivf_index_topk(spark, d, qv, k=ANN_K * 5,
                           n_probe=IVF_INDEX_CELLS)
    return _rerank_vec(raw.select("vec_id", "score"), ANN_K)


def sql_ann_ivf_index_topk() -> str:
    return sql_ann_cosine_topk()


PQ_M, PQ_KSUB = 8, 16  # 64 dims -> 8 subspaces x 8 comps, 16 centroids


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (operators/similarity.py::
    pq_encode/pq_topk, Jégou et al. 2011): vectors compressed to m=8
    one-byte codes (32x), ranked by the LUT inner product.  The gate
    uses the deterministic SAMPLED codebook (sub-vectors of
    vec_id<16) so the oracle re-derives the exact codes; left-assoc
    float accumulation keeps argmin assignments engine-identical."""
    from .operators.similarity import pq_encode, pq_sampled_codebook, pq_topk

    emb = _emb(spark, sf_dir)
    books = pq_sampled_codebook(emb, m=PQ_M, ksub=PQ_KSUB)
    codes = pq_encode(emb, books)
    qv = _query_vec(spark, sf_dir)
    raw = pq_topk(codes, books, qv, k=ANN_K * 5)
    return _rerank_vec(raw.select("vec_id", "score"), ANN_K)


PQ_REFINE_OVERFETCH = 3


def q_ann_pq_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase PQ retrieval (similarity.py::pq_topk_refined, the
    Faiss IndexRefineFlat shape): ADC over the 8-byte codes keeps the
    top k*overfetch candidate ids, then ONLY those rows' full vectors
    are read back (broadcast semi-join) and reranked by exact cosine.
    Candidate selection is micro-quantized on BOTH engines so the
    candidate boundary is engine-deterministic; the returned scores
    are the exact cosine (not ADC), so this gate value-proves the
    refine join + rerank, not just the candidate sweep."""
    from .operators.similarity import (cosine_topk, pq_encode,
                                       pq_sampled_codebook, pq_scores)

    emb = _emb(spark, sf_dir)
    books = pq_sampled_codebook(emb, m=PQ_M, ksub=PQ_KSUB)
    codes = pq_encode(emb, books)
    qv = _query_vec(spark, sf_dir)
    cands = (
        pq_scores(codes, books, qv)
        .select("vec_id",
                F.round(F.col("score") * 1e6).cast("long").alias("adc_micro"))
        .orderBy(F.desc("adc_micro"), F.asc("vec_id"))
        .limit(ANN_K * PQ_REFINE_OVERFETCH)
        .select("vec_id"))
    pruned = emb.join(F.broadcast(cands), "vec_id")
    raw = cosine_topk(pruned, qv, k=ANN_K)
    return _rerank_vec(raw.select("vec_id", "score"), ANN_K)


def sql_ann_pq_refined_topk() -> str:
    ctes, score, joins = _sql_pq_parts()
    return f"""
WITH {ctes},
adc AS (
  SELECT e.vec_id,
         CAST(ROUND(({score}) * 1000000) AS BIGINT) AS adc_micro
  FROM embeddings e
  CROSS JOIN q
  {joins}
),
cand AS (SELECT vec_id FROM adc
         ORDER BY adc_micro DESC, vec_id ASC
         LIMIT {ANN_K * PQ_REFINE_OVERFETCH}),
rq AS (SELECT embedding AS qe FROM embeddings
       WHERE vec_id = {ANN_QUERY_VEC_ID}),
rqcomps AS (SELECT CAST(unnest(qe) AS DOUBLE) AS e,
                   generate_subscripts(qe, 1) AS pos FROM rq),
rqn AS (SELECT SQRT(SUM(e * e)) AS n FROM rqcomps),
rcomps AS (SELECT v.vec_id, CAST(unnest(v.embedding) AS DOUBLE) AS e,
                  generate_subscripts(v.embedding, 1) AS pos
           FROM embeddings v JOIN cand USING (vec_id)),
rdots AS (
  SELECT a.vec_id, SUM(a.e * b.e) AS dot, SQRT(SUM(a.e * a.e)) AS dn
  FROM rcomps a JOIN rqcomps b USING (pos) GROUP BY a.vec_id
)
SELECT vec_id,
       CAST(ROUND(CASE WHEN dn > 0 AND rqn.n > 0 THEN dot / dn / rqn.n
                       ELSE 0.0 END * 1000000) AS BIGINT) AS score_micro
FROM rdots CROSS JOIN rqn
ORDER BY score_micro DESC, vec_id ASC LIMIT {ANN_K}
"""


def _sql_pq_parts() -> tuple[str, str, str]:
    """Shared SQL machinery for the PQ oracles: (ctes, adc_score_expr,
    joins) replaying pq_sampled_codebook assignment + the ADC score for
    every vector, exactly as the Arrow kernels compute them."""
    m, ksub = PQ_M, PQ_KSUB
    dsub = 64 // m

    def el(tbl: str, col: str, j: int, i: int) -> str:
        return f"CAST({tbl}.{col}[{j * dsub + i + 1}] AS DOUBLE)"

    code_ctes, score_exprs, joins = [], [], []
    for j in range(m):
        dist = " + ".join(
            f"(({el('v', 'embedding', j, i)} - {el('c', 'embedding', j, i)})"
            f" * ({el('v', 'embedding', j, i)} - {el('c', 'embedding', j, i)}))"
            for i in range(dsub))
        code_ctes.append(f"""code{j} AS (
  SELECT vec_id, c FROM (
    SELECT v.vec_id, c.vec_id AS c,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist} ASC, c.vec_id ASC) AS rn
    FROM embeddings v CROSS JOIN cent c) _r{j}
  WHERE rn = 1)""")
        dot = " + ".join(
            f"({el('q', 'qe', j, i)} * {el('c', 'embedding', j, i)})"
            for i in range(dsub))
        score_exprs.append(f"({dot})")
        joins.append(f"JOIN code{j} ON code{j}.vec_id = e.vec_id "
                     f"JOIN cent c{j} ON c{j}.vec_id = code{j}.c")
    # rebind each subspace's centroid alias inside its dot expression
    score = " + ".join(
        expr.replace("c.embedding", f"c{j}.embedding")
        for j, expr in enumerate(score_exprs))
    ctes = f"""q AS (SELECT embedding AS qe FROM embeddings
           WHERE vec_id = {ANN_QUERY_VEC_ID}),
cent AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {ksub}),
{",".join(code_ctes)}"""
    return ctes, score, " ".join(joins)


def sql_ann_pq_topk() -> str:
    ctes, score, joins = _sql_pq_parts()
    return f"""
WITH {ctes}
SELECT e.vec_id,
       CAST(ROUND(({score}) * 1000000) AS BIGINT) AS score_micro
FROM embeddings e
CROSS JOIN q
{joins}
ORDER BY score_micro DESC, e.vec_id ASC LIMIT {ANN_K}
"""


HYBRID_K = 10


def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-10 (flagship query, DataFrame engine)
    fused with embedding-cosine top-10 via reciprocal-rank fusion.
    The driver testdata aligns ``embeddings.vec_id`` with
    ``documents.doc_id`` row-for-row, so the dense list re-keys
    directly.  Each source list is its own gated engine; fusion itself
    touches only the two top-N lists (no corpus access)."""
    from .gates import q_bm25_topk
    from .operators import hybrid as H

    lex = H.ranked(q_bm25_topk(spark, sf_dir), "score_micro")
    dense = H.ranked(
        q_ann_cosine_topk(spark, sf_dir).withColumnRenamed("vec_id", "doc_id"),
        "score_micro")
    return H.rrf_fuse([lex, dense], k=HYBRID_K)


def sql_hybrid_rrf_topk() -> str:
    from .gates import sql_bm25_topk
    from .operators.hybrid import RRF_C

    return f"""
WITH lex_base AS ({sql_bm25_topk()}),
dense_base AS ({sql_ann_cosine_topk()}),
lex AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS rnk
  FROM lex_base
),
dense AS (
  SELECT vec_id AS doc_id,
         ROW_NUMBER() OVER (ORDER BY score_micro DESC, vec_id) AS rnk
  FROM dense_base
),
fused AS (
  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
         CAST(ROUND((COALESCE(1.0 / ({RRF_C} + l.rnk), 0.0)
                     + COALESCE(1.0 / ({RRF_C} + d.rnk), 0.0)) * 1000000)
              AS BIGINT) AS rrf_micro
  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id, rrf_micro,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id) AS INT) AS rank
FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {HYBRID_K}
"""


def q_hybrid_combmnz_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-based hybrid fusion (operators/hybrid.py::combsum_fuse,
    CombMNZ): the same BM25 + dense top-10 lists as the RRF gate, but
    fused on min-max-normalized SCORES times the number of lists
    containing the doc — preserves within-list score gaps RRF
    discards."""
    from .gates import q_bm25_topk
    from .operators import hybrid as H

    lex = q_bm25_topk(spark, sf_dir)
    dense = q_ann_cosine_topk(spark, sf_dir).withColumnRenamed(
        "vec_id", "doc_id")
    return H.combsum_fuse([lex, dense], k=HYBRID_K, mnz=True)


def sql_hybrid_combmnz_topk() -> str:
    from .gates import sql_bm25_topk

    def norm(side: str) -> str:
        return f"""
{side} AS (
  SELECT doc_id,
         CASE WHEN MAX(score_micro) OVER () = MIN(score_micro) OVER ()
              THEN 1.0
              ELSE (CAST(score_micro AS DOUBLE) - MIN(score_micro) OVER ())
                   / (MAX(score_micro) OVER () - MIN(score_micro) OVER ())
         END AS ns
  FROM {side}_base
)"""

    return f"""
WITH lex_base AS ({sql_bm25_topk()}),
dense_base AS (SELECT vec_id AS doc_id, score_micro
               FROM ({sql_ann_cosine_topk()}) _d),
{norm("lex")},
{norm("dense")},
fused AS (
  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
         CAST(ROUND((COALESCE(l.ns, 0.0) + COALESCE(d.ns, 0.0))
                    * ((CASE WHEN l.doc_id IS NULL THEN 0 ELSE 1 END)
                       + (CASE WHEN d.doc_id IS NULL THEN 0 ELSE 1 END))
                    * 1000000) AS BIGINT) AS fused_micro
  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id, fused_micro,
       CAST(ROW_NUMBER() OVER (ORDER BY fused_micro DESC, doc_id) AS INT)
         AS rank
FROM fused ORDER BY fused_micro DESC, doc_id LIMIT {HYBRID_K}
"""


# ---------------------------------------------------------------------------
# corpus curation gates (decontamination / repetition / sampling / mix)
# ---------------------------------------------------------------------------

DECON_N = 4          # word n-gram width for the contamination check
DECON_BENCH_SRC = "src0"   # held-out "benchmark" slice of the corpus
SAMPLE_RATES = {"en": 0.5, "zh": 0.8}   # per-lang keep fractions


_HAN = "的一是不了人我在有他"  # 10-char alphabet for the CJK synthesis


def q_cjk_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CJK segmentation fallback (textstats.py::cjk_bigrams — Lucene
    CJKAnalyzer analogue): the corpus is Latin, so the gate derives a
    deterministic mixed-script text per doc (a Han run mapped from the
    first words' lengths + ' latin ' + one isolated Han char, which
    must index as a unigram) and recovers the bigram terms; the oracle
    rebuilds the same text and bigrams in SQL (both engines slice
    strings by codepoint)."""
    from .operators.textstats import cjk_bigrams

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", "text")
    zh = docs.select("doc_id", F.expr(
        f"concat(array_join(transform(slice(filter(split(text, ' '), "
        f"t -> length(t) > 0), 1, 4), w -> substring('{_HAN}', "
        f"(length(w) % 10) + 1, 1)), ''), ' latin ', "
        f"substring('{_HAN}', CAST(doc_id % 10 AS INT) + 1, 1))"
    ).alias("text"))
    return cjk_bigrams(zh)


def sql_cjk_bigrams() -> str:
    return f"""
WITH zh AS (
  SELECT doc_id,
         array_to_string(list_transform(
             list_filter(string_split(text, ' '),
                         t -> length(t) > 0)[1:4],
             w -> substr('{_HAN}', (length(w) % 10) + 1, 1)), '')
         || ' latin '
         || substr('{_HAN}', CAST(doc_id % 10 AS INT) + 1, 1) AS text
  FROM documents
),
runs AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text,
                '[\\x{{4e00}}-\\x{{9fff}}]+', 0)) AS r
  FROM zh
),
grams AS (
  SELECT doc_id,
         unnest(CASE WHEN length(r) < 2 THEN [r]
                ELSE list_transform(range(1, length(r)),
                                    i -> substr(r, i, 2)) END) AS term
  FROM runs
)
SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
FROM grams GROUP BY doc_id, term
"""


def q_host_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level curation profile (operators/corpus.py::host_profile)
    — the aggregation behind UT1/FineWeb-style host blocklists: doc
    counts, within-host exact-dup mass, mean token length, majority
    language per host."""
    from .operators.corpus import host_profile

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return host_profile(docs)


def sql_host_profile() -> str:
    return """
WITH base AS (
  SELECT source AS host, lang, md5(text) AS h,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> length(t) > 0)) AS DOUBLE) AS nt
  FROM documents
),
lc AS (SELECT host, lang, COUNT(*) AS c FROM base GROUP BY host, lang),
tl AS (
  SELECT host, lang AS top_lang
  FROM (SELECT host, lang,
               ROW_NUMBER() OVER (PARTITION BY host
                                  ORDER BY c DESC, lang ASC) AS rn
        FROM lc)
  WHERE rn = 1
),
prof AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_dup_docs,
         CAST(round(AVG(nt) * 1000000.0) AS BIGINT) AS mean_tokens_micro
  FROM base GROUP BY host
)
SELECT p.host, p.n_docs, p.n_dup_docs,
       CAST(round(p.n_dup_docs * 1000000.0 / p.n_docs) AS BIGINT)
         AS dup_frac_micro,
       p.mean_tokens_micro, t.top_lang
FROM prof p JOIN tl t ON t.host = p.host
"""


WSAMPLE_N = 100


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ES weighted sampling (operators/corpus.py::weighted_sample):
    top-100 docs by the deterministic ln(u)/w key, weights = n_chars
    (longer docs proportionally likelier).  Oracle recomputes the key
    and ordering in SQL."""
    from .operators.corpus import weighted_sample

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "n_chars")
    return weighted_sample(docs, weight_col="n_chars", n=WSAMPLE_N) \
        .select("doc_id", "sample_key_micro")


def sql_weighted_sample() -> str:
    return f"""
SELECT doc_id,
       CAST(round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      ::BIGINT + 1.0) / 4294967297.0)
                  / CAST(n_chars AS DOUBLE) * 1000000.0) AS BIGINT)
         AS sample_key_micro
FROM documents
WHERE n_chars > 0
ORDER BY sample_key_micro DESC, doc_id ASC
LIMIT {WSAMPLE_N}
"""


DECON_BLOOM_BITS = 1 << 16  # ~0.19 load at the gate's bench-gram count:
DECON_BLOOM_K = 5           # discriminative, with a few deterministic
#                             false positives still exercised


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-memory decontamination
    (operators/corpus.py::decontaminate_bloom): benchmark grams as a
    2^16-bit Bloom bitmap literal, corpus side a pure narrow map; the
    oracle recomputes the identical bit math from the bench grams (no
    false negatives by construction — pinned in pytest against the
    exact decontaminate)."""
    from .operators import corpus as C

    full = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    bench = full.filter(F.col("source") == DECON_BENCH_SRC).select(
        "doc_id", "text")
    corpus = full.filter(F.col("source") != DECON_BENCH_SRC).select(
        "doc_id", "text")
    return C.decontaminate_bloom(corpus, bench, n=DECON_N,
                                 n_hashes=DECON_BLOOM_K,
                                 n_bits=DECON_BLOOM_BITS)


def sql_decontaminate_bloom() -> str:
    k, m = DECON_BLOOM_K, DECON_BLOOM_BITS
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents
                WHERE source != '{DECON_BENCH_SRC}'),
bench AS (SELECT doc_id, text FROM documents
          WHERE source = '{DECON_BENCH_SRC}'),
cg AS (SELECT DISTINCT doc_id, g FROM ({_sql_ngrams(DECON_N, 'corpus')})),
bg AS (SELECT DISTINCT g FROM ({_sql_ngrams(DECON_N, 'bench')})),
bits AS (
  SELECT DISTINCT {_sql_hash_bucket('g', 'r.k', m)} AS bit
  FROM bg CROSS JOIN (SELECT unnest(range(0, {k})) AS k) r
),
probe AS (
  SELECT cg.doc_id, cg.g,
         CASE WHEN SUM(CASE WHEN b.bit IS NULL THEN 1 ELSE 0 END) = 0
              THEN 1 ELSE 0 END AS member
  FROM cg
  CROSS JOIN (SELECT unnest(range(0, {k})) AS k) r
  LEFT JOIN bits b ON b.bit = {_sql_hash_bucket('cg.g', 'r.k', m)}
  GROUP BY cg.doc_id, cg.g
),
agg AS (
  SELECT doc_id, CAST(SUM(member) AS BIGINT) AS n_bloom_hits,
         CAST(COUNT(*) AS BIGINT) AS n_grams
  FROM probe GROUP BY doc_id
)
SELECT doc_id, n_bloom_hits, n_grams,
       CAST(CASE WHEN n_bloom_hits > 0 THEN 1 ELSE 0 END AS INT)
         AS contaminated
FROM agg
"""


def _sql_ngrams(n: int, src: str = "corpus") -> str:
    """DuckDB CTE body producing NON-distinct word n-grams (doc_id, g)
    from ``src(doc_id, text)`` — mirror of corpus._gram_counts input."""
    return f"""
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - {n - 2}),
                               i -> array_to_string(w[i:i+{n - 1}], ' '))) AS g
  FROM (SELECT doc_id, list_filter(string_split(text, ' '),
                                   t -> length(t) > 0) AS w FROM {src})
  WHERE len(w) >= {n}"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import corpus as C

    full = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    bench = full.filter(F.col("source") == DECON_BENCH_SRC).select("doc_id", "text")
    corpus = full.filter(F.col("source") != DECON_BENCH_SRC).select("doc_id", "text")
    return C.decontaminate(corpus, bench, n=DECON_N)


def sql_decontaminate() -> str:
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE source != '{DECON_BENCH_SRC}'),
bench AS (SELECT doc_id, text FROM documents WHERE source = '{DECON_BENCH_SRC}'),
cg AS (SELECT DISTINCT doc_id, g FROM ({_sql_ngrams(DECON_N, 'corpus')})),
bg AS (SELECT DISTINCT g FROM ({_sql_ngrams(DECON_N, 'bench')})),
hits AS (
  SELECT cg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM cg JOIN bg USING (g) GROUP BY cg.doc_id
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM cg GROUP BY doc_id)
SELECT c.doc_id,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_contaminated_grams,
       CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_hit, 0) > 0 AS INT) AS contaminated
FROM (SELECT DISTINCT doc_id FROM corpus) c
LEFT JOIN sizes s ON s.doc_id = c.doc_id
LEFT JOIN hits h ON h.doc_id = c.doc_id
"""


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import corpus as C

    return C.repetition_profile(_docs(spark, sf_dir))


def sql_repetition_filter() -> str:
    from .operators.corpus import DUP_TRIGRAM_MAX, TOP_BIGRAM_MAX

    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
bi AS (SELECT doc_id, g, COUNT(*) AS cnt FROM ({_sql_ngrams(2)}) GROUP BY doc_id, g),
tri AS (SELECT doc_id, g, COUNT(*) AS cnt FROM ({_sql_ngrams(3)}) GROUP BY doc_id, g),
bia AS (
  SELECT doc_id, CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top_bigram_frac
  FROM bi GROUP BY doc_id
),
tria AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) / SUM(cnt)
           AS dup_trigram_frac
  FROM tri GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(ROUND(COALESCE(b.top_bigram_frac, 0.0) * 1000000) AS BIGINT)
         AS top_bigram_frac_micro,
       CAST(ROUND(COALESCE(t.dup_trigram_frac, 0.0) * 1000000) AS BIGINT)
         AS dup_trigram_frac_micro,
       CAST(COALESCE(b.top_bigram_frac, 0.0) <= {TOP_BIGRAM_MAX}
            AND COALESCE(t.dup_trigram_frac, 0.0) <= {DUP_TRIGRAM_MAX} AS INT) AS keep
FROM documents d
LEFT JOIN bia b ON b.doc_id = d.doc_id
LEFT JOIN tria t ON t.doc_id = d.doc_id
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import corpus as C

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return C.stratified_sample(docs, SAMPLE_RATES)


def sql_stratified_sample() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in sorted(SAMPLE_RATES.items()))
    return f"""
WITH keyed AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS key
  FROM documents
)
SELECT doc_id, lang,
       CAST(ROUND(key * 1000000) AS BIGINT) AS sample_key_micro
FROM keyed
WHERE key < CASE lang {cases} ELSE 1.0 END
"""


def q_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import corpus as C

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return C.mix_report(docs)


def sql_mix_report() -> str:
    return """
WITH per AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split(text, ' '), t -> length(t) > 0)))
              AS BIGINT) AS n_tokens,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars
  FROM documents GROUP BY lang
)
SELECT lang, n_docs, n_tokens, n_chars,
       CAST(ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () * 1000000)
            AS BIGINT) AS token_share_micro
FROM per
"""


DSIR_BUCKETS = 4096


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/corpus.py::dsir_importance):
    hashed unigram+bigram multinomials, target = every 5th doc (a
    stand-in curated seed set), raw = the whole table.  Weights
    micro-quantized for the value hash."""
    from .operators import corpus as C

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", "text")
    target = docs.filter(F.col("doc_id") % 5 == 0)
    w = C.dsir_importance(docs, target, n_buckets=DSIR_BUCKETS)
    return w.select(
        "doc_id",
        F.round(F.col("dsir_logw") * 1e6).cast("long").alias(
            "dsir_logw_micro"))


def sql_dsir_weights() -> str:
    b = DSIR_BUCKETS
    return f"""
WITH ts AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, UNNEST(t) AS gram FROM ts
  UNION ALL
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i + 1])) AS gram
  FROM ts
),
bg AS (
  SELECT doc_id,
         ('0x' || substr(md5(gram), 1, 8))::BIGINT % {b} AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM grams GROUP BY doc_id, b
),
tgt AS (SELECT b, SUM(cnt) AS tc FROM bg WHERE doc_id % 5 = 0 GROUP BY b),
rawd AS (SELECT b, SUM(cnt) AS rc FROM bg GROUP BY b),
tots AS (SELECT (SELECT SUM(tc) FROM tgt) AS tt,
                (SELECT SUM(rc) FROM rawd) AS rt),
ratio AS (
  SELECT r.b,
         LN((COALESCE(t.tc, 0) + 1.0) / (tots.tt + {b}.0))
       - LN((r.rc + 1.0) / (tots.rt + {b}.0)) AS lr
  FROM rawd r LEFT JOIN tgt t USING (b) CROSS JOIN tots
)
SELECT g.doc_id,
       CAST(ROUND(SUM(g.cnt * r.lr) * 1000000) AS BIGINT) AS dsir_logw_micro
FROM bg g JOIN ratio r USING (b)
GROUP BY g.doc_id
"""


DRIFT_BUCKETS = 4096


def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-slice distribution drift (operators/corpus.py::corpus_drift):
    Jensen-Shannon divergence in bits between each lang slice's
    hashed-unigram distribution and the pooled rest of the corpus —
    the pre-training telemetry that catches a source whose content
    mix silently changed between crawls."""
    from .operators import corpus as C

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    d = C.corpus_drift(docs, "lang", n_buckets=DRIFT_BUCKETS)
    return d.select(
        "slice", "n_slice_tokens",
        F.round(F.col("jsd_bits") * 1e6).cast("long").alias(
            "jsd_bits_micro"))


def sql_corpus_drift() -> str:
    b = DRIFT_BUCKETS
    return f"""
WITH toks AS (
  SELECT lang AS slice,
         UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
  FROM documents
),
sb AS (
  SELECT slice, ('0x' || substr(md5(tok), 1, 8))::BIGINT % {b} AS b,
         CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM toks GROUP BY slice, 2
),
gb AS (SELECT b, SUM(cnt) AS gcnt FROM sb GROUP BY b),
stot AS (SELECT slice, SUM(cnt) AS stot FROM sb GROUP BY slice),
gtot AS (SELECT SUM(gcnt) AS gtot FROM gb),
terms AS (
  SELECT s.slice, s.stot,
         COALESCE(x.cnt, 0) / s.stot AS p,
         (g.gcnt - COALESCE(x.cnt, 0)) / (t.gtot - s.stot) AS q
  FROM stot s CROSS JOIN gb g CROSS JOIN gtot t
  LEFT JOIN sb x ON x.slice = s.slice AND x.b = g.b
  WHERE t.gtot - s.stot > 0
)
SELECT slice, CAST(MAX(stot) AS BIGINT) AS n_slice_tokens,
       CAST(ROUND(SUM(
           CASE WHEN p > 0 THEN p * LN(p / ((p + q) / 2)) ELSE 0 END
         + CASE WHEN q > 0 THEN q * LN(q / ((p + q) / 2)) ELSE 0 END
       ) / (2 * LN(2)) * 1000000) AS BIGINT) AS jsd_bits_micro
FROM terms GROUP BY slice
"""


# --- bigram collocations (PMI) -----------------------------------------------

COLLOC_MIN_N, COLLOC_K = 5, 20


def q_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k adjacent-token collocations by pointwise mutual
    information (operators/ngrams.py) — tokenizer-vocabulary /
    boilerplate mining surface for training pipelines."""
    from .operators.ngrams import collocations

    return collocations(_docs(spark, sf_dir), min_count=COLLOC_MIN_N,
                        k=COLLOC_K)


def sql_collocations_pmi() -> str:
    return f"""
WITH seq AS (
  SELECT doc_id, term,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
  FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents)
  WHERE LENGTH(term) > 1
),
pairs AS (
  SELECT term AS w1,
         LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM seq),
big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs WHERE w2 IS NOT NULL GROUP BY w1, w2),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM big),
l AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS nl FROM big GROUP BY w1),
r AS (SELECT w2, CAST(SUM(n) AS BIGINT) AS nr FROM big GROUP BY w2)
SELECT b.w1, b.w2, b.n,
       CAST(ROUND(1000000.0 * LN(CAST(b.n AS DOUBLE) * t.t
                                 / (l.nl * r.nr))) AS BIGINT) AS pmi_micro
FROM big b JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tot t
WHERE b.n >= {COLLOC_MIN_N}
ORDER BY pmi_micro DESC, w1 ASC, w2 ASC LIMIT {COLLOC_K}
"""


QUANT_PROBS = [0.25, 0.5, 0.75, 0.95]


def q_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang token-count quantiles
    (operators/textstats.py::token_quantiles); the quantile array is
    flattened to scalar columns for the driver's value hash."""
    from .operators.textstats import token_quantiles

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    per = token_quantiles(docs, QUANT_PROBS)
    cols = [F.col("q_micro")[i].alias(f"p{int(p * 100)}_micro")
            for i, p in enumerate(QUANT_PROBS)]
    return per.select("lang", "n_docs", *cols)


def sql_token_quantiles() -> str:
    probs = ", ".join(str(p) for p in QUANT_PROBS)
    qcols = ",\n       ".join(
        f"CAST(ROUND(qs[{i + 1}] * 1000000) AS BIGINT) AS p{int(p * 100)}_micro"
        for i, p in enumerate(QUANT_PROBS))
    return f"""
WITH t AS (
  SELECT lang, len({_SQL_W}) AS n_tokens FROM documents
),
agg AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         quantile_cont(n_tokens, [{probs}]) AS qs
  FROM t GROUP BY lang
)
SELECT lang, n_docs,
       {qcols}
FROM agg
"""


PPL_TAU = 6.0


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram-LM perplexity filter
    (operators/textstats.py::bigram_nll)."""
    from .operators.textstats import bigram_nll

    return bigram_nll(_docs(spark, sf_dir), tau=PPL_TAU)


def sql_lm_perplexity(tau: float = PPL_TAU) -> str:
    w = "list_filter(string_split(text, ' '), t -> length(t) > 1)"
    return f"""
WITH d AS (SELECT doc_id, {w} AS w FROM documents),
uni AS (SELECT unnest(w) AS t FROM d),
c1 AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c1 FROM uni GROUP BY t),
v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM c1),
bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
         unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS w2
  FROM d WHERE len(w) >= 2
),
doc_bi AS (
  SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS n
  FROM bi GROUP BY doc_id, w1, w2
),
c2 AS (SELECT w1, w2, SUM(n) AS c2 FROM doc_bi GROUP BY w1, w2),
scored AS (
  SELECT b.doc_id, b.n,
         b.n * LN((c2.c2 + 1.0) / (c1.c1 + v.v)) AS nlp
  FROM doc_bi b
  JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
  JOIN c1 ON c1.t = b.w1
  CROSS JOIN v
),
per AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
         -SUM(nlp) / SUM(n) AS nll
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       CAST(ROUND(nll * 1000000) AS BIGINT) AS nll_micro,
       CAST(nll <= {tau} AS INT) AS keep
FROM per
"""


PACK_BUDGET = 2048


_PACK_MEMO: dict[tuple, DataFrame] = {}


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing plan (operators/corpus.py::pack_sequences):
    distributed prefix sum of whitespace token counts in doc_id order;
    the oracle computes the same stream layout with a single SQL
    window.  Memoized per (session, sf_dir) so pack_sequences'
    internal persist is created once, not leaked per invocation."""
    from .operators.corpus import pack_sequences

    key = (id(spark), sf_dir)
    if key not in _PACK_MEMO:
        docs = _docs(spark, sf_dir)
        nt = docs.select(
            "doc_id",
            F.size(F.filter(F.split(F.col("text"), " "),
                            lambda t: F.length(t) > 0)).alias("n_tokens"))
        _PACK_MEMO[key] = pack_sequences(nt, budget=PACK_BUDGET)
    return _PACK_MEMO[key]


def sql_sequence_pack(budget: int = PACK_BUDGET) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, CAST(len({_SQL_W}) AS BIGINT) AS n_tokens FROM documents
),
s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start
  FROM t
)
SELECT doc_id, n_tokens, start,
       start // {budget} AS bin_id,
       start % {budget} AS bin_offset
FROM s
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/textstats.py::pii_scrub).  The corpus
    is clean [a-z ] text, so deterministic synthetic PII (one email,
    one phone, one IPv4 per doc, derived from doc_id) is appended on
    BOTH the engine and oracle sides — the gate then proves the
    redaction output byte-identically (md5) plus the per-type counts."""
    from .operators.textstats import pii_scrub

    docs = _docs(spark, sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-1234 from 10.2."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
        ).alias("text"))
    out = pii_scrub(aug)
    return out.select(
        "doc_id", "n_emails", "n_phones", "n_ips",
        F.md5(F.col("scrubbed").cast("binary")).alias("scrubbed_md5"))


def sql_pii_scrub() -> str:
    from .operators.textstats import PII_EMAIL, PII_IP, PII_PHONE

    aug = ("text || ' contact user' || CAST(doc_id AS VARCHAR)"
           " || '@mail.example.com or 555-'"
           " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
           " || '-1234 from 10.2.' || CAST(doc_id % 256 AS VARCHAR)"
           " || '.7'")
    return f"""
WITH aug AS (SELECT doc_id, {aug} AS text FROM documents),
stages AS (
  SELECT doc_id, text,
         regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS after_email
  FROM aug
),
stages2 AS (
  SELECT doc_id, text, after_email,
         regexp_replace(after_email, '{PII_IP}', '<IP>', 'g') AS after_ip
  FROM stages
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(after_ip, '{PII_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(after_email, '{PII_IP}')) AS BIGINT) AS n_ips,
       md5(regexp_replace(after_ip, '{PII_PHONE}', '<PHONE>', 'g'))
         AS scrubbed_md5
FROM stages2
"""


DUP_SPAN_N = 8       # word n-gram width for exact-substring coverage
HOST_CAP = 10        # max docs kept per source/host


def q_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc duplicate-span coverage (exact-substring dedup signal,
    operators/dedup.py::duplicate_span_coverage) over the near-dup
    derived corpus (every 7th doc gets a drop-first-word variant, so
    long shared spans exist on both engine and oracle sides)."""
    return D.duplicate_span_coverage(
        _with_near_dups(_docs(spark, sf_dir)), n=DUP_SPAN_N)


def sql_dup_span_coverage(n: int = DUP_SPAN_N) -> str:
    return f"""
WITH {_SQL_NEAR_CORPUS.strip()},
words AS (
  SELECT doc_id, list_filter(string_split(text, ' '),
                             t -> length(t) > 0) AS w
  FROM corpus
),
grams AS (
  SELECT doc_id, s.pos AS pos, s.g AS g
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - {n - 2}),
                  i -> struct_pack(pos := i,
                       g := md5(array_to_string(w[i:i+{n - 1}], ' '))))) AS s
    FROM words WHERE len(w) >= {n})
),
dup AS (
  SELECT g FROM (
    SELECT g, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY g)
  WHERE nd >= 2
),
dp AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
cov AS (
  SELECT doc_id,
         LEAST({n}, pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos))
           AS add0
  FROM dp
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_positions,
         CAST(SUM(COALESCE(add0, {n})) AS BIGINT) AS covered_tokens
  FROM cov GROUP BY doc_id
),
tot AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(GREATEST(len(w) - {n - 1}, 0) AS BIGINT) AS n_grams
  FROM words
)
SELECT t.doc_id, t.n_tokens, t.n_grams,
       CAST(COALESCE(a.n_dup_positions, 0) AS BIGINT) AS n_dup_positions,
       CAST(COALESCE(a.covered_tokens, 0) AS BIGINT) AS covered_tokens,
       CAST(CASE WHEN t.n_tokens > 0 THEN
            FLOOR(COALESCE(a.covered_tokens, 0) * 1000000.0 / t.n_tokens)
            ELSE 0 END AS BIGINT) AS dup_token_frac_micro
FROM tot t LEFT JOIN agg a ON a.doc_id = t.doc_id
"""


def q_host_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host quota sampling (operators/corpus.py::cap_per_source):
    deterministic md5-ordered keep of at most HOST_CAP docs/source."""
    from .operators.corpus import cap_per_source

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return cap_per_source(docs, cap=HOST_CAP)


def sql_host_cap_sample(cap: int = HOST_CAP) -> str:
    return f"""
WITH ranked AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
              PARTITION BY source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
           AS host_rank
  FROM documents
)
SELECT doc_id, source, host_rank FROM ranked WHERE host_rank <= {cap}
"""


PR_ITERS = 5
PR_DAMPING = 0.85
PR_OFFSETS = (1, 2, 3)


def _md5_partner_pairs(spark: SparkSession, sf_dir: str,
                       cols: list[str]) -> DataFrame:
    """Deterministic doc-pairing shared by the link-graph gates: the
    doc at md5-permutation rank r pairs with the docs at ranks
    (r + j) mod n for j in PR_OFFSETS.  Returns one row per pair with
    the requested columns prefixed a_/b_ for the two sides.  The md5
    permutation decorrelates doc_id residues from hosts, so derived
    host-pair weights vary (a uniform fixpoint would not distinguish a
    broken PageRank).  Gate plumbing only: the global-order window is
    fine at gate scale; the SCALE paths under test live in
    operators/linkgraph.py.  The partner rank is projected as a plain
    column BEFORE the join so Catalyst extracts an equi-key (an inline
    modulo in the join condition degrades to CartesianProduct).  This
    derivation must stay in lockstep with the perm/edges/links CTEs in
    the SQL oracles below."""
    from pyspark.sql import Window

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", *[
            c for c in cols if c != "doc_id"])
    n = docs.count()
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    perm = docs.withColumn("r", F.row_number().over(w) - F.lit(1))
    offs = spark.createDataFrame([(j,) for j in PR_OFFSETS], "j long")
    a = (perm.crossJoin(offs)
         .select(*[F.col(c).alias(f"a_{c}") for c in cols],
                 ((F.col("r") + F.col("j")) % F.lit(n)).alias("rb")))
    b = perm.select(*[F.col(c).alias(f"b_{c}") for c in cols],
                    F.col("r").cast("long").alias("rb"))
    return a.join(b, "rb").drop("rb")


def _derived_host_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted host graph from the documents table (the
    driver corpus has no hyperlinks): md5-partner doc pairs collapsed
    to (source_host, source_host) edges."""
    pairs = _md5_partner_pairs(spark, sf_dir, ["source"])
    return (
        pairs.select(F.col("a_source").alias("src"),
                     F.col("b_source").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


_PR_MEMO: dict[tuple, DataFrame] = {}


def _host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized host PageRank (node, rank) — the result is an eager
    localCheckpoint, safe to reuse across the pagerank and fusion
    gates within a session."""
    from .operators.linkgraph import pagerank

    key = (id(spark), sf_dir)
    if key not in _PR_MEMO:
        # materialize the derivation once: the dangling check AND the
        # pagerank iterations both read it (recomputing the md5-partner
        # pipeline twice doubled this gate's cost in BENCH r3)
        edges = _derived_host_edges(spark, sf_dir).localCheckpoint(eager=True)
        # The SQL oracle's unrolled recurrence omits the dangling-mass
        # term (see _pagerank_ctes NOTE); that is only valid while the
        # derived graph has NO dangling node.  A host whose md5-partner
        # edges are all same-host would be dropped by the src<>dst
        # filter yet can still appear as a dst — fail loudly here
        # rather than let the gate mismatch a correct operator.
        n_dangling = (edges.select(F.col("dst").alias("node"))
                      .distinct()
                      .join(edges.select(F.col("src").alias("node"))
                            .distinct(), "node", "left_anti")
                      .count())
        if n_dangling:
            raise AssertionError(
                f"pagerank gate derivation produced {n_dangling} dangling "
                "host(s); add damped dangling redistribution to the SQL "
                "oracle before trusting this gate")
        _PR_MEMO[key] = pagerank(
            edges, n_iters=PR_ITERS, damping=PR_DAMPING, weighted=True)
    return _PR_MEMO[key]


def q_pagerank_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the derived host graph — the real
    iterative operator (linkgraph.py::pagerank: stationary persisted
    edge partitioning, per-iteration rank-only shuffle, damped
    dangling redistribution, lineage checkpointing)."""
    ranks = _host_pagerank(spark, sf_dir)
    return ranks.select(
        "node",
        F.round(F.col("rank") * 1e6).cast("long").alias("rank_micro"),
    )


def q_host_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-linking spam signal (linkgraph.py::host_reciprocity)
    over the derived host graph (same derivation as the pagerank
    gate)."""
    from .operators.linkgraph import host_reciprocity

    return host_reciprocity(_derived_host_edges(spark, sf_dir))


def sql_host_reciprocity() -> str:
    # perm/edges derivation in lockstep with _pagerank_ctes
    offs = ", ".join(f"({j})" for j in PR_OFFSETS)
    return f"""
WITH perm AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
           AS r
  FROM documents
),
pairs AS (
  SELECT DISTINCT a.source AS src, b.source AS dst
  FROM perm a
  CROSS JOIN (VALUES {offs}) offs(j)
  JOIN perm b
    ON b.r = (a.r + offs.j) % (SELECT COUNT(*) FROM documents)
  WHERE a.source <> b.source
)
SELECT p.src AS host,
       CAST(COUNT(*) AS BIGINT) AS n_out,
       CAST(SUM(CASE WHEN q.src IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_reciprocal,
       CAST(round(SUM(CASE WHEN q.src IS NULL THEN 0 ELSE 1 END)
                  * 1000000.0 / COUNT(*)) AS BIGINT) AS recip_frac_micro
FROM pairs p
LEFT JOIN pairs q ON q.src = p.dst AND q.dst = p.src
GROUP BY p.src
"""


def _pagerank_ctes() -> tuple[str, str]:
    """Shared unrolled-PageRank CTE body (derivation + {PR_ITERS}
    damped iterations); returns (cte_sql, final_rank_cte_name).  Used
    by the pagerank gate and the BM25xPageRank fusion gate.

    NOTE: the SQL recurrence omits the dangling-mass term the Spark
    operator handles (rank = (1-d)/n + d*contrib only).  That is valid
    for THIS derived graph, where every host provably has an out-edge
    (every doc emits PR_OFFSETS partners and every host has docs); if
    the derivation ever changes so a dst-only host can exist, add the
    damped dangling redistribution here too or the gate will fail
    against a correct operator."""
    d, base_num = PR_DAMPING, 1.0 - PR_DAMPING
    offs = ", ".join(f"({j})" for j in PR_OFFSETS)
    iters = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        iters.append(f"""
r{i} AS (
  SELECT h.node,
         {base_num} / (SELECT n FROM nn)
         + {d} * COALESCE(c.contrib, 0) AS rank
  FROM hosts h
  LEFT JOIN (SELECT f.dst, SUM(f.frac * r.rank) AS contrib
             FROM frac f JOIN {prev} r ON r.node = f.src
             GROUP BY f.dst) c ON c.dst = h.node)""")
        prev = f"r{i}"
    ctes = f"""perm AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
           AS r
  FROM documents
),
edges AS (
  SELECT a.source AS src, b.source AS dst, CAST(COUNT(*) AS BIGINT) AS weight
  FROM perm a
  CROSS JOIN (VALUES {offs}) offs(j)
  JOIN perm b
    ON b.r = (a.r + offs.j) % (SELECT COUNT(*) FROM documents)
  WHERE a.source <> b.source
  GROUP BY a.source, b.source
),
hosts AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM hosts),
frac AS (
  SELECT e.src, e.dst, CAST(e.weight AS DOUBLE) / o.out_w AS frac
  FROM edges e
  JOIN (SELECT src, SUM(CAST(weight AS DOUBLE)) AS out_w
        FROM edges GROUP BY src) o USING (src)
),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM hosts),{",".join(iters)}"""
    return ctes, prev


def sql_pagerank_hosts() -> str:
    ctes, final = _pagerank_ctes()
    return f"""
WITH {ctes}
SELECT node, CAST(ROUND(rank * 1000000) AS BIGINT) AS rank_micro FROM {final}
"""


HITS_ITERS = 3


def q_hits_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the derived host graph — the real
    iterative operator (linkgraph.py::hits: stationary persisted edge
    partitioning per orientation, per-iteration O(nodes) shuffles,
    integer-exact unnormalized iterations scaled once by max)."""
    from .operators.linkgraph import hits

    edges = _derived_host_edges(spark, sf_dir).localCheckpoint(eager=True)
    h = hits(edges, n_iters=HITS_ITERS, weighted=True)
    return h.select(
        "node",
        F.round(F.col("auth") * 1e6).cast("long").alias("auth_micro"),
        F.round(F.col("hub") * 1e6).cast("long").alias("hub_micro"),
    )


def sql_hits_hosts() -> str:
    """Unrolled HITS recurrence over the same perm/edges derivation as
    the PageRank oracle (must stay in lockstep with
    _md5_partner_pairs/_derived_host_edges).  hub_0 = 1; every
    intermediate is an exact integer in doubles, so the only rounding
    is the final max-division — bit-identical to the Spark operator."""
    offs = ", ".join(f"({j})" for j in PR_OFFSETS)
    steps = []
    prev_h = "h0"
    for i in range(1, HITS_ITERS + 1):
        steps.append(f"""
a{i} AS (
  SELECT h.node, COALESCE(c.s, 0) AS auth
  FROM hosts h LEFT JOIN (
    SELECT e.dst, SUM(CAST(e.weight AS DOUBLE) * p.hub) AS s
    FROM edges e JOIN {prev_h} p ON p.node = e.src GROUP BY e.dst) c
  ON c.dst = h.node),
h{i} AS (
  SELECT h.node, COALESCE(c.s, 0) AS hub
  FROM hosts h LEFT JOIN (
    SELECT e.src, SUM(CAST(e.weight AS DOUBLE) * a.auth) AS s
    FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src) c
  ON c.src = h.node)""")
        prev_h = f"h{i}"
    k = HITS_ITERS
    return f"""
WITH perm AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
           AS r
  FROM documents
),
edges AS (
  SELECT a.source AS src, b.source AS dst, CAST(COUNT(*) AS BIGINT) AS weight
  FROM perm a
  CROSS JOIN (VALUES {offs}) offs(j)
  JOIN perm b
    ON b.r = (a.r + offs.j) % (SELECT COUNT(*) FROM documents)
  WHERE a.source <> b.source
  GROUP BY a.source, b.source
),
hosts AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
h0 AS (SELECT node, CAST(1 AS DOUBLE) AS hub FROM hosts),{",".join(steps)}
SELECT a.node,
  CAST(ROUND(a.auth / (SELECT MAX(auth) FROM a{k}) * 1000000)
       AS BIGINT) AS auth_micro,
  CAST(ROUND(h.hub / (SELECT MAX(hub) FROM h{k}) * 1000000)
       AS BIGINT) AS hub_micro
FROM a{k} a JOIN h{k} h USING (node)
"""


TR_ITERS = 4
# seed rule: hosts whose md5 starts 0-7 (a deterministic ~half of the
# host universe; both engines compute md5 of the same utf-8 string)
TR_SEED_HEX = ("0", "1", "2", "3", "4", "5", "6", "7")


def q_trustrank_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank over the derived host graph (linkgraph.py::trustrank:
    seed-biased teleport, stationary persisted edge partitioning,
    per-iteration O(nodes) trust shuffle) with a deterministic
    md5-prefix seed set."""
    from .operators.linkgraph import trustrank

    edges = _derived_host_edges(spark, sf_dir).localCheckpoint(eager=True)
    # the SQL oracle omits the dangling term (dangling mass re-enters
    # via t(v)); valid only while the derived graph has no dangling
    # host — same loud guard as the pagerank gate
    n_dangling = (edges.select(F.col("dst").alias("node")).distinct()
                  .join(edges.select(F.col("src").alias("node")).distinct(),
                        "node", "left_anti").count())
    if n_dangling:
        raise AssertionError(
            f"trustrank gate derivation produced {n_dangling} dangling "
            "host(s); add damped dangling redistribution to the SQL "
            "oracle before trusting this gate")
    hosts = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct())
    seeds = hosts.where(
        F.substring(F.md5(F.col("node")), 1, 1).isin(*TR_SEED_HEX))
    t = trustrank(edges, seeds, n_iters=TR_ITERS, damping=PR_DAMPING)
    return t.select(
        "node",
        F.round(F.col("trust") * 1e6).cast("long").alias("trust_micro"),
    )


def sql_trustrank_hosts() -> str:
    """Unrolled TrustRank recurrence over the same perm/edges
    derivation as the PageRank oracle; teleport vector = 1/|S| on the
    md5-prefix seed hosts, 0 elsewhere.  (1-d) is emitted as the
    Python double repr so both engines multiply by the identical
    constant."""
    d, base = PR_DAMPING, 1.0 - PR_DAMPING
    offs = ", ".join(f"({j})" for j in PR_OFFSETS)
    hexes = ", ".join(f"'{h}'" for h in TR_SEED_HEX)
    iters = []
    prev = "r0"
    for i in range(1, TR_ITERS + 1):
        iters.append(f"""
r{i} AS (
  SELECT t.node,
         {base} * t.t + {d} * COALESCE(c.contrib, 0) AS trust
  FROM tvec t
  LEFT JOIN (SELECT f.dst, SUM(f.frac * r.trust) AS contrib
             FROM frac f JOIN {prev} r ON r.node = f.src
             GROUP BY f.dst) c ON c.dst = t.node)""")
        prev = f"r{i}"
    return f"""
WITH perm AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
           AS r
  FROM documents
),
edges AS (
  SELECT a.source AS src, b.source AS dst, CAST(COUNT(*) AS BIGINT) AS weight
  FROM perm a
  CROSS JOIN (VALUES {offs}) offs(j)
  JOIN perm b
    ON b.r = (a.r + offs.j) % (SELECT COUNT(*) FROM documents)
  WHERE a.source <> b.source
  GROUP BY a.source, b.source
),
hosts AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
seeds AS (SELECT node FROM hosts WHERE substr(md5(node), 1, 1) IN ({hexes})),
ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM seeds),
tvec AS (
  SELECT h.node,
         CASE WHEN s.node IS NULL THEN 0.0
              ELSE 1.0 / (SELECT n FROM ns) END AS t
  FROM hosts h LEFT JOIN seeds s USING (node)
),
frac AS (
  SELECT e.src, e.dst, CAST(e.weight AS DOUBLE) / o.out_w AS frac
  FROM edges e
  JOIN (SELECT src, SUM(CAST(weight AS DOUBLE)) AS out_w
        FROM edges GROUP BY src) o USING (src)
),
r0 AS (SELECT node, t AS trust FROM tvec),{",".join(iters)}
SELECT node, CAST(ROUND(trust * 1000000) AS BIGINT) AS trust_micro
FROM {prev}
"""


def _derived_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Url-level outlink rows from the shared md5-partner pairing,
    keeping urls and synthesizing anchor text as the first two words
    of the SOURCE doc (anchors describe targets from the linker's
    side).  Gate plumbing; the operator under test is
    linkgraph.py::anchor_text_agg."""
    def url(side: str) -> F.Column:
        return F.concat(F.lit("https://"), F.col(f"{side}_source"),
                        F.lit(".example/d/"),
                        F.col(f"{side}_doc_id").cast("string"))

    pairs = _md5_partner_pairs(spark, sf_dir, ["doc_id", "source", "text"])
    anchor = F.concat_ws(" ", F.slice(F.split(F.col("a_text"), " "), 1, 2))
    return pairs.select(url("a").alias("src_url"),
                        url("b").alias("dst_url"),
                        anchor.alias("anchor"))


def q_anchor_text_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incoming-anchor-text aggregation per target host (linkgraph.py::
    anchor_text_agg, by_host=True); anchor_terms emitted as a joined
    string so both engines hash plain scalars."""
    from .operators.linkgraph import anchor_text_agg

    agg = anchor_text_agg(_derived_outlinks(spark, sf_dir), by_host=True)
    return agg.select(
        "dst", "n_inlinks", "n_src_hosts",
        F.concat_ws(" ", "anchor_terms").alias("anchor_terms"),
    )


def sql_anchor_text_agg() -> str:
    offs = ", ".join(f"({j})" for j in PR_OFFSETS)
    return f"""
WITH perm AS (
  SELECT doc_id, source, text,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
           AS r
  FROM documents
),
links AS (
  SELECT a.source || '.example' AS src_host,
         b.source || '.example' AS dst_host,
         array_to_string(string_split(a.text, ' ')[1:2], ' ') AS anchor
  FROM perm a
  CROSS JOIN (VALUES {offs}) offs(j)
  JOIN perm b ON b.r = (a.r + offs.j) % (SELECT COUNT(*) FROM documents)
),
agg_links AS (
  SELECT dst_host, CAST(COUNT(*) AS BIGINT) AS n_inlinks,
         CAST(COUNT(DISTINCT src_host) AS BIGINT) AS n_src_hosts
  FROM links GROUP BY dst_host
),
agg_toks AS (
  -- regexp split on whitespace runs with empties dropped == the
  -- operator's F.split semantics, robust to multi-space anchors
  SELECT dst_host,
         array_to_string(list_sort(list(DISTINCT tok)), ' ') AS anchor_terms
  FROM (SELECT dst_host,
               UNNEST(list_filter(
                 regexp_split_to_array(lower(trim(anchor)), '\\s+'),
                 t -> t <> '')) AS tok
        FROM links)
  GROUP BY dst_host
)
SELECT l.dst_host AS dst, l.n_inlinks, l.n_src_hosts, t.anchor_terms
FROM agg_links l JOIN agg_toks t USING (dst_host)
"""


ANCHOR_FIELD_W = 2.0


def q_web_anchor_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-IR composition: BM25F with the page BODY plus an INCOMING
    ANCHOR TEXT field (fields.py::search_bm25f_relations over the
    anchor relation the link derivation produces) — anchors describe
    the target, so a page ranks for query terms its own body never
    mentions, with joint tf saturation across both fields."""
    from .gates import FLAGSHIP_QUERY, K_FLAGSHIP, _rerank_quantized
    from .operators.fields import search_bm25f_relations

    docs = _docs(spark, sf_dir)
    pairs = _md5_partner_pairs(spark, sf_dir, ["doc_id", "text"])
    anchor = F.concat_ws(" ", F.slice(F.split(F.col("a_text"), " "), 1, 2))
    anchors = (pairs
               .select(F.col("b_doc_id").alias("doc_id"),
                       anchor.alias("anchor"))
               .groupBy("doc_id")
               .agg(F.concat_ws(
                   " ", F.array_sort(F.collect_list("anchor"))).alias("text")))
    raw = search_bm25f_relations(
        spark, {"body": (docs, 1.0), "anchor": (anchors, ANCHOR_FIELD_W)},
        FLAGSHIP_QUERY, k=K_FLAGSHIP * 5)
    return _rerank_quantized(raw, K_FLAGSHIP)


def sql_web_anchor_bm25f_topk(k1: float = 1.2, b: float = 0.75) -> str:
    from .gates import K_FLAGSHIP, STOP_SQL, _sql_query_terms

    offs = ", ".join(f"({j})" for j in PR_OFFSETS)
    w = ANCHOR_FIELD_W
    return f"""
WITH perm AS (
  SELECT doc_id, text,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
           AS r
  FROM documents
),
links AS (
  SELECT b.doc_id AS doc_id,
         array_to_string(string_split(a.text, ' ')[1:2], ' ') AS anchor
  FROM perm a
  CROSS JOIN (VALUES {offs}) offs(j)
  JOIN perm b ON b.r = (a.r + offs.j) % (SELECT COUNT(*) FROM documents)
),
ftoks AS (
  SELECT doc_id, 1.0 AS fw, UNNEST(string_split(text, ' ')) AS term
  FROM documents
  UNION ALL
  SELECT doc_id, {w} AS fw, UNNEST(string_split(anchor, ' ')) AS term
  FROM links
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


DIVERSITY_PER_HOST = 2


def q_bm25_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-diversified top-k (search-result diversification): at most
    DIVERSITY_PER_HOST results per host survive into the final top-k —
    the standard web-search constraint against single-site domination.
    One window over the quantized candidate scores (partitioned by
    host, so it scales as a per-host top-N, not a global sort of
    everything; the final global top-k is TakeOrderedAndProject)."""
    from pyspark.sql import Window

    from .gates import FLAGSHIP_QUERY, K_FLAGSHIP, _df_index
    from .operators import query as Q

    idx = _df_index(spark, sf_dir)
    raw = Q.search(spark, idx, FLAGSHIP_QUERY, k=None, mode="bm25")
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", "source")
    scored = (raw.join(docs, "doc_id")
              .select("doc_id", "source",
                      F.round(F.col("score") * 1e6).cast("long")
                      .alias("score_micro")))
    w = Window.partitionBy("source").orderBy(
        F.desc("score_micro"), F.asc("doc_id"))
    return (scored.withColumn("host_rank", F.row_number().over(w))
            .where(F.col("host_rank") <= DIVERSITY_PER_HOST)
            .select("doc_id", "source", "score_micro",
                    F.col("host_rank").cast("long").alias("host_rank"))
            .orderBy(F.desc("score_micro"), F.asc("doc_id"))
            .limit(K_FLAGSHIP))


def sql_bm25_diverse_topk(k1: float = 1.2, b: float = 0.75) -> str:
    from .gates import K_FLAGSHIP, _sql_query_terms

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
scored AS (
  SELECT h.doc_id, dd.source,
         CAST(ROUND(SUM(h.partial) * 1000000) AS BIGINT) AS score_micro
  FROM hits h JOIN documents dd ON dd.doc_id = h.doc_id
  GROUP BY h.doc_id, dd.source
),
ranked AS (
  SELECT doc_id, source, score_micro,
         CAST(ROW_NUMBER() OVER (
              PARTITION BY source
              ORDER BY score_micro DESC, doc_id ASC) AS BIGINT) AS host_rank
  FROM scored
)
SELECT doc_id, source, score_micro, host_rank
FROM ranked WHERE host_rank <= {DIVERSITY_PER_HOST}
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


def q_bm25_collapse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-collapsed top-k (operators/query.py::collapse_topk — the
    ES ``collapse`` analogue): exactly ONE result per host (``source``),
    winner = highest score then lowest doc_id, then the global top-k of
    the representatives.  Windowless: the per-group winner is a plain
    min-aggregate with a map-side combiner."""
    from .gates import FLAGSHIP_QUERY, K_FLAGSHIP, _df_index
    from .operators import query as Q
    from .operators.query import collapse_topk

    idx = _df_index(spark, sf_dir)
    raw = Q.search(spark, idx, FLAGSHIP_QUERY, k=None, mode="bm25")
    scored = raw.select(
        "doc_id",
        F.round(F.col("score") * 1e6).cast("long").alias("score_micro"))
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", "source")
    return collapse_topk(scored, docs, "source", K_FLAGSHIP)


def sql_bm25_collapse_topk(k1: float = 1.2, b: float = 0.75) -> str:
    from .gates import K_FLAGSHIP, _sql_query_terms

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
scored AS (
  SELECT h.doc_id, dd.source,
         CAST(ROUND(SUM(h.partial) * 1000000) AS BIGINT) AS score_micro
  FROM hits h JOIN documents dd ON dd.doc_id = h.doc_id
  GROUP BY h.doc_id, dd.source
),
ranked AS (
  SELECT doc_id, source, score_micro,
         ROW_NUMBER() OVER (
              PARTITION BY source
              ORDER BY score_micro DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT source, doc_id, score_micro
FROM ranked WHERE rn = 1
ORDER BY score_micro DESC, doc_id ASC LIMIT {K_FLAGSHIP}
"""


PR_BOOST = 10.0


def q_bm25_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web ranking = content x authority: BM25 scores fused with the
    doc's host PageRank as a multiplicative prior,
    fused = bm25 * (1 + PR_BOOST * pagerank(host)).
    Both factors come from the real operators (query.py::search,
    linkgraph.py::pagerank).  Fusion is applied over ALL matching docs
    (no pre-cutoff) so the top-k is exact; at index scale the prior
    folds into the WAND upper bounds instead (max prior per run)."""
    from .gates import FLAGSHIP_QUERY, K_FLAGSHIP, _df_index
    from .operators import query as Q

    idx = _df_index(spark, sf_dir)
    raw = Q.search(spark, idx, FLAGSHIP_QUERY, k=None, mode="bm25")
    pr = _host_pagerank(spark, sf_dir)
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", "source")
    fused = (
        raw.join(docs, "doc_id")
        .join(F.broadcast(pr), F.col("source") == F.col("node"))
        .select(
            "doc_id",
            F.round((F.col("score")
                     * (F.lit(1.0) + F.lit(PR_BOOST) * F.col("rank")))
                    * 1e6).cast("long").alias("score_micro"),
        )
    )
    return (fused.orderBy(F.desc("score_micro"), F.asc("doc_id"))
            .limit(K_FLAGSHIP))


def sql_bm25_pagerank_topk(k1: float = 1.2, b: float = 0.75) -> str:
    from .gates import K_FLAGSHIP, _sql_query_terms

    pr_ctes, final = _pagerank_ctes()
    # hits formula == gates.sql_bm25_topk (same k1/b BM25)
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
bm25 AS (SELECT doc_id, SUM(partial) AS score FROM hits GROUP BY doc_id),
{pr_ctes}
SELECT m.doc_id,
       CAST(ROUND(m.score * (1.0 + {PR_BOOST} * r.rank) * 1000000) AS BIGINT)
         AS score_micro
FROM bm25 m
JOIN documents dd ON dd.doc_id = m.doc_id
JOIN {final} r ON r.node = dd.source
ORDER BY score_micro DESC, m.doc_id ASC LIMIT {K_FLAGSHIP}
"""


def _messy_url_expr() -> F.Column:
    """Deterministic messy-url synthesis from (doc_id, source): mixed
    scheme/host case, default :443 port, trailing slash, unsorted query
    params, fragments — the same expression the oracle SQL builds."""
    doc_id = F.col("doc_id")
    return F.concat(
        F.when(doc_id % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
        F.when(doc_id % 3 == 0,
               F.concat(F.upper(F.col("source")), F.lit(".Example.COM")))
        .otherwise(F.concat(F.col("source"), F.lit(".example.com"))),
        F.when(doc_id % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/page/"), (doc_id % 50).cast("string"),
        F.when(doc_id % 3 == 1, F.lit("/")).otherwise(F.lit("")),
        F.when(doc_id % 4 == 0, F.lit("?b=2&a=1"))
        .when(doc_id % 4 == 1, F.lit("?a=1&b=2"))
        .when(doc_id % 4 == 3, F.lit("?a=1"))
        .otherwise(F.lit("")),
        F.when(doc_id % 2 == 1, F.lit("#sec")).otherwise(F.lit("")),
    )


def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup (operators/urlnorm.py): messy url
    variants of the same page collapse to one canonical key; n_dups is
    the canonical group size."""
    from .operators.urlnorm import url_dedup_groups

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", "source")
    messy = docs.select("doc_id", _messy_url_expr().alias("url"))
    return url_dedup_groups(messy).select("doc_id", "canon_url", "n_dups")


def sql_url_canonical_dedup() -> str:
    return r"""
WITH messy AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
    || (CASE WHEN doc_id % 3 = 0 THEN upper(source) || '.Example.COM'
             ELSE source || '.example.com' END)
    || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
    || '/page/' || CAST(doc_id % 50 AS VARCHAR)
    || (CASE WHEN doc_id % 3 = 1 THEN '/' ELSE '' END)
    || (CASE doc_id % 4 WHEN 0 THEN '?b=2&a=1' WHEN 1 THEN '?a=1&b=2'
             WHEN 3 THEN '?a=1' ELSE '' END)
    || (CASE WHEN doc_id % 2 = 1 THEN '#sec' ELSE '' END) AS url
  FROM documents
),
parts AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:(\d+)', 1) AS port,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path,
    regexp_extract(url, '^[^#]*?\?([^#]*)', 1) AS query
  FROM messy
),
canon AS (
  SELECT doc_id,
    scheme || '://' || host
    || (CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
                  AND NOT (scheme = 'https' AND port = '443')
             THEN ':' || port ELSE '' END)
    || regexp_replace(CASE WHEN path = '' THEN '/' ELSE path END,
                      '^(.+?)/+$', '\1')
    || (CASE WHEN query <> ''
             THEN '?' || array_to_string(list_sort(string_split(query, '&')), '&')
             ELSE '' END) AS canon_url
  FROM parts
)
SELECT doc_id, canon_url,
       CAST(COUNT(*) OVER (PARTITION BY canon_url) AS BIGINT) AS n_dups
FROM canon
"""


# --- crawl-control gates (round 3): robots / frontier / sitemaps -------------
#
# The crawl corpus has no robots.txt or sitemap files, so the gates
# synthesize them DETERMINISTICALLY per host (source) with pure column
# expressions, run the real parsers from operators/crawl.py over the
# synthesized TEXT, and the DuckDB oracle generates the expected rows
# DIRECTLY (robots_rules / sitemap_urls: a value-hash match proves the
# parser inverts the synthesis bit-for-bit — warc_roundtrip pattern) or
# recomputes the decision logic independently in SQL (robots_allowed:
# longest-prefix-match precedence; crawl_frontier: politeness window).

# per-host star-group Crawl-delay (1-3 s, length-derived) + a decoy
# delay in the otherbot group that a correct parser must IGNORE
_ROBOTS_TXT_SQLEXPR = (
    "'User-agent: otherbot' || char(10) || 'Disallow: /' || char(10) "
    "|| 'Crawl-delay: 99' || char(10) "
    "|| char(10) || 'User-agent: helper' || char(10) || 'User-agent: *' "
    "|| char(10) || 'Disallow: /private' || char(10) "
    "|| 'Allow: /private/ok' || char(10) || '# generated fixture' "
    "|| char(10) || 'Disallow: /tmp-' || substr(md5(host), 1, 1) "
    "|| char(10) || 'Crawl-delay: ' "
    "|| CAST(length(host) % 3 + 1 AS STRING) "
    "|| char(10) || 'Disallow:' "
    "|| char(10) || char(10) || 'User-agent: spider' || char(10) "
    "|| 'User-agent: *' || char(10) || 'Disallow: /stacked'"
)


def _synth_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synthetic robots.txt per host, exercising every parser rule:
    a non-* group (ignored), stacked User-agent lines, comments,
    unknown directives, an empty Disallow, and a SECOND * group."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    hosts = docs.select(F.col("source").alias("host")).distinct()
    return hosts.withColumn("robots_txt", F.expr(_ROBOTS_TXT_SQLEXPR))


_CRAWL_RULES_CTE = """
hosts AS (SELECT DISTINCT source AS host FROM documents),
rules AS (
  SELECT host, '/private' AS rule_path, CAST(0 AS BIGINT) AS allow FROM hosts
  UNION ALL
  SELECT host, '/private/ok', CAST(1 AS BIGINT) FROM hosts
  UNION ALL
  SELECT host, '/tmp-' || substr(md5(host), 1, 1), CAST(0 AS BIGINT)
  FROM hosts
  UNION ALL
  SELECT host, '/stacked', CAST(0 AS BIGINT) FROM hosts
)"""


def q_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt parsing (operators/crawl.py::parse_robots): the
    * -group Allow/Disallow prefix rules recovered from synthesized
    robots text; the oracle emits the expected rules directly, so a
    match proves the parser (group splitting, agent stacking, comment/
    unknown-directive/empty-value handling) inverts the synthesis."""
    from .operators.crawl import parse_robots

    return parse_robots(_synth_robots(spark, sf_dir)) \
        .select("host", "rule_path", "allow")


def sql_robots_rules() -> str:
    return f"WITH {_CRAWL_RULES_CTE}\nSELECT host, rule_path, allow FROM rules"


_CRAWL_URL_PATH_SQL = """
  CASE CAST(doc_id % 5 AS INTEGER)
    WHEN 0 THEN '/private/d' || CAST(doc_id AS STRING)
    WHEN 1 THEN '/private/ok/d' || CAST(doc_id AS STRING)
    WHEN 2 THEN '/tmp-' || substr(md5(source), 1, 1) || '/d'
                || CAST(doc_id AS STRING)
    WHEN 3 THEN '/stacked/d' || CAST(doc_id AS STRING)
    ELSE '/public/d' || CAST(doc_id AS STRING)
  END"""


def _crawl_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", "source")
    return docs.select(
        "doc_id",
        F.concat(F.lit("https://"), F.col("source"),
                 F.expr(_CRAWL_URL_PATH_SQL)).alias("url"))


def q_robots_allowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots decision per url (operators/crawl.py::apply_robots):
    longest matching prefix wins, Allow beats Disallow on ties, no
    match -> allowed.  The url mix hits every outcome: blocked prefix,
    longer-Allow override, per-host hashed prefix, second-group rule,
    and no-rule default.  Oracle recomputes precedence independently
    (join + window), not by replaying the synthesis arithmetic."""
    from .operators.crawl import apply_robots, parse_robots

    rules = parse_robots(_synth_robots(spark, sf_dir))
    return apply_robots(_crawl_urls(spark, sf_dir), rules) \
        .select("doc_id", "allowed", "matched_path")


def sql_robots_allowed() -> str:
    return f"""
WITH {_CRAWL_RULES_CTE},
urls AS (
  SELECT doc_id, source AS host,
         {_CRAWL_URL_PATH_SQL} AS path
  FROM documents
),
hits AS (
  SELECT u.doc_id, r.rule_path, r.allow
  FROM urls u
  JOIN rules r ON r.host = u.host AND starts_with(u.path, r.rule_path)
),
best AS (
  SELECT doc_id, rule_path, allow,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY length(rule_path) DESC, allow DESC,
                                     rule_path DESC) AS rn
  FROM hits
)
SELECT u.doc_id,
       CAST(COALESCE(b.allow, 1) AS BIGINT) AS allowed,
       COALESCE(b.rule_path, '') AS matched_path
FROM urls u
LEFT JOIN (SELECT doc_id, rule_path, allow FROM best WHERE rn = 1) b
  ON b.doc_id = u.doc_id
"""


CRAWL_DELAY_MS = 700


def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness frontier (operators/crawl.py::crawl_frontier): one
    fetch per host per wave, priority queue per host, eta spaced by
    each host's OWN robots Crawl-delay (crawl.py::parse_crawl_delays —
    the star group's length-derived value; the otherbot group's decoy
    must be ignored)."""
    from .operators.crawl import crawl_frontier, parse_crawl_delays

    urls = _crawl_urls(spark, sf_dir).withColumn(
        "priority", F.pmod(F.col("doc_id") * 37 + 11, F.lit(97))
        .cast("long"))
    delays = parse_crawl_delays(_synth_robots(spark, sf_dir))
    return crawl_frontier(urls, delay_ms=CRAWL_DELAY_MS,
                          host_delays=delays) \
        .select("doc_id", "host", "host_rank", "eta_ms")


def sql_crawl_frontier() -> str:
    return f"""
WITH urls AS (
  SELECT doc_id, source AS host,
         'https://' || source || {_CRAWL_URL_PATH_SQL} AS url,
         CAST((doc_id * 37 + 11) % 97 AS BIGINT) AS priority
  FROM documents
)
SELECT doc_id, host,
       CAST(ROW_NUMBER() OVER (PARTITION BY host
                               ORDER BY priority DESC, url ASC) AS BIGINT)
         AS host_rank,
       CAST(round((ROW_NUMBER() OVER (PARTITION BY host
                                      ORDER BY priority DESC, url ASC) - 1)
            * (length(host) % 3 + 1) * 1000.0) AS BIGINT) AS eta_ms
FROM urls
"""


REVISIT_URL_MOD = 40
REVISIT_CONTENT_MOD = 7


def q_revisit_change_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl change detection (operators/crawl.py::revisit_stats):
    docs sharing (source, doc_id % mod) are recrawls of one url, in
    doc_id (capture-time) order; the content fingerprint repeats with
    period 7 so some revisits change and some don't.  Oracle = the
    same lag-window recurrence in SQL."""
    from .operators.crawl import revisit_stats

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", "source")
    caps = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit("/p"),
                 F.pmod(F.col("doc_id"), F.lit(REVISIT_URL_MOD))
                 .cast("string")).alias("url"),
        F.col("doc_id").alias("ts"),
        F.md5(F.concat(
            F.col("source"),
            F.pmod(F.col("doc_id"), F.lit(REVISIT_CONTENT_MOD))
            .cast("string"))).alias("content_md5"))
    return revisit_stats(caps)


def sql_revisit_change_rate() -> str:
    return f"""
WITH caps AS (
  SELECT 'https://' || source || '/p'
           || CAST(doc_id % {REVISIT_URL_MOD} AS STRING) AS url,
         doc_id AS ts,
         md5(source || CAST(doc_id % {REVISIT_CONTENT_MOD} AS STRING))
           AS content_md5
  FROM documents
),
flagged AS (
  SELECT url,
         CASE WHEN lag(content_md5) OVER w IS NOT NULL
                   AND lag(content_md5) OVER w <> content_md5
              THEN 1 ELSE 0 END AS chg
  FROM caps
  WINDOW w AS (PARTITION BY url ORDER BY ts ASC, content_md5 ASC)
)
SELECT url, CAST(COUNT(*) AS BIGINT) AS n_captures,
       CAST(SUM(chg) AS BIGINT) AS n_changes,
       CAST(CASE WHEN COUNT(*) > 1
                 THEN round(SUM(chg) * 1000000.0 / (COUNT(*) - 1))
                 ELSE 0 END AS BIGINT) AS change_rate_micro
FROM flagged GROUP BY url
"""


SITEMAP_PER_HOST = 3


def q_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap extraction (operators/crawl.py::extract_sitemap_urls):
    per-host sitemap XML synthesized from the host's first docs (every
    4th entry omits <lastmod> to prove the optional-field path), then
    parsed back; the oracle emits the expected (host, url, lastmod)
    rows directly — a match proves the XML parse inverts the
    synthesis."""
    from .operators.crawl import extract_sitemap_urls

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", "source")
    w = Window.partitionBy("source").orderBy("doc_id")
    picked = (docs.withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") <= SITEMAP_PER_HOST))
    entry = F.concat(
        F.lit("<url><loc>https://"), F.col("source"), F.lit("/p"),
        F.col("doc_id").cast("string"), F.lit("</loc>"),
        F.when(F.pmod(F.col("doc_id"), F.lit(4)) == 0, F.lit(""))
        .otherwise(F.concat(
            F.lit("<lastmod>2024-01-"),
            F.lpad((F.pmod(F.col("doc_id"), F.lit(28)) + 1).cast("string"),
                   2, "0"),
            F.lit("</lastmod>"))),
        F.lit("</url>"))
    sitemaps = (picked.groupBy(F.col("source").alias("host"))
                .agg(F.concat(
                    F.lit("<urlset>"),
                    F.concat_ws("", F.sort_array(F.collect_list(entry))),
                    F.lit("</urlset>")).alias("xml")))
    return extract_sitemap_urls(sitemaps).select("host", "url", "lastmod")


def sql_sitemap_urls() -> str:
    return f"""
WITH ranked AS (
  SELECT doc_id, source AS host,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
)
SELECT host,
       'https://' || host || '/p' || CAST(doc_id AS VARCHAR) AS url,
       CASE WHEN doc_id % 4 = 0 THEN ''
            ELSE '2024-01-'
                 || lpad(CAST((doc_id % 28) + 1 AS VARCHAR), 2, '0')
       END AS lastmod
FROM ranked WHERE rn <= {SITEMAP_PER_HOST}
"""


# --- passage-level BM25 retrieval (round 3) -----------------------------------

PASSAGE_K = 10
PASSAGE_QUERY_TERMS = sorted({
    "fast", "hash", "join", "with", "big", "vector", "table", "scan"})


def q_passage_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage retrieval (operators/passages.py::search_passages): the
    flagship query's whitespace terms scored BM25 over sliding-window
    chunks (CHUNK_W/CHUNK_STRIDE, chunk-level df/avgdl stats) — the
    RAG primitive.  Oracle recomputes windows, stats, the Lucene idf,
    and the quantized top-k ordering entirely in SQL."""
    from .operators.passages import search_passages

    return search_passages(_docs(spark, sf_dir), PASSAGE_QUERY_TERMS,
                           k=PASSAGE_K, chunk=CHUNK_W,
                           stride=CHUNK_STRIDE)


def sql_passage_bm25_topk(k1: float = 1.2, b: float = 0.75) -> str:
    terms = PASSAGE_QUERY_TERMS
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(win, x -> x = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(terms))
    df_cols = ",\n         ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms)))
    score_terms = " + ".join(
        f"(CASE WHEN s.df_{i} > 0 THEN "
        f"ln(1.0 + (s.n - s.df_{i} + 0.5) / (s.df_{i} + 0.5)) "
        f"* c.tf_{i} * {k1 + 1.0} / (c.tf_{i} + {k1} * (1.0 - {b} + {b} "
        f"* c.dl / s.avgdl)) ELSE 0.0 END)"
        for i in range(len(terms)))
    return f"""
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '),
                             t -> length(t) > 0) AS w
  FROM documents
),
counted AS (SELECT doc_id, w, len(w) AS n FROM words),
chunks AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_id,
         CAST(t.i * {CHUNK_STRIDE} AS BIGINT) AS start,
         w[t.i*{CHUNK_STRIDE}+1 : t.i*{CHUNK_STRIDE}+{CHUNK_W}] AS win
  FROM counted, UNNEST(range(0,
       CASE WHEN n <= 0 THEN 0 WHEN n <= {CHUNK_W} THEN 1
            ELSE 1 + CAST(ceil((n - {CHUNK_W}) / {CHUNK_STRIDE}.0) AS INT)
       END)) AS t(i)
),
cells AS (
  SELECT doc_id, chunk_id, start,
         CAST(len(win) AS DOUBLE) AS dl,
         {tf_cols}
  FROM chunks
),
stats AS (
  SELECT COUNT(*) AS n, AVG(dl) AS avgdl,
         {df_cols}
  FROM cells
),
scored AS (
  SELECT c.doc_id, c.chunk_id, c.start,
         CAST(round(({score_terms}) * 1000000.0) AS BIGINT) AS score_micro
  FROM cells c CROSS JOIN stats s
)
SELECT doc_id, chunk_id, start, score_micro
FROM scored WHERE score_micro > 0
ORDER BY score_micro DESC, doc_id ASC, chunk_id ASC
LIMIT {PASSAGE_K}
"""


# --- Naive Bayes classifier (round 3) ----------------------------------------

NB_ALPHA = 1.0


def q_nb_lang_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-Spark trained multinomial Naive Bayes (operators/classify.py)
    — the CCNet/fastText-style classifier stage of a training-data
    pipeline.  Train on docs with doc_id % 3 != 0 labeled by `lang`,
    classify EVERY doc (held-out docs exercise the unseen-term
    smoothing path).  The synthetic corpus shares one vocabulary
    across langs, so accuracy is chance-level by construction — the
    gate pins the exact math (smoothed log-probs, matched-postings
    decomposition, micro-quantized argmax), not model quality."""
    from .operators.classify import nb_classify, nb_train

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet"))
    # the token table feeds four aggregation passes (train scalars +
    # model + classify matched/lens) — persist for the gate's duration
    # and release after the result materializes via localCheckpoint
    toks = (docs.select("doc_id", "lang",
                        F.explode(F.expr(_WORDS_EXPR)).alias("term"))
            .groupBy("doc_id", "lang", "term")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"))
            .persist())
    try:
        model, classes = nb_train(
            toks.where(F.pmod(F.col("doc_id"), F.lit(3)) != 0),
            label_col="lang", alpha=NB_ALPHA)
        pred = nb_classify(toks.select("doc_id", "term", "tf"),
                           model, classes)
        return pred.select(
            "doc_id", F.col("pred_label").alias("pred_lang"),
            "mean_ll_micro").localCheckpoint(eager=True)
    finally:
        toks.unpersist()


def sql_nb_lang_classify(alpha: float = NB_ALPHA) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, lang, t AS term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, lang,
               unnest(list_filter(string_split(text, ' '),
                                  x -> length(x) > 0)) AS t
        FROM documents)
  GROUP BY doc_id, lang, t
),
train AS (SELECT * FROM toks WHERE doc_id % 3 <> 0),
vocab AS (SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v FROM train),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM train),
classes AS (
  SELECT lang,
         ln(CAST(COUNT(DISTINCT doc_id) AS DOUBLE) / (SELECT n FROM nd))
           AS log_prior,
         ln({alpha} / (SUM(tf) + {alpha} * (SELECT v FROM vocab)))
           AS log_unseen,
         SUM(tf) + {alpha} * (SELECT v FROM vocab) AS denom
  FROM train GROUP BY lang
),
model AS (
  SELECT t.term, t.lang,
         ln((SUM(t.tf) + {alpha}) / ANY_VALUE(c.denom)) AS log_cond
  FROM train t JOIN classes c ON c.lang = t.lang
  GROUP BY t.term, t.lang
),
lens AS (SELECT doc_id, SUM(tf) AS len FROM toks GROUP BY doc_id),
matched AS (
  SELECT a.doc_id, m.lang,
         SUM(a.tf * m.log_cond) AS m_sum, SUM(a.tf) AS m_tf
  FROM toks a JOIN model m ON m.term = a.term
  GROUP BY a.doc_id, m.lang
),
grid AS (
  SELECT l.doc_id, c.lang, l.len,
         c.log_prior + COALESCE(mm.m_sum, 0)
           + (l.len - COALESCE(mm.m_tf, 0)) * c.log_unseen AS score
  FROM lens l
  CROSS JOIN classes c
  LEFT JOIN matched mm ON mm.doc_id = l.doc_id AND mm.lang = c.lang
),
quant AS (
  SELECT doc_id, lang,
         CAST(round(score / len * 1000000) AS BIGINT) AS micro
  FROM grid
),
best AS (
  SELECT doc_id, lang, micro,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY micro DESC, lang ASC) AS rn
  FROM quant
)
SELECT doc_id, lang AS pred_lang, micro AS mean_ll_micro
FROM best WHERE rn = 1
"""


# --- paragraph dedup / chunking / C4 line filter (round 3) -------------------
#
# The synthetic documents are single-line; these gates derive a
# line-structured corpus with IDENTICAL pure-column expressions on both
# engines: words re-wrapped into fixed-width lines, plus injected
# boilerplate (shared header/footer lines, javascript/lorem-ipsum
# markers, varied terminal punctuation) so every filter rule fires.

PARA_LINE_W = 12
PARA_HEADER = "subscribe to our newsletter for updates"
PARA_FOOTER = "copyright example site all rights reserved"
C4_LINE_W = 8
C4_LOREM = "lorem ipsum dolor sit amet."
CHUNK_W, CHUNK_STRIDE = 32, 16

_WORDS_EXPR = "filter(split(text, ' '), t -> length(t) > 0)"


def _with_paragraph_lines(docs: DataFrame) -> DataFrame:
    """Re-wrap each doc into PARA_LINE_W-word lines; every 7th doc gets
    the shared header line, every 5th the shared footer."""
    lines = F.expr(
        f"transform(sequence(1, greatest(cast(ceil(size(_w) / {PARA_LINE_W}.0)"
        f" as int), 1)), i -> array_join(slice(_w, (i-1)*{PARA_LINE_W}+1, "
        f"{PARA_LINE_W}), ' '))")
    empty = F.array().cast("array<string>")
    hdr = F.when(F.col("doc_id") % 7 == 0,
                 F.array(F.lit(PARA_HEADER))).otherwise(empty)
    ftr = F.when(F.col("doc_id") % 5 == 0,
                 F.array(F.lit(PARA_FOOTER))).otherwise(empty)
    return (docs.select("doc_id", F.expr(_WORDS_EXPR).alias("_w"))
            .withColumn("_lines", lines)
            .select("doc_id", F.array_join(
                F.concat(hdr, F.col("_lines"), ftr), "\n").alias("text")))


_SQL_PARA_CORPUS = f"""
corpus AS (
  SELECT doc_id,
    array_to_string(list_concat(list_concat(
      CASE WHEN doc_id % 7 = 0 THEN ['{PARA_HEADER}']
           ELSE CAST([] AS VARCHAR[]) END,
      list_transform(range(1, greatest(CAST(ceil(len(w) / {PARA_LINE_W}.0)
                                            AS INT), 1) + 1),
        i -> array_to_string(
               w[(i-1)*{PARA_LINE_W}+1:(i-1)*{PARA_LINE_W}+{PARA_LINE_W}],
               ' '))),
      CASE WHEN doc_id % 5 = 0 THEN ['{PARA_FOOTER}']
           ELSE CAST([] AS VARCHAR[]) END),
    chr(10)) AS text
  FROM (SELECT doc_id, list_filter(string_split(text, ' '),
                                   t -> length(t) > 0) AS w
        FROM documents)
)"""


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph dedup (operators/dedup.py::dedup_paragraphs)
    over the derived line corpus: shared header/footer lines survive
    only in their first-seen doc."""
    return D.dedup_paragraphs(_with_paragraph_lines(_docs(spark, sf_dir)))


def sql_paragraph_dedup() -> str:
    return f"""
WITH {_SQL_PARA_CORPUS.strip()},
paras AS (
  SELECT doc_id, s.idx AS idx, s.para AS para FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
        i -> struct_pack(idx := i, para := ls[i]))) AS s
    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus))
  WHERE trim(s.para) <> ''
),
ranked AS (
  SELECT doc_id, idx, para,
         ROW_NUMBER() OVER (PARTITION BY md5(para) ORDER BY doc_id, idx) AS rn
  FROM paras
),
kept AS (
  SELECT doc_id, COUNT(*) AS nk,
         string_agg(para, chr(10) ORDER BY idx) AS kt
  FROM ranked WHERE rn = 1 GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS np FROM ranked GROUP BY doc_id)
SELECT t.doc_id, CAST(t.np AS BIGINT) AS n_paras,
       CAST(COALESCE(k.nk, 0) AS BIGINT) AS n_kept,
       md5(COALESCE(k.kt, '')) AS kept_md5
FROM tot t LEFT JOIN kept k USING (doc_id)
"""


BOILER_MIN_DOCS, BOILER_MIN_FRAC = 3, 0.1


def q_host_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-template stripping (operators/corpus.py::host_boilerplate)
    over the derived line corpus with the real source column: the
    injected header/footer lines recur across a host's pages and are
    removed everywhere, unique body lines survive."""
    from .operators import corpus as C

    full = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    lines = _with_paragraph_lines(full.select("doc_id", "text"))
    withhost = lines.join(full.select("doc_id", "source"), "doc_id")
    return C.host_boilerplate(withhost, "source",
                              min_docs=BOILER_MIN_DOCS,
                              min_frac=BOILER_MIN_FRAC)


def sql_host_boilerplate() -> str:
    return f"""
WITH {_SQL_PARA_CORPUS.strip()},
paras AS (
  SELECT c.doc_id, d.source AS host, s.idx AS idx, s.para AS para FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
        i -> struct_pack(idx := i, para := ls[i]))) AS s
    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus)) c
  JOIN documents d USING (doc_id)
  WHERE trim(c.s.para) <> ''
),
hd AS (SELECT source AS host, COUNT(DISTINCT doc_id) AS hdocs
       FROM documents GROUP BY source),
pk AS (
  SELECT host, md5(para) AS h, COUNT(DISTINCT doc_id) AS ndocs
  FROM paras GROUP BY host, 2
),
boiler AS (
  SELECT pk.host, pk.h FROM pk JOIN hd USING (host)
  WHERE pk.ndocs >= {BOILER_MIN_DOCS}
    AND pk.ndocs >= hd.hdocs * {BOILER_MIN_FRAC}
),
tagged AS (
  SELECT p.doc_id, p.idx, p.para,
         (b.h IS NULL) AS keep_para
  FROM paras p LEFT JOIN boiler b
    ON b.host = p.host AND b.h = md5(p.para)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras,
       CAST(SUM(CASE WHEN keep_para THEN 0 ELSE 1 END) AS BIGINT)
         AS n_boiler,
       md5(COALESCE(string_agg(CASE WHEN keep_para THEN para END,
                               chr(10) ORDER BY idx), '')) AS kept_md5
FROM tagged GROUP BY doc_id
"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (operators/corpus.py::chunk_documents)
    straight over the documents table."""
    from .operators.corpus import chunk_documents

    return chunk_documents(_docs(spark, sf_dir),
                           chunk=CHUNK_W, stride=CHUNK_STRIDE)


def sql_doc_chunks(chunk: int = CHUNK_W, stride: int = CHUNK_STRIDE) -> str:
    return f"""
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '),
                             t -> length(t) > 0) AS w
  FROM documents
),
counted AS (SELECT doc_id, w, len(w) AS n FROM words),
chunks AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_id,
         CAST(t.i * {stride} AS BIGINT) AS start,
         w[t.i*{stride}+1 : t.i*{stride}+{chunk}] AS win
  FROM counted, UNNEST(range(0,
       CASE WHEN n <= 0 THEN 0 WHEN n <= {chunk} THEN 1
            ELSE 1 + CAST(ceil((n - {chunk}) / {stride}.0) AS INT) END)) AS t(i)
)
SELECT doc_id, chunk_id, start,
       CAST(len(win) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(win, ' ')) AS chunk_md5
FROM chunks
"""


def _with_c4_lines(docs: DataFrame) -> DataFrame:
    """Re-wrap into C4_LINE_W-word lines with varied terminal
    punctuation ((doc_id+i)%4: . / ! / none / ?), a javascript marker
    on every (doc_id+2i)%11==0 line, a lorem-ipsum line on every 13th
    doc and a curly-brace line on every 17th."""
    lines = F.expr(
        f"transform(sequence(1, greatest(cast(ceil(size(_w) / {C4_LINE_W}.0)"
        f" as int), 1)), i -> concat("
        f"CASE WHEN (doc_id + 2*i) % 11 = 0 THEN 'javascript ' ELSE '' END, "
        f"array_join(slice(_w, (i-1)*{C4_LINE_W}+1, {C4_LINE_W}), ' '), "
        f"CASE CAST((doc_id + i) % 4 AS INT) WHEN 0 THEN '.' WHEN 1 THEN '!' "
        f"WHEN 2 THEN '' ELSE '?' END))")
    empty = F.array().cast("array<string>")
    lorem = F.when(F.col("doc_id") % 13 == 0,
                   F.array(F.lit(C4_LOREM))).otherwise(empty)
    brace = F.when(F.col("doc_id") % 17 == 0,
                   F.array(F.lit("page config uses braces {x: 1}."))
                   ).otherwise(empty)
    return (docs.select("doc_id", F.expr(_WORDS_EXPR).alias("_w"))
            .withColumn("_lines", lines)
            .select("doc_id", F.array_join(
                F.concat(F.col("_lines"), lorem, brace), "\n").alias("text")))


_SQL_C4_CORPUS = f"""
corpus AS (
  SELECT doc_id,
    array_to_string(list_concat(list_concat(
      list_transform(range(1, greatest(CAST(ceil(len(w) / {C4_LINE_W}.0)
                                            AS INT), 1) + 1),
        i -> (CASE WHEN (doc_id + 2*i) % 11 = 0
                   THEN 'javascript ' ELSE '' END)
             || array_to_string(
                  w[(i-1)*{C4_LINE_W}+1:(i-1)*{C4_LINE_W}+{C4_LINE_W}], ' ')
             || (CASE CAST((doc_id + i) % 4 AS INT) WHEN 0 THEN '.'
                      WHEN 1 THEN '!' WHEN 2 THEN '' ELSE '?' END)),
      CASE WHEN doc_id % 13 = 0 THEN ['{C4_LOREM}']
           ELSE CAST([] AS VARCHAR[]) END),
      CASE WHEN doc_id % 17 = 0 THEN ['page config uses braces {{x: 1}}.']
           ELSE CAST([] AS VARCHAR[]) END),
    chr(10)) AS text
  FROM (SELECT doc_id, list_filter(string_split(text, ' '),
                                   t -> length(t) > 0) AS w
        FROM documents)
)"""


def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line filter (operators/corpus.py::c4_line_filter) over
    the derived punctuated-line corpus."""
    from .operators.corpus import c4_line_filter

    return c4_line_filter(_with_c4_lines(_docs(spark, sf_dir)))


def sql_c4_line_filter() -> str:
    return f"""
WITH {_SQL_C4_CORPUS.strip()},
lines AS (
  SELECT doc_id, s.idx AS idx, s.line AS line FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
        i -> struct_pack(idx := i, line := ls[i]))) AS s
    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus))
  WHERE trim(s.line) <> ''
),
verd AS (
  SELECT doc_id, idx, line,
    CASE WHEN (line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?'
               OR line LIKE '%"')
          AND len(list_filter(string_split(line, ' '),
                              t -> length(t) > 0)) >= 3
          AND NOT contains(lower(line), 'javascript')
    THEN 1 ELSE 0 END AS lk
  FROM lines
),
perdoc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(lk) AS BIGINT) AS n_kept_lines,
         md5(COALESCE(string_agg(line, chr(10) ORDER BY idx)
                      FILTER (WHERE lk = 1), '')) AS kept_md5
  FROM verd GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(p.n_kept_lines, 0) AS BIGINT) AS n_kept_lines,
       COALESCE(p.kept_md5, md5('')) AS kept_md5,
       CAST(COALESCE(p.n_kept_lines, 0) >= 3
            AND NOT contains(lower(d.text), 'lorem ipsum')
            AND NOT contains(d.text, '{{')
            AND NOT contains(d.text, '}}') AS INT) AS keep
FROM corpus d LEFT JOIN perdoc p USING (doc_id)
"""


CMS_DEPTH, CMS_WIDTH = 3, 16      # narrow width: collisions exercised
BLOOM_K, BLOOM_BITS = 3, 256
SKETCH_ABSENT = ("zz_absent_alpha", "zz_absent_beta")
N_SKETCH_PROBES = 20


def _term_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection frequency per term (toks-level, stopwords included)
    from the real tokenize kernel — the CMS input stream."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return (B.token_counts(docs).groupBy("term")
            .agg(F.sum("tf").cast("long").alias("cnt")))


def _sketch_probes(term_cf: DataFrame) -> DataFrame:
    """Deterministic probe list: the N lexicographically-smallest
    vocabulary terms plus fixed absent strings.  Gate plumbing — the
    global sort is bounded by the vocabulary, not the corpus."""
    spark = term_cf.sparkSession
    present = term_cf.select("term").orderBy("term").limit(N_SKETCH_PROBES)
    absent = spark.createDataFrame([(t,) for t in SKETCH_ABSENT],
                                   "term string")
    return present.union(absent)


def q_cms_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates (operators/sketch.py) for the
    probe terms next to their true collection frequencies: the sketch
    is built at deliberately narrow width so the min-over-rows
    collision behavior is what the oracle must reproduce."""
    from .operators.sketch import count_min_build, count_min_estimate

    cf = _term_cf(spark, sf_dir)
    cms = count_min_build(cf.select("term", "cnt"),
                          depth=CMS_DEPTH, width=CMS_WIDTH)
    est = count_min_estimate(cms, _sketch_probes(cf),
                             depth=CMS_DEPTH, width=CMS_WIDTH)
    return (est.join(cf, "term", "left")
            .select("term", "est",
                    F.coalesce("cnt", F.lit(0)).cast("long")
                    .alias("true_cf")))


def _sql_sketch_probes() -> str:
    absent = " UNION ALL ".join(f"SELECT '{t}' AS term"
                                for t in SKETCH_ABSENT)
    return f"""
cf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM toks GROUP BY term),
probes AS (
  SELECT term FROM (SELECT term FROM cf ORDER BY term
                    LIMIT {N_SKETCH_PROBES})
  UNION ALL {absent}
)"""


def _sql_hash_bucket(value_expr: str, seed_expr: str, modulus: int) -> str:
    """The cross-engine md5 bucket (first 8 hex digits mod m) — must
    stay in lockstep with sketch.py::_bucket."""
    return (f"('0x' || substr(md5(CAST({seed_expr} AS VARCHAR) || ':' || "
            f"{value_expr}), 1, 8))::BIGINT % {modulus}")


def sql_cms_term_counts() -> str:
    return f"""
WITH {TOKS_CTE.strip()},
{_sql_sketch_probes().strip()},
cells AS (
  SELECT r.row, {_sql_hash_bucket('cf.term', 'r.row', CMS_WIDTH)} AS bucket,
         SUM(cf.cnt) AS cnt
  FROM cf CROSS JOIN (SELECT unnest(range(0, {CMS_DEPTH})) AS row) r
  GROUP BY 1, 2
),
est AS (
  SELECT p.term,
         MIN(COALESCE(c.cnt, 0)) AS est
  FROM probes p
  CROSS JOIN (SELECT unnest(range(0, {CMS_DEPTH})) AS row) r
  LEFT JOIN cells c
    ON c.row = r.row
   AND c.bucket = {_sql_hash_bucket('p.term', 'r.row', CMS_WIDTH)}
  GROUP BY p.term
)
SELECT e.term, CAST(e.est AS BIGINT) AS est,
       CAST(COALESCE(cf.cnt, 0) AS BIGINT) AS true_cf
FROM est e LEFT JOIN cf ON cf.term = e.term
"""


def q_bloom_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership (operators/sketch.py) of the probe terms
    against a filter built over the toks vocabulary."""
    from .operators.sketch import bloom_build, bloom_might_contain

    cf = _term_cf(spark, sf_dir)
    bloom = bloom_build(cf.select("term"), n_hashes=BLOOM_K,
                        n_bits=BLOOM_BITS)
    return bloom_might_contain(bloom, _sketch_probes(cf),
                               n_hashes=BLOOM_K, n_bits=BLOOM_BITS)


def sql_bloom_dictionary() -> str:
    return f"""
WITH {TOKS_CTE.strip()},
{_sql_sketch_probes().strip()},
bits AS (
  SELECT DISTINCT {_sql_hash_bucket('cf.term', 'r.k', BLOOM_BITS)} AS bit
  FROM cf CROSS JOIN (SELECT unnest(range(0, {BLOOM_K})) AS k) r
)
SELECT p.term,
       CAST(MIN(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) AS INT)
         AS might_contain
FROM probes p
CROSS JOIN (SELECT unnest(range(0, {BLOOM_K})) AS k) r
LEFT JOIN bits b ON b.bit = {_sql_hash_bucket('p.term', 'r.k', BLOOM_BITS)}
GROUP BY p.term
"""


HLL_B = 6  # m = 64 buckets: small enough that most see >1 term


def q_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register table (operators/sketch.py::hll_build)
    over the toks vocabulary — the registers are the bit-exact
    deterministic object (the float estimator is pytest-verified
    against true cardinality in test_analytics)."""
    from .operators.sketch import hll_build

    cf = _term_cf(spark, sf_dir)
    return hll_build(cf.select("term"), b=HLL_B)


def sql_hll_registers() -> str:
    tail = 32 - HLL_B
    return f"""
WITH {TOKS_CTE.strip()},
hashed AS (
  SELECT ('0x' || substr(md5(term), 1, 8))::BIGINT AS h
  FROM (SELECT DISTINCT term FROM toks)
),
parts AS (
  SELECT h // {1 << tail} AS bucket, h % {1 << tail} AS w FROM hashed
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(MAX(CASE WHEN w > 0 THEN {tail} - (length(bin(w)) - 1)
                     ELSE {tail + 1} END) AS BIGINT) AS register
FROM parts GROUP BY bucket
"""


GOPHER_LINE_W = 12


def _with_gopher_text(docs: DataFrame) -> DataFrame:
    """Derived corpus that fires every Gopher rule: words are
    truncated to 10 on every 11th doc (min-word-count rule), 8 '#'
    words appended on every 7th (hash-ratio rule), 40 numeric words on
    every 13th (alphabetic-word rule), 4 required stopwords on even
    docs vs 1 on odd (stopword rule); re-wrapped into GOPHER_LINE_W-
    word lines where every 4th doc bullets ALL lines (fails <=0.9) vs
    half on %4==1 docs (passes), and %5==1 docs end ALL lines with
    '...' (fails <=0.3) vs every 4th line on %5==2 (passes) and a
    single-char '…' first line on %5==3."""
    w2 = F.expr(
        "concat("
        "CASE WHEN doc_id % 11 = 4 THEN slice(_w, 1, 10) ELSE _w END, "
        "CASE WHEN doc_id % 7 = 3 THEN array_repeat('#', 8) "
        "     ELSE cast(array() as array<string>) END, "
        "CASE WHEN doc_id % 13 = 5 THEN array_repeat('12345', 40) "
        "     ELSE cast(array() as array<string>) END, "
        "CASE WHEN doc_id % 2 = 0 THEN array('the', 'of', 'and', 'that') "
        "     ELSE array('the') END)")
    lines = F.expr(
        f"transform(sequence(1, greatest(cast(ceil(size(_w2) / "
        f"{GOPHER_LINE_W}.0) as int), 1)), i -> concat("
        f"CASE WHEN doc_id % 4 = 0 THEN '• ' "
        f"     WHEN doc_id % 4 = 1 AND i % 2 = 0 THEN '- ' ELSE '' END, "
        f"array_join(slice(_w2, (i-1)*{GOPHER_LINE_W}+1, {GOPHER_LINE_W}), "
        f"' '), "
        f"CASE WHEN doc_id % 5 = 1 THEN ' ...' "
        f"     WHEN doc_id % 5 = 2 AND i % 4 = 0 THEN ' ...' "
        f"     WHEN doc_id % 5 = 3 AND i = 1 THEN ' …' ELSE '' END))")
    return (docs.select("doc_id", F.expr(_WORDS_EXPR).alias("_w"))
            .withColumn("_w2", w2)
            .select("doc_id", F.array_join(lines, "\n").alias("text")))


_SQL_GOPHER_CORPUS = f"""
corpus AS (
  SELECT doc_id,
    array_to_string(list_transform(
      range(1, greatest(CAST(ceil(len(w2) / {GOPHER_LINE_W}.0) AS INT),
                        1) + 1),
      i -> (CASE WHEN doc_id % 4 = 0 THEN '• '
                 WHEN doc_id % 4 = 1 AND i % 2 = 0 THEN '- '
                 ELSE '' END)
           || array_to_string(
                w2[(i-1)*{GOPHER_LINE_W}+1:(i-1)*{GOPHER_LINE_W}+{GOPHER_LINE_W}], ' ')
           || (CASE WHEN doc_id % 5 = 1 THEN ' ...'
                    WHEN doc_id % 5 = 2 AND i % 4 = 0 THEN ' ...'
                    WHEN doc_id % 5 = 3 AND i = 1 THEN ' …'
                    ELSE '' END)),
      chr(10)) AS text
  FROM (
    SELECT doc_id, list_concat(list_concat(list_concat(
      CASE WHEN doc_id % 11 = 4 THEN w[1:10] ELSE w END,
      CASE WHEN doc_id % 7 = 3
           THEN list_transform(range(1, 9), x -> '#')
           ELSE CAST([] AS VARCHAR[]) END),
      CASE WHEN doc_id % 13 = 5
           THEN list_transform(range(1, 41), x -> '12345')
           ELSE CAST([] AS VARCHAR[]) END),
      CASE WHEN doc_id % 2 = 0 THEN ['the', 'of', 'and', 'that']
           ELSE ['the'] END) AS w2
    FROM (SELECT doc_id, {_SQL_W} AS w FROM documents))
)"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-level quality filter (Rae et al. 2021;
    operators/corpus.py::gopher_quality_filter) over the derived
    rule-firing corpus."""
    from .operators.corpus import gopher_quality_filter

    return gopher_quality_filter(_with_gopher_text(_docs(spark, sf_dir)))


def sql_gopher_quality() -> str:
    from .operators.corpus import (
        GOPHER_ALPHA_WORD_MIN,
        GOPHER_BULLET_LINE_MAX,
        GOPHER_ELLIPSIS_LINE_MAX,
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_STOP_KINDS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
        GOPHER_SYMBOL_RATIO_MAX,
    )

    stops = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + "]"
    return f"""
WITH {_SQL_GOPHER_CORPUS.strip()},
feats AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'),
                t -> length(t) > 0) AS w,
    list_filter(list_transform(string_split(text, chr(10)),
                               x -> trim(x)), x -> x <> '') AS l,
    text
  FROM corpus
),
m AS (
  SELECT doc_id,
    CAST(len(w) AS DOUBLE) AS n_words,
    CASE WHEN len(w) > 0
         THEN CAST(list_sum(list_transform(w, t -> length(t)))
                   AS DOUBLE) / len(w) ELSE 0.0 END AS mean_len,
    CASE WHEN len(w) > 0
         THEN CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]')))
                   AS DOUBLE) / len(w) ELSE 0.0 END AS alpha_frac,
    CASE WHEN len(w) > 0
         THEN CAST(length(text) - length(replace(text, '#', ''))
                   AS DOUBLE) / len(w) ELSE 0.0 END AS hash_ratio,
    CASE WHEN len(w) > 0
         THEN CAST((length(text) - length(replace(text, '…', '')))
                   + (length(replace(text, '…', ''))
                      - length(replace(replace(text, '…', ''), '...', '')))
                     // 3 AS DOUBLE) / len(w) ELSE 0.0 END AS ell_ratio,
    CASE WHEN len(l) > 0
         THEN CAST(len(list_filter(l, x -> starts_with(x, '•')
                                        OR starts_with(x, '-')
                                        OR starts_with(x, '*')))
                   AS DOUBLE) / len(l) ELSE 0.0 END AS bullet_frac,
    CASE WHEN len(l) > 0
         THEN CAST(len(list_filter(l, x -> ends_with(x, '...')
                                        OR ends_with(x, '…')))
                   AS DOUBLE) / len(l) ELSE 0.0 END AS ell_line_frac,
    CAST(len(list_intersect(list_distinct(list_transform(w,
         t -> lower(t))), {stops})) AS BIGINT) AS n_stop
  FROM feats
)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  CAST(ROUND(mean_len * 1000000) AS BIGINT) AS mean_word_len_micro,
  CAST(ROUND(alpha_frac * 1000000) AS BIGINT) AS alpha_frac_micro,
  CAST(ROUND(hash_ratio * 1000000) AS BIGINT) AS hash_ratio_micro,
  CAST(ROUND(ell_ratio * 1000000) AS BIGINT) AS ellipsis_ratio_micro,
  CAST(ROUND(bullet_frac * 1000000) AS BIGINT) AS bullet_line_frac_micro,
  CAST(ROUND(ell_line_frac * 1000000) AS BIGINT) AS ellipsis_line_frac_micro,
  n_stop AS n_stop_kinds,
  CAST(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
       AND mean_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                        AND {GOPHER_MAX_MEAN_WORD_LEN}
       AND hash_ratio <= {GOPHER_SYMBOL_RATIO_MAX}
       AND ell_ratio <= {GOPHER_SYMBOL_RATIO_MAX}
       AND bullet_frac <= {GOPHER_BULLET_LINE_MAX}
       AND ell_line_frac <= {GOPHER_ELLIPSIS_LINE_MAX}
       AND alpha_frac >= {GOPHER_ALPHA_WORD_MIN}
       AND n_stop >= {GOPHER_MIN_STOP_KINDS} AS INT) AS keep
FROM m
"""


def analytics_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pii_scrub": q_pii_scrub,
        "sequence_pack": q_sequence_pack,
        "dedup_clusters": q_dedup_clusters,
        "lm_perplexity": q_lm_perplexity,
        "token_quantiles": q_token_quantiles,
        "vocab_growth": q_vocab_growth,
        "collocations_pmi": q_collocations_pmi,
        "dup_span_coverage": q_dup_span_coverage,
        "paragraph_dedup": q_paragraph_dedup,
        "simhash_near_dup": q_simhash_near_dup,
        "doc_chunks": q_doc_chunks,
        "c4_line_filter": q_c4_line_filter,
        "gopher_quality": q_gopher_quality,
        "cms_term_counts": q_cms_term_counts,
        "bloom_dictionary": q_bloom_dictionary,
        "hll_registers": q_hll_registers,
        "multimodal_png_pixels": q_multimodal_png_pixels,
        "warc_roundtrip": q_warc_roundtrip,
        "host_cap_sample": q_host_cap_sample,
        "pagerank_hosts": q_pagerank_hosts,
        "host_reciprocity": q_host_reciprocity,
        "hits_hosts": q_hits_hosts,
        "trustrank_hosts": q_trustrank_hosts,
        "url_canonical_dedup": q_url_canonical_dedup,
        "robots_rules": q_robots_rules,
        "robots_allowed": q_robots_allowed,
        "crawl_frontier": q_crawl_frontier,
        "sitemap_urls": q_sitemap_urls,
        "revisit_change_rate": q_revisit_change_rate,
        "anchor_text_agg": q_anchor_text_agg,
        "bm25_pagerank_topk": q_bm25_pagerank_topk,
        "bm25_diverse_topk": q_bm25_diverse_topk,
        "bm25_collapse_topk": q_bm25_collapse_topk,
        "dedup_exact": q_dedup_exact,
        "minhash_bands": q_minhash_bands,
        "lsh_near_dup_pairs": q_lsh_near_dup_pairs,
        "curation_pipeline": q_curation_pipeline,
        "simhash": q_simhash,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_index_topk": q_ann_ivf_index_topk,
        "ann_pq_topk": q_ann_pq_topk,
        "ann_pq_refined_topk": q_ann_pq_refined_topk,
        "hybrid_rrf_topk": q_hybrid_rrf_topk,
        "hybrid_combmnz_topk": q_hybrid_combmnz_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "srp_near_dup": q_srp_near_dup,
        "lang_id": q_lang_id,
        "unicode_nfc": q_unicode_nfc,
        "quality_score": q_quality_score,
        "token_stats": q_token_stats,
        "pretoken_stats": q_pretoken_stats,
        "doc_fingerprint": q_doc_fingerprint,
        "decontaminate": q_decontaminate,
        "decontaminate_bloom": q_decontaminate_bloom,
        "repetition_filter": q_repetition_filter,
        "stratified_sample": q_stratified_sample,
        "weighted_sample": q_weighted_sample,
        "host_profile": q_host_profile,
        "cjk_bigrams": q_cjk_bigrams,
        "mix_report": q_mix_report,
        "dsir_weights": q_dsir_weights,
        "corpus_drift": q_corpus_drift,
        "host_boilerplate": q_host_boilerplate,
        "nb_lang_classify": q_nb_lang_classify,
        "passage_bm25_topk": q_passage_bm25_topk,
        "web_anchor_bm25f_topk": q_web_anchor_bm25f_topk,
        "ann_mmr_topk": q_ann_mmr_topk,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_image_meta": q_multimodal_image_meta,
        "multimodal_wav_stats": q_multimodal_wav_stats,
        "multimodal_features": q_multimodal_features,
        "frame_sample": q_frame_sample,
    }


def analytics_oracle_sql() -> dict[str, str]:
    return {
        "pii_scrub": sql_pii_scrub(),
        "sequence_pack": sql_sequence_pack(),
        "dedup_clusters": sql_dedup_clusters(),
        "lm_perplexity": sql_lm_perplexity(),
        "token_quantiles": sql_token_quantiles(),
        "vocab_growth": sql_vocab_growth(),
        "collocations_pmi": sql_collocations_pmi(),
        "dup_span_coverage": sql_dup_span_coverage(),
        "paragraph_dedup": sql_paragraph_dedup(),
        "simhash_near_dup": sql_simhash_near_dup(),
        "doc_chunks": sql_doc_chunks(),
        "c4_line_filter": sql_c4_line_filter(),
        "gopher_quality": sql_gopher_quality(),
        "cms_term_counts": sql_cms_term_counts(),
        "bloom_dictionary": sql_bloom_dictionary(),
        "hll_registers": sql_hll_registers(),
        "multimodal_png_pixels": sql_multimodal_png_pixels(),
        "warc_roundtrip": sql_warc_roundtrip(),
        "host_cap_sample": sql_host_cap_sample(),
        "pagerank_hosts": sql_pagerank_hosts(),
        "host_reciprocity": sql_host_reciprocity(),
        "hits_hosts": sql_hits_hosts(),
        "trustrank_hosts": sql_trustrank_hosts(),
        "url_canonical_dedup": sql_url_canonical_dedup(),
        "robots_rules": sql_robots_rules(),
        "robots_allowed": sql_robots_allowed(),
        "crawl_frontier": sql_crawl_frontier(),
        "sitemap_urls": sql_sitemap_urls(),
        "revisit_change_rate": sql_revisit_change_rate(),
        "anchor_text_agg": sql_anchor_text_agg(),
        "bm25_pagerank_topk": sql_bm25_pagerank_topk(),
        "bm25_diverse_topk": sql_bm25_diverse_topk(),
        "bm25_collapse_topk": sql_bm25_collapse_topk(),
        "dedup_exact": sql_dedup_exact(),
        "minhash_bands": sql_minhash_bands(),
        "lsh_near_dup_pairs": sql_lsh_near_dup_pairs(),
        "curation_pipeline": sql_curation_pipeline(),
        "simhash": sql_simhash(),
        "ngram_jaccard_pairs": sql_ngram_jaccard_pairs(),
        "ann_cosine_topk": sql_ann_cosine_topk(),
        "ann_ivf_topk": sql_ann_ivf_topk(),
        "ann_ivf_index_topk": sql_ann_ivf_index_topk(),
        "ann_pq_topk": sql_ann_pq_topk(),
        "ann_pq_refined_topk": sql_ann_pq_refined_topk(),
        "hybrid_rrf_topk": sql_hybrid_rrf_topk(),
        "hybrid_combmnz_topk": sql_hybrid_combmnz_topk(),
        "embedding_near_dup": sql_embedding_near_dup(),
        "srp_near_dup": sql_srp_near_dup(),
        "lang_id": sql_lang_id(),
        "unicode_nfc": sql_unicode_nfc(),
        "quality_score": sql_quality_score(),
        "token_stats": sql_token_stats(),
        "pretoken_stats": sql_pretoken_stats(),
        "doc_fingerprint": sql_doc_fingerprint(),
        "decontaminate": sql_decontaminate(),
        "decontaminate_bloom": sql_decontaminate_bloom(),
        "repetition_filter": sql_repetition_filter(),
        "stratified_sample": sql_stratified_sample(),
        "weighted_sample": sql_weighted_sample(),
        "host_profile": sql_host_profile(),
        "cjk_bigrams": sql_cjk_bigrams(),
        "mix_report": sql_mix_report(),
        "dsir_weights": sql_dsir_weights(),
        "corpus_drift": sql_corpus_drift(),
        "host_boilerplate": sql_host_boilerplate(),
        "nb_lang_classify": sql_nb_lang_classify(),
        "passage_bm25_topk": sql_passage_bm25_topk(),
        "web_anchor_bm25f_topk": sql_web_anchor_bm25f_topk(),
        "ann_mmr_topk": sql_ann_mmr_topk(),
        "multimodal_meta": sql_multimodal_meta(),
        "multimodal_image_meta": sql_multimodal_image_meta(),
        "multimodal_wav_stats": sql_multimodal_wav_stats(),
        "multimodal_features": sql_multimodal_features(),
        "frame_sample": sql_frame_sample(),
    }
