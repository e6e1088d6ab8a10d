"""Embedding similarity search: brute-force cosine top-k (baseline)
and an IVF-style partition-probed variant (the scale path).

Input table: ``embeddings(vec_id:long, embedding:array<float>,
label:int)`` (unit-normalized vectors — cosine == dot product, but we
divide by norms anyway so the operators are correct on raw vectors).

Spark-first design:
- dot products via ``zip_with`` + ``aggregate`` higher-order functions
  — per-row JVM evaluation, float64 accumulation, NO Python worker and
  NO shuffle for the scan+score phase; the only shuffle is the final
  TakeOrderedAndProject top-k merge (k rows per partition).
- IVF: coarse quantization by an existing partition key (here
  ``label``; at scale a KMeans codebook id baked into the table and
  used as the Parquet partition column).  The query probes the
  ``n_probe`` nearest centroids, and partition pruning skips every
  other partition's files entirely — the 100 TB path reads only
  ``n_probe / n_partitions`` of the data.
- centroids: one groupBy(label) over posexploded components — shuffle
  payload is n_labels * dim rows, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _qlit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)).cast("double") for x in query_vec])


def dot_expr(vec_col: Column, query_vec: list[float]) -> Column:
    """Float64 dot product of an array<float> column with a literal
    query vector, evaluated JVM-side (sequential fold — deterministic
    summation order, reproducible across engines)."""
    prods = F.zip_with(vec_col, _qlit(query_vec),
                       lambda x, y: x.cast("double") * y)
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def norm_expr(vec_col: Column) -> Column:
    sq = F.aggregate(
        vec_col, F.lit(0.0).cast("double"),
        lambda acc, v: acc + v.cast("double") * v.cast("double"))
    return F.sqrt(sq)


def cosine_scores(emb: DataFrame, query_vec: list[float]) -> DataFrame:
    """(vec_id, embedding, ...) -> (vec_id, score:double) cosine vs the
    query.  Narrow (no shuffle); feeds TakeOrderedAndProject."""
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    dot = dot_expr(F.col("embedding"), query_vec)
    dn = norm_expr(F.col("embedding"))
    score = F.when((dn > 0) & (F.lit(qn) > 0), dot / dn / F.lit(qn)).otherwise(F.lit(0.0))
    return emb.select("vec_id", score.alias("score"))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """Brute-force exact top-k: per-partition heap + driver merge
    (TakeOrderedAndProject) — the correctness baseline for ANN."""
    return (
        cosine_scores(emb, query_vec)
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def label_centroids(emb: DataFrame) -> DataFrame:
    """(label, pos, c) — elementwise mean embedding per label.
    posexplode -> groupBy: one shuffle of (labels x dim) partial sums."""
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
    )


def nearest_labels(centroids: DataFrame, query_vec: list[float],
                   n_probe: int) -> list[int]:
    """Driver-side probe selection: dot(query, centroid) per label,
    top n_probe (micro-quantized, label-asc tie-break).  The centroid
    table is tiny (n_labels x dim) — collect is the right move."""
    scored = (
        centroids.groupBy("label")
        .agg(F.sum(
            F.col("c") * F.element_at(_qlit(query_vec), F.col("pos") + 1)
        ).alias("dot"))
        .select("label", F.round(F.col("dot") * 1e6).cast("long").alias("dot_micro"))
        .orderBy(F.desc("dot_micro"), F.asc("label"))
        .limit(n_probe)
    )
    return [r.label for r in scored.collect()]


def pair_cosine_expr(va: Column, vb: Column) -> Column:
    """Exact float64 cosine between two array<float> columns (JVM
    higher-order fns, sequential fold — deterministic order)."""
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"), lambda acc, v: acc + v)
    na, nb = norm_expr(va), norm_expr(vb)
    return F.when((na > 0) & (nb > 0), dot / na / nb).otherwise(F.lit(0.0))


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.6,
                             block_col: str = "label") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: exact cosine >= threshold
    within each ``block_col`` partition.

    Blocked-exact is the scale pattern: the quadratic self-join runs
    only within blocks (here ``label``; at 100 TB an IVF/LSH bucket id
    materialized as the table's partition column), so cost is
    sum(n_block^2) instead of n^2, the join shuffles on a high-
    cardinality key, and AQE splits skewed blocks.  Candidate recall is
    the blocking key's recall — near-identical vectors share a coarse
    bucket by construction.
    """
    # norms once per vector (not per pair — the self-join would
    # otherwise recompute each side's norm |block| times)
    with_norm = emb.select(
        F.col(block_col).alias("blk"), "vec_id", "embedding",
        norm_expr(F.col("embedding")).alias("nrm"))
    a = with_norm.select("blk", F.col("vec_id").alias("a"),
                         F.col("embedding").alias("ea"),
                         F.col("nrm").alias("na"))
    b = with_norm.select("blk", F.col("vec_id").alias("b"),
                         F.col("embedding").alias("eb"),
                         F.col("nrm").alias("nb"))
    pairs = a.join(b, "blk").filter(F.col("a") < F.col("b"))
    dot = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"), lambda acc, v: acc + v)
    cos = F.when((F.col("na") > 0) & (F.col("nb") > 0),
                 dot / F.col("na") / F.col("nb")).otherwise(F.lit(0.0))
    return (
        pairs.select("a", "b",
                     F.round(cos * 1e6).cast("long").alias("cosine_micro"))
        .filter(F.col("cosine_micro") >= int(round(threshold * 1e6)))
    )


def ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             n_probe: int = 3, centroids: DataFrame | None = None) -> DataFrame:
    """IVF-style ANN: probe the n_probe nearest label partitions, then
    exact cosine within them.  ``label IN (...)`` is a pushed-down
    partition filter when the table is partitioned/bucketed by label —
    the scan never touches unprobed partitions."""
    if centroids is None:
        centroids = label_centroids(emb)
    probes = nearest_labels(centroids, query_vec, n_probe)
    pruned = emb.filter(F.col("label").isin(probes))
    return cosine_topk(pruned, query_vec, k)


# --- materialized IVF index (build once, probe many) -----------------------

def build_ivf_index(emb: DataFrame, index_dir: str, n_cells: int = 16,
                    max_iter: int = 10, seed: int = 42,
                    replicas: int = 1) -> dict:
    """Train a real KMeans codebook (pyspark.ml) and materialize the
    IVF index: the embedding table rewritten as parquet PARTITIONED BY
    its assigned cell, plus a tiny ``centroids`` table and a manifest.

    This is the build-once/probe-many shape: at query time the probe
    set becomes a directory-level partition filter, so a probe reads
    ``n_probe / n_cells`` of the files — no per-query clustering, no
    full scan.  Training cost is KMeans over the corpus (Spark ML,
    distributed); assignment is one model.transform pass.

    ``replicas`` > 1 is multi-assignment (ScaNN "spilling" / FAISS
    replica lists): each vector is written into its ``replicas``
    nearest cells, trading ``replicas``x storage for recall at a FIXED
    n_probe — the true neighbors a single-assignment probe misses are
    the ones sitting just across a cell boundary, and spilled copies
    put them back in reach.  The query path dedupes by vec_id.
    Assignment stays one vectorized Arrow pass (mapInPandas kernel
    ranking the broadcast centroid matrix per batch), zero shuffle
    before the partitioned write.

    Returns the manifest dict (n_cells, n_vectors, dim, replicas)."""
    import json
    import os

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    from ..sources.storage import atomic_write_parquet

    # resume point: the manifest is written LAST, so its presence
    # certifies a complete build — a re-run (driver restart, retried
    # job) is a no-op unless the requested shape changed
    manifest_path = os.path.join(index_dir, "ivf_manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            manifest = json.load(fh)
        if (manifest.get("n_cells") == n_cells
                and manifest.get("seed") == seed
                and manifest.get("max_iter") == max_iter
                and manifest.get("replicas", 1) == replicas):
            # max_iter is part of the build shape too: a re-run asking
            # for better-trained centroids must NOT silently return
            # the stale coarser codebook
            return manifest

    spark = emb.sparkSession
    vec = emb.withColumn("_features",
                         array_to_vector(F.col("embedding").cast("array<double>")))
    model = KMeans(k=n_cells, maxIter=max_iter, seed=seed,
                   featuresCol="_features", predictionCol="cell").fit(vec)
    if replicas <= 1:
        assigned = model.transform(vec).drop("_features")
    else:
        import numpy as np
        import pandas as pd

        cents = np.array([np.asarray(c, dtype=np.float64)
                          for c in model.clusterCenters()])
        r = min(replicas, n_cells)
        in_cols = [f for f in emb.columns]

        def kernel(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf["embedding"]), dtype=np.float64)
                # (n, cells) squared L2 without the query-constant |v|^2
                d2 = (-2.0 * mat @ cents.T
                      + (cents * cents).sum(axis=1)[None, :])
                near = np.argsort(d2, axis=1, kind="stable")[:, :r]
                rep = pdf.loc[pdf.index.repeat(r)].reset_index(drop=True)
                rep["cell"] = near.reshape(-1).astype(np.int32)
                yield rep

        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in emb.schema
        ) + ", cell int"
        assigned = emb.mapInPandas(kernel, schema=schema).select(
            *in_cols, "cell")
    atomic_write_parquet(assigned, os.path.join(index_dir, "vectors"),
                         partition_by=["cell"])
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>")
    atomic_write_parquet(centroids, os.path.join(index_dir, "centroids"))
    row = emb.select(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size("embedding")).alias("dim")).head()
    manifest = {"n_cells": n_cells, "n_vectors": int(row["n"]),
                "dim": int(row["dim"]), "seed": seed, "max_iter": max_iter,
                "replicas": replicas}
    with open(os.path.join(index_dir, "ivf_manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def ivf_probe_cells(centroid_rows, query_vec: list[float],
                    n_probe: int) -> list[int]:
    """Driver-side probe selection over the (tiny) centroid table:
    cells ranked by dot product with the query, cell id as the
    deterministic tie-break.  The ONE definition of which cells a
    probe touches — the query path and any harness measuring
    rows-read cost (BENCH/ann_frontier.py) must share it, or a later
    change to the ranking would silently decouple measured cost from
    measured recall."""
    import numpy as np

    c = np.array([r["centroid"] for r in centroid_rows])
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.lexsort(
        (np.array([r["cell"] for r in centroid_rows]), -(c @ q)))
    return [int(centroid_rows[i]["cell"])
            for i in order[: min(n_probe, len(centroid_rows))]]


def ivf_index_topk(spark, index_dir: str, query_vec: list[float],
                   k: int = 10, n_probe: int = 3) -> DataFrame:
    """Top-k cosine over a materialized IVF index: pick the n_probe
    nearest cells driver-side from the (tiny) centroid table, then scan
    ONLY those cells' partition directories (``cell IN (...)`` is a
    directory-level PartitionFilter — verified in PLANS.md §8).
    With n_probe >= n_cells this is exact brute force over the
    partitioned store."""
    import json
    import os

    import numpy as np

    with open(os.path.join(index_dir, "ivf_manifest.json")) as fh:
        manifest = json.load(fh)
    cents = (spark.read.parquet(os.path.join(index_dir, "centroids"))
             .orderBy("cell").collect())
    probes = ivf_probe_cells(cents, query_vec, n_probe)
    vecs = spark.read.parquet(os.path.join(index_dir, "vectors"))
    pruned = vecs.filter(F.col("cell").isin(probes))
    if manifest.get("replicas", 1) > 1:
        # multi-assignment stores a vector in several cells; a probe
        # touching two of them must not surface the doc twice.  The
        # dedupe shuffles only the PROBED subset (the same rows the
        # exact scorer reads anyway), keyed on vec_id.
        pruned = pruned.dropDuplicates(["vec_id"])
    return cosine_topk(pruned, query_vec, k)


def srp_signatures(emb: DataFrame, *, dim: int, n_bits: int = 32,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Signed-random-projection cosine sketch (Charikar, STOC 2002):
    bit i of the signature is [<v, s_i> >= 0] with a fixed ±1
    projection s_i whose entries come from md5-parity of ``(i, d)`` —
    NO RNG, so signatures are deterministic and engine-reproducible.
    P[bit agreement] = 1 - angle(u, v)/pi, so Hamming distance on the
    signatures estimates cosine similarity.

    This is the 100-TB embedding near-dup path: feed the output
    straight into dedup.simhash_near_dup_pairs — the Manku pigeonhole
    blocker runs unchanged over these fingerprints, so candidate
    pairing needs no all-pairs pass and no float arithmetic.  The
    sketch itself is ONE narrow map (n_bits fold expressions per
    vector); (id, simhash) is all that travels downstream.
    """
    import hashlib

    if n_bits > 62:
        raise ValueError("signature must fit a signed 64-bit long")

    def _sign(i: int, d: int) -> int:
        h = int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:8], 16)
        return 1 if h % 2 == 0 else -1

    bit_terms = []
    for i in range(n_bits):
        signs = ",".join(str(_sign(i, d)) for d in range(dim))
        dot = (f"aggregate(zip_with({vec_col}, array({signs}), "
               f"(x, s) -> CAST(x AS DOUBLE) * s), CAST(0.0 AS DOUBLE), "
               f"(a, y) -> a + y)")
        bit_terms.append(
            f"(CASE WHEN {dot} >= 0 THEN CAST({1 << i} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)")
    sig = " + ".join(bit_terms)
    return emb.select(F.col(id_col).alias("vec_id"),
                      F.expr(sig).alias("simhash"))


# --- product quantization (Jégou et al. 2011) --------------------------------
#
# The vector-side compression analogue of the posting codecs: a D-dim
# float32 vector (4D bytes) becomes m uint8 codes (m bytes, e.g. 64
# dims -> 8 bytes, 32x), and top-k search runs over CODES with an
# asymmetric-distance LUT (m*ksub floats per query) — the standard
# billion-vector memory-residency trick (FAISS IndexPQ).  Encoding is
# a narrow vectorized map; search reads only the code column.
#
# Float discipline: per-subspace distances / dot products accumulate
# LEFT-ASSOCIATIVELY component by component (a Python loop over dsub
# vectorized numpy ops, NOT np.sum's pairwise tree), matching the
# unrolled `(..((t1+t2)+t3)..)` expressions a SQL oracle emits — so an
# argmin code assignment never flips on summation order across
# engines.  Ties break to the smallest centroid id on both sides.


def pq_sampled_codebook(emb: DataFrame, *, m: int, ksub: int,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> "np.ndarray":
    """Deterministic data-sampled codebook: the sub-vectors of the
    ``ksub`` smallest-id vectors.  Crude vs k-means (use
    ``pq_train_kmeans`` for quality) but exactly re-derivable by any
    engine from the table alone — the oracle-friendly init."""
    import numpy as np

    rows = (emb.filter(F.col(id_col) < ksub)
            .select(id_col, vec_col).collect())
    if len(rows) < ksub:
        raise ValueError(f"need >= {ksub} vectors for the sampled codebook")
    mat = np.array([r[1] for r in sorted(rows, key=lambda r: r[0])],
                   dtype=np.float64)
    d = mat.shape[1]
    if d % m:
        raise ValueError("dim must divide into m subspaces")
    return mat.reshape(ksub, m, d // m).transpose(1, 0, 2).copy()


def pq_train_kmeans(emb: DataFrame, *, m: int, ksub: int,
                    sample: int = 10_000, iters: int = 10, seed: int = 7,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> "np.ndarray":
    """Per-subspace Lloyd k-means on a bounded deterministic sample
    (hash-ordered smallest ids) -> codebooks (m, ksub, dsub).  Training
    touches <= ``sample`` driver-side vectors no matter the corpus
    size; encoding (the corpus-wide pass) stays distributed."""
    import numpy as np

    rows = (emb.select(id_col, vec_col)
            .orderBy(F.md5(F.col(id_col).cast("string")))
            .limit(sample).collect())
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    n, d = mat.shape
    if d % m:
        raise ValueError("dim must divide into m subspaces")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        x = mat[:, j * dsub:(j + 1) * dsub]
        cents = x[rng.choice(n, size=ksub, replace=n < ksub)].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                pts = x[assign == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        books[j] = cents
    return books


def _pq_subspace_dists(sub: "np.ndarray", cents: "np.ndarray") -> "np.ndarray":
    """(n, dsub) x (ksub, dsub) -> (n, ksub) squared L2, accumulated
    left-associatively over components (see module note)."""
    import numpy as np

    n, dsub = sub.shape
    out = np.zeros((n, cents.shape[0]), dtype=np.float64)
    for i in range(dsub):
        diff = sub[:, i:i + 1] - cents[None, :, i]
        out = out + diff * diff
    return out


def pq_encode(emb: DataFrame, codebooks: "np.ndarray", *,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, vector) -> (vec_id, codes array<int>): per subspace the
    nearest centroid id.  Arrow-batched vectorized kernel; narrow map,
    zero shuffle."""
    import numpy as np
    import pandas as pd

    m, ksub, dsub = codebooks.shape
    books = codebooks.copy()

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                d2 = _pq_subspace_dists(
                    mat[:, j * dsub:(j + 1) * dsub], books[j])
                codes[:, j] = d2.argmin(axis=1)  # first min = smallest c
            yield pd.DataFrame({"vec_id": pdf[id_col].values,
                                "codes": list(codes)})

    return emb.select(id_col, vec_col).mapInPandas(
        kernel, schema="vec_id long, codes array<int>")


def pq_scores(codes: DataFrame, codebooks: "np.ndarray",
              query_vec: list) -> DataFrame:
    """Asymmetric-distance inner product over PQ codes -> (vec_id,
    score): score = sum_j <q_j, centroid_{j, code_j}> via an (m, ksub)
    lookup table — the scan reads ONLY the m-byte codes.  Narrow map,
    no shuffle; callers rank it."""
    import numpy as np
    import pandas as pd

    m, ksub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError("query dim mismatch")
    lut = np.zeros((m, ksub), dtype=np.float64)
    for j in range(m):
        for i in range(dsub):
            lut[j] = lut[j] + q[j * dsub + i] * codebooks[j, :, i]

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cd = np.array(list(pdf["codes"]), dtype=np.int64)
            s = np.zeros(len(pdf), dtype=np.float64)
            for j in range(m):
                s = s + lut[j][cd[:, j]]
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values, "score": s})

    return codes.mapInPandas(kernel, schema="vec_id long, score double")


def pq_topk(codes: DataFrame, codebooks: "np.ndarray",
            query_vec: list, k: int = 10) -> DataFrame:
    """ADC top-k over PQ codes (see pq_scores).  With normalized
    inputs this approximates cosine ranking."""
    scored = pq_scores(codes, codebooks, query_vec)
    return scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(k)


def pq_topk_refined(codes: DataFrame, codebooks: "np.ndarray",
                    emb: DataFrame, query_vec: list, k: int = 10,
                    overfetch: int = 5) -> DataFrame:
    """Two-phase PQ retrieval (Faiss IndexRefineFlat pattern, the
    lossless champion->exact shape champions.py already proves for
    text): phase 1 scans ONLY the m-byte codes and keeps the ADC top
    ``k * overfetch`` candidate ids; phase 2 reads the full vectors of
    JUST those candidate rows (broadcast semi-join on vec_id — k*of
    rows, never the table) and reranks by exact cosine.  Returned
    scores are exact; recall@k equals the candidate set's coverage of
    the true top-k, which over-fetch drives up at a cost of k*of full
    vector reads per query (measured in BENCH/detail.json)."""
    cands = pq_topk(codes, codebooks, query_vec,
                    k=k * overfetch).select("vec_id")
    pruned = emb.join(F.broadcast(cands), "vec_id")
    return cosine_topk(pruned, query_vec, k)


def mmr_rerank(emb: DataFrame, query_vec: list[float], *, k: int = 10,
               n_candidates: int = 50, lam_num: int = 7,
               lam_den: int = 10) -> DataFrame:
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998) —
    the embedding-space result diversifier: greedily pick k of the
    top-``n_candidates`` cosine candidates maximizing

        lam * sim(q, d)  -  (1 - lam) * max_{s in selected} sim(d, s)

    with lam = lam_num / lam_den.  The selection argmax runs on
    MICRO-QUANTIZED similarities with pure integer arithmetic
    (``obj = lam_num * rel_micro - (lam_den - lam_num) * max_sim_micro``
    — a lam_den-scaled, hence order-identical, objective), so the pick
    sequence is bit-reproducible across engines; ties break on vec_id
    ASC.  First pick carries an empty selected set (max term = 0), i.e.
    it is the plain cosine argmax.

    Plan shape (the part that must scale): the corpus-sized work is the
    ONE distributed cosine scan proposing the candidates (narrow map +
    TakeOrderedAndProject) plus ONE bounded self-join computing the
    n_candidates^2 pairwise similarity matrix (candidates broadcast —
    the corpus is touched exactly once).  The greedy loop itself is
    O(k * n_candidates) integer ops over that collected matrix — head-
    node work every production reranker does on the candidate page,
    independent of corpus size by construction.

    Returns (sel_rank:int, vec_id:long, obj_micro:long), sel_rank 1..k.
    """
    spark = emb.sparkSession
    # persist the candidate page: it feeds the pairwise join AND the
    # rel_rows collect, and without the cache each consumer re-runs
    # the corpus-sized cosine scan — "touched exactly once" must hold
    # in the plan, not just the docstring
    rel = (
        cosine_scores(emb, query_vec)
        .select("vec_id",
                F.round(F.col("score") * 1e6).cast("long").alias("rel_micro"))
        .orderBy(F.desc("rel_micro"), F.asc("vec_id"))
        .limit(n_candidates)
    ).persist()
    try:
        cand = F.broadcast(
            emb.join(F.broadcast(rel), "vec_id")
            .select("vec_id", "embedding", "rel_micro"))
        a = cand.select(F.col("vec_id").alias("a"),
                        F.col("embedding").alias("ea"))
        b = cand.select(F.col("vec_id").alias("b"),
                        F.col("embedding").alias("eb"))
        pairs = (
            a.join(b, F.col("a") < F.col("b"))
            .select("a", "b",
                    F.round(pair_cosine_expr(F.col("ea"), F.col("eb")) * 1e6)
                    .cast("long").alias("sim_micro"))
        )

        rel_rows = {r["vec_id"]: r["rel_micro"]
                    for r in rel.select("vec_id", "rel_micro").collect()}
        sim: dict[tuple[int, int], int] = {}
        for r in pairs.collect():
            sim[(r["a"], r["b"])] = r["sim_micro"]
            sim[(r["b"], r["a"])] = r["sim_micro"]
    finally:
        rel.unpersist()

    diff = lam_den - lam_num
    selected: list[tuple[int, int, int]] = []  # (rank, vec_id, obj)
    chosen: set[int] = set()
    while rel_rows and len(selected) < k:
        best = None
        for v, rm in rel_rows.items():
            if v in chosen:
                continue
            penalty = max((sim[(v, s)] for s in chosen), default=0)
            obj = lam_num * rm - diff * penalty
            if best is None or (obj, -v) > (best[1], -best[0]):
                best = (v, obj)
        if best is None:
            break
        chosen.add(best[0])
        selected.append((len(selected) + 1, best[0], best[1]))
    return spark.createDataFrame(
        selected, "sel_rank int, vec_id long, obj_micro long")
