"""Bounded-memory frequency/membership sketches for corpus-scale
term statistics: Count-Min (Cormode & Muthukrishnan 2005) and Bloom
(Bloom 1970) over term streams.

Why on a 100-TB corpus: exact per-term counts need a term-keyed
shuffle whose state grows with the vocabulary; a sketch is a FIXED
depth x width (or m-bit) table that partial-aggregates map-side, so
the shuffle carries at most depth*width rows regardless of corpus or
vocabulary size.  Spark's own runtime uses the same trick (bloom
joins, CountMinSketch in sql.DataFrameStatFunctions); these operators
expose it declaratively with md5-derived hash rows so results are
bit-reproducible across engines (the gate oracle recomputes the
sketch in SQL).

Reference scope: the reference engine keeps exact df/cf dictionaries
(pyindex/indexer); these sketches are the scale-path companion for
when the vocabulary itself does not fit (e.g. shingle or URL spaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, seed_col, modulus: int):
    """Deterministic hash bucket: first 8 hex digits of
    md5(seed || ':' || value) as an int, mod ``modulus`` — the same
    cross-engine idiom as the MinHash/LSH operators."""
    return (
        F.conv(F.substring(
            F.md5(F.concat(seed_col.cast("string"), F.lit(":"),
                           col).cast("binary")), 1, 8), 16, 10)
        .cast("long") % modulus
    )


def count_min_build(term_counts: DataFrame, *, depth: int = 4,
                    width: int = 1024) -> DataFrame:
    """(term, cnt) -> (row, bucket, cnt): the Count-Min table.

    Each input term lands in one bucket per hash row; the table has at
    most depth*width rows TOTAL, so the groupBy's partial aggregation
    absorbs arbitrarily large inputs map-side and the shuffle is O(1)
    in corpus size.  Estimates (count_min_estimate) are upper bounds:
    est >= true always; est <= true + eps*N with prob 1-delta for
    width = e/eps, depth = ln(1/delta).
    """
    rows = F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("row")
    exploded = term_counts.select(
        rows, F.col("term"), F.col("cnt").cast("long").alias("cnt"))
    return (exploded
            .withColumn("bucket", _bucket(F.col("term"), F.col("row"), width))
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt")))


def count_min_estimate(cms: DataFrame, probes: DataFrame, *,
                       depth: int = 4, width: int = 1024) -> DataFrame:
    """(probe terms) x (CMS table) -> (term, est): min over hash rows
    of the bucket count, 0 when a row's bucket is empty.

    depth/width MUST match the build.  The probe side is tiny (a query
    term list); the CMS side is bounded by depth*width — the join
    broadcasts whichever is smaller, no large shuffle either way.
    """
    rows = F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("row")
    p = (probes.select(rows, "term")
         .withColumn("bucket", _bucket(F.col("term"), F.col("row"), width)))
    return (p.join(F.broadcast(cms), ["row", "bucket"], "left")
            .groupBy("term")
            .agg(F.min(F.coalesce("cnt", F.lit(0)))
                 .cast("long").alias("est")))


def bloom_build(terms: DataFrame, *, n_hashes: int = 5,
                n_bits: int = 8192) -> DataFrame:
    """(term) -> (bit): the set bit positions of a Bloom filter.

    Emitted as distinct positions (at most n_bits rows) rather than a
    packed bitmap so the structure stays engine-portable; packing to
    a bitmap blob for shipping is a byte-level detail downstream of
    this plan.  False-positive rate ~ (1 - e^(-kn/m))^k.
    """
    ks = F.explode(F.expr(f"sequence(0, {n_hashes - 1})")).alias("k")
    return (terms.select(ks, "term")
            .select(_bucket(F.col("term"), F.col("k"), n_bits).alias("bit"))
            .distinct())


def bloom_might_contain(bloom: DataFrame, probes: DataFrame, *,
                        n_hashes: int = 5, n_bits: int = 8192) -> DataFrame:
    """(probe terms) x (bloom bits) -> (term, might_contain 0/1):
    1 iff ALL n_hashes positions are set (no false negatives; false
    positives at the configured rate).  Parameters MUST match the
    build.  The bloom side is bounded by n_bits — broadcast."""
    ks = F.explode(F.expr(f"sequence(0, {n_hashes - 1})")).alias("k")
    p = (probes.select(ks, "term")
         .select("term", _bucket(F.col("term"), F.col("k"), n_bits)
                 .alias("bit")))
    return (p.join(F.broadcast(bloom.withColumn("_set", F.lit(1))),
                   "bit", "left")
            .groupBy("term")
            .agg((F.min(F.coalesce("_set", F.lit(0))) == 1)
                 .cast("int").alias("might_contain")))


def hll_build(terms: DataFrame, *, b: int = 8) -> DataFrame:
    """(term) -> (bucket, register): HyperLogLog registers (Flajolet
    et al. 2007) with m = 2^b buckets over a 32-bit md5-derived hash.

    bucket = the hash's top b bits; register = max over the bucket's
    values of rho(w) = leading-zero count of the remaining 32-b bits,
    plus one.  rho is computed from the BINARY STRING LENGTH of w
    (32-b-len(bin(w))+1), not a float log2, so the construction is
    bit-exact across engines.  Like the CMS, the groupBy's key space
    is at most m: the shuffle carries at most m rows per upstream
    partition regardless of how many distinct values stream through —
    THE way to count distinct URLs/shingles at crawl scale without a
    distinct-keyed shuffle (Spark's approx_count_distinct is the same
    structure; this one is engine-portable and oracle-checkable).
    Empty buckets are implicit (estimator treats them as register 0).
    """
    if not 4 <= b <= 16:
        raise ValueError("b must be in [4, 16]")
    tail_bits = 32 - b
    h = (F.conv(F.substring(F.md5(F.col("term").cast("binary")), 1, 8),
                16, 10).cast("long"))
    w = h % (1 << tail_bits)
    rho = F.when(F.col("_w") > 0,
                 F.lit(tail_bits) - (F.length(F.expr("bin(_w)")) - 1)
                 ).otherwise(F.lit(tail_bits + 1))
    return (terms.select(F.floor(h / (1 << tail_bits)).cast("long")
                         .alias("bucket"), w.alias("_w"))
            .select("bucket", rho.cast("long").alias("rho"))
            .groupBy("bucket")
            .agg(F.max("rho").cast("long").alias("register")))


def hll_estimate(registers: DataFrame, *, b: int = 8) -> float:
    """Cardinality estimate from an hll_build table.  Collects at most
    m = 2^b register rows to the driver (the sketch IS tiny — that is
    the point), then applies the standard HLL estimator with the
    small-range (linear counting) correction."""
    import math

    m = 1 << b
    regs = {int(r["bucket"]): int(r["register"])
            for r in registers.collect()}
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    zeros = sum(1 for j in range(m) if regs.get(j, 0) == 0)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est
