"""Compressed term-dictionary store: blocked front-coding per bucket.

Closes SURVEY §2.6 C4 (dictionary blocking k=8) and C5 (front coding)
with REAL codecs instead of the earlier delegate-to-Parquet decision
D7 — the reference's intent (`Compression.java:151-174`,
`Utils.java:152-176`, `README.md:27`) with its quirk-Q7 bugs
(dropped k-th term, unflushed final block) fixed, plus C6 fixed-width
as the size baseline (`Compression.java:71-77`).

Layout: the dictionary is hashed into ``n_buckets`` buckets with the
SAME md5-derived rule as the posting segments
(``storage.term_bucket_col`` — so a query term prunes to one
dictionary bucket with the same arithmetic that prunes its posting
bucket, and the bucket id is computable driver-side with hashlib,
no Spark job per probe), terms SORTED within each bucket
(blocks need sorted input for long LCPs), then one row per bucket:
(bucket, n_terms, terms_fc:binary, dfs_vb:binary, cfs_vb:binary).

Scale shape: one shuffle on the bucket key; each bucket's blob is
assembled by an Arrow-batched kernel; lookups decode ONE bucket's
terms (a few MB at 10^8-term vocabularies with thousands of buckets).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources import storage
from ..codec import (
    DICT_BLOCK,
    frontcode_decode,
    frontcode_encode,
    varbyte_decode,
    varbyte_encode,
)

_STORE_SCHEMA = ("bucket int, n_terms long, terms_fc binary, "
                 "dfs_vb binary, cfs_vb binary")


def encode_dictionary(dictionary: DataFrame, n_buckets: int = 32,
                      k: int = DICT_BLOCK) -> DataFrame:
    """(term, df, cf) -> one front-coded row per bucket."""

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("term")
        terms = pdf["term"].tolist()
        return pd.DataFrame({
            "bucket": [int(key[0])],
            "n_terms": [len(terms)],
            "terms_fc": [frontcode_encode(terms, k)],
            "dfs_vb": [varbyte_encode(pdf["df"].to_numpy(np.uint64))],
            "cfs_vb": [varbyte_encode(pdf["cf"].to_numpy(np.uint64))],
        })

    bucketed = dictionary.withColumn(
        "bucket", storage.term_bucket_col(F.col("term"), n_buckets))
    return bucketed.groupBy("bucket").applyInPandas(kernel, _STORE_SCHEMA)


def decode_dictionary(blocks: DataFrame) -> DataFrame:
    """Inverse: front-coded bucket rows -> (term, df, cf) relation."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms: list[str] = []
            dfs: list[int] = []
            cfs: list[int] = []
            for _, r in pdf.iterrows():
                ts = frontcode_decode(bytes(r["terms_fc"]))
                assert len(ts) == int(r["n_terms"])
                terms.extend(ts)
                dfs.extend(varbyte_decode(bytes(r["dfs_vb"])).tolist())
                cfs.extend(varbyte_decode(bytes(r["cfs_vb"])).tolist())
            yield pd.DataFrame({"term": terms, "df": dfs, "cf": cfs})

    return blocks.mapInPandas(kernel, "term string, df long, cf long")


def lookup_terms(blocks: DataFrame, terms: list[str],
                 n_buckets: int = 32) -> DataFrame:
    """Query-side probe: (term, df, cf) for a small term set, reading
    ONLY the buckets those terms hash to.

    The bucket ids are computed DRIVER-SIDE with hashlib (the md5
    rule ``storage.term_bucket_py`` — bit-identical to the writer's
    column expression), pushed down as ``bucket IN (...)``
    (partition/row-group pruning when the block table is stored
    partitioned by bucket), and only the matching buckets' blobs are
    decoded.  A |query|-term probe therefore touches <= |query|
    buckets regardless of vocabulary size, and costs ZERO Spark jobs
    beyond the pruned read itself.
    """
    spark = blocks.sparkSession
    if not terms:
        return spark.createDataFrame([], "term string, df long, cf long")
    uniq = sorted(set(terms))
    wanted = sorted({storage.term_bucket_py(t, n_buckets) for t in uniq})
    pruned = blocks.filter(F.col("bucket").isin(wanted))
    return decode_dictionary(pruned).filter(F.col("term").isin(uniq))
