"""Spark SQL schemas for every table the engine reads or writes.

SURVEY §1.2: docIDs are LongType (the reference's 4-byte ints overflow
at 2^31 — Utils.java:48-52 — and the north rule targets 10^12 docs);
tf/df fit IntegerType per posting but aggregate counts are LongType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# authoritative input shape (BASELINE.json input_hint)
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# url <-> deterministic dense doc_id (SURVEY S1)
DOC_MAP = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
    ]
)

# output of the tokenize kernel: per-doc term frequencies, stopwords
# INCLUDED (doc_len per D2 counts them; the build filters them out)
TOKEN_COUNTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
    ]
)

DOCINFO = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("doc_len", T.LongType(), False),
        T.StructField("max_tf", T.IntegerType(), True),
    ]
)

DICTIONARY = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
    ]
)

# compressed index segment rows (SURVEY §1.3 Spark mapping): one row
# per (term, run) with four varbyte streams (postings + denormalized
# doc stats), block metadata and the (tf, doc_len) Pareto skylines for
# block-max WAND.  Kept in sync with the writer's Arrow schema
# (segments.py::_ENCODED + the term/run/run_df/run_cf/bucket columns
# added around the kernel) — the writer schema is authoritative.
SEGMENTS = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("run", T.LongType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        # directory partition columns (bucket=N/ under grp=G/): grp is
        # the append-batch segment group (snapshots/tiered merges key
        # on it); partition discovery infers both as int
        T.StructField("grp", T.IntegerType(), False),
        T.StructField("run_df", T.LongType(), False),
        T.StructField("run_cf", T.LongType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("doc_gaps_vb", T.BinaryType(), False),
        T.StructField("tfs_vb", T.BinaryType(), False),
        T.StructField("doc_lens_vb", T.BinaryType(), False),
        T.StructField("max_tfs_vb", T.BinaryType(), False),
        T.StructField("block_last_doc_id", T.ArrayType(T.LongType()), False),
        T.StructField("block_max_tf", T.ArrayType(T.IntegerType()), False),
        T.StructField("block_min_doc_len", T.ArrayType(T.LongType()), False),
        T.StructField("block_sky_idx", T.ArrayType(T.IntegerType()), False),
        T.StructField("block_sky_tf", T.ArrayType(T.IntegerType()), False),
        T.StructField("block_sky_dl", T.ArrayType(T.LongType()), False),
    ]
)
