"""Distributed tokenize kernels (SURVEY E1 stage, T1-T12).

The hot path is ``tokenize_counts``: an Arrow-batched ``mapInPandas``
kernel that turns (doc_id, text) batches into (doc_id, term, tf) rows,
pre-aggregated per document inside the batch, so the downstream
``groupBy(term, doc_id)`` shuffle carries tf counts, never raw token
streams (reference: the SPIMI invert loop, SPIMI.java:111-117, done
here as one pass + one shuffle).

Stopwords are NOT filtered here — doc_len (D2) counts them; the build
stage drops them with a Catalyst-side ``~isin`` filter.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd

from ..text import tokenize

TOKEN_COUNTS_SCHEMA = "doc_id long, term string, tf int"

TOKEN_COUNTS_DOCINFO_SCHEMA = (
    "doc_id long, term string, tf int, doc_len long, max_tf int")


def tokenize_counts_kernel(
    batches: Iterator[pd.DataFrame], stem: bool = False
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, text) -> (doc_id, term, tf).

    Emits per-document term counts (including stopwords).  Because each
    document is wholly contained in one input row, counts are final —
    no re-aggregation needed downstream except the term-wise group.
    """
    for pdf in batches:
        doc_ids: list[int] = []
        terms: list[str] = []
        tfs: list[int] = []
        for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
            if text is None:
                continue
            for term, tf in Counter(tokenize(text, stem=stem)).items():
                doc_ids.append(doc_id)
                terms.append(term)
                tfs.append(tf)
        yield pd.DataFrame({"doc_id": doc_ids, "term": terms, "tf": tfs})


def make_tokenize_counts(stem: bool = False):
    """Bind the stem flag (kept out of the closure-captured hot loop)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return tokenize_counts_kernel(batches, stem=stem)

    return kernel


def tokenize_counts_docinfo_kernel(
    batches: Iterator[pd.DataFrame], stem: bool = False
) -> Iterator[pd.DataFrame]:
    """Fused kernel: (doc_id, text) -> token counts PLUS one per-doc
    SENTINEL row (term NULL) carrying (doc_len, max_tf).

    The docinfo aggregation (A3 doc_len over ALL tokens incl.
    stopwords, D2; A4 max_tf over indexed terms only, D3) re-walks
    exactly the Counter this kernel already holds — computing it here
    turns the build's docinfo stage from a second aggregation pass
    over the token relation into a narrow ``term IS NULL`` filter
    (r4 stage itemization: docinfo was 4.2s of the 21.6s sf0.1 build).
    Stopword token rows are DROPPED in the kernel: their only reader
    was the docinfo doc_len sum, which is folded into the sentinel
    here, so emitting them would only inflate the persisted relation
    for the postings filter to discard (T11 exclusion, applied one
    step earlier than ``build_postings``).  Docs whose tokenization is
    empty emit NO sentinel, matching the groupBy formulation (no
    docinfo row).  The padding values on the "other" side of each row
    (doc_len/max_tf on token rows, tf on sentinels) are never read —
    both consumers filter on ``term`` nullness first.
    """
    from ..text import STOPWORDS

    for pdf in batches:
        doc_ids: list[int] = []
        terms: list[str] = []
        tfs: list[int] = []
        s_ids: list[int] = []
        s_len: list[int] = []
        s_max: list[int] = []
        for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
            if text is None:
                continue
            counts = Counter(tokenize(text, stem=stem))
            if not counts:
                continue
            dl = 0
            mt = 0
            for term, tf in counts.items():
                dl += tf
                if term in STOPWORDS:
                    continue
                doc_ids.append(doc_id)
                terms.append(term)
                tfs.append(tf)
                if tf > mt:
                    mt = tf
            s_ids.append(doc_id)
            s_len.append(dl)
            s_max.append(mt)
        n, m = len(doc_ids), len(s_ids)
        yield pd.DataFrame({
            "doc_id": doc_ids + s_ids,
            "term": terms + [None] * m,
            "tf": tfs + [0] * m,
            "doc_len": [0] * n + s_len,
            "max_tf": [0] * n + s_max,
        })


def make_tokenize_counts_docinfo(stem: bool = False):
    """Bind the stem flag for the fused kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return tokenize_counts_docinfo_kernel(batches, stem=stem)

    return kernel


def extract_text_udf(col):
    """T1/T2 HTML extraction as a vectorized pandas UDF over a column
    (ir_spark/text.py::extract_text — the byte-identical invariant);
    used by jobs/build_index.py --from-html.  Built lazily so importing
    this module never requires an active SparkSession."""
    from pyspark.sql.functions import pandas_udf

    from ..text import extract_text

    @pandas_udf("string")
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(lambda h: None if h is None else extract_text(h))

    return _extract(col)


def tokenize_query(text: str, stem: bool = False) -> dict[str, int]:
    """Driver-side query tokenization — identical pipeline + stopword
    filter (QueryParser.java:47-68); queries are tiny (A8)."""
    from ..oracle import parse_query

    return parse_query(text, stem=stem)
