"""URL canonicalization — the first dedup key of any web crawl.

Common-Crawl-style corpora carry the same page under many url
spellings (scheme/host case, default ports, fragments, unsorted query
params, trailing slashes).  ``canonicalize_url`` folds those into one
canonical form so exact URL-dedup (one groupBy) catches them.

Everything here is JVM-side column expressions (regexp + array ops)
inside whole-stage codegen — no Python, no shuffle; at 10^12 rows this
is a pure map stage fused into the scan.

Rules applied (RFC 3986 normalization subset, crawl-practical):
  1. scheme and host lower-cased (path/query case preserved);
  2. default port stripped (``:80`` for http, ``:443`` for https);
  3. fragment (``#...``) dropped;
  4. query parameters sorted bytewise (``?b=2&a=1`` == ``?a=1&b=2``);
  5. trailing slash stripped from non-root paths; empty path -> ``/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"
_PORT = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:(\d+)"
# path incl. leading '/', excluding query and fragment
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
# anchored pre-fragment scan: [^#] can't cross a '#', so a '?' INSIDE
# the fragment ('...#sec?b=1', hash-bang SPA routes) never reads as a
# query string — unanchored \?([^#]*) did exactly that
_QUERY = r"^[^#]*?\?([^#]*)"


def canonicalize_url(col) -> F.Column:
    """Canonical form of an absolute http(s) url (column expression)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME, 1))
    host = F.lower(F.regexp_extract(u, _HOST, 1))
    port = F.regexp_extract(u, _PORT, 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_extract(u, _PATH, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # strip trailing slashes from non-root paths (regexp keeps this
    # JVM-side; '/' alone is preserved by the non-greedy (.+?) group)
    path = F.regexp_replace(path, r"^(.+?)/+$", r"$1")
    query = F.regexp_extract(u, _QUERY, 1)
    sorted_query = F.concat_ws("&", F.array_sort(F.split(query, "&")))
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_query))
        .otherwise(F.lit("")),
    )


def url_dedup_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach (canon_url, n_dups) to every row: one canonicalize map +
    one groupBy-count join (broadcast-sized only if the dup key space
    is small; at crawl scale this is a plain hash agg + shuffle join on
    canon_url, both AQE-managed)."""
    canon = df.withColumn("canon_url", canonicalize_url(url_col))
    sizes = canon.groupBy("canon_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_dups"))
    return canon.join(sizes, "canon_url")
