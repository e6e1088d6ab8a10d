"""Crawl-side operators: robots.txt, politeness frontier, sitemaps.

A Common-Crawl-style pipeline doesn't start at the WARC file — it
starts at the fetch decision.  These operators cover the crawl-control
plane the reference engine assumes away (its corpus is pre-fetched,
`/root/reference/README.md` "collection"): which urls a polite crawler
MAY fetch (robots.txt), in what order it fetches them without
hammering a host (frontier waves), and which urls a host advertises
(sitemaps).

Everything is JVM-side column expressions + per-HOST windows — no
Python in any hot path.  At 10^12 urls the windows partition on host
(robots files and per-host frontiers are naturally host-local), so no
operator here ever moves more than one host's rows to one task; a
pathological mega-host is the classic skew case and rides AQE skew
splitting like any other keyed window.

Robots semantics implemented (RFC 9309 subset, documented
simplifications):
  - only the ``User-agent: *`` group(s) are applied (a real crawler
    would pick the longest agent match; single-agent engines crawl as
    ``*``);
  - consecutive ``User-agent`` lines stack onto one group (RFC 9309
    §2.1: a group may name several agents);
  - ``Allow`` / ``Disallow`` are path PREFIX rules; the longest
    matching prefix wins, ``Allow`` wins ties (Google/RFC 9309
    precedence);
  - an empty ``Disallow:`` value means "no restriction" and is
    dropped; unknown directives (``Crawl-delay``, ``Sitemap``, ...)
    and ``#`` comments are ignored inside groups;
  - no rule matches -> ALLOWED (robots is deny-listing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# absolute-url pieces (same shapes as urlnorm.py)
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"

# agent values may contain spaces ("Some Bot"); ANY User-agent line is
# a group line even if its value is empty/odd — otherwise the line gets
# is_agent=0, creates no boundary, and its rules fold into the PREVIOUS
# group (e.g. "User-agent: Some Bot\nDisallow: /" would disallow the
# whole site for * instead of only for that bot).
_AGENT_LINE_RE = r"(?i)^user-agent:"
_AGENT_RE = r"(?i)^user-agent:\s*(.*?)\s*$"
_ALLOW_RE = r"(?i)^allow:\s*(\S*)\s*$"
_DISALLOW_RE = r"(?i)^disallow:\s*(\S*)\s*$"


def url_host(col) -> F.Column:
    """Host of an absolute url (column expression, lower-cased)."""
    u = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(u, _HOST_RE, 1))


def url_path(col) -> F.Column:
    """Path of an absolute url ('' -> '/'), query/fragment excluded."""
    u = F.col(col) if isinstance(col, str) else col
    p = F.regexp_extract(u, _PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def _grouped_lines(robots: DataFrame, host_col: str,
                   txt_col: str) -> DataFrame:
    """Shared robots.txt line pipeline: split+posexplode (narrow),
    comment strip, per-host window to assign agent-group ids (robots
    files are small and host-keyed — the window shuffles each host's
    few dozen lines to one task, exactly the locality a crawler
    wants).  A User-agent line starts a NEW group iff the previous
    line was not itself a User-agent line (RFC 9309 §2.1: consecutive
    agent lines stack onto one group)."""
    lines = (
        robots.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(txt_col), "\n")).alias("idx", "raw"))
        # strip comments, then whitespace; blank lines stay as group
        # separators (they end a stacked user-agent run)
        .withColumn("line", F.trim(F.regexp_replace("raw", r"#.*$", "")))
        .withColumn("agent", F.regexp_extract("line", _AGENT_RE, 1))
        .withColumn("is_agent",
                    F.col("line").rlike(_AGENT_LINE_RE).cast("int"))
    )
    w = Window.partitionBy("host").orderBy("idx")
    return (
        lines
        .withColumn("prev_is_agent",
                    F.coalesce(F.lag("is_agent").over(w), F.lit(0)))
        .withColumn("boundary",
                    ((F.col("is_agent") == 1)
                     & (F.col("prev_is_agent") == 0)).cast("int"))
        .withColumn("grp", F.sum("boundary").over(w))
        .where(F.col("grp") > 0)  # rules before any User-agent: invalid
    )


def _star_groups(grouped: DataFrame) -> DataFrame:
    return (grouped.where(F.col("agent") == "*")
            .select("host", "grp").distinct())


def parse_robots(robots: DataFrame, host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> one row per ``*``-group rule:
    (host, rule_path, allow:long 0/1).

    Plan shape: the shared :func:`_grouped_lines` window pipeline,
    then a group-level semi-join keeps groups naming agent ``*``.
    """
    grouped = (
        _grouped_lines(robots, host_col, txt_col)
        .withColumn("allow_v", F.regexp_extract("line", _ALLOW_RE, 1))
        .withColumn("dis_v", F.regexp_extract("line", _DISALLOW_RE, 1))
        .withColumn("is_allow",
                    F.col("line").rlike(r"(?i)^allow:").cast("int"))
        .withColumn("is_dis",
                    F.col("line").rlike(r"(?i)^disallow:").cast("int"))
    )
    rules = (
        grouped
        .where((F.col("is_allow") == 1) | (F.col("is_dis") == 1))
        .select(
            "host", "grp",
            F.when(F.col("is_allow") == 1, F.col("allow_v"))
            .otherwise(F.col("dis_v")).alias("rule_path"),
            F.col("is_allow").cast("long").alias("allow"))
        # empty Disallow: = no restriction; empty Allow: is a no-op too
        .where(F.col("rule_path") != "")
    )
    return (rules.join(_star_groups(grouped), ["host", "grp"])
            .select("host", "rule_path", "allow")
            .distinct())


_DELAY_RE = r"(?i)^crawl-delay:\s*(\d+(?:\.\d+)?)\s*$"


def parse_crawl_delays(robots: DataFrame, host_col: str = "host",
                       txt_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> (host, delay_sec): the ``Crawl-delay``
    value of the ``*`` group (non-standard but honored by most polite
    crawlers).  Several ``*``-group values collapse to the MAX (the
    most conservative); hosts with none are absent — downstream joins
    coalesce to their own default (see :func:`crawl_frontier`).  Same
    per-host window shape as :func:`parse_robots`."""
    grouped = (
        _grouped_lines(robots, host_col, txt_col)
        .withColumn("delay", F.regexp_extract("line", _DELAY_RE, 1)))
    return (grouped.where(F.col("delay") != "")
            .join(_star_groups(grouped), ["host", "grp"])
            .groupBy("host")
            .agg(F.max(F.col("delay").cast("double")).alias("delay_sec")))


def apply_robots(urls: DataFrame, rules: DataFrame,
                 url_col: str = "url") -> DataFrame:
    """Attach (allowed:long 0/1, matched_path) to every url row.

    Longest matching rule prefix wins; Allow wins length ties; no
    match -> allowed, matched_path ''.  Rules aggregate to ONE small
    array row per host (robots files are bounded), broadcast-join on
    host, and the winner pick is a narrow ``aggregate`` fold over that
    array — urls never shuffle, never group, and input cardinality is
    preserved exactly (a groupBy over the url columns would merge
    legitimately duplicated frontier rows).
    """
    u = urls.withColumn("_host", url_host(url_col)) \
            .withColumn("_path", url_path(url_col))
    per_host = (rules.groupBy(F.col("host").alias("_host"))
                .agg(F.collect_list(F.struct("rule_path", "allow"))
                     .alias("_rules")))
    joined = u.join(F.broadcast(per_host), ["_host"], "left")
    # best matching rule as struct(l, a, p): longest prefix first,
    # Allow beats Disallow on length ties, path is the final tiebreak
    # (struct ordering gives exactly that precedence)
    best = F.array_max(F.transform(
        F.filter(F.coalesce("_rules",
                            F.array().cast(
                                "array<struct<rule_path:string,"
                                "allow:bigint>>")),
                 lambda x: F.col("_path").startswith(x["rule_path"])),
        lambda x: F.struct(F.length(x["rule_path"]).alias("l"),
                           x["allow"].alias("a"),
                           x["rule_path"].alias("p"))))
    return (
        joined.withColumn("_best", best)
        .select(
            *urls.columns,
            F.coalesce(F.col("_best.a"), F.lit(1)).cast("long")
            .alias("allowed"),
            F.coalesce(F.col("_best.p"), F.lit("")).alias("matched_path"))
    )


def crawl_frontier(urls: DataFrame, url_col: str = "url",
                   priority_col: str = "priority",
                   delay_ms: int = 1000,
                   host_delays: DataFrame | None = None) -> DataFrame:
    """Politeness scheduling: one fetch per host per wave.

    host_rank = position of the url in its host's priority queue
    (priority DESC, url ASC tie-break); the url's earliest fetch time
    is (host_rank-1) * the host's crawl delay after the host's first
    fetch.  ``host_delays`` (host, delay_sec — e.g. the output of
    :func:`parse_crawl_delays`) overrides the default ``delay_ms``
    per host; the delays table is host-count-sized and broadcast.
    One per-host window — the frontier for a host lives on one task,
    which is exactly how a fetcher shards politeness queues.
    """
    w = Window.partitionBy("host").orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc())
    out = urls.withColumn("host", url_host(url_col))
    delay_col = F.lit(float(delay_ms))
    if host_delays is not None:
        out = out.join(
            F.broadcast(host_delays.select("host", "delay_sec")),
            "host", "left")
        delay_col = F.coalesce(F.col("delay_sec") * 1000.0,
                               F.lit(float(delay_ms)))
        out = out.withColumn("_delay_ms", delay_col).drop("delay_sec")
        delay_col = F.col("_delay_ms")
    return (
        out.withColumn("host_rank", F.row_number().over(w).cast("long"))
        .withColumn("eta_ms",
                    F.round((F.col("host_rank") - 1) * delay_col)
                    .cast("long"))
        .drop("_delay_ms")
    )


def revisit_stats(captures: DataFrame, url_col: str = "url",
                  ts_col: str = "ts", content_col: str = "content_md5"
                  ) -> DataFrame:
    """Change detection across recrawls of the same url — the signal a
    crawl scheduler feeds back into revisit frequency (fast-changing
    pages get recrawled sooner; Common Crawl's monthly snapshots make
    this a per-url lag comparison).

    Input: one row per capture (url, ts, content fingerprint).
    Output: one row per url —
      (url, n_captures, n_changes, change_rate_micro)
    where a "change" is a capture whose fingerprint differs from the
    PREVIOUS capture of the same url (ts order, fingerprint tie-break
    for duplicate timestamps), and change_rate = n_changes /
    (n_captures - 1), 0 for single-capture urls.

    One per-URL window + one keyed agg — captures of a url co-locate
    on one task (bounded by the crawl's revisit count, dozens not
    millions), then a partial-aggregable groupBy.  No global state.
    """
    w = Window.partitionBy(url_col).orderBy(
        F.col(ts_col).asc(), F.col(content_col).asc())
    flagged = captures.withColumn(
        "_chg",
        (F.lag(content_col).over(w).isNotNull()
         & (F.lag(content_col).over(w) != F.col(content_col)))
        .cast("long"))
    return (
        flagged.groupBy(F.col(url_col).alias("url"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_captures"),
             F.sum("_chg").cast("long").alias("n_changes"))
        .select(
            "url", "n_captures", "n_changes",
            F.when(F.col("n_captures") > 1,
                   F.round(F.col("n_changes") * F.lit(1000000.0)
                           / (F.col("n_captures") - 1)).cast("long"))
            .otherwise(F.lit(0).cast("long")).alias("change_rate_micro"))
    )


def extract_sitemap_urls(sitemaps: DataFrame, host_col: str = "host",
                         xml_col: str = "xml") -> DataFrame:
    """(host, sitemap xml) -> one row per ``<url>`` entry:
    (host, url, lastmod) with lastmod '' when the entry has none.

    Narrow map only (regexp_extract_all + posexplode) — a sitemap
    parse at crawl scale is a pure scan stage.  Entries without a
    ``<loc>`` are skipped (spec: loc is mandatory).
    """
    entries = sitemaps.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            # (?s): real sitemaps are pretty-printed, so <url> blocks
            # span lines — without DOTALL every multi-line sitemap
            # would extract zero entries
            F.regexp_extract_all(F.col(xml_col),
                                 F.lit(r"(?s)<url>(.*?)</url>"), F.lit(1)))
        .alias("pos", "entry"))
    return (
        entries.select(
            "host",
            F.regexp_extract("entry", r"<loc>([^<]*)</loc>", 1)
            .alias("url"),
            F.regexp_extract("entry", r"<lastmod>([^<]*)</lastmod>", 1)
            .alias("lastmod"))
        .where(F.col("url") != "")
    )
