"""Web link-graph operators: outlink extraction, host graph, PageRank.

A Common-Crawl-scale corpus is a hyperlinked graph, and link-based
authority (PageRank) is the canonical web-scale ranking prior the
reference's pure-content engine lacks (reference scope: content
scoring only, `QueryParser.java`; this module is additive surface for
the webtext payload).

Scale notes (100 TB / 10^12 docs):
- ``extract_outlinks`` is one JVM-side regexp pass over the html
  column (``regexp_extract_all``) — whole-stage codegen, no Python,
  no shuffle; output is (src, dst, anchor) edges ready for a
  partitioned write.
- ``pagerank`` hash-partitions the edge list on ``src`` ONCE and
  persists it; every iteration then joins the (small) rank vector
  into that stationary edge partitioning, so the per-iteration
  shuffle moves only O(nodes) rank rows, never the O(edges) edge
  list.  Lineage is truncated with ``localCheckpoint`` every few
  iterations so the plan does not grow linearly with iteration count
  (the classic iterative-algorithm OOM on a long lineage chain).
- Dangling mass (nodes with no outlinks) is redistributed uniformly
  each iteration — the textbook formulation — via one scalar agg on
  the rank vector (O(nodes), driver receives one double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# href + anchor text of well-formed <a> tags.  Group 1 = href target,
# group 2 = anchor text (minimal-match, single-line anchors).
# (?i): '<A HREF=...>' is valid HTML and common in older crawl pages —
# a case-sensitive scan silently drops every edge of all-caps markup
_A_TAG = r'(?i)<a\s+[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'

# scheme://host[:port] prefix of an absolute url
_ABS_URL = r"^(https?)://([^/:?#]+)(?::(\d+))?"


def extract_outlinks(pages: DataFrame,
                     url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """(url, html:binary) -> (src_url, dst_url, anchor) edge rows.

    Root-relative hrefs (``/x``) are resolved against the source
    page's scheme://host; path-relative hrefs (``x.html``) against the
    source page's DIRECTORY (RFC 3986 merge-paths: ``rel.html`` on
    ``https://h/dir/page`` -> ``https://h/dir/rel.html``).  Dot
    segments (``./``, ``../``) are NOT normalized here — url
    canonicalization (``urlnorm.canonicalize_urls``) is the
    downstream place for that.  Fragment-only hrefs and empty targets
    are dropped.  Single regexp pass, all JVM expressions (the two
    ``regexp_extract_all`` calls over the same pattern are collapsed
    into one scan by column pruning + common subexpression reuse).
    """
    html_str = F.decode(F.col(html_col), "UTF-8")
    hrefs = F.regexp_extract_all(html_str, F.lit(_A_TAG), 1)
    anchors = F.regexp_extract_all(html_str, F.lit(_A_TAG), 2)
    # origin = scheme://host[:port] — dropping the port would resolve
    # root-relative hrefs on 'http://h:8080/...' pages to the wrong
    # origin (and inconsistently with path-relative ones, which keep
    # the port via the raw-url-derived directory)
    src_port = F.regexp_extract(F.col(url_col), _ABS_URL, 3)
    src_base = F.concat(
        F.regexp_extract(F.col(url_col), _ABS_URL, 1),
        F.lit("://"),
        F.regexp_extract(F.col(url_col), _ABS_URL, 2),
        F.when(src_port != "", F.concat(F.lit(":"), src_port))
        .otherwise(F.lit("")),
    )
    # directory of the source url: strip query/fragment, then the last
    # path segment (trailing slash kept); a path-less url's directory
    # is its host root
    src_dir = F.when(
        F.col(url_col).rlike(_ABS_URL + r"/"),
        F.regexp_replace(
            F.regexp_replace(F.col(url_col), r"[?#].*$", ""),
            r"[^/]*$", ""),
    ).otherwise(F.concat(src_base, F.lit("/")))
    out = (
        pages.select(
            F.col(url_col).alias("src_url"),
            src_base.alias("_base"),
            src_dir.alias("_dir"),
            F.explode(F.arrays_zip(hrefs.alias("href"),
                                   anchors.alias("anchor"))).alias("_e"),
        )
        .select(
            "src_url",
            F.col("_e.href").alias("_href"),
            F.trim(F.col("_e.anchor")).alias("anchor"),
            "_base",
            "_dir",
        )
        .where(
            (F.col("_href") != "")
            & ~F.col("_href").startswith("#")
            # drop non-http(s) schemes (mailto:, javascript:, tel:,
            # data:, ftp: ...) — they are not crawlable page links
            & (~F.col("_href").rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")
               | F.col("_href").rlike("^https?://"))
        )
        .select(
            "src_url",
            F.when(F.col("_href").rlike("^https?://"), F.col("_href"))
            # scheme-relative //host/path inherits the source's scheme
            .when(F.col("_href").startswith("//"),
                  F.concat(F.regexp_extract(F.col("src_url"), _ABS_URL, 1),
                           F.lit(":"), F.col("_href")))
            .when(F.col("_href").startswith("/"),
                  F.concat(F.col("_base"), F.col("_href")))
            # query-only hrefs ('?page=2', ubiquitous pagination)
            # resolve against the full RESOURCE path, not its
            # directory (RFC 3986: same path, new query)
            .when(F.col("_href").startswith("?"),
                  F.concat(F.regexp_replace(F.col("src_url"),
                                            r"[?#].*$", ""),
                           F.col("_href")))
            .otherwise(F.concat(F.col("_dir"), F.col("_href")))
            .alias("dst_url"),
            "anchor",
        )
    )
    return out


def host_of(url_col) -> F.Column:
    """Lower-cased host component of an absolute url (JVM regexp)."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.regexp_extract(col, _ABS_URL, 2))


def host_link_graph(outlinks: DataFrame, *,
                    drop_self: bool = True) -> DataFrame:
    """Collapse url-level edges to a weighted host graph
    (src_host, dst_host, weight).  One groupBy with map-side combine;
    host cardinality is ~10^7 at Common-Crawl scale, far below the
    url-level 10^12, so the output is broadcast-sized downstream."""
    g = outlinks.select(
        host_of("src_url").alias("src"), host_of("dst_url").alias("dst"))
    if drop_self:
        g = g.where(F.col("src") != F.col("dst"))
    return g.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("weight"))


def anchor_text_agg(outlinks: DataFrame, *,
                    by_host: bool = False) -> DataFrame:
    """Aggregate incoming anchor text per link target — the classic
    web-IR document-expansion signal (anchor terms describe the TARGET
    page; search engines index them as a separate high-weight field).

    Input: (src_url, dst_url, anchor) edge rows from
    ``extract_outlinks``.  Output one row per target:
      (dst, n_inlinks, n_src_hosts, anchor_terms) where anchor_terms
    is the deduped, sorted token union of all incoming anchors —
    deterministic, ready to union into the index build as an extra
    field for the target doc.

    One groupBy with map-side combine; anchors are short (UI strings),
    so the per-target state is bounded.  At 10^12 edges the shuffle
    key is dst (or dst host), the same key the index build shuffles
    on — co-partitionable with the postings build.
    """
    dst = host_of("dst_url") if by_host else F.col("dst_url")
    # drop the lone '' token a blank/whitespace-only anchor produces
    # (F.split never returns an empty array) — keeps parity with SQL
    # oracles that filter t <> ''
    toks = F.array_remove(
        F.split(F.lower(F.trim(F.col("anchor"))), r"\s+"), "")
    return (
        outlinks.select(
            dst.alias("dst"),
            host_of("src_url").alias("src_host"),
            toks.alias("_toks"),
        )
        .groupBy("dst")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_inlinks"),
            F.countDistinct("src_host").cast("long").alias("n_src_hosts"),
            F.array_sort(F.array_distinct(
                F.flatten(F.collect_list("_toks")))).alias("anchor_terms"),
        )
    )


def pagerank(
    edges: DataFrame,
    *,
    n_iters: int = 5,
    damping: float = 0.85,
    weighted: bool = True,
    checkpoint_every: int = 4,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Weighted PageRank over (src, dst[, weight]) -> (node, rank).

    rank_0 = 1/N; each iteration
      rank(v) = (1-d)/N + d * (sum_{u->v} rank(u) * w(u,v)/W(u)
                               + dangling_mass / N)
    where W(u) is u's total out-weight and dangling_mass is the rank
    held by nodes with no outlinks.  Deterministic up to float sum
    order (callers quantize; see gates).

    Plan shape per iteration: ranks (O(nodes)) shuffles into the
    stationary, persisted edge partitioning; one groupBy(dst) for the
    contributions; one scalar agg for dangling mass.  The edge list —
    the 100-TB side — is shuffled exactly once, up front.
    """
    w = (F.col("weight").cast("double") if weighted and "weight" in edges.columns
         else F.lit(1.0))
    e = edges.select(F.col("src").alias("src"), F.col("dst").alias("dst"),
                     w.alias("w"))
    n_edges = e.count()  # driver-side scalar, sizes the partitioning
    nparts = shuffle_partitions or max(
        1, min(int(e.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32")),
            (n_edges // 2_000_000) + 1))

    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .repartition(nparts, "node")
             .persist())
    n_nodes = nodes.count()  # driver-side scalar: one long
    if n_nodes == 0:
        nodes.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node string, rank double")

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # stationary edge side: contribution fraction per edge, partitioned
    # by src once; every iteration reuses this exchange (materialized
    # by the dangling-count action below).
    frac = (e.join(out_w, "src")
            .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
            .repartition(nparts, "src")
            .persist())

    has_out = frac.select("src").distinct()
    # If every node has outlinks (the usual case once a crawl graph is
    # host-collapsed), the dangling term is identically zero and the
    # per-iteration scalar agg is skipped entirely — the loop body then
    # runs ZERO actions between lineage checkpoints.
    n_dangling = nodes.join(
        has_out, nodes["node"] == has_out["src"], "left_anti").count()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))

    base = (1.0 - damping) / n_nodes
    cached: list[DataFrame] = []
    for it in range(n_iters):
        if n_dangling:
            dangling = (
                ranks.join(has_out, ranks["node"] == has_out["src"],
                           "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .collect()[0][0]
            )  # one double to the driver per iteration
        else:
            dangling = 0.0
        contribs = (
            frac.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("frac") * F.col("rank")).alias("contrib"))
        )
        # dangling mass enters damped: d * (contrib + dangling/N)
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping)
                 * (F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.lit(dangling / n_nodes))).alias("rank"),
            )
        )
        # truncate lineage periodically (eager) so the plan does not
        # grow with iteration count; between checkpoints the chain
        # stays lazy.
        if (it + 1) % checkpoint_every == 0 and it + 1 < n_iters:
            # checkpoint BEFORE releasing the per-iteration caches the
            # checkpoint job still reads (else it recomputes the whole
            # inter-checkpoint chain cold)
            ranks = ranks.localCheckpoint(eager=True)
            for c in cached:
                c.unpersist()
            cached = []
        elif n_dangling:
            ranks = ranks.persist()  # reused by next dangling agg + join
            cached.append(ranks)

    out = ranks.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    nodes.unpersist()
    frac.unpersist()
    return out


def hits(
    edges: DataFrame,
    *,
    n_iters: int = 3,
    weighted: bool = True,
    checkpoint_every: int = 4,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, "Authoritative sources
    in a hyperlinked environment") over (src, dst[, weight]) ->
    (node, auth, hub).

    hub_0 = 1; each iteration
      auth(v) = sum_{u->v} w(u,v) * hub(u)
      hub(u)  = sum_{u->v} w(u,v) * auth(v)
    run UNNORMALIZED through the iterations, then scaled ONCE by the
    max at the end.  Rationale: with integer edge weights every
    intermediate value is an exact integer, and IEEE doubles represent
    integers exactly below 2^53 — sums of exact integers are
    order-independent, and max is an order-independent reduction, so
    the result is bit-reproducible across engines (unlike per-iteration
    L2 normalization, whose global float sum depends on reduction
    order).  The exactness window (score growth ~ (total out-weight)^k)
    comfortably covers small k on host graphs; for deep iteration
    counts at web scale, renormalize by the max (still exact-safe)
    every few iterations via ``checkpoint_every``.

    Plan shape per iteration: the rank-sized (O(nodes)) hub/auth frames
    shuffle into the STATIONARY persisted edge partitioning (edges —
    the 100-TB side — are shuffled exactly once per orientation, up
    front); one groupBy per phase with map-side partial aggs.  Lineage
    is truncated with an eager localCheckpoint every
    ``checkpoint_every`` iterations, exactly like ``pagerank``.
    """
    w = (F.col("weight").cast("double")
         if weighted and "weight" in edges.columns else F.lit(1.0))
    e = edges.select(F.col("src").alias("src"), F.col("dst").alias("dst"),
                     w.alias("w"))
    n_edges = e.count()
    nparts = shuffle_partitions or max(
        1, min(int(e.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32")),
            (n_edges // 2_000_000) + 1))

    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .repartition(nparts, "node")
             .persist())
    if nodes.count() == 0:
        nodes.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node string, auth double, hub double")

    by_dst = e.repartition(nparts, "dst").persist()
    by_src = e.repartition(nparts, "src").persist()

    hub = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = nodes.select("node", F.lit(0.0).alias("auth"))
    for it in range(n_iters):
        a_contrib = (
            by_dst.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("hub")).alias("s")))
        auth = (nodes.join(a_contrib, nodes["node"] == a_contrib["dst"],
                           "left")
                .select("node", F.coalesce("s", F.lit(0.0)).alias("auth")))
        h_contrib = (
            by_src.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum(F.col("w") * F.col("auth")).alias("s")))
        hub = (nodes.join(h_contrib, nodes["node"] == h_contrib["src"],
                          "left")
               .select("node", F.coalesce("s", F.lit(0.0)).alias("hub")))
        if (it + 1) % checkpoint_every == 0 and it + 1 < n_iters:
            auth = auth.localCheckpoint(eager=True)
            hub = hub.localCheckpoint(eager=True)

    scores = (auth.join(hub, "node")
              .localCheckpoint(eager=True))  # truncate before the scalar aggs
    mx = scores.agg(F.max("auth"), F.max("hub")).collect()[0]
    max_a = mx[0] or 0.0
    max_h = mx[1] or 0.0
    out = scores.select(
        "node",
        (F.col("auth") / F.lit(max_a) if max_a > 0
         else F.lit(0.0)).alias("auth"),
        (F.col("hub") / F.lit(max_h) if max_h > 0
         else F.lit(0.0)).alias("hub"))
    nodes.unpersist()
    by_dst.unpersist()
    by_src.unpersist()
    return out


def host_reciprocity(edges: DataFrame) -> DataFrame:
    """Reciprocal-linking profile per host — a classic link-spam
    signal (link farms exchange links; organic linking is mostly
    one-way).  Input: weighted host edges (src, dst[, weight]).

    Output per linking host:
      (host, n_out, n_reciprocal, recip_frac_micro)
    where n_out counts DISTINCT outgoing partner hosts and
    n_reciprocal counts those that link back.

    One self-join on the (small) distinct host-pair edge list — the
    host graph is orders of magnitude smaller than the page corpus, so
    this is dimension-table work; both sides of the join are the same
    deduplicated frame.
    """
    pairs = (edges.select("src", "dst")
             .where(F.col("src") != F.col("dst")).distinct())
    back = pairs.select(F.col("dst").alias("src"),
                        F.col("src").alias("dst"),
                        F.lit(1).alias("_rec"))
    marked = pairs.join(back, ["src", "dst"], "left")
    return (marked.groupBy(F.col("src").alias("host"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_out"),
                 F.sum(F.coalesce("_rec", F.lit(0))).cast("long")
                 .alias("n_reciprocal"))
            .select("host", "n_out", "n_reciprocal",
                    F.round(F.col("n_reciprocal") * F.lit(1000000.0)
                            / F.col("n_out")).cast("long")
                    .alias("recip_frac_micro")))


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    n_iters: int = 5,
    damping: float = 0.85,
    weighted: bool = True,
    checkpoint_every: int = 4,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen 2004, "Combating
    web spam with TrustRank"): PageRank with the uniform teleport
    replaced by a trusted-seed distribution — trust flows OUT of a
    small vetted seed set, so spam farms that merely cite each other
    accumulate none.  (src, dst[, weight]) x seeds(node) ->
    (node, trust).

      t(v)    = 1/|S| for seed nodes, 0 otherwise
      trust_0 = t
      trust(v) = (1-d)*t(v) + d * (sum_{u->v} trust(u)*w(u,v)/W(u)
                                   + dangling_mass * t(v))

    Dangling mass re-enters through the seed distribution (the biased
    analogue of PageRank's uniform redistribution), so total trust is
    conserved at 1 every iteration.

    Plan shape per iteration is identical to :func:`pagerank`: the
    edge fractions — the 100-TB side — are shuffled into a stationary
    persisted partitioning exactly once; each iteration moves only the
    O(nodes) trust vector plus one optional scalar agg for dangling
    mass.  The seed set is dimension-sized (hand-vetted lists are
    thousands of hosts), broadcast-joined onto the node list once.
    """
    w = (F.col("weight").cast("double")
         if weighted and "weight" in edges.columns else F.lit(1.0))
    e = edges.select(F.col("src").alias("src"), F.col("dst").alias("dst"),
                     w.alias("w"))
    n_edges = e.count()
    nparts = shuffle_partitions or max(
        1, min(int(e.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32")),
            (n_edges // 2_000_000) + 1))

    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .repartition(nparts, "node"))
    # teleport vector: 1/|S| on seeds present in the graph, 0 elsewhere
    seed_nodes = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    from pyspark.sql.functions import broadcast as _bc

    flagged = (nodes.join(_bc(seed_nodes.withColumn("_s", F.lit(1))),
                          "node", "left")
               .select("node",
                       F.coalesce(F.col("_s"), F.lit(0)).alias("_s")))
    n_seeds = flagged.agg(F.sum("_s")).collect()[0][0] or 0
    if n_seeds == 0:
        raise ValueError("trustrank: no seed appears in the graph")
    nodes = flagged.select(
        "node",
        (F.col("_s") / F.lit(float(n_seeds))).alias("t")).persist()

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    frac = (e.join(out_w, "src")
            .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
            .repartition(nparts, "src")
            .persist())
    has_out = frac.select("src").distinct()
    n_dangling = nodes.join(
        has_out, nodes["node"] == has_out["src"], "left_anti").count()

    trust = nodes.select("node", "t", F.col("t").alias("trust"))

    cached: list[DataFrame] = []
    for it in range(n_iters):
        if n_dangling:
            dangling = (
                trust.join(has_out, trust["node"] == has_out["src"],
                           "left_anti")
                .agg(F.coalesce(F.sum("trust"), F.lit(0.0)))
                .collect()[0][0])
        else:
            dangling = 0.0
        contribs = (
            frac.join(trust.select(F.col("node").alias("src"), "trust"),
                      "src")
            .groupBy("dst")
            .agg(F.sum(F.col("frac") * F.col("trust")).alias("contrib"))
        )
        trust = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node", "t",
                ((1.0 - damping) * F.col("t") + F.lit(damping)
                 * (F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.lit(dangling) * F.col("t"))).alias("trust"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < n_iters:
            trust = trust.localCheckpoint(eager=True)
            for c in cached:
                c.unpersist()
            cached = []
        elif n_dangling:
            trust = trust.persist()
            cached.append(trust)

    out = trust.select("node", "trust").localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    nodes.unpersist()
    frac.unpersist()
    return out
