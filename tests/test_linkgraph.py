"""Link-graph operators: outlink extraction, PageRank, URL canon.

PageRank parity is checked against an independent numpy power
iteration (dense transition matrix, damped dangling redistribution) —
the same textbook formulation, computed a completely different way.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ir_spark.operators.linkgraph import (
    anchor_text_agg,
    extract_outlinks,
    host_link_graph,
    pagerank,
)
from ir_spark.operators.urlnorm import canonicalize_url, url_dedup_groups


@pytest.fixture(scope="module")
def link_pages(spark):
    rows = [
        ("https://a.example/p1",
         b'<html><body><a href="https://b.example/x">To B</a>'
         b'<a href="/local/page">Local</a>'
         b'<a href="rel.html">Rel</a>'
         b'<a href="#frag">Skip frag</a>'
         b'<a href="">Skip empty</a></body></html>'),
        ("https://b.example/p2",
         b'<a href="https://a.example/y">Back</a>'
         b'<a href="https://b.example/self">Self</a>'),
        ("https://c.example/p3", b"<p>no links</p>"),
    ]
    return spark.createDataFrame(
        [(u, bytearray(h)) for u, h in rows], "url string, html binary")


def test_extract_outlinks(link_pages):
    got = {(r.src_url, r.dst_url, r.anchor)
           for r in extract_outlinks(link_pages).collect()}
    assert got == {
        ("https://a.example/p1", "https://b.example/x", "To B"),
        ("https://a.example/p1", "https://a.example/local/page", "Local"),
        ("https://a.example/p1", "https://a.example/rel.html", "Rel"),
        ("https://b.example/p2", "https://a.example/y", "Back"),
        ("https://b.example/p2", "https://b.example/self", "Self"),
    }


def test_extract_outlinks_scheme_relative_and_non_http(spark):
    pages = spark.createDataFrame([
        ("https://a.example/p",
         bytearray(b'<a href="//b.example/x">SchemeRel</a>'
                   b'<a href="mailto:u@c.example">Mail</a>'
                   b'<a href="javascript:void(0)">JS</a>'
                   b'<a href="tel:+15551234">Tel</a>'
                   b'<a href="ftp://f.example/file">Ftp</a>')),
        ("http://d.example/q",
         bytearray(b'<a href="//e.example/y">SchemeRelHttp</a>')),
    ], "url string, html binary")
    got = {(r.src_url, r.dst_url) for r in extract_outlinks(pages).collect()}
    # scheme-relative inherits the source scheme; non-http(s) dropped
    assert got == {
        ("https://a.example/p", "https://b.example/x"),
        ("http://d.example/q", "http://e.example/y"),
    }


def test_pagerank_empty_edges(spark):
    empty = spark.createDataFrame([], "src string, dst string, weight double")
    assert pagerank(empty, n_iters=3).collect() == []


def test_host_link_graph_drops_self_edges(link_pages):
    g = {(r.src, r.dst): r.weight
         for r in host_link_graph(extract_outlinks(link_pages)).collect()}
    assert g == {("a.example", "b.example"): 1, ("b.example", "a.example"): 1}


def test_anchor_text_agg(spark):
    links = spark.createDataFrame([
        ("https://a.example/1", "https://t.example/page", "Great Search"),
        ("https://b.example/2", "https://t.example/page", "search engine"),
        ("https://a.example/3", "https://t.example/page", "great  engine"),
        ("https://a.example/1", "https://u.example/other", "Other"),
    ], "src_url string, dst_url string, anchor string")
    rows = {r.dst: r for r in anchor_text_agg(links).collect()}
    t = rows["https://t.example/page"]
    assert t.n_inlinks == 3
    assert t.n_src_hosts == 2
    assert list(t.anchor_terms) == ["engine", "great", "search"]
    u = rows["https://u.example/other"]
    assert (u.n_inlinks, u.n_src_hosts, list(u.anchor_terms)) == (1, 1, ["other"])


def test_anchor_text_agg_by_host(spark):
    links = spark.createDataFrame([
        ("https://a.example/1", "https://t.example/p1", "one"),
        ("https://b.example/2", "https://t.example/p2", "two"),
    ], "src_url string, dst_url string, anchor string")
    rows = anchor_text_agg(links, by_host=True).collect()
    assert len(rows) == 1
    assert rows[0].dst == "t.example"
    assert rows[0].n_inlinks == 2
    assert list(rows[0].anchor_terms) == ["one", "two"]


def _numpy_pagerank(edges, n_iters, damping):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for s, d, wt in edges:
        w[idx[s], idx[d]] += wt
    out = w.sum(axis=1)
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        dangling = rank[out == 0].sum()
        contrib = np.zeros(n)
        nz = out > 0
        contrib += (w[nz].T / out[nz]) @ rank[nz]
        rank = (1 - damping) / n + damping * (contrib + dangling / n)
    return dict(zip(nodes, rank))


@pytest.mark.parametrize("n_iters", [1, 5, 12])
def test_pagerank_matches_numpy(spark, n_iters):
    edges = [("a", "b", 2.0), ("b", "c", 1.0), ("c", "a", 1.0),
             ("a", "c", 1.0), ("d", "a", 3.0), ("e", "a", 1.0)]
    # e has no outlinks only if absent as src; add dangling node via dst-only
    edges.append(("c", "f", 1.0))  # f is dangling (never a src)
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {r.node: r.rank
           for r in pagerank(df, n_iters=n_iters, damping=0.85).collect()}
    want = _numpy_pagerank(edges, n_iters, 0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_unweighted_flag(spark):
    # weighted=False must ignore the weight column entirely
    edges = [("a", "b", 100.0), ("a", "c", 1.0), ("b", "a", 1.0),
             ("c", "a", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {r.node: r.rank
           for r in pagerank(df, n_iters=6, weighted=False).collect()}
    want = _numpy_pagerank([(s, d, 1.0) for s, d, _ in edges], 6, 0.85)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # b and c are symmetric under unit weights
    assert got["b"] == pytest.approx(got["c"], abs=1e-12)


@pytest.mark.parametrize("raw,canon", [
    ("HTTPS://WWW.Example.COM:443/Page/1/?b=2&a=1#frag",
     "https://www.example.com/Page/1?a=1&b=2"),
    ("http://x.example:80", "http://x.example/"),
    ("http://x.example:8080/a/", "http://x.example:8080/a"),
    ("https://x.example/a//", "https://x.example/a"),
    ("https://x.example/?z=1&a=2", "https://x.example/?a=2&z=1"),
    ("https://x.example", "https://x.example/"),
    # a '?' INSIDE the fragment is not a query string — hash-bang SPA
    # routes must canonicalize to the fragment-free page
    ("http://a.example/p#sec?b=1", "http://a.example/p"),
    ("http://h.example/#!/route?tab=1", "http://h.example/"),
])
def test_canonicalize_url(spark, raw, canon):
    df = spark.createDataFrame([(raw,)], "url string")
    assert df.select(canonicalize_url("url").alias("c")).head().c == canon


def test_url_dedup_groups(spark):
    df = spark.createDataFrame(
        [("HTTPS://A.example/p?b=1&a=1#x",), ("https://a.example/p/?a=1&b=1",),
         ("https://b.example/q",)], "url string")
    rows = url_dedup_groups(df).collect()
    sizes = {r.url: r.n_dups for r in rows}
    assert sizes["https://b.example/q"] == 1
    assert sizes["HTTPS://A.example/p?b=1&a=1#x"] == 2
    assert sizes["https://a.example/p/?a=1&b=1"] == 2


def test_extract_outlinks_path_relative_directory(spark):
    """Path-relative hrefs resolve against the source DIRECTORY
    (RFC 3986 merge), not the host root; query strings are stripped
    from the base; a path-less source falls back to the host root."""
    pages = spark.createDataFrame([
        ("https://a.example/dir/page",
         bytearray(b'<a href="rel.html">R</a><a href="/abs.html">A</a>')),
        ("https://b.example/d1/d2/p?q=1",
         bytearray(b'<a href="x.html">X</a>')),
        ("https://c.example",
         bytearray(b'<a href="root.html">RootRel</a>')),
    ], "url string, html binary")
    got = {(r.src_url, r.dst_url) for r in extract_outlinks(pages).collect()}
    assert got == {
        ("https://a.example/dir/page", "https://a.example/dir/rel.html"),
        ("https://a.example/dir/page", "https://a.example/abs.html"),
        ("https://b.example/d1/d2/p?q=1", "https://b.example/d1/d2/x.html"),
        ("https://c.example", "https://c.example/root.html"),
    }


def test_anchor_text_agg_blank_anchor_yields_no_tokens(spark):
    """A whitespace-only anchor must not contribute a '' token to
    anchor_terms (parity with the SQL oracle's t <> '' filter)."""
    links = spark.createDataFrame([
        ("https://a.example/1", "https://t.example/p", "   "),
        ("https://b.example/2", "https://t.example/p", "real term"),
    ], "src_url string, dst_url string, anchor string")
    rows = anchor_text_agg(links).collect()
    assert len(rows) == 1
    assert rows[0].n_inlinks == 2
    assert list(rows[0].anchor_terms) == ["real", "term"]


# --- HITS hubs & authorities (round 3) ----------------------------------------


def _py_hits(edges, n_iters):
    """Pure-python unnormalized-then-max-scaled HITS oracle."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    hub = {v: 1.0 for v in nodes}
    auth = {v: 0.0 for v in nodes}
    for _ in range(n_iters):
        auth = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            auth[d] += w * hub[s]
        hub = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            hub[s] += w * auth[d]
    ma = max(auth.values()) or 1.0
    mh = max(hub.values()) or 1.0
    return ({v: a / ma for v, a in auth.items()},
            {v: h / mh for v, h in hub.items()})


@pytest.mark.parametrize("n_iters", [1, 3, 5])
def test_hits_matches_python(spark, n_iters):
    from ir_spark.operators.linkgraph import hits

    edges = [("a", "b", 2.0), ("b", "c", 1.0), ("c", "a", 1.0),
             ("a", "c", 4.0), ("d", "a", 3.0), ("e", "a", 1.0),
             ("c", "f", 1.0)]  # f: authority only; e: hub only
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {r.node: (r.auth, r.hub)
           for r in hits(df, n_iters=n_iters).collect()}
    wa, wh = _py_hits(edges, n_iters)
    assert set(got) == set(wa)
    for v in wa:
        # integer-exact arithmetic until the single final division:
        # bit-equality, not approx
        assert got[v][0] == wa[v], (v, got[v][0], wa[v])
        assert got[v][1] == wh[v]
    assert max(a for a, _ in got.values()) == 1.0
    assert max(h for _, h in got.values()) == 1.0
    assert got["f"][1] == 0.0  # never a src
    assert got["e"][0] == 0.0  # never a dst


def test_hits_empty_and_unweighted(spark):
    from ir_spark.operators.linkgraph import hits

    empty = spark.createDataFrame([], "src string, dst string")
    assert hits(empty).count() == 0
    edges = [("a", "b", 100.0), ("b", "a", 1.0), ("a", "c", 1.0),
             ("c", "a", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {r.node: (r.auth, r.hub)
           for r in hits(df, n_iters=3, weighted=False).collect()}
    wa, wh = _py_hits([(s, d, 1.0) for s, d, _ in edges], 3)
    for v in wa:
        assert got[v] == (wa[v], wh[v])
    # b and c are symmetric under unit weights
    assert got["b"] == got["c"]


def test_hits_checkpointing_path(spark):
    from ir_spark.operators.linkgraph import hits

    edges = [("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 1.0),
             ("d", "a", 3.0), ("b", "a", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {r.node: (r.auth, r.hub)
           for r in hits(df, n_iters=6, checkpoint_every=2).collect()}
    wa, wh = _py_hits(edges, 6)
    for v in wa:
        assert got[v] == (wa[v], wh[v])


def test_host_reciprocity(spark):
    from ir_spark.operators.linkgraph import host_reciprocity

    edges = spark.createDataFrame(
        [("a", "b", 3), ("b", "a", 1),      # reciprocal pair
         ("a", "c", 2),                      # one-way
         ("c", "c", 9),                      # self-loop ignored
         ("a", "b", 5)],                     # duplicate edge deduped
        "src string, dst string, weight long")
    got = {r.host: (r.n_out, r.n_reciprocal, r.recip_frac_micro)
           for r in host_reciprocity(edges).collect()}
    # c has only a self-loop -> no outgoing partners -> absent
    assert got == {
        "a": (2, 1, 500000),   # b reciprocates, c does not
        "b": (1, 1, 1000000),
    }


def _numpy_trustrank(edges, seeds, n_iters, damping):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for s, d, wt in edges:
        w[idx[s], idx[d]] += wt
    out = w.sum(axis=1)
    t = np.zeros(n)
    live_seeds = [s for s in seeds if s in idx]
    for s in live_seeds:
        t[idx[s]] = 1.0 / len(live_seeds)
    trust = t.copy()
    for _ in range(n_iters):
        dangling = trust[out == 0].sum()
        contrib = np.zeros(n)
        nz = out > 0
        contrib += (w[nz].T / out[nz]) @ trust[nz]
        trust = (1 - damping) * t + damping * (contrib + dangling * t)
    return dict(zip(nodes, trust))


@pytest.mark.parametrize("n_iters", [1, 5, 12])
def test_trustrank_matches_numpy(spark, n_iters):
    from ir_spark.operators.linkgraph import trustrank

    edges = [("a", "b", 2.0), ("b", "c", 1.0), ("c", "a", 1.0),
             ("a", "c", 1.0), ("d", "a", 3.0), ("e", "a", 1.0),
             ("c", "f", 1.0)]  # f dangling
    seeds = ["a", "d", "zz-not-in-graph"]
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
    got = {r.node: r.trust
           for r in trustrank(df, sdf, n_iters=n_iters,
                              damping=0.85).collect()}
    want = _numpy_trustrank(edges, seeds, n_iters, 0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # trust is conserved (dangling re-enters via the seed vector)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_trustrank_starves_unreachable_spam(spark):
    """The point of TrustRank: a clique unreachable from the seeds
    holds zero trust, however densely it cites itself."""
    from ir_spark.operators.linkgraph import trustrank

    edges = [("seed", "good", 1.0), ("good", "seed", 1.0),
             ("spam1", "spam2", 9.0), ("spam2", "spam1", 9.0),
             ("spam1", "good", 1.0)]  # spam links OUT, nothing links in
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    sdf = spark.createDataFrame([("seed",)], "node string")
    got = {r.node: r.trust for r in trustrank(df, sdf, n_iters=8).collect()}
    assert got["spam1"] == 0.0 and got["spam2"] == 0.0
    assert got["good"] > 0.0 and got["seed"] > 0.0


def test_trustrank_no_live_seed_raises(spark):
    from ir_spark.operators.linkgraph import trustrank

    df = spark.createDataFrame([("a", "b", 1.0)],
                               "src string, dst string, weight double")
    sdf = spark.createDataFrame([("nope",)], "node string")
    with pytest.raises(ValueError):
        trustrank(df, sdf, n_iters=2)


def test_extract_outlinks_port_case_and_query_hrefs(spark):
    """Non-default ports survive root-relative resolution, uppercase
    <A HREF> anchors still extract, and query-only hrefs resolve
    against the full resource path (RFC 3986)."""
    pages = spark.createDataFrame([
        ("http://h.example:8080/a/index.html",
         bytearray(b'<a href="/about">About</a>'
                   b'<A HREF="http://x.example/">Caps</A>')),
        ("https://h.example/dir/list.html",
         bytearray(b'<a href="?page=2">Next</a>')),
    ], "url string, html binary")
    got = {(r.src_url, r.dst_url) for r in extract_outlinks(pages).collect()}
    assert got == {
        ("http://h.example:8080/a/index.html",
         "http://h.example:8080/about"),
        ("http://h.example:8080/a/index.html", "http://x.example/"),
        ("https://h.example/dir/list.html",
         "https://h.example/dir/list.html?page=2"),
    }
