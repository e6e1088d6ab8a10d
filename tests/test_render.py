"""Reference-format result rendering (Driver.java:83-105, SURVEY
S8/W5): golden comparison against a pure-Python oracle rendering."""

from __future__ import annotations

import math
import re

import pytest

from ir_spark import oracle
from ir_spark.operators import segments as SEG
from ir_spark.operators.render import RULE, render_search_results

QUERIES = ["flow pressure boundary layer", "supersonic wing heat transfer"]


@pytest.fixture(scope="module")
def index_dir(spark, pages_small, tmp_path_factory):
    path, _ = pages_small
    d = str(tmp_path_factory.mktemp("render_idx"))
    SEG.build_segment_index(spark, spark.read.parquet(path), d, source=path,
                            n_buckets=8, range_width=64, segment_groups=2)
    return d


def _oracle_render(oracle_index, pages, query, mode, k=5):
    """The reference's writeSearchResults + getVectors semantics in pure
    Python over the oracle index (clean-room from Driver.java:83-105)."""
    idx = oracle_index
    by_url = sorted(pages, key=lambda p: p.url)
    url_of = {i + 1: p.url for i, p in enumerate(by_url)}
    text_of = {i + 1: p.text for i, p in enumerate(by_url)}

    bag = oracle.parse_query(query)
    labels = sorted(set(idx.postings) | set(bag))
    pos = {t: i for i, t in enumerate(labels)}
    n = len(idx.docinfo)
    avg = sum(dl for dl, _ in idx.docinfo.values()) / n
    max_q = max(bag.values())
    qvec = []
    for t, tf in bag.items():
        w = oracle.max_tf_weight(tf, max_q, idx.df(t), n)
        if w > 0:
            qvec.append((t, pos[t], w))

    top = oracle.search(idx, query, k=k, mode=mode)
    out = {"query": query, "rows": []}
    for rank, (d, score) in enumerate(top, start=1):
        dvec = []
        dl, mtf = idx.docinfo[d]
        for t, plist in idx.postings.items():
            tf = dict(plist).get(d)
            if tf is None:
                continue
            if mode == "w1":
                w = oracle.max_tf_weight(tf, mtf, idx.df(t), n)
            else:
                w = oracle.okapi_weight(tf, dl, idx.df(t), n, avg)
            if w > 0:
                dvec.append((t, pos[t], w))
        out["rows"].append({
            "rank": rank, "filename": url_of[d], "score": score,
            "headline": text_of[d][:60].replace("\n", " ").strip(),
            "qvec": sorted(qvec, key=lambda x: x[1]),
            "dvec": sorted(dvec, key=lambda x: x[1]),
        })
    return out


VEC_RE = re.compile(r"\(([^,]+), (\d+)\)=([0-9.eE+-]+)")


def _parse_render(text):
    """Parse the rendered format back into comparable structures."""
    blocks = [b for b in text.split(RULE) if b.strip()]
    header = blocks[0].splitlines()[0]
    assert header.startswith("Query = ")
    out = {"query": header[len("Query = "):], "rows": []}
    body = text.splitlines()
    i = 1
    while i < len(body):
        if not body[i].startswith("Rank = "):
            i += 1
            continue
        m = re.match(r"Rank = (\d+), filename = (.*), score = (.*)", body[i])
        assert m, body[i]
        row = {"rank": int(m.group(1)), "filename": m.group(2),
               "score": float(m.group(3))}
        assert body[i + 1].startswith("Headline = ")
        row["headline"] = body[i + 1][len("Headline = "):]
        for key, ln in (("qvec", body[i + 2]), ("dvec", body[i + 3])):
            assert ln.startswith(("Query vector = [ ", "Document vector = [ "))
            row[key] = [(t, int(ix), float(w))
                        for t, ix, w in VEC_RE.findall(ln)]
        out["rows"].append(row)
        i += 4
    return out


@pytest.mark.parametrize("mode", ["w1", "w2"])
@pytest.mark.parametrize("query", QUERIES)
def test_render_matches_oracle(spark, index_dir, pages_small, oracle_index,
                               query, mode):
    _, pages = pages_small
    docs = spark.read.parquet(pages_small[0]).select("url", "text")
    got = _parse_render(render_search_results(
        spark, index_dir, query, k=5, mode=mode, documents=docs))
    want = _oracle_render(oracle_index, pages, query, mode, k=5)

    assert got["query"] == want["query"]
    assert len(got["rows"]) == len(want["rows"]) == 5
    for g, w in zip(got["rows"], want["rows"]):
        assert g["rank"] == w["rank"]
        assert g["filename"] == w["filename"]
        assert g["headline"] == w["headline"]
        assert g["score"] == pytest.approx(w["score"], abs=1e-9)
        for key in ("qvec", "dvec"):
            assert [(t, i) for t, i, _ in g[key]] == [
                (t, i) for t, i, _ in w[key]], (key, g["rank"])
            for (_, _, gw), (_, _, ww) in zip(g[key], w[key]):
                assert gw == pytest.approx(ww, abs=1e-9)


def test_query_index_job_renders(spark, index_dir, pages_small, tmp_path):
    """--render-vectors writes one <mode>-q<i>.txt per query in the
    reference's naming (Driver.java:68-70)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import query_index

    qfile = tmp_path / "queries.txt"
    qfile.write_text("\n".join(QUERIES) + "\n")
    rdir = tmp_path / "render"
    rc = query_index.main([
        "--index-dir", index_dir, "--queries", str(qfile), "--k", "5",
        "--mode", "w1", "--render-vectors", str(rdir),
        "--documents", pages_small[0], "--local-cpus", "4",
    ])
    assert rc == 0
    for i, q in enumerate(QUERIES):
        text = (rdir / f"w1-q{i}.txt").read_text()
        parsed = _parse_render(text)
        assert parsed["query"] == q
        assert len(parsed["rows"]) == 5
        assert text.count("Query vector = [ ") == 5
