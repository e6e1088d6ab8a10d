"""jobs/ entry points run in-process (--local-cpus), covering the
--from-html extraction path and the packaging helper's determinism."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from ir_spark.fixtures import generate_pages, pages_to_parquet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_build_from_html_and_query(tmp_path, capsys):
    """--from-html re-derives text from the html payload with the
    reference extraction; index must equal the text-column build."""
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import build_index
    import query_index

    pages = generate_pages(150, seed=11)
    src = str(tmp_path / "pages.parquet")
    pages_to_parquet(pages, src)

    idx_html = str(tmp_path / "idx_html")
    idx_text = str(tmp_path / "idx_text")
    for idx, extra in ((idx_html, ["--from-html"]), (idx_text, [])):
        rc = build_index.main([
            "--input", src, "--index-dir", idx, "--segment-groups", "1",
            "--local-cpus", "8"] + extra)
        assert rc == 0
    capsys.readouterr()

    qfile = tmp_path / "q.txt"
    qfile.write_text("flow pressure boundary layer\n")
    out_html = str(tmp_path / "res_html")
    out_text = str(tmp_path / "res_text")
    for idx, out in ((idx_html, out_html), (idx_text, out_text)):
        rc = query_index.main([
            "--index-dir", idx, "--queries", str(qfile), "--k", "5",
            "--output", out, "--local-cpus", "8"])
        assert rc == 0
    capsys.readouterr()

    from ir_spark.session import get_spark

    spark = get_spark("test_jobs")
    rows_html = sorted(
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in spark.read.parquet(out_html).collect())
    rows_text = sorted(
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in spark.read.parquet(out_text).collect())
    assert rows_html == rows_text
    assert len(rows_html) == 5


def test_package_pyfiles_deterministic(tmp_path):
    script = os.path.join(REPO, "jobs", "package_pyfiles.py")
    z1, z2 = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    for z in (z1, z2):
        subprocess.run([sys.executable, script, "--out", z],
                       check=True, capture_output=True)
    assert open(z1, "rb").read() == open(z2, "rb").read()


def test_merge_index_job(tmp_path, capsys):
    """jobs/merge_index.py merges two builds; querying the merged index
    equals querying a full build of the union."""
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import build_index
    import merge_index
    import query_index

    pages = generate_pages(120, seed=13)
    src_a = str(tmp_path / "a.parquet")
    src_b = str(tmp_path / "b.parquet")
    src_all = str(tmp_path / "all.parquet")
    pages_to_parquet(pages[:60], src_a)
    pages_to_parquet(pages[60:], src_b)
    pages_to_parquet(pages, src_all)

    dirs = {k: str(tmp_path / k) for k in ("ia", "ib", "ifull", "im")}
    for src, idx in ((src_a, dirs["ia"]), (src_b, dirs["ib"]),
                     (src_all, dirs["ifull"])):
        assert build_index.main([
            "--input", src, "--index-dir", idx, "--segment-groups", "1",
            "--local-cpus", "8"]) == 0
    capsys.readouterr()

    assert merge_index.main([
        "--sources", dirs["ia"], dirs["ib"], "--out", dirs["im"],
        "--local-cpus", "8"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metrics"]["n_docs"] == 120

    qfile = tmp_path / "q.txt"
    qfile.write_text("flow pressure boundary layer\n")
    results = {}
    for idx in ("ifull", "im"):
        dest = str(tmp_path / f"res_{idx}")
        assert query_index.main([
            "--index-dir", dirs[idx], "--queries", str(qfile), "--k", "5",
            "--output", dest, "--local-cpus", "8"]) == 0
        from ir_spark.session import get_spark

        spark = get_spark("test_jobs")
        doc_map = spark.read.parquet(os.path.join(dirs[idx], "doc_map"))
        res = spark.read.parquet(dest).join(doc_map, "doc_id")
        results[idx] = sorted(
            (r["rank"], r["url"], round(r["score"], 9))
            for r in res.collect())
    capsys.readouterr()
    assert results["ifull"] == results["im"]
    assert len(results["im"]) == 5
