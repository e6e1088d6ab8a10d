"""Bucketed segment storage + build checkpointing (SURVEY S6/S7).

Layout of an index directory (Parquet stand-in for Iceberg — no Iceberg
jars in the sandbox; the writer keeps the bucket column + layout so a
``writeTo(...).using('iceberg')`` swap is a config change, SURVEY §7.1.5):

    <index_dir>/
      doc_map/            (url, doc_id)            - parquet
      docinfo/            (doc_id, doc_len, max_tf)- parquet
      dictionary/         (term, df, cf)           - parquet
      segments/bucket=N/  segment rows             - parquet, dir-pruned
      norms/              (doc_id, norm_w1, norm_w2)
      _manifests/<stage>.json                      - commit markers

Every stage commit is atomic: write to ``<dir>.tmp`` -> os.replace ->
manifest JSON with lineage + metrics.  A re-run skips stages whose
manifest says committed and whose lineage matches (SURVEY §4.5,
reference's index-serialization cache Driver.java:26-57 generalized).

Term -> bucket uses md5-derived hashing computable identically on the
driver (hashlib) and in Spark SQL (md5 + conv), so query-time bucket
pruning needs no Spark job.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32


def term_bucket_py(term: str, n_buckets: int = DEFAULT_BUCKETS) -> int:
    """Driver-side bucket id: first 60 bits of md5, mod n_buckets."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % n_buckets


def term_bucket_col(term: Column, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """Same hash as a Catalyst expression (JVM-side)."""
    return F.pmod(
        F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


# --- manifests ---------------------------------------------------------------

def _manifest_path(index_dir: str, stage: str) -> str:
    return os.path.join(index_dir, "_manifests", f"{stage}.json")


def stage_committed(index_dir: str, stage: str, lineage: dict[str, Any]) -> bool:
    """True iff the stage committed earlier with identical lineage."""
    path = _manifest_path(index_dir, stage)
    if not os.path.exists(path):
        return False
    with open(path) as fp:
        manifest = json.load(fp)
    return manifest.get("status") == "committed" and manifest.get("lineage") == lineage


def commit_stage(index_dir: str, stage: str, lineage: dict[str, Any],
                 metrics: dict[str, Any]) -> dict[str, Any]:
    manifest = {
        "stage": stage,
        "status": "committed",
        "lineage": lineage,
        "metrics": metrics,
        "committed_at_unix": time.time(),
    }
    os.makedirs(os.path.join(index_dir, "_manifests"), exist_ok=True)
    tmp = _manifest_path(index_dir, stage) + ".tmp"
    with open(tmp, "w") as fp:
        json.dump(manifest, fp, indent=2, sort_keys=True)
    os.replace(tmp, _manifest_path(index_dir, stage))
    return manifest


def read_manifests(index_dir: str) -> dict[str, dict[str, Any]]:
    mdir = os.path.join(index_dir, "_manifests")
    out = {}
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.endswith(".json"):
                with open(os.path.join(mdir, name)) as fp:
                    out[name[:-5]] = json.load(fp)
    return out


def tree_bytes(path: str) -> int:
    """Total bytes of data files under ``path`` (parquet part files;
    _SUCCESS/_metadata markers excluded).  Local-FS walk — on a real
    cluster the same number comes from the Iceberg snapshot's
    total-files-size summary or an FS content summary, one RPC."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.startswith("_") or name.startswith("."):
                continue
            total += os.path.getsize(os.path.join(root, name))
    return total


def atomic_write_parquet(df: DataFrame, dest: str, partition_by: list[str] | None = None,
                         sort_within: list[str] | None = None) -> None:
    """Write parquet to ``dest.tmp`` then rename to ``dest``.
    ``sort_within`` orders rows inside each file so Parquet row-group
    min/max stats prune term lookups.

    When ``dest`` already exists it is renamed ASIDE first and deleted
    only after the swap: the not-exists window for a concurrent reader
    is two rename syscalls, not a whole rmtree of the old tree (POSIX
    rename cannot replace a non-empty directory, so some window is
    unavoidable without renameat2-EXCHANGE; readers holding open file
    handles keep working either way).  TRUE zero-downtime swaps go
    through the ``set_alias`` pointer below, which flips one file
    atomically."""
    tmp = dest + ".tmp"
    old = dest + ".old"
    # crash recovery: a previous call that died between
    # os.replace(dest, old) and os.replace(tmp, dest) leaves ``dest``
    # absent with the only committed copy stranded in ``.old`` —
    # restore it before anything else, or the rmtree below would
    # delete the sole surviving copy instead of a stale one
    if not os.path.exists(dest) and os.path.exists(old):
        os.replace(old, dest)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    had_old = os.path.exists(dest)
    if had_old:
        os.replace(dest, old)
    os.replace(tmp, dest)
    if had_old:
        shutil.rmtree(old)


# --- serving aliases (Elasticsearch-alias / atomic-pointer analogue) ---------


def set_alias(alias_path: str, index_dir: str) -> dict:
    """Point a serving alias file at an index directory, atomically
    (tmp + os.replace): readers resolving the alias see either the old
    index or the new one, never a torn pointer — the zero-downtime
    reindex swap (build v2 offline, flip the alias, delete v1 later).
    ``alias_path`` must end in ``.alias.json`` so a resolver can tell
    aliases from index dirs."""
    if not alias_path.endswith(".alias.json"):
        raise ValueError("alias files must end in .alias.json")
    target = os.path.abspath(index_dir)
    if not os.path.isdir(target):
        raise ValueError(f"alias target is not a directory: {target}")
    prev = None
    if os.path.exists(alias_path):
        with open(alias_path) as fh:
            prev = json.load(fh).get("index_dir")
    tmp = alias_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"index_dir": target}, fh)
    os.replace(tmp, alias_path)
    return {"index_dir": target, "previous": prev}


def resolve_alias(path: str) -> str:
    """Resolve a path that may be an alias file: ``*.alias.json`` is
    dereferenced (one level — aliases to aliases are refused to keep
    resolution O(1) and loop-free); anything else passes through."""
    if not path.endswith(".alias.json"):
        return path
    with open(path) as fh:
        target = json.load(fh)["index_dir"]
    if target.endswith(".alias.json"):
        raise ValueError("alias chains are not allowed")
    return target
