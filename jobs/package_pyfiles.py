#!/usr/bin/env python
"""Package ``ir_spark`` into a ``--py-files`` zip (north rule: the
pipeline ships via ``spark-submit --py-files``).

Usage::

    python jobs/package_pyfiles.py [--out dist/ir_spark.zip]

The zip is deterministic (fixed timestamps, sorted entries) so
re-packaging an unchanged tree produces byte-identical artifacts —
useful for cache keys on a real cluster deploy.
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_EPOCH = (1980, 1, 1, 0, 0, 0)  # zip format's epoch; fixed for determinism


def package(out_path: str) -> str:
    src_root = os.path.join(REPO_ROOT, "ir_spark")
    entries: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, REPO_ROOT)
            entries.append((full, arc))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    os.replace(tmp, out_path)
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO_ROOT, "dist", "ir_spark.zip"))
    args = ap.parse_args()
    path = package(args.out)
    print(path)


if __name__ == "__main__":
    main()
