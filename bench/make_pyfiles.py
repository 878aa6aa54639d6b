#!/usr/bin/env python
"""Package the engine for ``spark-submit --py-files`` (the north-star
deployment shape: driver ships one zip, executors import it).

    python bench/make_pyfiles.py [--out dist/singer_tap_spark.zip]
    spark-submit --py-files dist/singer_tap_spark.zip \\
        singer_tap_spark/job.py sync --changelog ... --target ...

Deterministic output: entries are added in sorted order with zeroed
timestamps, so the zip is byte-stable for a given tree (reproducible
deploy artifacts diff cleanly).
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "singer_tap_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    files = []
    for root, _dirs, names in os.walk(pkg):
        for n in sorted(names):
            if n.endswith(".py"):
                p = os.path.join(root, n)
                files.append((p, os.path.relpath(p, REPO)))
    files.sort(key=lambda t: t[1])
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for path, arc in files:
            with open(path, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "singer_tap_spark.zip"))
    args = ap.parse_args()
    print(build(args.out))
