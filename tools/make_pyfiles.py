"""Build the --py-files archive for spark-submit deployment.

    python tools/make_pyfiles.py [dest.zip]

Zips the ``linkinator_spark`` package (sources only, no __pycache__) into
``dist/linkinator_spark.zip`` by default. Ship it with

    spark-submit --py-files dist/linkinator_spark.zip jobs/crawl_job.py ...

The archive root contains the package directory itself, so executors add it
to sys.path and ``import linkinator_spark`` works driver- and worker-side.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(dest: str | None = None) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "linkinator_spark")
    dest = dest or os.path.join(repo, "dist", "linkinator_spark.zip")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in sorted(files):
                if name.endswith(".pyc"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, repo))
    return dest


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
