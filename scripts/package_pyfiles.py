"""Build the --py-files artifact for cluster submission.

Zips the ``timeseries_harmonizer_spark`` package (source only) into
``dist/timeseries_harmonizer_spark.zip`` and prints the spark-submit line —
the deployment path the engine is designed for (the same ``get_spark``
factory runs on the cluster; only master/memory change):

    spark-submit --py-files dist/timeseries_harmonizer_spark.zip \
        jobs/run_tier.py --tier 1h --warehouse <path> --run-id <id> \
        --input <pages.parquet>
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "timeseries_harmonizer_spark"


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PKG}.zip")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
                n += 1
    print(f"wrote {out} ({n} modules)")
    print(
        f"spark-submit --py-files {out} jobs/run_tier.py "
        "--tier 1h --warehouse <path> --run-id <id> --input <pages.parquet>"
    )
    return out


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else None)
