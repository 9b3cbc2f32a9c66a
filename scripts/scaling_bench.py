"""Two-cluster-size scaling evidence (north rule): run the identical
web_pages rollup job at local[8] and local[32] on the same input and report
throughput at both plus scaling efficiency = (T8/T32)/(32/8).

Each run is a fresh JVM (subprocess) so executor-thread count is the only
variable. Writes BENCH.md.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

JOB = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from timeseries_harmonizer_spark.session import get_spark
from timeseries_harmonizer_spark.plans import pipeline
from timeseries_harmonizer_spark.sources.webpages import web_pages, registry
from timeseries_harmonizer_spark.operators.compress import compress_points

cores = int(sys.argv[1])
n_urls = int(sys.argv[2])
ppu = int(sys.argv[3])
spark = get_spark(app_name=f"scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=4 * cores,
                  extra_conf={
                      "spark.ui.showConsoleProgress": "false",
                      # at bench scale the default 64MB advisory target makes
                      # AQE coalesce every shuffle to ~1 partition, which
                      # serializes reduce stages regardless of core count;
                      # 2MB keeps task counts proportional to the data
                      # (production at full scale keeps the 64MB default)
                      "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
                  })
import os
path = f"/tmp/scale_pages_{n_urls}x{ppu}"
if not os.path.exists(path + "/_SUCCESS"):
    gen = web_pages(spark, n_urls=n_urls, points_per_url=ppu, seed=42)
    gen.write.mode("overwrite").parquet(path)
pages = spark.read.parquet(path)
reg = registry(spark, pages, seed=42); reg.cache().count()

def once():
    pts, payloads = pipeline.run_tier(pages, reg, "1h")
    n = pts.count()
    payloads.count()
    blobs = compress_points(pts.select("url","start","value"), "1h")
    blobs.write.mode("overwrite").parquet(f"/tmp/scale_blobs_{cores}")
    return n

once()  # JIT/codegen warmup — measure steady state
t0 = time.time()
n = once()
dt = time.time() - t0
print(json.dumps({"cores": cores, "points": n, "sec": round(dt,2),
                  "points_per_sec": round(n/dt,1)}))
"""


def run(cores: int, n_urls: int, ppu: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", JOB, str(cores), str(n_urls), str(ppu)],
        capture_output=True, text=True, timeout=3000,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    # big enough that parallel work dominates the sandbox's fixed per-stage
    # overheads (~5s/job); generation is untimed and cached on disk
    n_urls, ppu = 20000, 800  # ~16.7M raw rows
    r8 = run(8, n_urls, ppu)
    r32 = run(32, n_urls, ppu)
    speedup = r8["sec"] / r32["sec"]
    efficiency = speedup / (32 / 8)
    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

Same job (synthetic web_pages -> native 1h tier rollup -> Gorilla/DoD
compressed payload write), same input ({n_urls} urls x {ppu} points =
~{n_urls*ppu/1e6:.1f}M raw rows), fresh JVM per run; only executor thread
count varies (local[8] vs local[32] — the sandbox proxy for N vs 4N
executors per BASELINE.md §B).

| cores | rolled-up points | wall sec | points/sec |
|---|---|---|---|
| 8 | {r8['points']} | {r8['sec']} | {r8['points_per_sec']} |
| 32 | {r32['points']} | {r32['sec']} | {r32['points_per_sec']} |

- speedup 8->32: **{speedup:.2f}x**
- scaling efficiency (speedup / 4): **{efficiency:.3f}** (target >= 0.8)
"""
    with open("/root/repo/BENCH.md", "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
