"""Scaling-efficiency evidence for the north_rule: run the SAME pipeline
on the SAME input at two parallelism levels (local[8] = N, local[32] = 4N
— the sandbox proxy for N vs 4N executors) and report throughput at both
plus efficiency = T_4N / (4 * T_N).

Each level runs in a fresh subprocess (one SparkSession per JVM).
Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/scaling_bench.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from relation_extraction_cdr_spark.session import spark_session
from relation_extraction_cdr_spark import datagen
from relation_extraction_cdr_spark.plans.pipeline import score_candidates, materialize_triples

cpus = int(sys.argv[1]); n_pages = int(sys.argv[2])
# initial shuffle partitions scale with cores (AQE can only coalesce DOWN
# from this number, never up — too few starves wide stages of waves)
spark = spark_session("scaling", master=f"local[{{cpus}}]", shuffle_partitions=cpus * 8)
spark.sparkContext.setLogLevel("ERROR")
# IDENTICAL input layout at both levels: fixed partition counts so the
# only variable is the core count (the north-rule criterion)
PARTS = 128
pages = datagen.gen_pages_df(spark, n_pages, partitions=PARTS, doc_scale=12).cache()
n = pages.count()
mesh = datagen.mesh_df(spark)

def run_once():
    # numpy backend: per-doc encoder compute representative of the real
    # ONNX scorer (the stub alone is unrealistically cheap, which makes a
    # single machine memory-bandwidth-bound instead of compute-bound)
    scored = score_candidates(pages, mesh, salt_partitions=PARTS,
                              scorer_backend="numpy")
    triples = materialize_triples(scored)
    return triples.count()

# warm-up: one full-scale run (JIT/codegen compile, Python worker pool,
# broadcast materialization) — steady-state throughput is the metric
run_once()
t0 = time.perf_counter()
n_triples = run_once()
wall = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "pages": n, "triples": n_triples,
                   "wall_sec": round(wall, 3),
                   "pages_per_sec": round(n / wall, 2),
                   "triples_per_sec": round(n_triples / wall, 3)}}))
"""


def run_level(cpus: int, n_pages: int) -> dict:
    code = CHILD.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_pages)],
        capture_output=True, text=True, check=True, cwd=str(REPO),
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    lo = run_level(8, n_pages)
    hi = run_level(32, n_pages)
    speedup = lo["wall_sec"] / hi["wall_sec"]
    efficiency = round(speedup / 4.0, 3)
    result = {
        "metric": "scaling_efficiency_N_vs_4N",
        "value": efficiency,
        "unit": "ratio",
        "n_pages": n_pages,
        "local8": lo,
        "local32": hi,
        "speedup": round(speedup, 3),
    }
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE.md — measured scaling evidence

North-rule criterion: throughput scaling efficiency >= 0.8 between N and
4N parallelism on identical input.  Sandbox proxy: local[8] (N) vs
local[32] (4N) on one machine, same seeded synthetic pages corpus
({n_pages} pages), same code, fresh JVM per level, warm-up excluded.

| level | cores | pages | triples | wall (s) | pages/sec | triples/sec |
|---|---|---|---|---|---|---|
| N  | 8  | {lo['pages']} | {lo['triples']} | {lo['wall_sec']} | {lo['pages_per_sec']} | {lo['triples_per_sec']} |
| 4N | 32 | {hi['pages']} | {hi['triples']} | {hi['wall_sec']} | {hi['pages_per_sec']} | {hi['triples_per_sec']} |

speedup (wall_N / wall_4N): **{speedup:.3f}x**
scaling efficiency (speedup / 4): **{efficiency}** (target >= 0.8)

Caveats: single-machine core scaling understates cluster scaling for this
workload (shared memory bandwidth, one shuffle service); the pipeline's
only wide stages key on unique urls / pair hashes, so the plan has no
scaling bottleneck that would appear at executor granularity.
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "BASELINE.md").write_text(md)


if __name__ == "__main__":
    main()
