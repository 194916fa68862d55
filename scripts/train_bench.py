"""Training-job scaling evidence (SURVEY §2.9 M4/M5, north_rule):
run the SAME training job — frozen-encoder feature pooling + 3
full-batch epochs of the reference AdamW update — on the SAME input at
local[8] and local[32], and report:

* throughput (pooled rows/sec end-to-end) at each level + efficiency,
  compared against a no-Spark hardware ceiling: the same pinned-BLAS
  encoder kernel under multiprocessing at 8 and 32 processes (this
  box's SMT/memory-bandwidth limit for the kernel — the honest
  denominator, same methodology as scripts/scaling_bench.py),
* the per-epoch exact-integer losses and the final quantized-weight
  checksum at BOTH levels — which must be BIT-IDENTICAL, because every
  cross-row reduction in the gradient path is an int64/decimal(38,0)
  fold (scoring/train.py).  Identical-results-at-any-parallelism is
  the strongest form of the two-cluster-size criterion: not only does
  the job scale, it provably computes the same model.

The input is synthesized relationally (hash-derived token ids — no
Python, no files): FEATURES_SCHEMA rows with 128-token sequences and a
two-entity mask, partition count FIXED across levels so the only
variable is the core count.

Each level runs in a fresh subprocess (one SparkSession per JVM) with a
warm-up batch excluded from the measurement.  Writes BENCH/TRAIN.md and
prints one JSON line.

Usage: python scripts/train_bench.py [n_rows]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# must match CHILD's config so the ceiling measures the same kernel
CFG_ARGS = dict(vocab_size=30524, embedding_size=64, hidden_size=64,
                num_hidden_layers=4, num_attention_heads=4,
                intermediate_size=256)


def _pin_blas() -> None:
    import os

    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
              "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ[v] = "1"


def _kernel_batches(nbatch: int) -> float:
    """One pinned single-threaded process: nbatch encoder forwards of a
    (16, 128) batch; returns the inner wall (excludes import/spawn)."""
    sys.path.insert(0, str(REPO))
    import numpy as np

    from relation_extraction_cdr_spark.scoring.electra import (
        ElectraConfig,
        ElectraWeights,
        encoder_forward,
    )

    cfg = ElectraConfig(**CFG_ARGS)
    w = ElectraWeights.seeded(cfg, seed=3)
    rng = np.random.RandomState(0)
    ids = rng.randint(1000, 30000, (16, 128))
    att = np.ones((16, 128), np.float32)
    encoder_forward(w, ids, att)  # warm caches
    t0 = time.perf_counter()
    for _ in range(nbatch):
        encoder_forward(w, ids, att)
    return time.perf_counter() - t0


def kernel_ceiling(procs: int, nbatch: int = 32, repeats: int = 2) -> float:
    """Rows/sec of the bare pinned-BLAS encoder kernel at `procs`
    single-threaded processes — zero Spark.  Straggler-aware within a
    run (max of the inner walls) and best-of-`repeats` across runs —
    the SAME best-of-N protocol the Spark levels use, so ceiling and
    measurement see the same shared-host noise distribution (a
    single-run ceiling against a best-of-N job produced >100%
    artifacts on this noisy VM).  Spawn/import excluded."""
    ctx = mp.get_context("spawn")
    best = 0.0
    with ctx.Pool(procs, initializer=_pin_blas) as p:
        for _ in range(repeats):
            walls = p.map(_kernel_batches, [nbatch] * procs)
            best = max(best, procs * nbatch * 16 / max(walls))
    return best

CHILD = r"""
import json, os, sys, time
# Pin BLAS to ONE thread per python worker (env propagates JVM ->
# pyspark worker subprocesses).  Without this, each of the local[8]
# workers spawns multi-threaded OpenBLAS and silently steals all 64
# hardware threads — the local[8] number then exceeds the 8-process
# pinned kernel ceiling and the 8->32 "efficiency" is fiction.  Pinned,
# core count is genuinely the only variable between levels, matching
# the kernel_ceiling methodology.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
           "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ[_v] = "1"
sys.path.insert(0, {repo!r})
import numpy as np
from pyspark.sql import functions as F
from relation_extraction_cdr_spark.session import spark_session
from relation_extraction_cdr_spark.scoring.electra import ElectraConfig
from relation_extraction_cdr_spark.scoring.train import (
    Q_LOSS, pool_features, train_pair_head,
)

cpus = int(sys.argv[1]); n_rows = int(sys.argv[2]); repeats = int(sys.argv[3])
spark = spark_session("train-bench", master=f"local[{{cpus}}]",
                      shuffle_partitions=max(64, cpus * 8))
spark.sparkContext.setLogLevel("ERROR")

PARTS = 64      # identical layout at every level (north-rule criterion)
SEQ = 128

def synth_features(n):
    # deterministic, fully relational FEATURES_SCHEMA synth: token ids
    # are hash-derived, the entity mask marks two fixed spans with the
    # per-row chem/dis codes, label correlates with a token-id parity
    # so the head has signal to fit
    base = spark.range(n).repartition(PARTS, "id")
    pos = F.sequence(F.lit(0), F.lit(SEQ - 1))
    tok = F.transform(pos, lambda p: (F.xxhash64(F.col("id"), p) % 29000 + 29000) % 29000 + 1000)
    msk = F.transform(pos, lambda p: F.when(p.between(3, 6), F.lit(0))
                                      .when(p.between(40, 44), F.lit(1))
                                      .otherwise(F.lit(-1)))
    return base.select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.lit("C1").alias("chem_mesh"), F.lit("D1").alias("dis_mesh"),
        (F.element_at(tok, 4) % 2).cast("int").alias("label"),
        tok.cast("array<int>").alias("token_ids"),
        msk.cast("array<int>").alias("entity_mask"),
        F.lit(0).cast("int").alias("chem_code"),
        F.lit(1).cast("int").alias("dis_code"),
    )

cfg = ElectraConfig(vocab_size=30524, embedding_size=64, hidden_size=64,
                    num_hidden_layers=4, num_attention_heads=4,
                    intermediate_size=256)

def run_once(feats):
    pooled = pool_features(feats, config=cfg, seed=3)
    res = train_pair_head(pooled, epochs=3, optimizer="adamw",
                          ignore_index=None, seed=1)
    checksum = int(sum(
        int(np.rint(p.astype(np.float64) * (1 << 14)).astype(np.int64).sum())
        for _, p in res.params.tensors()))
    loss_qs = [int(round(l * res.n_valid * Q_LOSS)) for l in res.losses]
    return res.n_valid, loss_qs, checksum

# warm-up: codegen + python worker pool + numpy weight materialization
run_once(synth_features(max(256, n_rows // 8)))
walls = []
for _ in range(repeats):
    t0 = time.perf_counter()
    n_valid, loss_qs, checksum = run_once(synth_features(n_rows))
    walls.append(time.perf_counter() - t0)
wall = min(walls)
print(json.dumps({{"cpus": cpus, "rows": n_rows, "n_valid": n_valid,
                   "loss_qs": loss_qs, "checksum": checksum,
                   "wall_sec": round(wall, 3),
                   "walls": [round(w, 3) for w in walls],
                   "rows_per_sec": round(n_rows / wall, 2)}}))
"""


def run_level(cpus: int, n_rows: int, repeats: int) -> dict:
    code = CHILD.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_rows), str(repeats)],
        capture_output=True, text=True, check=True, cwd=str(REPO),
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 48000
    c8 = kernel_ceiling(8)
    c32 = kernel_ceiling(32)
    ceil_eff = (c32 / c8) / 4
    r8 = run_level(8, n_rows, 2)
    r32 = run_level(32, n_rows, 2)
    eff = (r32["rows_per_sec"] / r8["rows_per_sec"]) / 4
    identical = (r8["loss_qs"] == r32["loss_qs"]
                 and r8["checksum"] == r32["checksum"])
    md = f"""# BENCH/TRAIN.md — training-job scaling (M4/M5)

Same job (frozen-encoder pooling, 4-layer/64-hidden config, 128-token
sequences + 3 full-batch reference-AdamW epochs), same {n_rows}-row
relationally-synthesized input, FIXED 64-partition layout; only the
core count varies.  Fresh JVM per level, warm-up excluded, best-of-N.

| level | rows/s | wall (s) | walls | kernel hw ceiling (rows/s) |
|---|---|---|---|---|
| local[8]  | {r8['rows_per_sec']} | {r8['wall_sec']} | {r8['walls']} | {c8:.0f} |
| local[32] | {r32['rows_per_sec']} | {r32['wall_sec']} | {r32['walls']} | {c32:.0f} |

8→32 scaling efficiency: **{eff:.3f}**, vs a **{ceil_eff:.3f}** hardware
ceiling measured for THIS kernel on this box (pinned single-threaded
BLAS, one process per core, zero Spark — SMT + memory bandwidth cap
the 8→32 step well below 1.0; methodology as in BENCH/BASELINE.md).
Engine/ceiling ratio: **{eff / ceil_eff:.2f}**.  Spark at local[8]
reaches {100 * r8['rows_per_sec'] / c8:.0f}% of the 8-process kernel
ceiling end-to-end (including input synthesis, the shuffle, Arrow
transfer, and three optimizer epochs, which the bare kernel excludes).

**Bit-identical results across parallelism levels: {identical}.**
Per-epoch exact-integer losses (units 1/Q_LOSS) and final
quantized-weight checksum at both levels:

- local[8]:  loss_q={r8['loss_qs']}, checksum={r8['checksum']}
- local[32]: loss_q={r32['loss_qs']}, checksum={r32['checksum']}

The equality is by construction — every cross-row reduction in the
gradient path is an int64 fixed-point matmul/sum folded in
decimal(38,0) (scoring/train.py) — and this run is the measured proof.
The same property holds 1000 executors vs 8: the fold is associative,
commutative, and overflow-proof past 10^12 rows.
"""
    (REPO / "BENCH" / "TRAIN.md").write_text(md)
    print(json.dumps({"rows": n_rows, "r8": r8, "r32": r32,
                      "eff_8_32": round(eff, 3), "bit_identical": identical}))
    sys.exit(0 if identical else 1)


if __name__ == "__main__":
    main()
