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

from ..functions.tokenize import vocab_id

SCORED_SCHEMA = (
    "url string, chem_mesh string, dis_mesh string, label int, "
    "evidence_type string, pred int, prob double"
)

# causal-trigger WordPiece ids; vocab_id (not piece_to_id) so an
# out-of-vocab surface form can never alias to [UNK] and make every
# unknown token a trigger.  "induces" max-munches to induce+##s, so the
# in-vocab stems cover all inflections the corpus generator emits.
_TRIGGER_IDS = frozenset(
    tid
    for w in ("induc", "induce", "induced", "induces", "inducing")
    if (tid := vocab_id(w)) is not None
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
        # numpy-encoder backend: the encoder logit deterministically
        # modulates the probability tail (decision unchanged)
        enc = getattr(r, "enc_logit", None)
        if enc is not None and not (isinstance(enc, float) and np.isnan(enc)):
            prob += 1e-9 * float(np.tanh(enc))
        out.append(
            {"url": r.url, "chem_mesh": r.chem_mesh, "dis_mesh": r.dis_mesh,
             "label": int(r.label), "evidence_type": r.evidence_type,
             "pred": pred, "prob": float(prob)}
        )
    cols = [c.split(" ")[0] for c in SCORED_SCHEMA.split(", ")]
    return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)


def score_pairs(features: DataFrame, backend: str = "stub") -> DataFrame:
    """features (FEATURES_SCHEMA) -> scored pairs (SCORED_SCHEMA).

    backend="electra" runs the EXACT reference architecture
    (scoring/electra.py: embeddings -> 12-layer encoder -> first-token
    span pooling -> concat -> dense/gelu/out_proj) with seeded weights
    per executor; the emitted DECISION stays the deterministic trigger
    rule (CI needs exact P/R without real checkpoint weights) while the
    real head logit modulates the probability tail — identical plumbing
    to what loading converted weights via ElectraWeights.load_npz would
    score with."""
    if backend == "onnx":  # pragma: no cover - not available in sandbox
        try:
            import onnxruntime  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "onnxruntime is not installed; export the reference "
                "entity-pair head (electra_model.py:563-734) to ONNX and "
                "install onnxruntime to enable this backend"
            ) from e
    use_electra = backend == "electra"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_electra and len(pdf):
                pdf = pdf.assign(enc_logit=_electra_margins(pdf))
            yield _score_rows(pdf)

    return features.mapInPandas(run, schema=SCORED_SCHEMA)


_ELECTRA_WEIGHTS = None


def _electra_weights():
    """Executor-global exact-architecture weights (seeded, deterministic
    — the same lazy-init-once pattern a broadcast ONNX session uses)."""
    global _ELECTRA_WEIGHTS
    if _ELECTRA_WEIGHTS is None:
        from .electra import DEFAULT_CONFIG, ElectraWeights

        _ELECTRA_WEIGHTS = ElectraWeights.seeded(DEFAULT_CONFIG, seed=0)
    return _ELECTRA_WEIGHTS


def _electra_margins(pdf: pd.DataFrame) -> np.ndarray:
    """Real-architecture positive-class logit margin per feature row
    (the non-full-sample forward: one padded batch per micro-chunk,
    sequence_padding.py semantics)."""
    from .electra import score_candidates

    logits = score_candidates(
        _electra_weights(),
        [list(x) for x in pdf["token_ids"]],
        [list(x) for x in pdf["entity_mask"]],
        [int(x) for x in pdf["chem_code"]],
        [int(x) for x in pdf["dis_code"]],
    )
    return logits[:, 1] - logits[:, 0]


def fused_score_docs(
    doc_payload: DataFrame,
    tree_map: dict[str, list[str]] | None = None,
    use_levi: bool = True,
    extract_inter: bool = True,
    gazetteer: dict[str, list[tuple[str, str]]] | None = None,
    max_term_words: int = 1,
    backend: str = "stub",
    sentence_splitter: str = "regex",
) -> DataFrame:
    """Doc-level fused stage: candidate pairs + Levi filter + evidence +
    featurize + score for ALL of a document's pairs in one pass — the
    reference's own batching shape ("one encoder pass per document scores
    all its pairs", electra_model.py:711-734 / SURVEY §3.3).

    Input: one row per document
      (url, text, entities array<struct<mesh_id, positions, rep_text,
       type>>, gold_pairs array<struct<chem_mesh, dis_mesh>> | null)

    Scale rationale: the document text crosses the shuffle and the Arrow
    boundary ONCE per document instead of once per pair — at ~3 KB/page
    and tens of pairs/page that is an order of magnitude less data
    movement than a pair-level join, and it keeps the python stage
    compute-bound (the scaling-efficiency criterion).  ``tree_map`` (the
    MeSH multimap) rides along in the UDF closure — a few MB, the same
    payload a broadcast variable would carry.

    With ``gazetteer`` set, the input payload needs only (url, text
    [, gold_pairs]) and mention detection itself runs in this same pass
    (operators.mentions.detect_mentions_py — semantics identical to the
    relational operator), making the whole pipeline a SINGLE narrow
    python stage: no token explode, no per-doc window shuffle.

    Semantically identical to the modular relational path
    (detect_mentions |> entity_inventory |> candidate_pairs |>
    label_pairs |> levi_filter |> select_evidence |> featurize |>
    score_pairs) — pytest-verified.
    """
    from ..functions.tokenize import _PIECE, piece_to_id as _pid
    from ..operators.candidates import levi_rejected_py
    from ..operators.evidence import DocIndex, select_evidence_py
    from ..operators.features import featurize_py
    from ..operators.mentions import detect_mentions_py

    tree_map = tree_map or {}
    use_encoder = backend == "numpy"
    use_electra = backend == "electra"

    def doc_encoder_logits(text: str, pair_spans):
        """One encoder pass per document (is_full_sample shape,
        electra_model.py:711-734): encode all doc tokens once, mean-pool
        each pair's mention-span hidden states, dot-product pair logits."""
        import bisect

        spans = [(m.start(), m.group(0)) for m in _PIECE.finditer(text.lower())]
        if not spans:
            return [0.0] * len(pair_spans)
        ids = np.fromiter((_pid(p) for _, p in spans), dtype=np.int64)
        starts = [s for s, _ in spans]
        hidden = _encode_doc(ids)

        def pool(char_spans):
            idxs = []
            for cs, ce in char_spans:
                lo = bisect.bisect_left(starts, cs)
                hi = bisect.bisect_left(starts, ce)
                idxs.extend(range(lo, hi))
            if not idxs:
                return None
            return hidden[idxs].mean(axis=0)

        out = []
        for cspans, dspans in pair_spans:
            c, d = pool(cspans), pool(dspans)
            out.append(float(np.dot(c, d)) if c is not None and d is not None else 0.0)
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split(" ")[0] for c in SCORED_SCHEMA.split(", ")]
        for pdf in batches:
            feat_rows = []
            for r in pdf.itertuples(index=False):
                # poison-row guard: extract_text yields NULL for pages
                # whose html strips to empty and text is NULL — skip,
                # never crash the stage (no mentions => no pairs anyway)
                if r.text is None or not r.text:
                    continue
                if gazetteer is not None:
                    inv: dict[str, dict] = {}
                    for m in detect_mentions_py(r.text, gazetteer, max_term_words):
                        e = inv.setdefault(
                            m["mesh_id"],
                            {"mesh_id": m["mesh_id"], "type": m["type"],
                             "positions": [], "rep_text": m["mention_text"],
                             "_last": -1},
                        )
                        e["positions"].append({"start": m["start"], "end": m["end"]})
                        if m["start"] > e["_last"]:  # last-mention-wins rep
                            e["rep_text"] = m["mention_text"]
                            e["_last"] = m["start"]
                    ents = list(inv.values())
                else:
                    ents = list(r.entities)
                chems = [e for e in ents if e["type"] == "Chemical"]
                diss = [e for e in ents if e["type"] == "Disease"]
                if not chems or not diss:
                    continue
                gold = (
                    [(g["chem_mesh"], g["dis_mesh"]) for g in r.gold_pairs]
                    if r.gold_pairs is not None
                    else []
                )
                gold_set = set(gold)
                pairs = [(c["mesh_id"], d["mesh_id"]) for c in chems for d in diss]
                rejected = (
                    levi_rejected_py(pairs, gold, tree_map)
                    if gold and use_levi
                    else set()
                )
                doc = DocIndex(r.text, sentence_splitter)
                doc_row0 = len(feat_rows)
                pair_spans = []
                for c in chems:
                    for d in diss:
                        key = (c["mesh_id"], d["mesh_id"])
                        if key in rejected:
                            continue
                        label = 1 if key in gold_set else 0
                        cpos = [(int(p["start"]), int(p["end"])) for p in c["positions"]]
                        dpos = [(int(p["start"]), int(p["end"])) for p in d["positions"]]
                        ev = select_evidence_py(
                            r.text, c["mesh_id"], d["mesh_id"], cpos, dpos,
                            c["rep_text"], d["rep_text"], label,
                            extract_inter=extract_inter, sents=doc.sents,
                            pos_index=doc.index_for(
                                [p for p, _ in cpos] + [p for p, _ in dpos]
                            ),
                        )
                        if ev is None:
                            continue
                        feat = featurize_py(
                            ev["sentence"], ev["sent_pos"] or 0,
                            c["mesh_id"], d["mesh_id"],
                            ev["chem_start"], ev["chem_end"],
                            ev["dis_start"], ev["dis_end"],
                        )
                        if feat is None:
                            continue
                        feat_rows.append(
                            {"url": r.url, "chem_mesh": c["mesh_id"],
                             "dis_mesh": d["mesh_id"], "label": label,
                             "evidence_type": ev["evidence_type"], **feat}
                        )
                        if use_encoder:
                            pair_spans.append((cpos, dpos))
                if use_encoder and pair_spans:
                    # one encoder pass for the whole document's pairs
                    for row, logit in zip(
                        feat_rows[doc_row0:], doc_encoder_logits(r.text, pair_spans)
                    ):
                        row["enc_logit"] = logit
            if feat_rows:
                fdf = pd.DataFrame(feat_rows)
                if use_electra:
                    # exact-architecture forward over the batch's padded
                    # candidate rows (train_sentence shape, SURVEY §3.1)
                    fdf = fdf.assign(enc_logit=_electra_margins(fdf))
                yield _score_rows(fdf)
            else:
                yield pd.DataFrame(columns=cols)

    return doc_payload.mapInPandas(run, schema=SCORED_SCHEMA)


# ---------------------------------------------------------------------------
# numpy mini-encoder backend: models the REAL scorer's compute shape
# ---------------------------------------------------------------------------
# The production scorer is an ELECTRA encoder + entity-pair head run as
# ONNX batch inference (electra_model.py:563-734): one encoder pass per
# document scores all its pairs.  ``onnxruntime`` is not available in
# this environment, so the "numpy" backend reproduces the same compute
# shape with seeded deterministic weights: embedding lookup -> 2 dense
# tanh layers (hidden 96) over the document tokens -> mean-pooled entity
# span reps -> pair dot-product logit.  The DECISION still comes from the
# deterministic trigger rule (CI needs exact P/R), but the encoder's
# logit deterministically modulates the reported probability, and the
# FLOPs per document are representative — which is what makes throughput
# and scaling measurements meaningful.

_NP_WEIGHTS: dict | None = None
_VOCAB_MOD = 32768
_HIDDEN = 96


def _np_weights() -> dict:
    global _NP_WEIGHTS
    if _NP_WEIGHTS is None:
        rng = np.random.default_rng(42)
        _NP_WEIGHTS = {
            "emb": (rng.standard_normal((_VOCAB_MOD, _HIDDEN)) * 0.05).astype(np.float32),
            "w1": (rng.standard_normal((_HIDDEN, _HIDDEN)) * 0.1).astype(np.float32),
            "w2": (rng.standard_normal((_HIDDEN, _HIDDEN)) * 0.1).astype(np.float32),
        }
    return _NP_WEIGHTS


def _encode_doc(token_ids: np.ndarray) -> np.ndarray:
    """[T] ids -> [T, H] hidden states (the M1 analog)."""
    w = _np_weights()
    h = w["emb"][token_ids % _VOCAB_MOD]
    h = np.tanh(h @ w["w1"])
    h = np.tanh(h @ w["w2"])
    return h


def _pair_logit(hidden: np.ndarray, mask: np.ndarray, chem_code: int, dis_code: int) -> float:
    """Mean-pooled span reps (A3/M3) -> dot-product pair head (M2)."""
    c = hidden[mask == chem_code]
    d = hidden[mask == dis_code]
    if len(c) == 0 or len(d) == 0:
        return 0.0
    return float(np.dot(c.mean(axis=0), d.mean(axis=0)))
