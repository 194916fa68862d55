"""Literal port of the reference's entity-pair model forward, as a
pytest oracle for scoring/electra.py.

Transcribes ElectraModelEntitySentenceClassification.forward
(reference electra_model.py:563-690) together with the transformers-2.11
modules it instantiates (ElectraEmbeddings, BertEncoder/BertLayer,
get_extended_attention_mask) — deliberately NAIVE: one example at a
time, one head at a time, per-position pooling loops, math.erf for the
exact GELU.  Shares only the weight dict layout with the engine module;
every matmul/normalization is written independently here.
"""

from __future__ import annotations

import math

import numpy as np


def erf_exact(x: np.ndarray) -> np.ndarray:
    return np.vectorize(math.erf)(x.astype(np.float64))


def gelu_exact(x: np.ndarray) -> np.ndarray:
    return x * 0.5 * (1.0 + erf_exact(x / math.sqrt(2.0)))


def _ln(x, w, b, eps):
    out = np.empty_like(x, dtype=np.float64)
    for i in range(x.shape[0]):  # per position, naive
        row = x[i].astype(np.float64)
        mu = row.mean()
        var = ((row - mu) ** 2).mean()
        out[i] = (row - mu) / math.sqrt(var + eps) * w + b
    return out


def encode_one(w, input_ids: list[int], attention_mask: list[int]) -> np.ndarray:
    """One example through embeddings -> encoder; returns [T, H]."""
    c = w.config
    p = w.p
    T = len(input_ids)

    # ElectraEmbeddings: word + position + token_type (all-zero type ids)
    h = np.zeros((T, c.embedding_size), np.float64)
    for i, tid in enumerate(input_ids):
        h[i] = (
            p["emb.word"][tid].astype(np.float64)
            + p["emb.pos"][i].astype(np.float64)
            + p["emb.type"][0].astype(np.float64)
        )
    h = _ln(h, p["emb.ln.w"], p["emb.ln.b"], c.layer_norm_eps)
    if "proj.w" in p:
        h = h @ p["proj.w"] + p["proj.b"]

    # get_extended_attention_mask: (1 - m) * -10000
    ext = np.array([(1.0 - m) * -10000.0 for m in attention_mask])

    nh = c.num_attention_heads
    dh = c.hidden_size // nh
    for li in range(c.num_hidden_layers):
        q_all = h @ p[f"l{li}.q.w"] + p[f"l{li}.q.b"]
        k_all = h @ p[f"l{li}.k.w"] + p[f"l{li}.k.b"]
        v_all = h @ p[f"l{li}.v.w"] + p[f"l{li}.v.b"]
        ctx = np.zeros((T, c.hidden_size), np.float64)
        for hd in range(nh):  # per head, naive
            q = q_all[:, hd * dh:(hd + 1) * dh]
            k = k_all[:, hd * dh:(hd + 1) * dh]
            v = v_all[:, hd * dh:(hd + 1) * dh]
            for i in range(T):  # per query position
                scores = np.array(
                    [float(q[i] @ k[j]) / math.sqrt(dh) + ext[j] for j in range(T)]
                )
                e = np.exp(scores - scores.max())
                probs = e / e.sum()
                ctx[i, hd * dh:(hd + 1) * dh] = probs @ v
        attn = _ln(
            ctx @ p[f"l{li}.ao.w"] + p[f"l{li}.ao.b"] + h,
            p[f"l{li}.aln.w"], p[f"l{li}.aln.b"], c.layer_norm_eps,
        )
        inter = gelu_exact(attn @ p[f"l{li}.i.w"] + p[f"l{li}.i.b"])
        h = _ln(
            inter @ p[f"l{li}.o.w"] + p[f"l{li}.o.b"] + attn,
            p[f"l{li}.oln.w"], p[f"l{li}.oln.b"], c.layer_norm_eps,
        )
    return h


def forward_one(
    w, input_ids: list[int], attention_mask: list[int],
    entity_mask: list[int], chem_code: int, dis_code: int,
):
    """One example through embeddings -> encoder -> first-token pooling
    -> pair head; returns ([T,H] hidden, [2] logits)."""
    c = w.config
    p = w.p
    h = encode_one(w, input_ids, attention_mask)

    # get_entity_embedding (electra_model.py:618-624): FIRST position
    # whose mask equals the code, found with the reference's own loop
    def get_entity_embedding(token_embedding, masked_entities, code):
        embedding = None
        for i, mask in enumerate(masked_entities):
            if mask == code:
                embedding = token_embedding[i]
                break
        return embedding

    chem = get_entity_embedding(h, entity_mask, chem_code)
    dis = get_entity_embedding(h, entity_mask, dis_code)
    if chem is None:
        chem = np.zeros(c.hidden_size, np.float64)
    if dis is None:
        dis = np.zeros(c.hidden_size, np.float64)
    x = np.concatenate([chem, dis])
    x = x @ p["head.dense.w"] + p["head.dense.b"]
    x = gelu_exact(x)
    logits = x @ p["head.out.w"] + p["head.out.b"]
    return h, logits
