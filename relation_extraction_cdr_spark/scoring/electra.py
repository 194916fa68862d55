"""Exact ELECTRA entity-pair architecture in numpy (SURVEY §2.9 M1-M3).

This is the REAL scorer architecture of the reference — not the
mini-encoder FLOPs analog (scorer.py `_encode_doc`) — transcribed layer
by layer from the model the reference's ``train_sentence`` entry point
builds (``ElectraModelEntitySentenceClassification``,
reference electra_model.py:535-553 __init__, :563-690 forward):

- ElectraEmbeddings: word + position + token-type embeddings, LayerNorm
  (eps 1e-12); dropout is identity at inference
  (transformers 2.11 modeling_electra.ElectraEmbeddings)
- embeddings_project: Linear(embedding_size -> hidden_size), present
  only when the two differ (electra_model.py:541-542, :514-515)
- BertEncoder x num_hidden_layers: multi-head self-attention
  (scores/sqrt(head_dim) + additive mask), attention-output dense +
  residual + LayerNorm, intermediate GELU, output dense + residual +
  LayerNorm (transformers 2.11 modeling_bert.BertLayer)
- extended attention mask: (1 - mask) * -10000.0
  (modeling_utils.get_extended_attention_mask)
- FIRST-TOKEN span pooling: the entity embedding is the hidden state of
  the first position whose entity_mask equals the entity's code
  (get_entity_embedding, electra_model.py:618-624)
- pair head: concat(chem, dis) -> dropout -> dense(embedding_size*2,
  embedding_size*2) -> gelu -> dropout -> out_proj(-> 2)
  (electra_model.py:544-546 init, :676-690 apply; gelu per the inline
  comment "although BERT uses tanh here ... Electra authors used gelu")

Head dimension note (faithfully reproduced): the head is sized
``embedding_size * 2`` while the pooled concat is ``hidden_size * 2``
(electra_model.py:544,:675).  The reference's runnable configuration is
google/electra-base-discriminator (cdr_trainer.py:224) where
embedding_size == hidden_size == 768, so the shapes agree; with the
shipped small-checkpoint config (models_saved/Electra_converted_pytorch/
config.json: embedding 128, hidden 256) the reference forward itself
would raise a shape error.  This module follows the code literally —
construct it with an embedding_size == hidden_size config to run the
full head (DEFAULT_CONFIG below is the small-consistent 256/256 shape),
or any config to run the encoder alone.

Weights: seeded-random by default (truncated-normal-free
normal(0, initializer_range) per transformers 2.11 _init_weights;
LayerNorm weight=1 bias=0), or loaded from an .npz file — the plug
point for converted real checkpoint weights, which are not shipped.

GELU: x * 0.5 * (1 + erf(x / sqrt(2))).  numpy has no erf; the engine
uses the Abramowitz-Stegun 7.1.26 rational approximation (|err| <=
1.5e-7, i.e. float32-exact); the pytest literal port uses math.erf, so
the parity test also bounds the approximation error.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass(frozen=True)
class ElectraConfig:
    vocab_size: int = 30524  # 30522 + [e]/[/e] added tokens
    embedding_size: int = 256
    hidden_size: int = 256
    num_hidden_layers: int = 12
    num_attention_heads: int = 4
    intermediate_size: int = 1024
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02

    @classmethod
    def from_json(cls, path: str | Path) -> "ElectraConfig":
        """Load a transformers-style config.json (e.g. the shipped
        models_saved/Electra_converted_pytorch/config.json)."""
        raw = json.loads(Path(path).read_text())
        keep = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in raw.items() if k in keep})


# the shipped checkpoint's encoder shape with the embedding width lifted
# to hidden so the literal head dimensions are consistent (see module
# docstring); FLOPs-representative of the real small model
DEFAULT_CONFIG = ElectraConfig()


def _erf(x: np.ndarray) -> np.ndarray:
    """Vectorized erf, Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7)."""
    sign = np.sign(x)
    x = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * np.exp(-x * x))


def gelu(x: np.ndarray) -> np.ndarray:
    """transformers.activations.gelu: x * 0.5 * (1 + erf(x / sqrt 2))."""
    return x * 0.5 * (1.0 + _erf(x / np.sqrt(2.0)))


def layer_norm(x: np.ndarray, w: np.ndarray, b: np.ndarray, eps: float) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


class ElectraWeights:
    """Flat dict of named numpy arrays matching the module layout."""

    def __init__(self, config: ElectraConfig, params: dict[str, np.ndarray]):
        self.config = config
        self.p = params

    @classmethod
    def seeded(cls, config: ElectraConfig = DEFAULT_CONFIG, seed: int = 0) -> "ElectraWeights":
        """normal(0, initializer_range) like _init_weights; LayerNorm
        weight=1/bias=0; all biases 0.  Deterministic per seed."""
        rng = np.random.default_rng(seed)
        c = config
        s = c.initializer_range

        def lin(nin, nout):
            return rng.normal(0.0, s, (nin, nout)).astype(np.float32)

        p: dict[str, np.ndarray] = {
            "emb.word": lin(c.vocab_size, c.embedding_size),
            "emb.pos": lin(c.max_position_embeddings, c.embedding_size),
            "emb.type": lin(c.type_vocab_size, c.embedding_size),
            "emb.ln.w": np.ones(c.embedding_size, np.float32),
            "emb.ln.b": np.zeros(c.embedding_size, np.float32),
        }
        if c.embedding_size != c.hidden_size:
            p["proj.w"] = lin(c.embedding_size, c.hidden_size)
            p["proj.b"] = np.zeros(c.hidden_size, np.float32)
        for i in range(c.num_hidden_layers):
            h = c.hidden_size
            p[f"l{i}.q.w"] = lin(h, h)
            p[f"l{i}.q.b"] = np.zeros(h, np.float32)
            p[f"l{i}.k.w"] = lin(h, h)
            p[f"l{i}.k.b"] = np.zeros(h, np.float32)
            p[f"l{i}.v.w"] = lin(h, h)
            p[f"l{i}.v.b"] = np.zeros(h, np.float32)
            p[f"l{i}.ao.w"] = lin(h, h)
            p[f"l{i}.ao.b"] = np.zeros(h, np.float32)
            p[f"l{i}.aln.w"] = np.ones(h, np.float32)
            p[f"l{i}.aln.b"] = np.zeros(h, np.float32)
            p[f"l{i}.i.w"] = lin(h, c.intermediate_size)
            p[f"l{i}.i.b"] = np.zeros(c.intermediate_size, np.float32)
            p[f"l{i}.o.w"] = lin(c.intermediate_size, h)
            p[f"l{i}.o.b"] = np.zeros(h, np.float32)
            p[f"l{i}.oln.w"] = np.ones(h, np.float32)
            p[f"l{i}.oln.b"] = np.zeros(h, np.float32)
        two_e = c.embedding_size * 2
        p["head.dense.w"] = lin(two_e, two_e)
        p["head.dense.b"] = np.zeros(two_e, np.float32)
        p["head.out.w"] = lin(two_e, 2)
        p["head.out.b"] = np.zeros(2, np.float32)
        return cls(config, p)

    @classmethod
    def load_npz(cls, path: str | Path, config: ElectraConfig) -> "ElectraWeights":
        """Plug point for converted real checkpoint weights (same key
        layout as `.seeded`); np.savez of named arrays."""
        with np.load(path) as z:
            return cls(config, {k: z[k] for k in z.files})


def encoder_forward(
    w: ElectraWeights, input_ids: np.ndarray, attention_mask: np.ndarray | None = None
) -> np.ndarray:
    """[B, T] int ids (+ [B, T] 0/1 mask) -> [B, T, hidden] float32.

    The M1 operator: ElectraEmbeddings -> embeddings_project ->
    BertEncoder stack, faithful to the transformers-2.11 modules the
    reference instantiates (electra_model.py:509-521 call order)."""
    c = w.config
    p = w.p
    B, T = input_ids.shape
    if attention_mask is None:
        attention_mask = np.ones((B, T), np.float32)

    h = (
        p["emb.word"][input_ids]
        + p["emb.pos"][np.arange(T)][None, :, :]
        + p["emb.type"][0][None, None, :]
    )
    h = layer_norm(h, p["emb.ln.w"], p["emb.ln.b"], c.layer_norm_eps)
    if "proj.w" in p:
        h = h @ p["proj.w"] + p["proj.b"]

    # get_extended_attention_mask: (1 - m) * -10000, broadcast over heads
    ext = ((1.0 - attention_mask.astype(np.float32)) * -10000.0)[:, None, None, :]

    nh = c.num_attention_heads
    dh = c.hidden_size // nh

    def split_heads(x):  # [B,T,H] -> [B,nh,T,dh]
        return x.reshape(B, T, nh, dh).transpose(0, 2, 1, 3)

    for i in range(c.num_hidden_layers):
        q = split_heads(h @ p[f"l{i}.q.w"] + p[f"l{i}.q.b"])
        k = split_heads(h @ p[f"l{i}.k.w"] + p[f"l{i}.k.b"])
        v = split_heads(h @ p[f"l{i}.v.w"] + p[f"l{i}.v.b"])
        scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh) + ext
        ctx = softmax(scores) @ v  # [B,nh,T,dh]
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, c.hidden_size)
        attn = layer_norm(
            ctx @ p[f"l{i}.ao.w"] + p[f"l{i}.ao.b"] + h,
            p[f"l{i}.aln.w"], p[f"l{i}.aln.b"], c.layer_norm_eps,
        )
        inter = gelu(attn @ p[f"l{i}.i.w"] + p[f"l{i}.i.b"])
        h = layer_norm(
            inter @ p[f"l{i}.o.w"] + p[f"l{i}.o.b"] + attn,
            p[f"l{i}.oln.w"], p[f"l{i}.oln.b"], c.layer_norm_eps,
        )
    return h


def first_token_pool(
    hidden: np.ndarray, entity_mask: np.ndarray, code: int
) -> np.ndarray | None:
    """get_entity_embedding (electra_model.py:618-624): the hidden state
    of the FIRST position whose mask equals the code; None if absent."""
    idx = np.flatnonzero(entity_mask == code)
    if len(idx) == 0:
        return None
    return hidden[idx[0]]


def pair_head(w: ElectraWeights, pooled_concat: np.ndarray) -> np.ndarray:
    """[N, 2*E] -> [N, 2] logits: dense -> gelu -> out_proj (dropout is
    identity at inference), electra_model.py:676-690."""
    p = w.p
    x = pooled_concat @ p["head.dense.w"] + p["head.dense.b"]
    x = gelu(x)
    return x @ p["head.out.w"] + p["head.out.b"]


def score_candidates(
    w: ElectraWeights,
    token_ids: list[list[int]],
    entity_masks: list[list[int]],
    chem_codes: list[int],
    dis_codes: list[int],
    batch_size: int = 16,
    pad_id: int = 0,
) -> np.ndarray:
    """The full non-full-sample forward over N candidate rows:
    pad+stack per micro-batch (sequence_padding.py:18-44 semantics:
    ids pad = tokenizer pad id, mask pad = -1), encoder once per batch,
    first-token pooling per row, pair head.  Returns [N, 2] logits."""
    n = len(token_ids)
    hs = w.config.hidden_size
    out = np.zeros((n, 2), np.float32)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        b = hi - lo
        # vectorized pad+stack — bit-identical arrays to the row-loop
        # construction (equal-length fast path for pre-truncated input)
        lens = np.fromiter((len(x) for x in token_ids[lo:hi]), np.int64, b)
        t = int(lens.max())
        if int(lens.min()) == t:
            ids = np.asarray(token_ids[lo:hi], np.int64).reshape(b, t)
            att = np.ones((b, t), np.float32)
            msk = np.asarray(entity_masks[lo:hi], np.int64).reshape(b, t)
        else:
            valid = np.arange(t) < lens[:, None]
            ids = np.full((b, t), pad_id, np.int64)
            ids[valid] = np.concatenate(
                [np.asarray(x, np.int64) for x in token_ids[lo:hi]]
            )
            att = valid.astype(np.float32)
            msk = np.full((b, t), -1, np.int64)
            msk[valid] = np.concatenate(
                [np.asarray(x, np.int64) for x in entity_masks[lo:hi]]
            )
        hidden = encoder_forward(w, ids, att)
        # vectorized first_token_pool; a row missing EITHER code keeps
        # a fully-zero concat (degenerate row — head still runs)
        mc = msk == np.asarray(chem_codes[lo:hi], np.int64)[:, None]
        md = msk == np.asarray(dis_codes[lo:hi], np.int64)[:, None]
        has = mc.any(axis=1) & md.any(axis=1)
        rows = np.arange(b)
        pooled = np.zeros((b, 2 * hs), np.float32)
        pooled[has, :hs] = hidden[rows[has], mc.argmax(axis=1)[has]]
        pooled[has, hs:] = hidden[rows[has], md.argmax(axis=1)[has]]
        out[lo:hi] = pair_head(w, pooled)
    return out
