"""Parity + contract tests for the exact-architecture numpy ELECTRA
scorer (scoring/electra.py) vs the literal port (reference_ports/
electra_port.py).  No Spark needed — pure numpy."""

from __future__ import annotations

import numpy as np
import pytest

from relation_extraction_cdr_spark.functions.wordpiece import encode
from relation_extraction_cdr_spark.scoring import electra as E
from tests.reference_ports import electra_port as P

SMALL = E.ElectraConfig(
    vocab_size=30524, embedding_size=32, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128, max_position_embeddings=64,
)
CONSISTENT = E.ElectraConfig(
    vocab_size=30524, embedding_size=64, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128, max_position_embeddings=64,
)


def test_config_from_shipped_json():
    cfg = E.ElectraConfig.from_json(
        "/root/reference/models_saved/Electra_converted_pytorch/config.json"
    )
    assert (cfg.embedding_size, cfg.hidden_size) == (128, 256)
    assert (cfg.num_hidden_layers, cfg.num_attention_heads) == (12, 4)
    assert cfg.intermediate_size == 1024 and cfg.max_position_embeddings == 512


def test_erf_accuracy():
    xs = np.linspace(-4, 4, 2001)
    assert np.max(np.abs(E._erf(xs) - P.erf_exact(xs))) < 2e-7


def _batch(config, seed=7):
    """A real tokenized batch: marked CDR-style sentences."""
    rng = np.random.default_rng(seed)
    sents = [
        "x [E] lithium [/E] induced [E] tremor [/E] in rats",
        "[E] carbamazepine [/E] did not cause [E] dystonia [/E] here",
        "short [E] spark [/E] text [E] slow [/E]",
    ]
    ids, masks, chems, diss = [], [], [], []
    for s in sents:
        t = encode(s)[: config.max_position_embeddings]
        # entity mask: code 1 inside first span, 2 inside second, 0 else
        m, code, cur = [], 0, 0
        for x in t:
            if x == 30522:
                code += 1
                cur = code
                m.append(cur)
            elif x == 30523:
                m.append(cur)
                cur = 0
            else:
                m.append(cur)
        ids.append(t)
        masks.append(m)
        chems.append(1)
        diss.append(2)
    return ids, masks, chems, diss


def test_encoder_parity_projected():
    """Encoder with embedding_size != hidden_size (the shipped small
    shape): engine batched forward == naive per-example port."""
    w = E.ElectraWeights.seeded(SMALL, seed=1)
    ids, masks, _, _ = _batch(SMALL)
    t = max(len(x) for x in ids)
    idm = np.zeros((len(ids), t), np.int64)
    att = np.zeros((len(ids), t), np.float32)
    for r, x in enumerate(ids):
        idm[r, : len(x)] = x
        att[r, : len(x)] = 1
    hidden = E.encoder_forward(w, idm, att)
    for r, x in enumerate(ids):
        href = P.encode_one(w, x, [1] * len(x))
        # port runs unpadded; compare the unpadded prefix
        got = hidden[r, : len(x)]
        assert np.allclose(got, href, atol=5e-5), f"row {r}"


def test_full_forward_parity():
    """Full model (encoder + first-token pooling + pair head) on an
    embedding==hidden config, batched engine vs naive port, including
    padded batching effects."""
    w = E.ElectraWeights.seeded(CONSISTENT, seed=2)
    ids, masks, chems, diss = _batch(CONSISTENT)
    logits = E.score_candidates(w, ids, masks, chems, diss, batch_size=2)
    for r in range(len(ids)):
        _, lref = P.forward_one(w, ids[r], [1] * len(ids[r]), masks[r], chems[r], diss[r])
        assert np.allclose(logits[r], lref, atol=5e-5), f"row {r}: {logits[r]} vs {lref}"


def test_padding_invariance():
    """Padding must not change a row's logits: the additive -10000 mask
    keeps attention off pad positions (get_extended_attention_mask)."""
    w = E.ElectraWeights.seeded(CONSISTENT, seed=3)
    ids, masks, chems, diss = _batch(CONSISTENT)
    solo = E.score_candidates(w, ids[:1], masks[:1], chems[:1], diss[:1], batch_size=1)
    batched = E.score_candidates(w, ids, masks, chems, diss, batch_size=3)
    assert np.allclose(solo[0], batched[0], atol=5e-5)


def test_first_token_pooling_semantics():
    hidden = np.arange(12, dtype=np.float32).reshape(4, 3)
    mask = np.array([0, 2, 2, 1])
    # first position with code 2 is index 1
    assert np.array_equal(E.first_token_pool(hidden, mask, 2), hidden[1])
    assert E.first_token_pool(hidden, mask, 9) is None


def test_head_dimension_note():
    """The literal head sizing (embedding_size*2) is reproduced: with
    embedding != hidden the pooled concat cannot feed the head — the
    same shape error the reference forward would raise; with
    embedding == hidden it runs (the electra-base situation,
    cdr_trainer.py:224)."""
    w = E.ElectraWeights.seeded(SMALL, seed=4)
    ids, masks, chems, diss = _batch(SMALL)
    with pytest.raises(ValueError):
        E.score_candidates(w, ids, masks, chems, diss)


def test_seeded_weights_deterministic():
    a = E.ElectraWeights.seeded(SMALL, seed=5)
    b = E.ElectraWeights.seeded(SMALL, seed=5)
    assert all(np.array_equal(a.p[k], b.p[k]) for k in a.p)


def test_npz_roundtrip(tmp_path):
    w = E.ElectraWeights.seeded(SMALL, seed=6)
    f = tmp_path / "w.npz"
    np.savez(f, **w.p)
    w2 = E.ElectraWeights.load_npz(f, SMALL)
    assert all(np.array_equal(w.p[k], w2.p[k]) for k in w.p)


def test_electra_backend_end_to_end(spark, fixtures, mesh):
    """The exact-architecture backend runs distributed end-to-end and
    keeps the deterministic decisions (the real logit only modulates the
    probability tail, like the numpy analog backend)."""
    from relation_extraction_cdr_spark.plans.pipeline import score_candidates

    pages, _, gold = fixtures
    stub = {
        (r["url"], r["chem_mesh"], r["dis_mesh"]): (r["pred"], r["prob"])
        for r in score_candidates(pages, mesh, gold=gold, scorer_backend="stub").collect()
    }
    real = {
        (r["url"], r["chem_mesh"], r["dis_mesh"]): (r["pred"], r["prob"])
        for r in score_candidates(pages, mesh, gold=gold, scorer_backend="electra").collect()
    }
    assert stub.keys() == real.keys() and len(real) > 0
    moved = 0
    for k, (p_stub, prob_stub) in stub.items():
        p_real, prob_real = real[k]
        assert p_real == p_stub  # decisions identical
        assert abs(prob_real - prob_stub) < 1e-8  # tail-only modulation
        if prob_real != prob_stub:
            moved += 1
    assert moved > 0  # the forward actually ran and contributed
