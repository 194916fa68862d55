"""S12 checkpoint sink + J9 encoder-weight transfer (SURVEY §2.1/§2.3),
including the reference's dead-code name-filter quirk pinned by a
literal generator-semantics port of cdr_trainer.py:223-235."""

from __future__ import annotations

import numpy as np
import pytest

from relation_extraction_cdr_spark.scoring.checkpoint import (
    BestCheckpoint,
    encoder_keys,
    load_checkpoint,
    save_checkpoint,
    transfer_encoder_weights,
)
from relation_extraction_cdr_spark.scoring.electra import (
    DEFAULT_CONFIG,
    ElectraConfig,
    ElectraWeights,
    encoder_forward,
)

TINY = ElectraConfig(
    vocab_size=100, embedding_size=16, hidden_size=16,
    num_hidden_layers=2, num_attention_heads=2, intermediate_size=32,
)


def _weights_equal(a: dict, b: dict) -> bool:
    return set(a) == set(b) and all(np.array_equal(a[k], b[k]) for k in a)


class TestTransfer:
    def test_encoder_from_src_head_from_dst(self):
        src = ElectraWeights.seeded(TINY, seed=1)
        dst = ElectraWeights.seeded(TINY, seed=2)
        out = transfer_encoder_weights(src, dst)
        for k in encoder_keys(out):
            assert np.array_equal(out.p[k], src.p[k]), k
        for k in set(out.p) - encoder_keys(out):
            assert np.array_equal(out.p[k], dst.p[k]), k
        # copies, not views: training the transferred model must not
        # mutate the NER checkpoint
        out.p["emb.word"][0, 0] += 1.0
        assert not np.array_equal(out.p["emb.word"], src.p["emb.word"])

    def test_forward_uses_transferred_encoder(self):
        src = ElectraWeights.seeded(TINY, seed=1)
        dst = ElectraWeights.seeded(TINY, seed=2)
        out = transfer_encoder_weights(src, dst)
        ids = np.array([[1, 5, 7, 9]], np.int64)
        att = np.ones_like(ids, np.float32)
        assert np.array_equal(encoder_forward(out, ids, att),
                              encoder_forward(src, ids, att))

    def test_strict_on_config_mismatch(self):
        src = ElectraWeights.seeded(TINY, seed=1)
        bigger = ElectraConfig(
            vocab_size=100, embedding_size=16, hidden_size=16,
            num_hidden_layers=3, num_attention_heads=2, intermediate_size=32,
        )
        dst = ElectraWeights.seeded(bigger, seed=2)
        with pytest.raises(ValueError, match="missing"):
            transfer_encoder_weights(src, dst)

    def test_reference_name_filter_loop_is_dead_code(self):
        """Literal generator-semantics port of cdr_trainer.py:225-234:
        both named_parameters() calls yield generators; dict() exhausts
        the source one, so the filter loop at :230-232 runs ZERO times
        and the wholesale load_state_dict at :234 is the entire
        semantics.  Our transfer must equal that wholesale result."""
        src = ElectraWeights.seeded(TINY, seed=1)
        dst = ElectraWeights.seeded(TINY, seed=2)

        def named_parameters(w):  # torch returns a generator
            return ((k, v) for k, v in w.p.items() if not k.startswith("head."))

        net_ner_pretrained_encoder_params = named_parameters(src)
        net_encoder_params = named_parameters(dst)
        dict_params_ner = {k: v.copy() for k, v in net_ner_pretrained_encoder_params}
        loop_iterations = 0
        for name1, param1 in net_ner_pretrained_encoder_params:  # exhausted
            loop_iterations += 1
            if name1 in net_encoder_params:  # str vs tuples: never True
                dict_params_ner[name1] = param1.copy()
        assert loop_iterations == 0  # the quirk
        # load_state_dict(dict_params_ner): encoder := dict wholesale
        expected = {k: v for k, v in dst.p.items() if k.startswith("head.")}
        expected.update(dict_params_ner)

        out = transfer_encoder_weights(src, dst)
        assert _weights_equal(out.p, expected)


class TestCheckpointSink:
    def test_roundtrip_bit_exact(self, tmp_path):
        w = ElectraWeights.seeded(TINY, seed=3)
        p = tmp_path / "ckpt" / "model.npz"
        save_checkpoint(w, p)
        back = load_checkpoint(p, TINY)
        assert _weights_equal(back.p, w.p)
        ids = np.array([[2, 4, 6]], np.int64)
        att = np.ones_like(ids, np.float32)
        assert np.array_equal(encoder_forward(back, ids, att),
                              encoder_forward(w, ids, att))

    def test_suffixless_path_roundtrips(self, tmp_path):
        """np.savez silently appends '.npz' to bare paths when given a
        string; save_checkpoint writes through a file handle so the path
        stored by BestCheckpoint is the file actually on disk."""
        w = ElectraWeights.seeded(TINY, seed=5)
        p = tmp_path / "best"  # no suffix
        save_checkpoint(w, p)
        assert p.exists() and not (tmp_path / "best.npz").exists()
        back = load_checkpoint(p, TINY)
        assert _weights_equal(back.p, w.p)

    def test_best_tracking_strict_greater(self, tmp_path):
        """cdr_trainer.py:464-468: save on first epoch (best is None)
        and on strict f1 improvement; a tie does NOT move best_epoch."""
        p = tmp_path / "best.npz"
        bc = BestCheckpoint(p)
        snaps = [ElectraWeights.seeded(TINY, seed=s) for s in range(4)]
        f1s = [0.5, 0.4, 0.6, 0.6]
        saved = [bc.update(e, {"f1-score": f}, snaps[e]) for e, f in enumerate(f1s)]
        assert saved == [True, False, True, False]
        assert bc.best_epoch == 2
        assert bc.best_results == {"f1-score": 0.6}
        back = load_checkpoint(p, TINY)
        assert _weights_equal(back.p, snaps[2].p)

    def test_transfer_then_train_smoke(self, tmp_path):
        """The reference's full warm-start story: NER checkpoint saved
        (S12) → loaded → encoder transferred into a fresh RE model (J9)
        → the RE head trains while the encoder stays frozen-equal to
        the NER encoder (our M4/M5 trains the head only)."""
        from relation_extraction_cdr_spark.scoring.train import (
            HeadParams,
            train_pair_head_local,
        )

        ner = ElectraWeights.seeded(TINY, seed=5)
        p = tmp_path / "ner.npz"
        save_checkpoint(ner, p)
        re_model = transfer_encoder_weights(load_checkpoint(p, TINY),
                                            ElectraWeights.seeded(TINY, seed=6))
        rng = np.random.default_rng(0)
        feat = rng.normal(0, 1, (60, 32)).astype(np.float32)
        labels = (feat[:, 0] > 0).astype(np.int64)
        res = train_pair_head_local(
            feat, labels, epochs=3, ignore_index=None,
            init=HeadParams.from_weights(re_model),
        )
        assert res.steps == 3
        for k in encoder_keys(re_model):
            assert np.array_equal(re_model.p[k], ner.p[k])
        # the trained head moved away from its init
        assert not np.array_equal(res.params.w1, re_model.p["head.dense.w"])
