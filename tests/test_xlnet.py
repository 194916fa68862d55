"""XLNet-wrapper tokenizer tests (functions/xlnet.py) — the ALPS path's
tokenizer (alps_trainer.py:74-76): preprocess contract, digit-comma
re-split quirk (both branches), added-token atomicity and ids."""

from __future__ import annotations

import pytest

from relation_extraction_cdr_spark.functions import sp_unigram as sp
from relation_extraction_cdr_spark.functions import xlnet as x


def test_preprocess_text_contract():
    # remove_space + quote mapping + NFKD accent strip, NO lowering
    assert x.preprocess_text("  ``quote''  café  ") == '"quote" cafe'
    assert x.preprocess_text("A\t B") == "A B"


def test_added_tokens_atomic_with_appended_ids():
    toks = x.tokenize("日本語<e>東京</e>テスト")
    assert "<e>" in toks and "</e>" in toks
    ids = x.encode("<e>日本</e>")
    assert ids[0] == 32000 and ids[-1] == 32001
    assert all(i < 32000 for i in ids[1:-1])


def test_digit_comma_quirk_real_vocab():
    """'▁(1,' is the one digit-comma piece in the wiki-ja model: the
    quirk must re-split it into the encode of '(1' plus a bare ','."""
    assert sp.viterbi("▁(1,")[0] == ("▁(1,",)  # raw SP keeps the piece
    toks = x.tokenize("(1,")
    assert toks[-1] == ","
    assert "".join(toks).replace("▁", "") == "(1,"
    assert "▁(1," not in toks


def test_digit_comma_quirk_strip_branch(monkeypatch):
    """A digit-comma piece NOT starting with ▁ strips the re-encode's
    leading ▁ (the transformers branch for mid-word pieces)."""
    pieces = {
        "▁": (1, -1.0),
        "x": (2, -2.0),
        "2,": (3, -2.5),
        "2": (4, -9.0),
        ",": (5, -9.0),
    }
    monkeypatch.setattr(sp, "PIECES", pieces)
    monkeypatch.setattr(sp, "MAX_PIECE_LEN", 2)
    monkeypatch.setattr(sp, "MIN_SCORE", -9.0)
    monkeypatch.setattr(sp, "UNK_SCORE", -19.0)
    monkeypatch.setattr(sp, "_SINGLE_CHARS", frozenset("x2,▁"))
    sp.viterbi.cache_clear()
    try:
        assert sp.viterbi("▁x2,")[0] == ("▁", "x", "2,")
        toks = x._sp_tokenize("x2,")
        # '2,' -> re-encode('2') = ['▁','2'] -> leading '▁' (len 1) dropped
        assert toks == ["▁", "x", "2", ","]
    finally:
        sp.viterbi.cache_clear()


def test_ids_are_model_indices_unknown_zero():
    assert x.token_to_id("<e>") == 32000
    assert x.token_to_id("▁") == 9
    assert x.token_to_id("never-a-piece") == 0
