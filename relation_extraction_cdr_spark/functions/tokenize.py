"""Deterministic tokenizer used by featurization.

The reference ships a pickled ELECTRA WordPiece tokenizer
(utils/trainer_utils.py:9-18) with added ``[E]``/``[/E]`` marker tokens.
``transformers`` is not a dependency of this engine, so the engine
defines its own deterministic WordPiece-ish tokenizer as the contract:

- surface split: lowercase word / number / single-punct pieces
  (same regex family as the reference's BasicTokenizer word split,
  models/tokenization.py:103-129)
- id assignment: stable 32-bit id derived from md5 of the piece —
  collision-free in practice for our vocab sizes and identical on every
  executor with zero shipped state (no pickle, no broadcast needed)
- reserved ids: PAD=0, E_START=1, E_END=2 for ``[e]``/``[/e]`` markers
  (the reference lowercases markers before id lookup,
  cdr_dataset.py:286-287).

Swapping in a real WordPiece vocab later only changes ``piece_to_id`` —
the distributed featurization plan is unchanged.
"""

from __future__ import annotations

import hashlib
import functools
import re

PAD_ID = 0
E_START_ID = 1
E_END_ID = 2
_RESERVED = {"[pad]": PAD_ID, "[e]": E_START_ID, "[/e]": E_END_ID}
_VOCAB_BASE = 16
_VOCAB_SIZE = 2**31 - _VOCAB_BASE

_PIECE = re.compile(r"\[/?e\]|[a-z0-9]+|[^\sa-z0-9]")


@functools.lru_cache(maxsize=1 << 17)
def piece_to_id(piece: str) -> int:
    # cached: natural-language piece vocabularies are Zipfian, so the
    # md5 runs once per distinct piece per executor, not once per token
    rid = _RESERVED.get(piece)
    if rid is not None:
        return rid
    h = int.from_bytes(hashlib.md5(piece.encode()).digest()[:4], "big")
    return _VOCAB_BASE + (h % _VOCAB_SIZE)


def tokenize_pieces(text: str) -> list[str]:
    return _PIECE.findall(text.lower())


def encode(text: str) -> list[int]:
    """text -> token ids (no CLS/SEP — the scorer stub is model-free;
    a real ONNX scorer would prepend/append its specials here)."""
    return [piece_to_id(p) for p in tokenize_pieces(text)]
