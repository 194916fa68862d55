"""XLNet-wrapper tokenization over the wiki-ja SentencePiece model.

The ALPS trainer tokenizes with ``XLNetTokenizer.from_pretrained(
'model_sentence_piece/wiki-ja.model')`` plus added tokens ``<e>``/``</e>``
(alps_trainer.py:74-76) — NOT the in-repo FullTokenizer.  transformers'
XLNetTokenizer is a thin wrapper around the same unigram model
(functions/sp_unigram.py) with three extra behaviors, transcribed here
from the public transformers-2.x source:

1. ``preprocess_text``: collapse whitespace (remove_space=True), map
   ``````/``''`` quote pairs to ``"``, strip accents via NFKD +
   drop combining marks (keep_accents=False); do_lower_case defaults
   False for XLNet;
2. the digit-comma quirk in ``_tokenize``: a piece like ``▁1,`` (ends
   with ',' preceded by a digit) is re-encoded without the comma and the
   comma re-appended, with the leading ``▁`` of the re-encode stripped
   when the original piece didn't start with one;
3. added-token splitting: ``<e>``/``</e>`` are split out atomically
   before SentencePiece runs and get ids 32000/32001 (appended past the
   32,000-piece model, resize_token_embeddings order).

ids are model piece indices (PieceToId), unknown → 0.
"""

from __future__ import annotations

import unicodedata

from .sp_unigram import PIECES, UNK_ID, viterbi

SPIECE_UNDERLINE = "▁"

ADDED_TOKENS: dict[str, int] = {"<e>": 32000, "</e>": 32001}


def preprocess_text(text: str) -> str:
    out = " ".join(text.strip().split())
    out = out.replace("``", '"').replace("''", '"')
    out = "".join(
        c for c in unicodedata.normalize("NFKD", out) if not unicodedata.combining(c)
    )
    return out


def _encode_as_pieces(text: str) -> list[str]:
    """Raw EncodeAsPieces: per whitespace token with the ▁ dummy prefix
    (exact per-word == per-sentence equivalence: no piece in this model
    has an internal ▁ — verified at extraction)."""
    pieces: list[str] = []
    for w in text.split(" "):
        if w:
            pieces.extend(viterbi(SPIECE_UNDERLINE + w)[0])
    return pieces


def _sp_tokenize(text: str) -> list[str]:
    """XLNetTokenizer._tokenize: EncodeAsPieces + the digit-comma
    re-split quirk."""
    pieces = _encode_as_pieces(preprocess_text(text))
    out: list[str] = []
    for piece in pieces:
        if len(piece) > 1 and piece[-1] == "," and piece[-2].isdigit():
            cur = _encode_as_pieces(piece[:-1].replace(SPIECE_UNDERLINE, ""))
            if piece[0] != SPIECE_UNDERLINE and cur and cur[0][0] == SPIECE_UNDERLINE:
                if len(cur[0]) == 1:
                    cur = cur[1:]
                else:
                    cur[0] = cur[0][1:]
            cur.append(piece[-1])
            out.extend(cur)
        else:
            out.append(piece)
    return out


def tokenize(text: str) -> list[str]:
    """Full tokenize with added-token splitting (transformers'
    tokenize(): added tokens are atomic, fragments between them go
    through _tokenize)."""
    frags = [text]
    for tok in ADDED_TOKENS:
        nxt: list[str] = []
        for frag in frags:
            if frag in ADDED_TOKENS:
                nxt.append(frag)
                continue
            parts = frag.split(tok)
            for i, sub in enumerate(parts):
                if sub:
                    nxt.append(sub)
                if i < len(parts) - 1:
                    nxt.append(tok)
        frags = nxt
    out: list[str] = []
    for frag in frags:
        if frag in ADDED_TOKENS:
            out.append(frag)
        else:
            out.extend(_sp_tokenize(frag))
    return out


def token_to_id(token: str) -> int:
    tid = ADDED_TOKENS.get(token)
    if tid is not None:
        return tid
    hit = PIECES.get(token)
    return hit[0] if hit is not None else UNK_ID


def convert_tokens_to_ids(tokens: list[str]) -> list[int]:
    return [token_to_id(t) for t in tokens]


def encode(text: str) -> list[int]:
    return convert_tokens_to_ids(tokenize(text))
