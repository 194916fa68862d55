"""Extract the SentencePiece unigram piece table from wiki-ja.model.

The .model file is a serialized ``sentencepiece.ModelProto`` (public
schema, sentencepiece_model.proto): field 1 is the repeated
``SentencePiece`` message with fields ``1: piece (string)``,
``2: score (float32)``, ``3: type (enum, default NORMAL=1)``.  The
container has no protobuf/sentencepiece package, so this is a minimal
hand-rolled wire-format reader for exactly that shape — unknown fields
(trainer_spec, normalizer_spec, ...) are skipped by wire type.

Output: TSV ``piece \\t score \\t type`` where score is the shortest
decimal repr that round-trips to the float64 value of the stored
float32 (so Python and DuckDB read bit-identical doubles).  Piece ids
are the 0-based row index, which this script VERIFIES equals the
line order of the sibling .vocab TSV (the id space of
models/tokenization.py load_vocab).

Usage: python scripts/extract_sp_model.py MODEL VOCAB OUT_TSV
"""

from __future__ import annotations

import struct
import sys


def read_varint(buf: bytes, i: int) -> tuple[int, int]:
    val = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def skip_field(buf: bytes, i: int, wire: int) -> int:
    if wire == 0:
        _, i = read_varint(buf, i)
    elif wire == 1:
        i += 8
    elif wire == 2:
        n, i = read_varint(buf, i)
        i += n
    elif wire == 5:
        i += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    return i


def parse_piece(buf: bytes) -> tuple[str, float, int]:
    piece, score, ptype = "", 0.0, 1  # type default NORMAL=1
    i = 0
    while i < len(buf):
        tag, i = read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:
            n, i = read_varint(buf, i)
            piece = buf[i : i + n].decode("utf-8")
            i += n
        elif field == 2 and wire == 5:
            (score,) = struct.unpack("<f", buf[i : i + 4])
            i += 4
        elif field == 3 and wire == 0:
            ptype, i = read_varint(buf, i)
        else:
            i = skip_field(buf, i, wire)
    return piece, score, ptype


def parse_model(buf: bytes) -> list[tuple[str, float, int]]:
    pieces = []
    i = 0
    while i < len(buf):
        tag, i = read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:
            n, i = read_varint(buf, i)
            pieces.append(parse_piece(buf[i : i + n]))
            i += n
        else:
            i = skip_field(buf, i, wire)
    return pieces


def main() -> None:
    model_path, vocab_path, out_path = sys.argv[1:4]
    with open(model_path, "rb") as f:
        pieces = parse_model(f.read())
    with open(vocab_path, encoding="utf-8") as f:
        vocab_lines = [ln.rstrip("\n").split("\t")[0] for ln in f if ln.strip()]
    assert len(pieces) == len(vocab_lines), (len(pieces), len(vocab_lines))
    for idx, ((p, _, _), v) in enumerate(zip(pieces, vocab_lines)):
        assert p == v, f"order mismatch at {idx}: model={p!r} vocab={v!r}"
    for p, _, _ in pieces:
        assert "\t" not in p and "\n" not in p, repr(p)
    n_internal_ws = sum(1 for p, _, _ in pieces if "▁" in p[1:])
    types = {}
    for _, _, t in pieces:
        types[t] = types.get(t, 0) + 1
    with open(out_path, "w", encoding="utf-8") as f:
        for p, s, t in pieces:
            f.write(f"{p}\t{float(s)!r}\t{t}\n")
    print(f"wrote {len(pieces)} pieces to {out_path}")
    print(f"type histogram: {types}")
    print(f"pieces with INTERNAL ▁ (would break per-word split): {n_internal_ws}")
    scores = [s for _, s, t in pieces if t == 1]
    print(f"min normal score: {min(scores)!r}  max piece len: {max(len(p) for p, _, _ in pieces)}")


if __name__ == "__main__":
    main()
