"""Featurization: entity-marker insertion, tokenization, entity mask,
per-row label encoding (SURVEY §2.5 W1/W2/W5, §2.4 A10, §2.2 P7/P8).

Reference semantics (cdr_dataset.py:294-376, make_example_non_global):

- markers inserted around the LATER-starting entity first so the earlier
  entity's char offsets stay valid (cdr_dataset.py:301-319); ``first`` is
  the earlier-starting entity's mesh code, ``second`` the later's.
- sentence offsets are evidence-relative: mention start minus sent_pos.
- candidates whose marked text tokenizes to > 512 ids are DROPPED
  (cdr_dataset.py:323-325, filter P7).
- entity mask: 'O' everywhere except marker spans, which carry the
  entity's mesh code, marker tokens included when use_entity_token
  (cdr_dataset.py:328-353); with use_entity_token=False the marker ids
  are stripped from the token list (P8, cdr_dataset.py:357-358).
- label encoding: sklearn LabelEncoder == dense codes over the
  LEXICOGRAPHICALLY SORTED distinct mask values (cdr_dataset.py:363-367);
  reproduced with numpy unique (which sorts) — per-row, no shuffle.

Execution: one ``mapInPandas`` over evidence rows — narrow stage, Arrow
batches; all heavy string surgery is per-row Python on short evidence
sentences (bounded by 512 tokens), vectorized at the batch level.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.tokenize import E_END_ID, E_START_ID, encode

FEATURES_SCHEMA = (
    "url string, chem_mesh string, dis_mesh string, label int, "
    "evidence_type string, token_ids array<int>, entity_mask array<int>, "
    "chem_code int, dis_code int"
)


def featurize_py(
    sentence: str,
    sent_pos: int,
    chem_mesh: str,
    dis_mesh: str,
    chem_start: int,
    chem_end: int,
    dis_start: int,
    dis_end: int,
    use_entity_token: bool = True,
    max_len: int = 512,
) -> dict | None:
    """Single-row reference implementation (pytest oracle)."""
    cs, ce = chem_start - sent_pos, chem_end - sent_pos
    ds, de = dis_start - sent_pos, dis_end - sent_pos
    if cs > ds:
        t = sentence[:cs] + " [E] " + sentence[cs:ce] + " [/E] " + sentence[ce:]
        t = t[:ds] + " [E] " + t[ds:de] + " [/E] " + t[de:]
        first, second = dis_mesh, chem_mesh
    else:
        t = sentence[:ds] + " [E] " + sentence[ds:de] + " [/E] " + sentence[de:]
        t = t[:cs] + " [E] " + t[cs:ce] + " [/E] " + t[ce:]
        first, second = chem_mesh, dis_mesh
    ids = encode(t)
    if len(ids) > max_len:
        return None
    mask: list[str] = []
    i = 0
    ent = 0
    while i < len(ids):
        if ids[i] != E_START_ID:
            mask.append("O")
            i += 1
        else:
            code = first if ent == 0 else second
            if use_entity_token:
                mask.append(code)
            i += 1
            while i < len(ids) and ids[i] != E_END_ID:
                mask.append(code)
                i += 1
            if use_entity_token:
                mask.append(code)
            ent += 1
            i += 1
    if not use_entity_token:
        ids = [x for x in ids if x not in (E_START_ID, E_END_ID)]
    # LabelEncoder: dense rank over lexicographically sorted classes
    classes, enc = np.unique(np.array(mask, dtype=object), return_inverse=True)
    lookup = {c: j for j, c in enumerate(classes)}
    if chem_mesh not in lookup or dis_mesh not in lookup:
        # pathological offsets (e.g. a find()-failure span from the
        # reproduced inter_window quirk) can corrupt a marker so an
        # entity never lands in the mask — drop the row like the other
        # guards do, never KeyError inside the executor task
        return None
    return dict(
        token_ids=ids,
        entity_mask=[int(x) for x in enc],
        chem_code=int(lookup[chem_mesh]),
        dis_code=int(lookup[dis_mesh]),
    )


FULLTEXT_SCHEMA = (
    "url string, token_ids array<int>, entity_mask array<int>, "
    "chem_codes array<int>, dis_codes array<int>, labels array<int>, "
    "chem_meshes array<string>, dis_meshes array<string>"
)


def fulltext_featurize_py(
    text: str,
    entities: list[dict],
    gold_pairs: list[tuple[str, str]],
    use_entity_token: bool = True,
    max_len: int = 512,
) -> dict | None:
    """The document-level (is_full_sample) example builder — reference
    ``make_example_fulltext`` (cdr_dataset.py:449-545) semantics:

    - EVERY mention of EVERY entity is marker-wrapped, sorted by start,
      inserted in reverse so earlier offsets stay valid (W1/W2)
    - tokenize the whole marked document; if > max_len ids, truncate to
      the window then cut BACK to just after the last [/e] inside it
      (W5, cdr_dataset.py:477-481; a window with no [/e] drops the doc
      — the reference would IndexError on ``e_end_last_idx[-1]``)
    - mask: 'O' outside marker spans, the entity's mesh code inside
      (markers included iff use_entity_token; with False the marker ids
      are filtered from the token list, cdr_dataset.py:506-507)
    - chem/dis code lists: the doc's codes of that type FILTERED to
      those present in the (possibly truncated) mask, chem in entity
      order, dis deduped preserving first-appearance order
      (cdr_dataset.py:519-530); labels follow the same chem-outer /
      dis-inner cross order, 1 iff the pair is in ``gold_pairs``
    - LabelEncoder over the mask strings (dense rank of sorted distinct
      values) re-encodes mask + both code lists (cdr_dataset.py:533-535)

    Returns token_ids / entity_mask / encoded code lists / labels plus
    the mesh-id lists in pair order (so logits can be joined back).
    """
    entities_pos = []
    for e in entities:
        for p in e["positions"]:
            entities_pos.append(
                {"code": e["mesh_id"], "start": int(p["start"]), "end": int(p["end"])}
            )
    if not entities_pos:
        return None
    entities_pos.sort(key=lambda p: p["start"])
    t = text
    for p in reversed(entities_pos):
        s, e_ = p["start"], p["end"]
        t = t[:s] + " [E] " + t[s:e_] + " [/E] " + t[e_:]
    ids = encode(t)
    if len(ids) > max_len:
        subset = ids[:max_len]
        last_end = -1
        for i, x in enumerate(subset):
            if x == E_END_ID:
                last_end = i
        if last_end < 0:
            return None
        ids = subset[: last_end + 1]
    mask: list[str] = []
    i = 0
    span = 0
    while i < len(ids):
        if ids[i] != E_START_ID:
            mask.append("O")
            i += 1
        else:
            code = entities_pos[span]["code"]
            if use_entity_token:
                mask.append(code)
            i += 1
            while i < len(ids) and ids[i] != E_END_ID:
                mask.append(code)
                i += 1
            if use_entity_token:
                mask.append(code)
            span += 1
            i += 1
    if not use_entity_token:
        ids = [x for x in ids if x not in (E_START_ID, E_END_ID)]
    present = set(mask)
    # one entity per mesh_id (the reference inventory is a dict keyed by
    # mesh_id, so duplicates cannot exist there; caller-supplied entity
    # lists CAN repeat an id — last type wins, like the dict overwrite —
    # and the ordered dedup keeps labels aligned with the
    # chem_meshes × dis_meshes pair order the scorer reconstructs)
    types: dict[str, str] = {}
    ordered_ids: list[str] = []
    for e in entities:
        if e["mesh_id"] not in types:
            ordered_ids.append(e["mesh_id"])
        types[e["mesh_id"]] = e["type"]
    chem_all = [m for m in ordered_ids if types[m] == "Chemical"]
    dis_all = [m for m in ordered_ids if types[m] == "Disease"]
    gold = set(gold_pairs)
    chem_meshes: list[str] = []
    dis_meshes: list[str] = []
    labels: list[int] = []
    for c in chem_all:
        if c in present:
            chem_meshes.append(c)
            for d in dis_all:
                if d in present:
                    if d not in dis_meshes:
                        dis_meshes.append(d)
                    labels.append(1 if (c, d) in gold else 0)
    if not chem_meshes or not dis_meshes:
        return None
    classes, enc = np.unique(np.array(mask, dtype=object), return_inverse=True)
    lookup = {c: j for j, c in enumerate(classes)}
    return dict(
        token_ids=[int(x) for x in ids],
        entity_mask=[int(x) for x in enc],
        chem_codes=[int(lookup[c]) for c in chem_meshes],
        dis_codes=[int(lookup[d]) for d in dis_meshes],
        labels=labels,
        chem_meshes=chem_meshes,
        dis_meshes=dis_meshes,
    )


def fulltext_features(
    docs_with_entities: DataFrame,
    use_entity_token: bool = True,
    max_len: int = 512,
) -> DataFrame:
    """Distributed document-level featurization.

    Input: one row per doc — (url, text,
    entities array<struct<mesh_id, type, positions array<struct<start,
    end>>>>, gold_pairs array<struct<chem_mesh, dis_mesh>> | null).
    Output: FULLTEXT_SCHEMA, one row per surviving document.  Narrow
    mapInPandas stage; same scale shape as ``featurize``.

    The per-row ``itertuples`` loop is measured, not assumed, to be
    off the critical path: on the real sf0.01 payload the featurize
    kernel is 93.6% of batch wall (15.6x the iteration+unpack cost;
    BENCH/ATTRIBUTION.md), and the heavier encoder-wrapping loops
    (ner/scorer/evidence) dominate by more still."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split(" ")[0] for c in FULLTEXT_SCHEMA.split(", ")]
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.text is None or not r.text:
                    continue
                ents = [
                    {
                        "mesh_id": e["mesh_id"],
                        "type": e["type"],
                        "positions": [
                            {"start": p["start"], "end": p["end"]}
                            for p in e["positions"]
                        ],
                    }
                    for e in r.entities
                ]
                gold = (
                    [(g["chem_mesh"], g["dis_mesh"]) for g in r.gold_pairs]
                    if getattr(r, "gold_pairs", None) is not None
                    else []
                )
                feat = fulltext_featurize_py(
                    r.text, ents, gold,
                    use_entity_token=use_entity_token, max_len=max_len,
                )
                if feat is not None:
                    out.append({"url": r.url, **feat})
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return docs_with_entities.mapInPandas(run, schema=FULLTEXT_SCHEMA)


def wordpiece_segments(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Per-word WordPiece segmentation as a relational surface:
    (word) -> (word, n_pieces, ids_csv) using the real ELECTRA vocab
    kernel (functions/wordpiece.py).  The word stream is tiny after
    distinct() (Zipfian vocabulary), so this is a broadcast-sized
    dimension in practice; corpus-side consumers join words to their
    piece counts instead of re-tokenizing every occurrence."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.wordpiece import UNK_ID, VOCAB, wordpiece

        for pdf in batches:
            out = []
            for w in pdf[word_col]:
                pieces = wordpiece(w)
                out.append(
                    {
                        "word": w,
                        "n_pieces": len(pieces),
                        "ids_csv": ",".join(str(VOCAB.get(p, UNK_ID)) for p in pieces),
                    }
                )
            yield (
                pd.DataFrame(out, columns=["word", "n_pieces", "ids_csv"])
                if out
                else pd.DataFrame(columns=["word", "n_pieces", "ids_csv"])
            )

    return words.mapInPandas(run, schema="word string, n_pieces int, ids_csv string")


def sp_segments(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Per-word SentencePiece unigram segmentation as a relational
    surface: (word, already ▁-prefixed) -> (word, n_pieces, ids_csv,
    cost_e6) using the real wiki-ja model kernel
    (functions/sp_unigram.py).  cost_e6 is the Viterbi path cost
    (-logprob) in fixed-point micro-units — FLOOR(cost*1e6 + 0.5) so the
    value is engine-exact.  Same dimension-sized contract as
    wordpiece_segments: distinct Zipfian vocabulary, corpus consumers
    join back instead of re-tokenizing occurrences."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.sp_unigram import viterbi

        cols = ["word", "n_pieces", "ids_csv", "cost_e6"]
        for pdf in batches:
            out = []
            for w in pdf[word_col]:
                pieces, ids, logprob = viterbi(w)
                out.append(
                    {
                        "word": w,
                        "n_pieces": len(pieces),
                        "ids_csv": ",".join(map(str, ids)),
                        "cost_e6": int(math.floor(-logprob * 1e6 + 0.5)),
                    }
                )
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return words.mapInPandas(
        run, schema="word string, n_pieces int, ids_csv string, cost_e6 long"
    )


def featurize(evidence: DataFrame, use_entity_token: bool = True, max_len: int = 512) -> DataFrame:
    """Distributed featurization over EVIDENCE_SCHEMA rows.

    Global evidence rows (sent_pos null) use offset base 0 and the whole
    document as the sentence.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split(" ")[0] for c in FEATURES_SCHEMA.split(", ")]
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.chem_start is None or (isinstance(r.chem_start, float) and np.isnan(r.chem_start)):
                    continue  # global rows carry no span offsets
                feat = featurize_py(
                    r.sentence,
                    int(r.sent_pos) if r.sent_pos is not None else 0,
                    r.chem_mesh, r.dis_mesh,
                    int(r.chem_start), int(r.chem_end),
                    int(r.dis_start), int(r.dis_end),
                    use_entity_token=use_entity_token, max_len=max_len,
                )
                if feat is not None:
                    out.append(
                        {"url": r.url, "chem_mesh": r.chem_mesh,
                         "dis_mesh": r.dis_mesh, "label": int(r.label),
                         "evidence_type": r.evidence_type, **feat}
                    )
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return evidence.mapInPandas(run, schema=FEATURES_SCHEMA)
