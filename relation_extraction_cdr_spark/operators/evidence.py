"""Evidence selection: pick the textual support for each candidate pair
(SURVEY §2.3 J5/J6, §2.5 W3; reference utils/text_utils.py:54-150).

Decision procedure reproduced exactly (including quirks):

1. For every sentence and every (chem mention, dis mention) position pair
   where BOTH mention starts fall inside the sentence
   (check_position, text_utils.py:7-10 — sentence located via
   ``text.find(sent)``, i.e. FIRST occurrence for duplicated sentences,
   text_utils.py:86):
   - token distance = number of ' '-split pieces of the text between the
     earlier entity's END and the later entity's START, where the earlier
     entity's length is the length of its MESH CODE STRING, not its
     surface form (compute_token_distance, text_utils.py:12-16 — the
     function is called with the mesh code as ``entity_chemical``; quirk
     reproduced verbatim).
   - distance < 10  → intra candidate (text_utils.py:94-96)
   - distance >= 10 → same-sentence fallback bucket (text_utils.py:97-100)
   - otherwise record which sentences contain each entity alone
     (text_utils.py:102-105).
2. Any intra candidate → return the min-token-distance one (ties: first
   encountered, Python list.index(min) semantics; text_utils.py:149-150).
3. Else, in inter mode: same-sentence fallback if any (min distance,
   text_utils.py:110-112); else nearest chem-sentence/dis-sentence pair
   with |i-j| <= 3 becomes a sentence-window evidence
   (text_utils.py:114-143, including the find()-failure swap at :136-141);
   else the pair is dropped.
4. In global mode (extract_inter=False) a pair with no intra evidence gets
   the whole document (text_utils.py:146-147).

Execution shape: ``mapInPandas`` — each input row is self-contained
(text + both mention position lists), so this is a NARROW stage: no
shuffle, Arrow batches in/out, sentence splits memoized per document
within a batch.  At 100 TB this stage scales embarrassingly; the upstream
join that attached ``text`` to pairs is the only exchange.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import split_sentences_py

EVIDENCE_SCHEMA = (
    "url string, chem_mesh string, dis_mesh string, label int, "
    "evidence_type string, sentence string, sent_pos int, "
    "chem_start int, chem_end int, dis_start int, dis_end int"
)


def _check_position(start: int, sent_start: int, sent: str) -> bool:
    return sent_start <= start <= sent_start + len(sent) - 1


def _token_distance(chem_code: str, chem_start: int, dis_code: str,
                    dis_start: int, sent: str, sent_start: int) -> int:
    # earlier entity's END computed with the length of its MESH CODE
    # (reference quirk, text_utils.py:13-14)
    if chem_start < dis_start:
        pos_start, pos_end = chem_start + len(chem_code), dis_start
    else:
        pos_start, pos_end = dis_start + len(dis_code), chem_start
    return len(sent[pos_start - sent_start : pos_end - sent_start].split(" "))


def select_evidence_py(
    text: str,
    chem: str,
    dis: str,
    chem_positions: list[tuple[int, int]],
    dis_positions: list[tuple[int, int]],
    chem_text: str,
    dis_text: str,
    label: int,
    extract_inter: bool = True,
    sents: list[dict] | None = None,
) -> dict | None:
    """Single-pair reference implementation (also the pytest oracle)."""
    if sents is None:
        sents = split_sentences_py(text)
    intra, intra_d = [], []
    far, far_d = [], []
    chem_sent_idx: list[int] = []
    dis_sent_idx: list[int] = []
    for s in sents:
        sent, sent_start = s["text"], s["start"]
        for cs, ce in chem_positions:
            for ds, de in dis_positions:
                c_in = _check_position(cs, sent_start, sent)
                d_in = _check_position(ds, sent_start, sent)
                if c_in and d_in:
                    td = _token_distance(chem, cs, dis, ds, sent, sent_start)
                    row = dict(
                        sentence=sent, sent_pos=sent_start,
                        chem_start=cs, chem_end=ce, dis_start=ds, dis_end=de,
                    )
                    if td < 10:
                        intra.append(row)
                        intra_d.append(td)
                    else:
                        far.append(row)
                        far_d.append(td)
                elif c_in:
                    chem_sent_idx.append(s["idx"])
                elif d_in:
                    dis_sent_idx.append(s["idx"])
    if intra:
        best = intra[intra_d.index(min(intra_d))]
        return dict(label=label, evidence_type="intra", **best)
    if not extract_inter:
        return dict(
            label=label, evidence_type="global", sentence=text, sent_pos=None,
            chem_start=None, chem_end=None, dis_start=None, dis_end=None,
        )
    if far:
        best = far[far_d.index(min(far_d))]
        return dict(label=label, evidence_type="inter_fartoken", **best)
    # nearest sentence-pair window (text_utils.py:114-143)
    c_idx = sorted(set(chem_sent_idx))
    d_idx = sorted(set(dis_sent_idx))
    min_distance, start_sentence, end_sentence = 10000, 0, 0
    for ci in c_idx:
        for di in d_idx:
            if abs(ci - di) < min_distance:
                min_distance = abs(ci - di)
                start_sentence, end_sentence = min(ci, di), max(ci, di)
    if min_distance <= 3 and c_idx and d_idx:
        by_idx = {s["idx"]: s for s in sents}
        s0, s1 = by_idx[start_sentence], by_idx[end_sentence]
        start_pos = text.find(s0["text"])
        end_pos = text.find(s1["text"]) + len(s1["text"])
        window = text[start_pos:end_pos]
        cstart = s0["text"].find(chem_text)
        dstart = s1["text"].find(dis_text)
        if cstart == -1 or dstart == -1:
            cstart = s1["text"].find(chem_text) + text.find(s1["text"])
            dstart = s0["text"].find(dis_text) + start_pos
        else:
            cstart += start_pos
            dstart += text.find(s1["text"])
        return dict(
            label=label, evidence_type="inter_window", sentence=window,
            sent_pos=start_pos,
            chem_start=cstart, chem_end=cstart + len(chem_text),
            dis_start=dstart, dis_end=dstart + len(dis_text),
        )
    return None


def select_evidence(pairs_with_text: DataFrame, extract_inter: bool = True) -> DataFrame:
    """Distributed evidence selection.

    Input columns: url, text, chem_mesh, dis_mesh, chem_positions,
    dis_positions, chem_text, dis_text, label.
    Output: EVIDENCE_SCHEMA rows (pairs with no evidence are dropped,
    matching the reference's None return).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sent_cache: dict[str, list] = {}
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                sents = sent_cache.get(r.url)
                if sents is None:
                    sents = split_sentences_py(r.text)
                    if len(sent_cache) > 256:
                        sent_cache.clear()
                    sent_cache[r.url] = sents
                row = select_evidence_py(
                    r.text, r.chem_mesh, r.dis_mesh,
                    [(int(p["start"]), int(p["end"])) for p in r.chem_positions],
                    [(int(p["start"]), int(p["end"])) for p in r.dis_positions],
                    r.chem_text, r.dis_text, int(r.label),
                    extract_inter=extract_inter, sents=sents,
                )
                if row is not None:
                    out.append({"url": r.url, "chem_mesh": r.chem_mesh,
                                "dis_mesh": r.dis_mesh, **row})
            cols = [c.split(" ")[0] for c in EVIDENCE_SCHEMA.split(", ")]
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return pairs_with_text.mapInPandas(run, schema=EVIDENCE_SCHEMA)
