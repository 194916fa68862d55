"""ALPS Excel scan + CDR conversion (SURVEY §2.1 S10).

The reference converts the ALPS corpus from a spreadsheet with
``convert_alps_to_cdr.py``: ``pd.read_excel`` over columns
``Sample``/``Japanese`` (:14-40), rows grouped into samples (a
non-empty ``Sample`` ordinal closes the running sample; continuation
rows concatenate), NFKC normalization, entity surface lists from
pickled label files (:7-11), longest-match-first entity scanning over
the text (:80-88 — the same W6 discipline as gazetteer mentions),
cause→Chemical / effect→Disease / other→Other labeling (:68-75),
cause×effect relation product excluding unmatched entities (:95-99),
and PubTator-ish block serialization with +1 offsets (:43-59).

This module re-implements that pipeline without pandas.read_excel or
openpyxl (neither ships here): a minimal stdlib XLSX reader (an .xlsx
is a zip of XML — worksheet cells reference a shared-strings table or
carry inline/numeric values) feeds the same sample-assembly loop, and
the per-sample conversion runs distributed as an Arrow-batched UDF.

Deliberate determinism fix: the reference builds ``entity_dict`` by
enumerating a Python ``set`` (run-dependent iteration order,
convert_alps_to_cdr.py:16-17); this engine pins ids by SORTED surface
order so conversions are reproducible — documented divergence, ids are
only ever compared within one conversion run.
"""

from __future__ import annotations

import re
import unicodedata
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'B'->1, ... 'AA'->26."""
    out = 0
    for ch in ref:
        out = out * 26 + (ord(ch) - ord("A") + 1)
    return out - 1


def _rich_text(el) -> str:
    """Concatenate the <t> runs of a rich-text container, SKIPPING
    phonetic (furigana) <rPh> blocks — Japanese-authored spreadsheets
    store readings there, and pandas/openpyxl (the reference path)
    ignore them; naively joining every <t> would corrupt 頭痛 into
    頭痛ズツウ and shift every entity offset downstream."""
    parts = []
    for child in list(el):
        if child.tag == f"{_NS}rPh" or child.tag == f"{_NS}phoneticPr":
            continue
        if child.tag == f"{_NS}t":
            parts.append(child.text or "")
        else:
            parts.append("".join(t.text or "" for t in child.iter(f"{_NS}t")))
    return "".join(parts)


def read_xlsx(path: str, sheet: int = 0) -> list[dict[str, str]]:
    """Minimal XLSX scan: list of {header: cell-text} row dicts for one
    worksheet.  Handles shared strings (t="s"), inline strings
    (t="inlineStr"), and numeric/direct values; empty cells are absent
    from their row dict."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append(_rich_text(si))
        sheet_names = sorted(
            (
                n
                for n in z.namelist()
                if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
            ),
            # numeric order: a lexicographic sort puts sheet10 before
            # sheet2 and silently selects the wrong worksheet
            key=lambda n: int(re.search(r"(\d+)", n).group(1)),
        )
        root = ET.fromstring(z.read(sheet_names[sheet]))
        rows: list[dict[int, str]] = []
        for row in root.iter(f"{_NS}row"):
            cells: dict[int, str] = {}
            for c in row.findall(f"{_NS}c"):
                # OOXML allows <c> without r: such cells position
                # sequentially (a defaulted 'A1' would stack them all
                # on column 0)
                r_attr = c.get("r")
                ref = _CELL_REF.match(r_attr) if r_attr else None
                col = _col_index(ref.group(1)) if ref else len(cells)
                ctype = c.get("t", "n")
                if ctype == "s":
                    v = c.find(f"{_NS}v")
                    cells[col] = shared[int(v.text)] if v is not None else ""
                elif ctype == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    cells[col] = _rich_text(is_el) if is_el is not None else ""
                else:
                    v = c.find(f"{_NS}v")
                    if v is not None and v.text is not None:
                        cells[col] = v.text
            rows.append(cells)
    if not rows:
        return []
    header = rows[0]
    out = []
    for cells in rows[1:]:
        out.append({header[i]: val for i, val in cells.items() if i in header})
    return out


def assemble_samples(
    rows: list[dict[str, str]],
    entities: list[list[str]],
    cause: list[list[str]],
    effect: list[list[str]],
) -> list[dict]:
    """The read_data grouping loop (convert_alps_to_cdr.py:21-40): a
    non-empty Sample ordinal CLOSES the running sample (the mark equals
    the 1-based count of completed samples — the assert at :31 pins this
    reading) and its own Japanese cell starts the next one;
    continuation rows concatenate; NFKC at close.  Divergence: the
    reference's loop never closes the final running sample (it relies
    on a trailing marker row); this implementation closes it so the
    last document is not silently dropped."""
    current_text = ""
    current_index = 0
    samples: list[dict] = []

    def close():
        nonlocal current_index, current_text
        samples.append(
            {
                "sample_id": current_index,
                "text": unicodedata.normalize("NFKC", current_text),
                "entities": entities[current_index],
                "cause": cause[current_index],
                "effect": effect[current_index],
            }
        )
        current_index += 1

    for row in rows:
        idx = str(row.get("Sample", "")).strip()
        text = row.get("Japanese", "")
        if idx and idx.lower() != "nan" and not current_text:
            # the reference silently swallows a mark with no
            # accumulated text (and a first-row mark); that is exactly
            # the silent entity-list misalignment the consecutiveness
            # check exists to prevent — fail loudly instead
            raise ValueError(
                f"Sample mark {idx!r} with no accumulated text "
                f"(after {current_index} completed samples)"
            )
        if idx and idx.lower() != "nan" and current_text:
            try:
                mark = int(float(idx))
            except ValueError as e:
                raise ValueError(
                    f"non-numeric Sample mark {idx!r} in ALPS sheet"
                ) from e
            # a real raise, not assert (which vanishes under python -O):
            # a misnumbered mark means every later sample pairs with the
            # WRONG entity/cause/effect lists by index
            if mark != current_index + 1:
                raise ValueError(
                    f"Sample marks must be consecutive: mark {mark} after "
                    f"{current_index} completed samples"
                )
            close()
            current_text = text
        else:
            current_text += text
    if current_text:
        close()
    return samples


def entity_ids(entities: list[list[str]]) -> dict[str, int]:
    """Deterministic surface -> id (sorted; see module docstring)."""
    return {s: i for i, s in enumerate(sorted({x for es in entities for x in es}))}


def convert_sample(sample: dict, ids: dict[str, int]) -> str:
    """One sample -> its PubTator block text (write_to_text shape:
    +1-based offsets, cause/effect/Other labels, cause×effect relation
    product excluding entities whose surface never matched)."""
    text = sample["text"]
    # stable len-desc sort: length ties keep the entity list's order,
    # exactly like the reference's sorted(key=len, reverse=True)
    ents = sorted(sample["entities"], key=len, reverse=True)
    checked = [False] * len(ents)
    found: list[tuple[int, str]] = []
    i = 0
    # faithful transcription of the scan (convert_alps_to_cdr.py:80-88):
    # the inner loop has NO break — a match advances i and the REMAINING
    # entities are tested at the advanced position within the same pass,
    # then i advances one more unconditionally
    while i < len(text):
        for j, surface in enumerate(ents):
            if text.startswith(surface, i):
                checked[j] = True
                found.append((i, surface))
                i += len(surface)
        i += 1
    # unmatched entity OBJECTS contribute their code to the exclusion
    # set (a duplicate surface that matched once but not twice still
    # excludes its code — reference :89-99 semantics)
    not_checked = {ids[s] for j, s in enumerate(ents) if not checked[j]}
    lines = [f"{sample['sample_id']}|t|", f"{sample['sample_id']}|a|{text}"]
    for start, surface in found:
        if surface in sample["cause"]:
            label = "Chemical"
        elif surface in sample["effect"]:
            label = "Disease"
        else:
            label = "Other"
        lines.append(
            f"{sample['sample_id']}\t{start + 1}\t{start + 1 + len(surface)}"
            f"\t{surface}\t{label}\t{ids[surface]}"
        )
    for c in sample["cause"]:
        for e in sample["effect"]:
            if ids[c] not in not_checked and ids[e] not in not_checked:
                lines.append(f"{sample['sample_id']}\tCID\t{ids[c]}\t{ids[e]}")
    return "\n".join(lines) + "\n"


def alps_samples_df(spark: SparkSession, samples: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        [
            (s["sample_id"], s["text"], s["entities"], s["cause"], s["effect"])
            for s in samples
        ],
        "sample_id long, text string, entities array<string>, "
        "cause array<string>, effect array<string>",
    )


def alps_to_pubtator(samples: DataFrame, ids: dict[str, int]) -> DataFrame:
    """Distributed conversion: one block per sample, Arrow-batched.
    The id dict is a broadcast-sized dimension carried in the closure
    (the S4 pattern)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                convert_sample(
                    {
                        "sample_id": int(r.sample_id),
                        "text": r.text,
                        "entities": list(r.entities),
                        "cause": list(r.cause),
                        "effect": list(r.effect),
                    },
                    ids,
                )
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame({"sample_id": pdf["sample_id"], "block": out})

    return samples.mapInPandas(run, schema="sample_id long, block string").orderBy(
        "sample_id"
    )


def deterministic_split(
    samples: DataFrame, test_frac: float = 0.25
) -> DataFrame:
    """The reference splits with random.sample (run-dependent); the
    engine's split is the md5-threshold discipline (q34): reproducible
    under any partitioning."""
    thresh = int(test_frac * 16)
    nib = F.conv(F.substring(F.md5(F.col("sample_id").cast("string")), 1, 1), 16, 10)
    return samples.withColumn(
        "split",
        F.when(nib.cast("int") < thresh, "test").otherwise("train"),
    )
