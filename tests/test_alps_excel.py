"""S10 ALPS Excel scan + conversion: stdlib XLSX reader, sample
assembly, and per-sample conversion parity against the literal
reference port (convert_alps_to_cdr.py)."""

from __future__ import annotations

import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from relation_extraction_cdr_spark.sources import alps_excel as AX
from tests.reference_ports import alps_port

_XLSX_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'


def write_xlsx(path, rows, shared_strings=True):
    """Hand-built minimal xlsx: header + data rows; strings go through
    the shared-strings table (or inline), numbers stay numeric."""
    strings: list[str] = []

    def cell(ref, val):
        if isinstance(val, (int, float)):
            return f'<c r="{ref}"><v>{val}</v></c>'
        if val is None:
            return ""
        if shared_strings:
            if val not in strings:
                strings.append(val)
            return f'<c r="{ref}" t="s"><v>{strings.index(val)}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{val}</t></is></c>'

    body = []
    for rix, row in enumerate(rows, start=1):
        cells = "".join(
            cell(f"{chr(ord('A') + cix)}{rix}", v) for cix, v in enumerate(row)
        )
        body.append(f'<row r="{rix}">{cells}</row>')
    sheet = (
        f'<?xml version="1.0"?><worksheet {_XLSX_NS}><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    sst = (
        f'<?xml version="1.0"?><sst {_XLSX_NS}>'
        + "".join(f"<si><t>{s}</t></si>" for s in strings)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        if shared_strings and strings:
            z.writestr("xl/sharedStrings.xml", sst)
    return path


# Reference layout: a Sample mark CLOSES the previous sample (mark ==
# 1-based count of completed samples) and its own text starts the next
ROWS = [
    ["Sample", "Japanese"],
    [None, "薬剤Xは"],
    [None, "頭痛を引き起こした。"],
    [1, "薬剤Yは安全だった。"],
]


@pytest.mark.parametrize("shared", [True, False])
def test_read_xlsx_both_string_encodings(tmp_path, shared):
    p = write_xlsx(str(tmp_path / "a.xlsx"), ROWS, shared_strings=shared)
    rows = AX.read_xlsx(p)
    assert rows[0] == {"Japanese": "薬剤Xは"}
    assert rows[1] == {"Japanese": "頭痛を引き起こした。"}
    assert rows[2]["Sample"] == "1"


def test_assemble_samples_grouping(tmp_path):
    p = write_xlsx(str(tmp_path / "a.xlsx"), ROWS)
    ents = [["薬剤X", "頭痛"], ["薬剤Y"]]
    samples = AX.assemble_samples(
        AX.read_xlsx(p), ents, [["薬剤X"], ["薬剤Y"]], [["頭痛"], []]
    )
    assert len(samples) == 2
    assert samples[0]["text"] == "薬剤Xは頭痛を引き起こした。"
    assert samples[1]["text"] == "薬剤Yは安全だった。"
    assert samples[0]["sample_id"] == 0 and samples[1]["sample_id"] == 1


def test_convert_matches_literal_port():
    sample = {
        "sample_id": 22836123,
        "text": "薬剤Xは重度の頭痛と薬剤X誘発性めまいを引き起こした。",
        "entities": ["薬剤X", "頭痛", "めまい", "薬剤X"],  # duplicate surface
        "cause": ["薬剤X"],
        "effect": ["頭痛", "めまい"],
    }
    ids = AX.entity_ids([sample["entities"], sample["effect"]])
    assert AX.convert_sample(sample, ids) == alps_port.convert_sample_to_text(
        sample, ids
    )


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="abcdxy薬頭痛Xは。", min_size=0, max_size=30),
    st.lists(
        st.text(alphabet="abcdxy薬頭痛X", min_size=1, max_size=4),
        min_size=0,
        max_size=5,
    ),
)
def test_convert_property_equals_port(text, entities):
    cause = entities[: len(entities) // 2]
    effect = entities[len(entities) // 2 :]
    sample = {
        "sample_id": 7,
        "text": text,
        "entities": entities,
        "cause": cause,
        "effect": effect,
    }
    ids = AX.entity_ids([entities])
    assert AX.convert_sample(sample, ids) == alps_port.convert_sample_to_text(
        sample, ids
    )


def test_distributed_conversion_equals_driver(spark, tmp_path):
    p = write_xlsx(str(tmp_path / "a.xlsx"), ROWS)
    ents = [["薬剤X", "頭痛"], ["薬剤Y"]]
    samples = AX.assemble_samples(
        AX.read_xlsx(p), ents, [["薬剤X"], ["薬剤Y"]], [["頭痛"], []]
    )
    ids = AX.entity_ids(ents)
    df = AX.alps_samples_df(spark, samples)
    got = [r["block"] for r in AX.alps_to_pubtator(df, ids).collect()]
    want = [AX.convert_sample(s, ids) for s in samples]
    assert got == want
    # blocks parse back through the PubTator scanner shape (doc + anns)
    assert got[0].startswith("0|t|\n0|a|薬剤Xは頭痛")
    # and the deterministic split is total + reproducible
    s1 = {(r["sample_id"], r["split"]) for r in AX.deterministic_split(df).collect()}
    s2 = {(r["sample_id"], r["split"]) for r in AX.deterministic_split(df).collect()}
    assert s1 == s2 and len(s1) == 2


def test_furigana_runs_are_ignored(tmp_path):
    """Japanese xlsx stores phonetic readings in <rPh> blocks inside
    shared strings; they must NOT leak into cell text (pandas/openpyxl
    ignore them — naive <t> joining read 頭痛 as 頭痛ズツウ)."""
    sheet = (
        f'<?xml version="1.0"?><worksheet {_XLSX_NS}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
        "</sheetData></worksheet>"
    )
    sst = (
        f'<?xml version="1.0"?><sst {_XLSX_NS}>'
        "<si><t>Japanese</t></si>"
        "<si><r><t>頭痛</t></r><rPh><t>ズツウ</t></rPh><phoneticPr/></si>"
        "</sst>"
    )
    p = str(tmp_path / "f.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)
    rows = AX.read_xlsx(p)
    assert rows == [{"Japanese": "頭痛"}]


def test_mark_without_text_fails_loudly(tmp_path):
    """A Sample mark with no accumulated text previously slipped past
    the consecutiveness guard and silently misaligned every later
    sample's entity lists — it must raise."""
    rows = [
        ["Sample", "Japanese"],
        [None, "text zero"],
        [1, None],
        [2, "text one"],
    ]
    p = write_xlsx(str(tmp_path / "m.xlsx"), rows)
    with pytest.raises(ValueError, match="no accumulated text"):
        AX.assemble_samples(AX.read_xlsx(p), [[], [], []], [[], [], []], [[], [], []])
