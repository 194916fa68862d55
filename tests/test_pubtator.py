"""PubTator source semantics (SURVEY §2.1 S1/S2/S9, §1.1 filters)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from relation_extraction_cdr_spark.sources import pubtator as PT

FIXTURE = """\
100|t|Title Line
100|a|Lithium induced severe tremor in rats.
100\t0\t7\tLithium\tChemical\tD910001
100\t23\t29\ttremor\tDisease\tD010001
100\t31\t35\trats\tDisease\t-1
100\t31\t35\trats\tDisease\tD1|D2
100\tCID\tD910001\tD010001
100\tCID\tD910001\tD999999

200|a|Haloperidol was administered.
200\t0\t11\tHaloperidol\tChemical\tD910002
"""


@pytest.fixture(scope="module")
def blocks(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("pt") / "fixture.txt"
    p.write_text(FIXTURE)
    return PT.read_pubtator(spark, str(p)).cache()


def test_block_split(blocks):
    rows = blocks.orderBy("doc_idx").collect()
    assert len(rows) == 2
    assert len(rows[0]["lines"]) == 8
    assert len(rows[1]["lines"]) == 2


def test_parse_documents_lowercased(blocks):
    docs = {r["doc_id"]: r["text"] for r in PT.parse_documents(blocks).collect()}
    # abstract payload lowercased (cdr_dataset.py:44); title line ignored
    assert docs["100"] == "lithium induced severe tremor in rats."
    assert docs["200"] == "haloperidol was administered."


def test_parse_mentions_filters(blocks):
    m = PT.parse_mentions(blocks).collect()
    ids = {(r["doc_id"], r["mesh_id"]) for r in m}
    # -1 and composite ids dropped (cdr_dataset.py:56,67)
    assert ids == {("100", "D910001"), ("100", "D010001"), ("200", "D910002")}
    lith = [r for r in m if r["mesh_id"] == "D910001"][0]
    assert (lith["start"], lith["end"]) == (0, 7)
    assert lith["mention_text"] == "lithium"  # lowercased (cdr_dataset.py:73)


def test_parse_relations_endpoint_semijoin(blocks):
    mentions = PT.parse_mentions(blocks)
    rels = PT.parse_relations(blocks, mentions).collect()
    # (D910001, D999999) dropped: endpoint not in entity set (cdr_dataset.py:81)
    assert [(r["doc_id"], r["chem_mesh"], r["dis_mesh"]) for r in rels] == [
        ("100", "D910001", "D010001")
    ]


def test_roundtrip_sink(spark, blocks, tmp_path):
    docs = PT.parse_documents(blocks)
    mentions = PT.parse_mentions(blocks)
    rels = PT.parse_relations(blocks, mentions)
    out = str(tmp_path / "roundtrip")
    PT.write_pubtator(docs, mentions, rels, out)
    back = PT.read_pubtator(spark, out)
    docs2 = PT.parse_documents(back)
    assert {r["text"] for r in docs2.collect()} == {r["text"] for r in docs.collect()}
    m2 = PT.parse_mentions(back)
    assert m2.count() == mentions.count()
