"""Gazetteer mention detection (J8/W6) vs generator gold offsets."""

from __future__ import annotations

import pyspark.sql.functions as F

from relation_extraction_cdr_spark.operators.mentions import (
    detect_mentions,
    entity_inventory,
)
from relation_extraction_cdr_spark.plans.pipeline import extracted_docs
from relation_extraction_cdr_spark.sources.mesh import gazetteer


def test_detect_matches_gold_offsets(spark, fixtures, mesh):
    pages, gold_m, _ = fixtures
    docs = extracted_docs(pages)
    got = detect_mentions(docs, gazetteer(mesh, type_col="type"))
    got_set = {
        (r["url"], r["mesh_id"], r["start"], r["end"])
        for r in got.collect()
    }
    gold_set = {
        (r["url"], r["mesh_id"], r["start"], r["end"]) for r in gold_m.collect()
    }
    # every generated mention must be found at its exact char offsets
    missing = gold_set - got_set
    assert not missing, f"missing mentions: {sorted(missing)[:5]}"
    # and nothing hallucinated outside the gold set EXCEPT legitimate
    # sub-term matches of multi-word golds (e.g. 'renal failure' inside
    # 'acute renal failure' never survives longest-match; check none)
    extra = got_set - gold_set
    assert not extra, f"extra mentions: {sorted(extra)[:5]}"


def test_longest_match_wins(spark, mesh):
    df = spark.createDataFrame(
        [("u1", "acute renal failure was observed after lithium use.")],
        "url string, text string",
    )
    got = detect_mentions(df, gazetteer(mesh, type_col="type")).collect()
    by_id = {r["mesh_id"]: r for r in got}
    assert "D010005" in by_id  # acute renal failure (longest)
    assert "D010004" not in by_id  # contained 'renal failure' suppressed
    assert by_id["D010005"]["start"] == 0
    assert by_id["D010005"]["end"] == len("acute renal failure")
    assert "D910001" in by_id  # lithium


def test_punctuation_stripped_offsets(spark, mesh):
    df = spark.createDataFrame(
        [("u1", "tremor, and seizures! were seen.")], "url string, text string"
    )
    got = {r["mesh_id"]: r for r in detect_mentions(df, gazetteer(mesh, type_col="type")).collect()}
    assert got["D010001"]["start"] == 0 and got["D010001"]["end"] == 6
    assert got["D010002"]["start"] == 12 and got["D010002"]["end"] == 20


def test_entity_inventory_last_mention_wins(spark, mesh):
    df = spark.createDataFrame(
        [("u1", "lithium early. later lithium again.")], "url string, text string"
    )
    inv = entity_inventory(detect_mentions(df, gazetteer(mesh, type_col="type")))
    row = inv.where(F.col("mesh_id") == "D910001").first()
    assert len(row["positions"]) == 2
    assert row["rep_text"] == "lithium"
    assert row["type"] == "Chemical"
