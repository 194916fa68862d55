"""In-UDF python gazetteer matcher must equal the relational operator."""

from __future__ import annotations

import pyspark.sql.functions as F

from relation_extraction_cdr_spark.operators.mentions import (
    detect_mentions,
    detect_mentions_py,
    gazetteer_dict,
)
from relation_extraction_cdr_spark.plans.pipeline import extracted_docs
from relation_extraction_cdr_spark.sources.mesh import gazetteer


def test_python_matcher_equals_relational(spark, fixtures, mesh):
    pages, _, _ = fixtures
    docs = extracted_docs(pages)
    gaz = gazetteer(mesh, type_col="type")
    gd = gazetteer_dict(gaz)
    max_words = max(t.count(" ") + 1 for t in gd)

    relational = {}
    for r in detect_mentions(docs, gaz).collect():
        relational.setdefault(r["url"], set()).add(
            (r["mesh_id"], r["start"], r["end"], r["mention_text"])
        )
    for row in docs.collect():
        got = {
            (m["mesh_id"], m["start"], m["end"], m["mention_text"])
            for m in detect_mentions_py(row["text"], gd, max_words)
        }
        assert got == relational.get(row["url"], set()), row["url"]


def test_python_matcher_on_documents_table(spark):
    """Same check over the driver-provided documents vocabulary (the q28
    gazetteer, incl. the multi-word 'hash join' overlap with 'join')."""
    from relation_extraction_cdr_spark.plans.queries import _GAZ_ROWS

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("url"), F.lower("text").alias("text"))
        .limit(100)
    )
    gaz = spark.createDataFrame(
        [(t, m, ty) for t, m, ty, _ in _GAZ_ROWS], "term string, mesh_id string, type string"
    )
    gd = gazetteer_dict(gaz)
    relational = {}
    for r in detect_mentions(docs, gaz).collect():
        relational.setdefault(r["url"], set()).add((r["mesh_id"], r["start"], r["end"]))
    for row in docs.collect():
        got = {
            (m["mesh_id"], m["start"], m["end"])
            for m in detect_mentions_py(row["text"], gd, 2)
        }
        assert got == relational.get(row["url"], set()), row["url"]
