"""Structured Streaming variant: availableNow over a parquet landing dir,
exactly-once via Spark checkpointing (SURVEY §2.10)."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from relation_extraction_cdr_spark import datagen
from relation_extraction_cdr_spark.streaming.incremental import stream_pages


def test_stream_available_now(spark, mesh, tmp_path):
    pages, _, _ = datagen.gen_fixture_dfs(spark, 20)
    in_dir = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")
    pages.write.mode("overwrite").parquet(in_dir)

    q = stream_pages(
        spark, in_dir, mesh, out_dir, cp_dir,
        schema=datagen.PAGES_SCHEMA, trigger_once=True,
    )
    q.awaitTermination(120)
    scored = spark.read.parquet(out_dir)
    n1 = scored.count()
    assert n1 > 0
    assert "batch_id" in scored.columns

    # restart with no new files: exactly-once — nothing reprocessed
    q2 = stream_pages(
        spark, in_dir, mesh, out_dir, cp_dir,
        schema=datagen.PAGES_SCHEMA, trigger_once=True,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n1
