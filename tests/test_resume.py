"""Checkpoint/resume at partition granularity (north_star requirement):
kill mid-run, rerun, identical triples, no reprocessing."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from relation_extraction_cdr_spark.plans.pipeline import materialize_triples
from relation_extraction_cdr_spark.streaming.incremental import (
    completed_buckets,
    run_resumable,
)


def test_kill_and_resume_identical(spark, fixtures, mesh, tmp_path):
    pages, _, gold = fixtures
    out1 = str(tmp_path / "full_out")
    cp1 = str(tmp_path / "full_cp")
    full = run_resumable(
        spark, pages, mesh, out1, cp1, run_id="full", n_buckets=4, gold=gold
    )
    full_triples = {
        tuple(r) for r in materialize_triples(full).select("subj", "obj").collect()
    }

    out2 = str(tmp_path / "kill_out")
    cp2 = str(tmp_path / "kill_cp")
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_resumable(
            spark, pages, mesh, out2, cp2, run_id="kill", n_buckets=4,
            fail_after=2, gold=gold,
        )
    done_after_kill = completed_buckets(spark, cp2, "kill", "score")
    assert len(done_after_kill) == 2

    resumed = run_resumable(
        spark, pages, mesh, out2, cp2, run_id="kill", n_buckets=4, gold=gold
    )
    resumed_triples = {
        tuple(r) for r in materialize_triples(resumed).select("subj", "obj").collect()
    }
    assert resumed_triples == full_triples

    # lineage: exactly one checkpoint row per bucket — completed buckets
    # were NOT reprocessed on resume
    cp = spark.read.parquet(cp2)
    per_bucket = cp.groupBy("partition_id").count().collect()
    assert all(r["count"] == 1 for r in per_bucket)
    assert len(per_bucket) == 4
    assert set(cp.columns) >= {
        "run_id", "stage", "partition_id", "url_count", "row_count", "written_at"
    }
