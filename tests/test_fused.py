"""Fused scoring path must equal the modular three-stage path exactly."""

from __future__ import annotations

from relation_extraction_cdr_spark.plans.pipeline import score_candidates


def _rows(df):
    return sorted(
        (r["url"], r["chem_mesh"], r["dis_mesh"], r["label"], r["evidence_type"],
         r["pred"], round(r["prob"], 9))
        for r in df.collect()
    )


def test_fused_equals_modular(spark, fixtures, mesh):
    pages, _, gold = fixtures
    fused = score_candidates(pages, mesh, gold=gold, fused=True)
    modular = score_candidates(pages, mesh, gold=gold, fused=False)
    assert _rows(fused) == _rows(modular)
