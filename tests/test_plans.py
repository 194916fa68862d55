"""Physical-plan audit tests: the plan Catalyst picks for each audited
query must be the plan we'd want on a 1000-executor cluster — broadcast
dimension joins, pushed scan filters, map-side combines, no cartesian
products. A regression here is a scale bug even when results stay
correct."""

from __future__ import annotations

import pytest

from relation_extraction_cdr_spark.plans.audit import (
    EXPECTATIONS,
    audit_query,
    plan_facts,
)
from relation_extraction_cdr_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_audited_plan(spark, name):
    violations = audit_query(name, QUERIES[name](spark, SF_DIR))
    assert not violations, "; ".join(violations)


def test_no_cartesian_anywhere(spark):
    """Global invariant: no query's plan contains a cartesian product."""
    bad = {}
    for name, fn in QUERIES.items():
        facts = plan_facts(fn(spark, SF_DIR))
        if facts.cartesian_products:
            bad[name] = facts.cartesian_products
    assert not bad, f"cartesian products in: {bad}"


def test_q01_column_pruning(spark):
    """The pricing-summary scan must read only the referenced columns,
    not the full lineitem schema (16 cols)."""
    facts = plan_facts(QUERIES["q01_pricing_summary"](spark, SF_DIR))
    assert facts.read_schemas, "no parquet scan found"
    assert all(n <= 8 for n in facts.scan_columns), facts.read_schemas


def test_doc_family_helpers_are_memoized(spark):
    """Regression: createDataFrame yields a fresh ExistingRDD identity per
    call, so two identically-built helper plans are never canonically
    equal and persisted caches silently stop being shared.  The helpers
    must return the SAME DataFrame object per (app, sf_dir)."""
    from relation_extraction_cdr_spark.plans import queries as Q

    sf = "/root/testdata/sf0.001"
    assert Q._doc_mentions(spark, sf) is Q._doc_mentions(spark, sf)
    assert Q._doc_cooc(spark, sf) is Q._doc_cooc(spark, sf)
    assert Q._doc_gazetteer(spark) is Q._doc_gazetteer(spark)
    assert Q._doc_tree_map(spark) is Q._doc_tree_map(spark)
