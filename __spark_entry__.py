"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (CDR triple materialization over the
  sf0.001 documents table).
- ``queries()``: one entry per implemented operator family from
  SURVEY.md §2 plus the training-data-curation extensions (dedup, ANN,
  text analysis) — see relation_extraction_cdr_spark/plans/queries.py.
- ``oracle_sql()``: DuckDB-runnable ANSI SQL equivalents (column names
  and values match the Spark results exactly; doubles are stabilized
  through DECIMAL so value hashes cannot drift on summation order).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from relation_extraction_cdr_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deduplicated (chemical, CID:induces, disease) triple
    table with per-pair document support over sf0.001 documents."""
    return QUERIES["q30_cdr_triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
