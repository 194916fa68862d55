"""MeSH hierarchy dimension source (SURVEY §2.1 S3, §1.3).

Reference: data_loaders/2017MeshTree.txt — header + TSV rows
``tree_number \t mesh_id \t term`` loaded into a mesh_id→[tree_number]
multimap at cdr_dataset.py:22-34.

Spark design: one small dimension DataFrame, ALWAYS broadcast
(BASELINE north_star: "broadcast joins for the MeSH gazetteer").  At
58k rows it is a few MB — broadcasting removes the shuffle from every
join that touches it, which at 100 TB fact scale is the difference
between a map-side join and a full-cluster exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_mesh_tree(spark: SparkSession, path: str) -> DataFrame:
    """mesh_tree(tree_number, mesh_id, term, ...) from the TSV (header
    row skipped via option).

    The first three columns are renamed positionally; any extra columns
    (e.g. the fixture tables' explicit ``type`` column, consumed via
    ``--mesh-type-col``) pass through — a fixed 3-name toDF would refuse
    the 4-column fixture shape outright."""
    df = spark.read.option("sep", "\t").option("header", True).csv(path)
    if len(df.columns) < 3:
        raise ValueError(
            f"mesh tree TSV needs >= 3 columns (tree_number, mesh_id, term); "
            f"got {df.columns}"
        )
    for old, new in zip(df.columns[:3], ("tree_number", "mesh_id", "term")):
        df = df.withColumnRenamed(old, new)
    return df


def tree_multimap(mesh_tree: DataFrame) -> DataFrame:
    """mesh_id -> collect_list(tree_number)  (cdr_dataset.py:29-31, A2)."""
    return mesh_tree.groupBy("mesh_id").agg(
        F.collect_list("tree_number").alias("tree_numbers")
    )


def gazetteer(mesh_tree: DataFrame, type_col: str | None = None) -> DataFrame:
    """Entity-linking gazetteer: lowercase surface term -> mesh_id.

    ``type_col``: fixtures carry an explicit Chemical/Disease type column;
    the real 2017 MeSH tree derives type from the tree-number letter
    (D* branch = chemicals/drugs, C* branch = diseases).
    """
    typ = (
        F.col(type_col)
        if type_col
        else F.when(F.col("tree_number").startswith("D"), "Chemical").otherwise(
            F.when(F.col("tree_number").startswith("C"), "Disease")
        )
    )
    return (
        mesh_tree.select(
            F.lower(F.col("term")).alias("term"),
            F.col("mesh_id"),
            typ.alias("type"),
        )
        .where(F.col("type").isNotNull())
        .distinct()
    )
