"""TACRED JSON source (SURVEY §2.1 S11; reference
data_loaders/tacred_dataset.py:105-124 json.load of a sample list).

Spark: spark.read.json with multiLine (TACRED ships one JSON array)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_tacred(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.option("multiLine", True).json(path)
    cols = df.columns
    keep = [c for c in ("id", "relation", "token", "subj_start", "subj_end",
                        "obj_start", "obj_end", "subj_type", "obj_type") if c in cols]
    out = df.select(*keep)
    if "token" in keep:
        out = out.withColumn("text", F.array_join("token", " "))
    return out


def tacred_spans(rows: DataFrame) -> DataFrame:
    """Span-to-mention extraction over TACRED rows (token array +
    inclusive subj/obj index spans, tacred_dataset.py:105-124): adds
    subj_mention / obj_mention (space-joined inclusive token slices, the
    format the reference reconstructs text with) and n_tokens."""
    def sl(start_col: str, end_col: str):
        return F.array_join(
            F.slice(
                F.col("token"),
                F.col(start_col) + 1,
                F.col(end_col) - F.col(start_col) + 1,
            ),
            " ",
        )

    return rows.select(
        "*",
        sl("subj_start", "subj_end").alias("subj_mention"),
        sl("obj_start", "obj_end").alias("obj_mention"),
        F.size("token").alias("n_tokens"),
    )
