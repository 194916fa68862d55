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
