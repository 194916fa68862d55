"""GDA (gene-disease) auxiliary sources (SURVEY §2.1 S6-S8).

Reference: data_loaders/convert_gda_to_cdr.py —
- abstracts: blocks of [id line, text lines...] separated by blank lines
  (load_abstract, :20-44)
- annotations: whitespace-split mention rows; duplicate (start,end) spans
  resolved by dropping type-conflicting duplicates (load_anns, :47-83)
- labels: CSV (id, geneId, diseaseId, label) (load_labels, :86-99)

Spark mappings: same block splitter as PubTator; dropDuplicates with a
type-priority window; plain csv reads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .pubtator import _split_blocks_udf


def read_gda_abstracts(spark: SparkSession, path: str) -> DataFrame:
    """docs(doc_id, text): first block line is the id, rest joined as text."""
    raw = spark.read.text(path, wholetext=True)
    blocks = raw.select(F.explode(_split_blocks_udf(F.col("value"))).alias("lines"))
    return blocks.select(
        F.element_at("lines", 1).alias("doc_id"),
        F.lower(F.array_join(F.slice("lines", 2, F.size("lines") - 1), " ")).alias("text"),
    )


def resolve_duplicate_spans(rows: DataFrame) -> DataFrame:
    """The S7 duplicate-span resolution of load_anns
    (convert_gda_to_cdr.py:47-83): keep ONE row per (doc_id, start, end),
    Gene rows winning over Disease on a type conflict, entity_id as the
    deterministic tiebreak — a priority row_number window."""
    w = Window.partitionBy("doc_id", "start", "end").orderBy(
        F.when(F.col("type") == "Gene", 0).otherwise(1), F.col("entity_id")
    )
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def read_gda_annotations(spark: SparkSession, path: str) -> DataFrame:
    """mentions(doc_id, start, end, mention_text, type, entity_id) with the
    duplicate-span resolution of load_anns (resolve_duplicate_spans)."""
    rows = (
        spark.read.option("sep", "\t").csv(path)
        .toDF("doc_id", "start", "end", "mention_text", "type", "entity_id")
        .withColumn("start", F.col("start").cast("int"))
        .withColumn("end", F.col("end").cast("int"))
    )
    return resolve_duplicate_spans(rows)


def read_gda_labels(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.option("header", True).csv(path)
        .select(
            F.col("id").alias("doc_id"),
            F.col("geneId").alias("gene_id"),
            F.col("diseaseId").alias("disease_id"),
            F.col("label").cast("int").alias("label"),
        )
    )


def gda_to_cdr(
    abstracts: DataFrame, annotations: DataFrame, labels: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Assemble the CDR-shaped (docs, mentions, relations) frames from
    the GDA scans — the distributed analog of
    convert_gda_to_cdr.write_cdr_file (:102-113); feed the result to
    sources.pubtator.write_pubtator for the file form, or straight into
    the candidate/labeling operators (the gda_trainer workload, which
    runs the CDR pipeline with Gene playing the chemical role).

    Reference quirk reproduced faithfully: write_cdr_file emits EVERY
    label row as a CID relation line, ignoring the label column's value
    (:112-113) — so a (gene, disease, label=0) row still becomes a CID
    line in the converted file.
    """
    docs = abstracts.select("doc_id", "text")
    mentions = annotations.select(
        "doc_id", "start", "end", "mention_text", "type",
        F.col("entity_id").alias("mesh_id"),
    )
    relations = labels.select(
        "doc_id",
        F.col("gene_id").alias("chem_mesh"),
        F.col("disease_id").alias("dis_mesh"),
    )
    return docs, mentions, relations
