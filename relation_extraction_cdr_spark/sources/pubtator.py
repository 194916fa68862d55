"""PubTator block-file source and sink (SURVEY §2.1 S1/S2/S9).

Reference semantics (/root/reference):
- file scan + blank-line block grouping: cdr_dataset.py:546-556
- abstract parse `docid|a|text`, lowercased: cdr_dataset.py:41-44
- mention rows tab-split (docid, start, end, text, type, mesh_id):
  cdr_dataset.py:60-66; drop mesh_id == '-1' (cdr_dataset.py:56) and
  composite ids containing '|' (cdr_dataset.py:58,67)
- relation rows `docid  CID  chem  dis`: cdr_dataset.py:77-83; endpoints
  must exist in the surviving entity set (cdr_dataset.py:81).
  (The reference's ca_list filter at cdr_dataset.py:46 excludes CID lines
  from its own relation scan — an evident bug that would make every gold
  set empty; we implement the documented intent: CID lines ARE the
  relation rows.)

Distributed shape: PubTator files are read one-row-per-file
(``wholetext``) and split into per-document rows by a pandas UDF — the
file is the natural parallel unit; at Common-Crawl scale documents arrive
one-per-row in Iceberg/parquet and this source is only used for golden
fixtures and format interchange.  All downstream parsing (line
classification, tab splits, filters) is pure JVM column expressions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, StringType

# one output row per (doc) with the raw block lines kept as an array
_BLOCKS_SCHEMA = ArrayType(ArrayType(StringType()))


@F.pandas_udf(_BLOCKS_SCHEMA)
def _split_blocks_udf(contents: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Group a whole file's lines into blank-line separated blocks
    (cdr_dataset.py:546-556 semantics: a block is the run of non-empty
    lines between blank lines)."""

    def split(content: str) -> list[list[str]]:
        blocks: list[list[str]] = []
        cur: list[str] = []
        for line in content.split("\n"):
            if line.strip() == "":
                if cur:
                    blocks.append(cur)
                    cur = []
            else:
                cur.append(line)
        if cur:
            blocks.append(cur)
        return blocks

    for batch in contents:
        yield batch.map(split)


def read_pubtator(spark: SparkSession, path: str) -> DataFrame:
    """Read PubTator file(s) → one row per line with (file, block) keys.

    Returns columns: ``doc_lines array<string>`` exploded to
    (file, doc_idx, lines).
    """
    raw = spark.read.text(path, wholetext=True).withColumn(
        "file", F.input_file_name()
    )
    blocks = raw.select(
        "file", F.posexplode(_split_blocks_udf(F.col("value"))).alias("doc_idx", "lines")
    )
    return blocks


def parse_documents(blocks: DataFrame) -> DataFrame:
    """docs(doc_id, text): abstract line `docid|a|text`, text lowercased
    (cdr_dataset.py:41-44 keeps the LAST `|`-field of the `|a|` line).
    Title lines (`|t|`) are ignored by the reference's CDR path — the
    sample uses only the abstract payload (cdr_dataset.py:41-43)."""
    lines = blocks.select(F.explode("lines").alias("line"))
    abstracts = lines.where(F.col("line").like("%|a|%"))
    return abstracts.select(
        F.split("line", r"\|").getItem(0).alias("doc_id"),
        F.lower(F.element_at(F.split("line", r"\|"), -1)).alias("text"),
    )


def _classified_lines(blocks: DataFrame) -> DataFrame:
    lines = blocks.select(F.explode("lines").alias("line")).where(
        ~F.col("line").contains("|t|") & ~F.col("line").contains("|a|")
    )
    fields = F.split(F.regexp_replace("line", r"\n", ""), "\t")
    # line kind per cdr_dataset.py:45-46: whitespace-token[1] == 'cid'
    # marks a relation row; anything else with >= 6 tab fields is a mention
    return lines.select(
        fields.alias("f"),
        F.lower(F.element_at(F.split(F.trim("line"), r"\s+"), 2)).alias("tok1"),
    )


def parse_mentions(blocks: DataFrame) -> DataFrame:
    """mentions(doc_id, start, end, mention_text, type, mesh_id).

    Filters P3/P4 (cdr_dataset.py:56,67): mesh_id != '-1', no composite
    '|' ids.  mention_text lowercased per cdr_dataset.py:73.
    """
    rows = _classified_lines(blocks).where(F.col("tok1") != "cid")
    return (
        rows.where(F.size("f") >= 6)
        .select(
            F.col("f").getItem(0).alias("doc_id"),
            F.col("f").getItem(1).cast("int").alias("start"),
            F.col("f").getItem(2).cast("int").alias("end"),
            F.lower(F.col("f").getItem(3)).alias("mention_text"),
            F.col("f").getItem(4).alias("type"),
            F.col("f").getItem(5).alias("mesh_id"),
        )
        .where((F.col("mesh_id") != "-1") & ~F.col("mesh_id").contains("|"))
    )


def parse_relations(blocks: DataFrame, mentions: DataFrame) -> DataFrame:
    """gold_relations(doc_id, chem_mesh, dis_mesh) with the endpoint
    semi-joins of cdr_dataset.py:81 (both ids must survive mention
    filtering) and composite-id filter."""
    rows = _classified_lines(blocks).where(F.col("tok1") == "cid")
    rels = rows.select(
        F.col("f").getItem(0).alias("doc_id"),
        F.col("f").getItem(2).alias("chem_mesh"),
        F.col("f").getItem(3).alias("dis_mesh"),
    ).where(~F.col("chem_mesh").contains("|") & ~F.col("dis_mesh").contains("|"))
    ents = mentions.select("doc_id", "mesh_id").distinct()
    return (
        rels.join(
            ents.withColumnRenamed("mesh_id", "chem_mesh"),
            ["doc_id", "chem_mesh"],
            "left_semi",
        )
        .join(
            ents.withColumnRenamed("mesh_id", "dis_mesh"),
            ["doc_id", "dis_mesh"],
            "left_semi",
        )
    )


def pubtator_blocks(docs: DataFrame, mentions: DataFrame, relations: DataFrame) -> DataFrame:
    """Serialized PubTator block per document (S9,
    convert_gda_to_cdr.py:102-113 shape) as a DataFrame(value string) —
    the in-memory form write_pubtator persists, and the input shape the
    block scanner parses back (roundtrip-testable without a filesystem)."""
    doc_lines = docs.select(
        "doc_id", F.concat_ws("|", "doc_id", F.lit("a"), "text").alias("line"), F.lit(0).alias("ord")
    )
    men_lines = mentions.select(
        "doc_id",
        F.concat_ws(
            "\t", "doc_id", F.col("start").cast("string"), F.col("end").cast("string"),
            "mention_text", "type", "mesh_id",
        ).alias("line"),
        F.lit(1).alias("ord"),
    )
    rel_lines = relations.select(
        "doc_id",
        F.concat_ws("\t", "doc_id", F.lit("CID"), "chem_mesh", "dis_mesh").alias("line"),
        F.lit(2).alias("ord"),
    )
    all_lines = doc_lines.unionByName(men_lines).unionByName(rel_lines)
    return (
        all_lines.groupBy("doc_id")
        .agg(F.array_join(F.array_sort(F.collect_list(F.struct("ord", "line"))).line, "\n").alias("block"))
        .orderBy("doc_id")
        .select(F.concat(F.col("block"), F.lit("\n")).alias("value"))
    )


def write_pubtator(docs: DataFrame, mentions: DataFrame, relations: DataFrame, path: str) -> None:
    """PubTator sink: persist the serialized blocks."""
    pubtator_blocks(docs, mentions, relations).coalesce(1).write.mode("overwrite").text(path)
