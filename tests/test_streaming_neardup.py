"""Streaming MinHash-LSH near-dup on ingest vs the batch operators.

Two agreement surfaces: (1) the per-row Python kernel must produce
byte-identical band hashes to the batch word_shingles →
minhash_signatures → band chain; (2) the stateful stream's flagged
documents must equal the greater-id side of batch lsh_candidate_pairs
on the same corpus."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from relation_extraction_cdr_spark.operators import dedup as DD
from relation_extraction_cdr_spark.streaming.neardup import (
    band_hashes,
    neardup_on_ingest,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog yesterday"),  # near dup of 1
    (4, "completely different content about spark query planners here"),
    (5, "completely different content about spark query planners here"),  # dup of 4
    (6, "an unrelated sentence with no overlap whatsoever in it"),
    (7, "xy"),  # < 3 tokens: no shingles, no bands
    # JVM-parity trap:   is whitespace to Python but NOT to Java
    # regex \s — the kernel must keep "over the" as ONE token like
    # the batch operator does
    (8, "words split around over the strange nbsp token here"),
]


def _batch_band_rows(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    sigs = DD.minhash_signatures(DD.word_shingles(docs), k=8)
    r = 2
    return (
        sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.md5(F.concat_ws("|", F.slice(F.col("sig"), b * r + 1, r)))
                        for b in range(4)
                    ]
                )
            ).alias("band_hash"),
        )
        .collect()
    )


def test_kernel_matches_batch_band_hashes(spark):
    batch = {}
    for row in _batch_band_rows(spark):
        batch.setdefault(row["doc_id"], []).append(row["band_hash"])
    for doc_id, text in DOCS:
        assert band_hashes(text) == batch.get(doc_id, []), doc_id


def test_stream_flags_match_batch_lsh_pairs(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    docs.coalesce(1).write.parquet(in_dir)

    stream = spark.readStream.schema(docs.schema).parquet(in_dir)
    q = (
        neardup_on_ingest(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.read.parquet(out_dir).collect()
    flagged = {r["doc_id"] for r in rows if r["first_doc"] != r["doc_id"]}
    owners = {r["doc_id"] for r in rows if r["first_doc"] == r["doc_id"]}

    sigs = DD.minhash_signatures(DD.word_shingles(docs), k=8)
    pairs = DD.lsh_candidate_pairs(sigs, bands=4, sig_len=8).collect()
    batch_flagged = {p["b"] for p in pairs}

    assert flagged == batch_flagged  # {2, 3, 5} on this corpus
    assert flagged == {2, 3, 5}
    assert 1 in owners and 4 in owners and 6 in owners
    assert all(r["doc_id"] != 7 for r in rows)  # no bands for tiny doc


def test_k_bands_divisibility_guard(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="not divisible"):
        neardup_on_ingest(docs, k=8, bands=3)


def test_state_survives_restart_across_runs(spark, tmp_path):
    """Bucket ownership must persist in the state store across SEPARATE
    availableNow runs sharing a checkpoint: a batch-2 duplicate of a
    batch-1 document is flagged with the batch-1 owner after a full
    query restart (crash/resume semantics of the ingest dedup)."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"

    def run_batch(rows, fname):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).parquet(str(in_dir))
        q = (
            neardup_on_ingest(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    text = "the quick brown fox jumps over the lazy dog tonight"
    run_batch([(1, text)], "b1")
    run_batch([(2, text)], "b2")  # fresh query instance, same checkpoint

    rows = spark.read.parquet(out_dir).collect()
    owners = {r["doc_id"]: r["first_doc"] for r in rows}
    assert owners[1] == 1
    assert owners[2] == 1  # batch-1 ownership recovered from state store
