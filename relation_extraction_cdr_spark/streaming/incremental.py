"""Resumable, partition-granular execution with lineage checkpointing
(BASELINE north_star: "every stage writes per-partition lineage rows and
counters to a checkpoint table so a killed job resumes at partition
granularity"; FIXTURES.md §6 schema).

Design: input pages are bucketed by ``pmod(xxhash64(url), n_buckets)``.
Each bucket is one unit of restartable work; its triples land in a
parquet partition ``bucket=<id>`` and a lineage row
(run_id, stage, partition_id, url_count, row_count, written_at) is
appended to the checkpoint table only AFTER the bucket's output commit.
Resume = anti-join pending buckets against the checkpoint — processed
buckets are never recomputed and the final triple table is byte-identical
to an uninterrupted run (pytest-verified).

On a real cluster each bucket is itself a distributed job over many
executors; n_buckets controls restart granularity, not parallelism.
A Structured Streaming variant (`stream_pages`) expresses the same plan
over readStream+foreachBatch for continuously arriving pages with
idempotent per-batch partition overwrites.
"""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

CHECKPOINT_SCHEMA = (
    "run_id string, stage string, partition_id int, url_count long, "
    "row_count long, written_at timestamp"
)


def bucketed(pages: DataFrame, n_buckets: int) -> DataFrame:
    return pages.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )


def completed_buckets(spark: SparkSession, checkpoint_dir: str, run_id: str, stage: str) -> set[int]:
    """Bucket ids with committed lineage rows.  The not-yet-created case
    is detected by attempting the read, NOT os.path.exists — the lineage
    URI is usually remote (hdfs://, s3a://) where a driver-local stat is
    always False and would silently disable resume on a cluster."""
    from pyspark.errors import AnalysisException

    try:
        cp = spark.read.parquet(checkpoint_dir)
    except AnalysisException:
        return set()
    rows = (
        cp.where((F.col("run_id") == run_id) & (F.col("stage") == stage))
        .select("partition_id")
        .distinct()
        .collect()
    )
    return {r["partition_id"] for r in rows}


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    mesh_tree: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    run_id: str = "run1",
    n_buckets: int = 8,
    fail_after: int | None = None,
    **pipeline_kwargs,
) -> DataFrame:
    """Process pages bucket-by-bucket with lineage; returns the scored
    pairs read back from ``out_dir``.

    ``fail_after``: test hook — raise after N buckets to simulate a kill.
    """
    from ..plans.pipeline import score_candidates

    pages_b = bucketed(pages, n_buckets)
    done = completed_buckets(spark, checkpoint_dir, run_id, "score")
    processed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"simulated kill after {processed} buckets")
        part = pages_b.where(F.col("bucket") == b).drop("bucket")
        url_count = part.count()
        scored = score_candidates(part, mesh_tree, **pipeline_kwargs)
        scored.write.mode("overwrite").parquet(os.path.join(out_dir, f"bucket={b}"))
        row_count = spark.read.parquet(os.path.join(out_dir, f"bucket={b}")).count()
        lineage = spark.createDataFrame(
            [(run_id, "score", b, url_count, row_count, datetime.now())],
            CHECKPOINT_SCHEMA,
        )
        lineage.write.mode("append").parquet(checkpoint_dir)
        processed += 1
    return spark.read.parquet(os.path.join(out_dir, "bucket=*"))


def stream_pages(
    spark: SparkSession,
    input_dir: str,
    mesh_tree: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    trigger_once: bool = True,
    dedup_watermark: str | None = None,
    **pipeline_kwargs,
):
    """Structured Streaming variant: continuously arriving page files →
    triples; the batch plan is reused verbatim inside foreachBatch, and
    ``pipeline_kwargs`` forward to score_candidates exactly like
    run_resumable (scorer_backend, salt_partitions, splitter, ...).

    Exactly-once OUTPUT: foreachBatch is an at-least-once contract (a
    crash between the sink write and the checkpoint commit replays the
    batch), so the write is made idempotent — each batch overwrites only
    its own ``batch_id=`` partition (dynamic partition overwrite); a
    replay rewrites identical rows instead of appending duplicates.

    ``dedup_watermark``: when set (e.g. "24 hours"), re-crawled/mirrored
    pages whose text fingerprint was already seen inside the horizon are
    dropped BEFORE extraction — streaming dedup must sit on the stream
    itself (state store), not inside foreachBatch where each batch is an
    isolated batch frame.
    """
    from ..plans.pipeline import score_candidates
    from .windows import stream_dedup

    stream = spark.readStream.schema(schema).parquet(input_dir)
    if dedup_watermark:
        stream = stream_dedup(stream, watermark=dedup_watermark)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # mesh artifacts (gazetteer plan, isEmpty probe, dict collect)
        # are memoized per mesh_tree inside score_candidates, so a
        # long-running stream pays them once, not once per trigger
        scored = score_candidates(batch_df, mesh_tree, **pipeline_kwargs)
        (
            scored.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
