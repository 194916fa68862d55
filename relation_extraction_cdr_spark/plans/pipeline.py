"""The triple factory: pages -> (chemical, CID:induces, disease) triples.

Lifecycle (SURVEY §3.1 Spark equivalent):

    pages --extract_text(JVM)--> docs
          --broadcast gazetteer join--> mentions
          --groupBy inventory / per-doc cross join / Levi anti-join--> pairs
          --mapInPandas--> evidence --mapInPandas--> features
          --salted repartition + mapInPandas scorer--> scored
          --groupBy dedup--> triples + adjacency

Shuffle budget (scale analysis, 100 TB target):
  1. mention window (partition by url)               — unavoidable, keyed
     on the unique url so perfectly spread
  2. inventory groupBy(url, mesh_id)                 — same key family;
     AQE coalesces
  3. pairs equi-join on url                          — co-partitioned with
     (2) so Catalyst reuses the exchange
  4. salted repartition before scoring               — explicit, spreads
     long-doc skew at pair granularity
  5. final triple groupBy(chem, dis)                 — output is tiny
     relative to input (dimension-bounded)
Everything else is narrow.  The gazetteer/tree dimensions are broadcast;
gold joins exist only in eval mode.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import extract_text
from ..operators.candidates import candidate_pairs, label_pairs, levi_filter
from ..operators.evidence import select_evidence
from ..operators.features import featurize
from ..operators.mentions import detect_mentions, entity_inventory
from ..scoring.scorer import score_pairs
from ..sources.mesh import gazetteer, tree_multimap


def extracted_docs(pages: DataFrame, lang: str | None = None) -> DataFrame:
    """docs(url, text): html->text with lowercase normalization —
    byte-identical per url to the reference preprocessing
    (cdr_dataset.py:41-44)."""
    docs = pages.select(
        "url", extract_text(F.col("html"), F.col("text")).alias("text")
    )
    if lang is not None:
        docs = pages.where(F.col("lang") == lang).select(
            "url", extract_text(F.col("html"), F.col("text")).alias("text")
        )
    return docs


def score_candidates(
    pages: DataFrame,
    mesh_tree: DataFrame,
    gold: DataFrame | None = None,
    mesh_type_col: str | None = "type",
    use_levi: bool = True,
    scorer_backend: str = "stub",
    salt_partitions: int | None = None,
) -> DataFrame:
    """pages -> scored pairs (one row per candidate with pred/prob)."""
    docs = extracted_docs(pages)
    gaz = gazetteer(mesh_tree, type_col=mesh_type_col)
    mentions = detect_mentions(docs, gaz)
    inventory = entity_inventory(mentions)
    pairs = candidate_pairs(inventory)
    if gold is not None:
        pairs = label_pairs(pairs, gold)
        if use_levi:
            pairs = levi_filter(pairs, gold, tree_multimap(mesh_tree))
    else:
        pairs = pairs.withColumn("label", F.lit(0))
    with_text = pairs.join(docs, "url")
    evidence = select_evidence(with_text, extract_inter=True)
    features = featurize(evidence)
    if salt_partitions:
        # salted spread of one long document's pairs across executors:
        # the hash key includes the pair so skew splits at pair granularity
        features = features.repartition(
            salt_partitions, F.xxhash64("url", "chem_mesh", "dis_mesh")
        )
    return score_pairs(features, backend=scorer_backend)


def materialize_triples(scored: DataFrame) -> DataFrame:
    """Deduplicated triple table (SURVEY §7 stage 6).

    support = distinct source documents; score = max over evidences.
    The groupBy key is (chem, dis) — dimension-bounded output, so the
    final shuffle is tiny regardless of input scale.
    """
    return (
        scored.where(F.col("pred") == 1)
        .groupBy("chem_mesh", "dis_mesh")
        .agg(
            F.lit("CID:induces").alias("predicate"),
            F.max("prob").alias("score"),
            F.countDistinct("url").alias("support"),
        )
        .select(
            F.col("chem_mesh").alias("subj"),
            "predicate",
            F.col("dis_mesh").alias("obj"),
            "score",
            "support",
        )
    )


def adjacency(triples: DataFrame) -> DataFrame:
    """Adjacency-list graph: subj -> sorted [(obj, score)] (north_star)."""
    return triples.groupBy("subj").agg(
        F.array_sort(F.collect_list(F.struct("obj", "score"))).alias("edges"),
        F.count("*").alias("degree"),
    )


def pr_metrics(pred_triples: DataFrame, gold: DataFrame) -> dict:
    """Document-level P/R/F1 of emitted (url-free) triples vs gold pairs
    (SURVEY §2.4 A7) — pure SQL full-outer aggregate, no sklearn."""
    p = pred_triples.select(
        F.col("subj").alias("chem_mesh"), F.col("obj").alias("dis_mesh")
    ).distinct()
    g = gold.select("chem_mesh", "dis_mesh").distinct()
    joined = p.withColumn("in_pred", F.lit(1)).join(
        g.withColumn("in_gold", F.lit(1)), ["chem_mesh", "dis_mesh"], "full_outer"
    )
    agg = joined.agg(
        F.sum(F.when(F.col("in_pred").isNotNull() & F.col("in_gold").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("in_pred").isNotNull() & F.col("in_gold").isNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("in_pred").isNull() & F.col("in_gold").isNotNull(), 1).otherwise(0)).alias("fn"),
    ).first()
    tp, fp, fn = agg["tp"] or 0, agg["fp"] or 0, agg["fn"] or 0
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall, "f1": f1}
