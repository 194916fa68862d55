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


# The driver's correctness gate checks the FIRST 50 entries of queries()
# (CORRECTNESS_r02 covered q01-q50 and nothing beyond).  q01-q50 all have
# green r02 driver rows already, so this window surfaces the queries the
# gate has never seen: the KG-analytics / tokenizer / curation / training
# families (q51-q86) and this round's new kernels, topped up with the
# flagship pipeline queries for continuity.  Everything not listed still
# runs (appended in registry order) — the order is the only change.
DRIVER_WINDOW = [
    # round-3 kernels (exact-architecture forwards made load-bearing)
    "q87_fullsample_logits",
    "q88_ner_type_counts",
    "q89_alps_logits",
    "q90_png_decode",
    "q92_wav_decode",
    # KG analytics + distributed training (unseen by the gate in r02)
    "q79_cooc_lift",
    "q80_neardup_bfs",
    "q81_triple_diff",
    "q82_mesh_closure",
    "q83_entity_canonical",
    "q84_triple_provenance",
    "q85_distinctive_terms",
    "q86_head_training",
    "q91_fulltext_training",
    # tokenizers / sources (unseen)
    "q57_wordpiece",
    "q58_gda_roundtrip",
    "q59_gda_pairs",
    "q60_tacred_spans",
    "q61_sentencepiece",
    # curation / dedup / ANN / packing (unseen)
    "q51_boilerplate_strip",
    "q52_decontaminate",
    "q53_time_rollup",
    "q54_bloom_prefilter",
    "q55_stratified_sample",
    "q56_jaccard_lsh_verified",
    "q62_repetition_signals",
    "q63_corpus_token_counts",
    "q64_token_packing",
    "q65_pagerank",
    "q66_word_rank_quality",
    "q67_source_mixture",
    "q68_neardup_triangles",
    "q69_hll_registers",
    "q70_countmin_heavy_hitters",
    "q71_balanced_mixture_sample",
    "q72_lsh_first_owner",
    "q73_blame_unique_supplier",
    "q74_ann_recall",
    "q75_crossdoc_passages",
    "q76_curation_verdicts",
    "q77_below_avg_quantity",
    "q78_bpe_pair_stats",
    # flagship pipeline continuity (r02-green, kept in-window)
    "q30_cdr_triples",
    "q28_cdr_mentions",
    "q29_cdr_candidates",
    "q40_pipeline_triples",
    "q48_ner_features",
    "q37_multimodal_features",
    "q24_jaccard_neardup",
    "q26_ann_cosine_topk",
]


def _ordered() -> list[str]:
    head = [n for n in DRIVER_WINDOW if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(head)]
    return head + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLES[n] for n in _ordered() if n in ORACLES}
