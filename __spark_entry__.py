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


# The driver's correctness gate checks the FIRST 50 entries of queries().
# Round-4 curation (VERDICT r3 item 2): (a) the four round-3 red rows,
# now fixed to exact scaled-integer outputs; (b) every VALUE-ORACLED
# query whose implementation changed this round (q37/q90 codec dispatch,
# PNG Sub vectorization + widened PNG variants, new q93 lifecycle + q94
# JPEG + q95 palette/16-bit/interlaced PNG + q96 sub-byte PNG & JPEG
# restart intervals + q97 progressive JPEG + q98 real AVI video
# frame-sampling); (c) the rotation slice of queries last
# driver-checked in r02 — two rounds stale — q01, q03-q23, q25, q27,
# q31-q36, q39, q42-q47, q49-q50 (39 queries; q02_filter_project
# yields its slot to q98 — its filter+project surface is load-bearing
# inside virtually every in-window query), restoring their gate
# coverage.  The OTHER round-4-changed queries are
# rows-only by design (q86/q88/q91 training/NER loops and q87/q89 — the
# grouped scorer batching), so a driver row adds only rows>0 over the
# pytest bit-exactness pins (test_train layout-independence, test_ner,
# the scorer batched-bit-identical tests) — they and q28-q30/q40/q48/
# q51-q86/q92 rest on green r03 driver rows plus pytest; q90
# (r03-green) yields its window slot to q96, whose in-window paths are
# a strict superset of q90's unfilter/bit-layout kernels (q90 stays
# pinned by test_png_known_bytes + the roundtrip property suite); the
# trained lifecycle is value-gated in-window via q93.  Everything not
# listed still runs (appended in registry order).
DRIVER_WINDOW = [
    # round-3 red rows, fixed (exact ppm/e6 integer ratios)
    "q66_word_rank_quality",
    "q67_source_mixture",
    "q74_ann_recall",
    "q75_crossdoc_passages",
    # round-4 new / implementation-changed (all value-oracled)
    "q93_train_serve_lifecycle",
    "q94_jpeg_decode",
    "q95_png_variants",
    "q96_codec_edges",
    "q97_jpeg_progressive",
    "q98_avi_frames",
    "q37_multimodal_features",
    # rotation slice: last driver-checked in r02 (two rounds stale)
    "q01_pricing_summary",
    "q03_broadcast_join",
    "q04_semi_join",
    "q05_anti_join",
    "q06_pergroup_cross_join",
    "q07_window_topk",
    "q08_dense_rank",
    "q09_min_by",
    "q10_topk_global",
    "q11_union",
    "q12_symmetric_pair_dedup",
    "q13_tagged_split",
    "q14_range_join",
    "q15_asof_join",
    "q16_sessionize",
    "q17_lang_id",
    "q18_quality",
    "q19_token_count",
    "q20_fingerprint",
    "q21_exact_dedup",
    "q22_shingles",
    "q23_minhash",
    "q25_simhash",
    "q27_embed_stats",
    "q31_levi_filter",
    "q32_srp_buckets",
    "q33_cdr_adjacency",
    "q34_hash_split",
    "q35_cooc_histogram",
    "q36_embed_neardup",
    "q39_windowed_counts",
    "q42_neardup_clusters",
    "q43_simhash_hamming",
    "q44_kg_degree",
    "q45_length_quantiles",
    "q46_local_supplier_volume",
    "q47_large_orders",
    "q49_event_gaps",
    "q50_rollup_revenue",
]


def _ordered() -> list[str]:
    head = [n for n in DRIVER_WINDOW if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(head)]
    return head + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLES[n] for n in _ordered() if n in ORACLES}
