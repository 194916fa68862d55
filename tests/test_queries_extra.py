"""Semantic checks beyond oracle hash-parity for round-2 queries."""

from __future__ import annotations

import math

from relation_extraction_cdr_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.01"


def test_hll_estimate_within_error_envelope(spark):
    """The q69 register sketch must actually estimate: reconstructing
    the HLL estimate from the exact S2 mass lands within the m=256
    error envelope (1.04/sqrt(256) = 6.5% standard error; assert 3x)
    of the true per-group distinct count, with the standard
    linear-counting correction in the small range."""
    rows = {r["event_type"]: r for r in QUERIES["q69_hll_registers"](spark, SF_DIR).collect()}
    truth = {
        r["event_type"]: r["n"]
        for r in spark.sql(
            "SELECT event_type, COUNT(DISTINCT user_id) AS n FROM events GROUP BY event_type"
        ).collect()
    }
    assert rows.keys() == truth.keys() and rows
    m = 256
    alpha = 0.7213 / (1 + 1.079 / m)
    for et, r in rows.items():
        s = r["s2"] / float(1 << 33)  # exact register mass sum(2^-rho)
        est = alpha * m * m / s
        zeros = m - r["m_used"]
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)  # linear counting small-range fix
        true = truth[et]
        assert abs(est - true) / true <= 3 * 1.04 / math.sqrt(m), (et, est, true)


def test_countmin_never_underestimates(spark):
    """CM property: est >= true for every reported word, and every true
    heavy hitter is reported (no false negatives by construction)."""
    rows = QUERIES["q70_countmin_heavy_hitters"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["est_cnt"] >= r["true_cnt"], r
    true_heavy = {
        r["w"]
        for r in spark.sql(
            "SELECT w, COUNT(*) c FROM (SELECT explode(split(lower(text), ' ')) w "
            "FROM documents) WHERE w <> '' GROUP BY w HAVING COUNT(*) >= 200"
        ).collect()
    }
    reported = {r["word"] for r in rows}
    assert true_heavy <= reported


def test_round2_queries_survive_empty_corpus(spark, tmp_path):
    """Every round-2 query must return an empty frame (not crash) on a
    schema-only corpus — the degenerate case of an all-filtered
    partition slice."""
    import os

    d = str(tmp_path)
    for name in ("documents", "events", "lineitem", "supplier", "orders"):
        src = spark.read.parquet(f"/root/testdata/sf0.001/{name}.parquet")
        src.limit(0).write.parquet(os.path.join(d, f"{name}.parquet"))
    for q in [
        "q61_sentencepiece", "q62_repetition_signals", "q63_corpus_token_counts",
        "q64_token_packing", "q65_pagerank", "q66_word_rank_quality",
        "q67_source_mixture", "q68_neardup_triangles", "q69_hll_registers",
        "q70_countmin_heavy_hitters", "q71_balanced_mixture_sample",
        "q72_lsh_first_owner", "q73_blame_unique_supplier",
    ]:
        assert QUERIES[q](spark, d).count() == 0, q
