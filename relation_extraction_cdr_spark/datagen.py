"""Deterministic synthetic fixtures (FIXTURES.md): pages, MeSH gazetteer,
gold mentions, gold relations.

Pure function of the seed — same seed → byte-identical tables.  Two
generators:

- ``gen_corpus(seed, n_docs)``: driver-side Python, small scale, returns
  exact gold mention offsets (used by pytest goldens).
- ``gen_pages_df(spark, n_docs, seed)``: fully distributed
  (``spark.range`` + deterministic column arithmetic, no driver
  materialization) — used by bench at 100k+ pages; the same text rule as
  the local generator so gold relations are derivable by rule.

Text synthesis covers the reference's evidence-selection code paths
(SURVEY §5 / FIXTURES §1): intra-sentence <10 tokens apart, ≥10 tokens
apart, 1-3 sentences apart (inter path), >3 apart (dropped), duplicated
sentences (text.find first-occurrence quirk), multi-mention entities, and
a ~50x longer skewed document per 100 docs (salting test).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# MeSH-style dimension fixture (~40 entities with hypernym chains)
# ---------------------------------------------------------------------------
# chemicals: D9xxxxx, diseases D0xxxxx (FIXTURES.md convention).
# Tree numbers contain strict-prefix chains (D030 is a hypernym of
# D030.250 etc.) so the Levi anti-join has positive and negative cases.

CHEMICALS = [
    # (mesh_id, term, tree_number)
    ("D910001", "lithium", "T109.100"),
    ("D910002", "haloperidol", "T109.200"),
    ("D910003", "carbamazepine", "T109.300"),
    ("D910004", "naloxone", "T109.400"),
    ("D910005", "morphine sulfate", "T109.500"),
    ("D910006", "cisplatin", "T109.600"),
    ("D910007", "dexamethasone", "T109.700"),
    ("D910008", "phenytoin", "T109.800"),
]
DISEASES = [
    ("D010001", "tremor", "C010.100"),
    ("D010002", "seizures", "C010.200"),
    ("D010003", "nephrotoxicity", "C010.300"),
    # hypernym chain: renal failure is a hypernym of acute renal failure
    ("D010004", "renal failure", "C010.300.500"),
    ("D010005", "acute renal failure", "C010.300.500.250"),
    ("D010006", "hypotension", "C010.400"),
    ("D010007", "bradycardia", "C010.500"),
    ("D010008", "hearing loss", "C010.600"),
]


def gen_mesh_rows() -> list[tuple]:
    """(tree_number, mesh_id, term, type) rows incl. a homograph term
    mapped to two ids (linking-ambiguity case, FIXTURES §2)."""
    rows = [(t, m, s, "Chemical") for m, s, t in CHEMICALS]
    rows += [(t, m, s, "Disease") for m, s, t in DISEASES]
    # homograph: 'ld50 shock' maps to both a chemical-ish and disease id
    rows.append(("T109.900", "D910009", "toxic shock agent", "Chemical"))
    rows.append(("C010.700", "D010009", "shock", "Disease"))
    return rows


def mesh_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        gen_mesh_rows(), "tree_number string, mesh_id string, term string, type string"
    )


# ---------------------------------------------------------------------------
# sentence templates — index is the behavior contract
# ---------------------------------------------------------------------------
# {C}=chemical surface, {D}=disease surface.  'induces' templates create a
# gold CID relation; others are negative co-occurrences or fillers.
TPL_INDUCES_NEAR = "{C} induced severe {D} in treated rats."  # intra, <10 tokens
TPL_INDUCES_FAR = (
    "{C} administered daily over a very long observation period of many "
    "weeks in several independent animal cohorts eventually induced {D}."
)  # intra, >=10 tokens between mentions
TPL_NEG_NEAR = "{D} was not observed after {C} treatment."  # co-occur, negative
TPL_CHEM_ONLY = "{C} was administered to all patients."
TPL_DIS_ONLY = "{D} was recorded during follow-up."
FILLER = "the cohort was monitored closely."


def _doc_plan(doc_id: int) -> list[tuple[str, int, int, bool]]:
    """Deterministic per-doc sentence plan.

    Returns [(template, chem_idx, dis_idx, is_gold)].  Arithmetic over
    doc_id only — reproducible in distributed SQL too.
    """
    c1 = doc_id % len(CHEMICALS)
    c2 = (doc_id * 3 + 1) % len(CHEMICALS)
    d1 = doc_id % len(DISEASES)
    d2 = (doc_id * 5 + 2) % len(DISEASES)
    variant = doc_id % 6
    if variant == 0:  # intra near → gold
        plan = [(TPL_INDUCES_NEAR, c1, d1, True), (FILLER, -1, -1, False),
                (TPL_NEG_NEAR, c2, d2, False)]
    elif variant == 1:  # intra far → gold
        plan = [(TPL_INDUCES_FAR, c1, d1, True), (TPL_DIS_ONLY, -1, d2, False)]
    elif variant == 2:  # inter, 1 sentence apart → gold pair via adjacency
        plan = [(TPL_CHEM_ONLY, c1, -1, False), (FILLER, -1, -1, False),
                (TPL_DIS_ONLY, -1, d1, False), ("{C} later induced {D}.", c1, d1, True)]
    elif variant == 3:  # >3 sentences apart, never co-occur → no relation
        plan = [(TPL_CHEM_ONLY, c1, -1, False), (FILLER, -1, -1, False),
                (FILLER, -1, -1, False), (FILLER, -1, -1, False),
                (FILLER, -1, -1, False), (TPL_DIS_ONLY, -1, d1, False)]
    elif variant == 4:  # duplicated sentence (text.find quirk) + negative
        plan = [(TPL_NEG_NEAR, c1, d1, False), (FILLER, -1, -1, False),
                (FILLER, -1, -1, False), (TPL_INDUCES_NEAR, c2, d2, True)]
    else:  # multi-mention chemical
        plan = [(TPL_CHEM_ONLY, c1, -1, False), (TPL_INDUCES_NEAR, c1, d1, True)]
    if doc_id % 100 == 99:  # skewed long doc: ~50x filler
        plan = plan + [(FILLER, -1, -1, False)] * 150
    return plan


def gen_corpus(n_docs: int = 20, seed: int = 42):
    """Driver-side generator with exact gold offsets.

    Returns (pages_rows, mention_rows, relation_rows):
      pages:     (url, warc_ts, html, text, lang)
      mentions:  (url, mesh_id, mention_text, type, start, end)
      relations: (url, chem_mesh, dis_mesh)
    Text is ALREADY lowercase-stable (templates are lowercase), matching
    the reference's lowercased document payload (cdr_dataset.py:44).
    """
    pages, mentions, relations = [], [], []
    epoch = datetime(2024, 1, 1, tzinfo=timezone.utc)
    for doc_id in range(n_docs):
        url = f"https://ex{seed}.org/doc/{doc_id}"
        parts: list[str] = []
        offset = 0
        doc_mentions, doc_relations = [], []
        for tpl, ci, di, gold in _doc_plan(doc_id):
            # substitute placeholders left-to-right so recorded offsets are
            # against the final substituted sentence text
            sent = ""
            rest = tpl
            while "{C}" in rest or "{D}" in rest:
                pc, pd_ = rest.find("{C}"), rest.find("{D}")
                if pd_ == -1 or (pc != -1 and pc < pd_):
                    mesh_id, term, _ = CHEMICALS[ci]
                    typ, pos, ph = "Chemical", pc, "{C}"
                else:
                    mesh_id, term, _ = DISEASES[di]
                    typ, pos, ph = "Disease", pd_, "{D}"
                sent += rest[:pos]
                start = offset + len(sent)
                sent += term
                doc_mentions.append((url, mesh_id, term, typ, start, start + len(term)))
                rest = rest[pos + len(ph):]
            sent += rest
            if gold and "{C}" in tpl and "{D}" in tpl:
                doc_relations.append((url, CHEMICALS[ci][0], DISEASES[di][0]))
            parts.append(sent)
            offset += len(sent) + 1  # single-space join
        text = " ".join(parts)
        ts = datetime.fromtimestamp(epoch.timestamp() + doc_id, tz=timezone.utc)
        lang = "ja" if doc_id % 17 == 16 else "en"
        html = b"<html><body><p>" + text.encode() + b"</p></body></html>"
        pages.append((url, ts, html, text, lang))
        mentions.extend(doc_mentions)
        relations.extend(sorted(set(doc_relations)))
    return pages, mentions, relations


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
GOLD_MENTIONS_SCHEMA = (
    "url string, mesh_id string, mention_text string, type string, start int, end int"
)
GOLD_RELATIONS_SCHEMA = "url string, chem_mesh string, dis_mesh string"


def gen_fixture_dfs(spark: SparkSession, n_docs: int = 20, seed: int = 42):
    pages, mentions, relations = gen_corpus(n_docs, seed)
    return (
        spark.createDataFrame(pages, PAGES_SCHEMA),
        spark.createDataFrame(mentions, GOLD_MENTIONS_SCHEMA),
        spark.createDataFrame(relations, GOLD_RELATIONS_SCHEMA),
    )


def gen_pages_df(spark: SparkSession, n_docs: int, seed: int = 42,
                 partitions: int | None = None, doc_scale: int = 1) -> DataFrame:
    """Distributed page generator for bench scale — NO driver-side rows.

    Reuses the same _doc_plan rule via a vectorized pandas UDF over
    ``spark.range`` ids, so text content is identical to gen_corpus for
    the same doc_id (at doc_scale=1).  spark.range is evenly partitioned
    → generation parallelizes linearly with cores.

    ``doc_scale``: repeat the sentence plan K times with rotated entity
    indices — fixture docs are ~40 tokens but real web pages are ~1000;
    bench/scaling runs use doc_scale>1 so per-page compute is realistic
    and the run is compute-bound rather than per-task-overhead-bound.
    """
    @F.pandas_udf(StringType())
    def gen_text(ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in ids:
            parts = []
            for rep in range(doc_scale):
                for tpl, ci, di, _gold in _doc_plan((int(doc_id) + rep * 7919) % (1 << 31)):
                    sent = tpl
                    if "{C}" in sent:
                        sent = sent.replace("{C}", CHEMICALS[(ci + rep) % len(CHEMICALS)][1])
                    if "{D}" in sent:
                        sent = sent.replace("{D}", DISEASES[(di + rep) % len(DISEASES)][1])
                    parts.append(sent)
            out.append(" ".join(parts))
        return pd.Series(out)

    rng = spark.range(n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    # bind the UDF output ONCE and derive html from the bound column with
    # JVM concat/encode — two independent gen_text('id') expressions would
    # each be evaluated, doubling generation CPU per row
    with_text = rng.withColumn("text", gen_text("id"))
    return with_text.select(
        F.concat(F.lit(f"https://ex{seed}.org/doc/"), F.col("id")).alias("url"),
        (F.lit(1704067200) + F.col("id")).cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")),
            "UTF-8",
        ).alias("html"),
        "text",
        F.when(F.col("id") % 17 == 16, "ja").otherwise("en").alias("lang"),
    )
