"""Gazetteer-based mention detection (SURVEY §2.3 J8 + §2.5 W6).

Reference behavior: convert_alps_to_cdr.py:65-88 scans document text
left-to-right matching the LONGEST gazetteer surface at each offset
(entities sorted by length desc at :65), emitting (start, end, term, id)
mention rows.  The CDR path consumes equivalent mention rows from the
PubTator file (cdr_dataset.py:60-66).

Spark-first design (no per-row Python, one narrow pass + one per-doc
window):

1. ``tokens_with_offsets``: a single ``F.aggregate`` fold over
   ``split(text, ' ')`` builds ``array<struct<clean,cstart,cend>>`` with
   punctuation-stripped token forms and their char offsets — one JVM pass,
   no shuffle, no O(n^2).
2. n-gram candidate surfaces for n=1..max_term_words via window ``lead``
   over (url, token_idx) — max_term_words is derived from the gazetteer
   (a handful), so this is a constant small fan-out.
3. broadcast equi-join candidate surface == gazetteer term (the MeSH
   gazetteer is always broadcast — BASELINE north_star).
4. longest-match-wins overlap resolution: interval scheduling via a
   running ``max(end)`` window ordered by (start asc, length desc)
   — reproduces the reference's greedy left-to-right longest-match scan
   (matches consumed by an earlier kept match are dropped).

Scale: the only shuffle is the hash partition by url for the window —
unavoidable for per-doc ordering and well-distributed (url is unique).
At 100 TB the gazetteer join stays map-side (broadcast); AQE handles any
residual skew from pathologically long documents.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

_TOK_SCHEMA = ArrayType(
    StructType(
        [
            StructField("clean", StringType()),
            StructField("cstart", IntegerType()),
            StructField("cend", IntegerType()),
        ]
    )
)


def tokens_with_offsets(text_col) -> "F.Column":
    """array<struct<clean,cstart,cend>> — one aggregate fold, JVM-side.

    clean = token with leading/trailing non-alnum stripped;
    cstart/cend = char offsets of the clean form in the original text.
    """
    tok = F.split(text_col, " ")
    zero = F.struct(
        F.lit(0).alias("off"),
        F.array().cast(_TOK_SCHEMA).alias("arr"),
    )

    def step(acc, t):
        lead_stripped = F.regexp_replace(t, r"^[^a-z0-9]+", "")
        clean = F.regexp_replace(lead_stripped, r"[^a-z0-9]+$", "")
        cstart = acc.off + (F.length(t) - F.length(lead_stripped))
        return F.struct(
            (acc.off + F.length(t) + 1).alias("off"),
            F.array_append(
                acc.arr,
                F.struct(
                    clean.alias("clean"),
                    cstart.cast("int").alias("cstart"),
                    (cstart + F.length(clean)).cast("int").alias("cend"),
                ),
            ).alias("arr"),
        )

    return F.aggregate(tok, zero, step, lambda acc: acc.arr)


def detect_mentions(
    pages: DataFrame,
    gazetteer: DataFrame,
    text_col: str = "text",
    key_col: str = "url",
    max_term_words: int | None = None,
) -> DataFrame:
    """mentions(url, mesh_id, mention_text, type, start, end).

    ``gazetteer``: (term, mesh_id, type) — lowercase surfaces; broadcast.
    """
    if max_term_words is None:
        max_term_words = (
            gazetteer.select(F.max(F.size(F.split("term", " "))).alias("m")).first()["m"]
        ) or 1

    toks = pages.select(
        F.col(key_col).alias("url"),
        F.posexplode(tokens_with_offsets(F.col(text_col))).alias("i", "tok"),
    ).select("url", "i", "tok.clean", "tok.cstart", "tok.cend")

    # materialize the lead columns first (window exprs are not allowed
    # inside a generator), then assemble n-gram structs from plain columns
    w = Window.partitionBy("url").orderBy("i")
    lead_cols = []
    for k in range(1, max_term_words):
        lead_cols.append(F.lead("clean", k).over(w).alias(f"clean_{k}"))
        lead_cols.append(F.lead("cend", k).over(w).alias(f"cend_{k}"))
    toks = toks.select("url", "clean", "cstart", "cend", *lead_cols)

    grams = []
    for n in range(1, max_term_words + 1):
        parts = [F.col("clean")] + [F.col(f"clean_{k}") for k in range(1, n)]
        end_n = F.col("cend") if n == 1 else F.col(f"cend_{n-1}")
        grams.append(
            F.struct(
                F.concat_ws(" ", *parts).alias("surface"),
                F.col("cstart").alias("start"),
                end_n.alias("end"),
            )
        )
    cands = (
        toks.select("url", F.explode(F.array(*grams)).alias("g"))
        .select("url", "g.surface", "g.start", "g.end")
        .where(F.col("end").isNotNull() & (F.col("surface") != ""))
    )

    matched = cands.join(
        F.broadcast(gazetteer), cands.surface == gazetteer.term, "inner"
    ).select(
        "url",
        "mesh_id",
        F.col("surface").alias("mention_text"),
        "type",
        "start",
        "end",
    )

    # longest-match-wins greedy: order by (start, longest first); keep a
    # match iff it starts at/after the furthest end seen so far
    order = Window.partitionBy("url").orderBy(
        F.col("start").asc(), (F.col("end") - F.col("start")).desc(), F.col("mesh_id")
    )
    prev_max_end = F.max("end").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        matched.withColumn("_pme", prev_max_end)
        .where(F.col("_pme").isNull() | (F.col("start") >= F.col("_pme")))
        .drop("_pme")
    )


def entity_inventory(mentions: DataFrame) -> DataFrame:
    """Per-doc entity inventory (SURVEY §1.2, cdr_dataset.py:54-75):
    positions list + representative surface (LAST mention in document
    order wins — dict-overwrite semantics) + type."""
    return mentions.groupBy("url", "mesh_id").agg(
        F.array_sort(F.collect_list(F.struct("start", "end"))).alias("positions"),
        F.max_by("mention_text", "start").alias("rep_text"),
        F.first("type").alias("type"),
    )
