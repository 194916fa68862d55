"""Distributed BPE tokenizer training (corpus-scale vocabulary learning).

A training-data platform doesn't just apply tokenizers — it trains them
on the corpus it curates (Sennrich et al. 2016).  The BPE loop is:

  1. tokenize every word into characters;
  2. count adjacent symbol pairs over the corpus (weighted by word
     frequency);
  3. merge the most frequent pair everywhere; repeat K times.

Scale shape: step 2 is ONE explode + groupBy per round over the
distinct-WORD dimension (the Zipf trick — the corpus collapses to
(word, freq) once, and every later round works on vocabulary-sized
data).  Step 3 is a pure JVM higher-order fold (F.aggregate) over the
symbol arrays — no Python in the loop.  The driver carries only the
winning pair per round (a few bytes); per-round localCheckpoint keeps
lineage flat exactly like connected_components.

Determinism: ties on count break by lexicographically smallest (a, b)
pair — reference BPE implementations use dict order; a distributed
trainer must pin this, and the literal-port parity tests use the same
rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the corpus collapsed to its Zipf dimension."""
    return (
        docs.select(F.explode(F.split(F.lower(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def to_symbols(words: DataFrame) -> DataFrame:
    """(word, freq, syms array<string>) — initial character symbols
    with the </w> end-of-word marker on the last character."""
    chars = F.split(F.col("word"), "")
    n = F.size(chars)
    syms = F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit("</w>"))),
    )
    return words.select("word", "freq", syms.alias("syms"))


def pair_counts(symbols: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-pair counts weighted by word frequency —
    one zip of two shifted views + explode + groupBy."""
    m = F.size("syms") - 1
    pairs = F.zip_with(
        F.slice("syms", 1, m),
        F.slice("syms", 2, m),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    return (
        symbols.where(F.size("syms") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def apply_merge(symbols: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every left-to-right non-overlapping (a, b) occurrence into
    the symbol a+b — a JVM-side fold over the array (F.aggregate), no
    Python.  Left-to-right: 'a a a' with merge (a,a) becomes
    '(aa) a', matching the sequential reference scan."""
    merged = F.lit(a + b)
    folded = F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return symbols.select("word", "freq", folded.alias("syms"))


def train_bpe(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn n_merges BPE merges over the corpus.

    Returns (merges in order, final symbol table).  Stops early when no
    pair remains.  The driver holds one (a, b, cnt) row per round —
    never corpus data."""
    symbols = to_symbols(word_freqs(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(symbols)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .head(1)
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        symbols = apply_merge(symbols, a, b).localCheckpoint()
    return merges, symbols


def segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges to one word (inference-side helper; pure
    Python, mirrors apply_merge's left-to-right scan)."""
    syms = list(word[:-1]) + [word[-1] + "</w>"] if word else []
    for a, b in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms
