"""Streaming near-duplicate detection on ingest (MinHash-LSH + state).

Batch dedup (operators/dedup.py) pairs documents AFTER the corpus
lands; a crawl ingest pipeline wants the verdict per document AS IT
ARRIVES.  This module runs the exact batch MinHash-LSH contract
incrementally:

- ``band_hashes`` is a pure-Python transcription of the batch kernel
  chain ``word_shingles → minhash_signatures → lsh band hashes``
  (same ``\\s+`` split, same ``seed{g}|shingle`` md5 lanes, same
  lexicographic-min, same ``md5(concat_ws('|', band slice))``) —
  byte-identical band hashes, asserted against the batch operators in
  tests/test_streaming_neardup.py;
- ``neardup_on_ingest`` computes band hashes stateless per document
  (Arrow-batched scalar UDF), explodes them, and runs a stateful
  first-owner registry keyed by band_hash (applyInPandasWithState,
  ONE long of state per occupied bucket): the first document to claim
  a bucket owns it; every later document sharing the bucket is emitted
  with the owner id.  A document is a near-dup candidate iff any of its
  rows has ``first_doc != doc_id`` — exactly the docs that appear as
  the greater id in batch ``lsh_candidate_pairs`` when arrival order is
  doc_id order (ties inside one micro-batch resolve to the min doc_id,
  making replays deterministic).

State is O(occupied band buckets) longs — the streaming-state analog of
the batch band equi-join, and the reason this holds at crawl scale:
nothing ever pairs all documents, state lookups are per-bucket.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# JVM-parity whitespace: Spark's trim() strips chars <= U+0020 and Java
# regex \s is ASCII-only by default, while Python's str.strip()/\s are
# Unicode-wide — match the batch operators' JVM semantics exactly
_JTRIM_CHARS = "".join(map(chr, range(0x21)))
_WS = re.compile(r"[ \t\n\x0b\f\r]+")

BAND_OUTPUT_SCHEMA = "band_hash string, doc_id long, first_doc long"
BAND_STATE_SCHEMA = "first_doc long"


def band_hashes(text: str, k: int = 8, bands: int = 4, n: int = 3) -> list[str]:
    """LSH band hashes of one document — the batch operators' contract,
    per row.  Documents with fewer than n tokens produce no shingles and
    therefore no bands (the batch path drops them from signatures the
    same way)."""
    stripped = text.strip(_JTRIM_CHARS)
    toks = _WS.split(stripped.lower()) if stripped else []
    if len(toks) < n:
        return []
    grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    groups = (k + 3) // 4
    sig: list[str] = []
    digests = [
        [hashlib.md5(f"seed{g}|{s}".encode()).hexdigest() for s in grams]
        for g in range(groups)
    ]
    for i in range(k):
        lane = (i % 4) * 8
        sig.append(min(d[lane : lane + 8] for d in digests[i // 4]))
    r = k // bands
    return [
        hashlib.md5("|".join(sig[b * r : (b + 1) * r]).encode()).hexdigest()
        for b in range(bands)
    ]


def neardup_on_ingest(
    docs: DataFrame, k: int = 8, bands: int = 4, n: int = 3
) -> DataFrame:
    """(doc_id, text) stream -> (band_hash, doc_id, first_doc) rows.

    Downstream verdict: doc is a near-dup candidate iff ANY of its rows
    has first_doc != doc_id (then verify with exact Jaccard against
    first_doc, exactly like the batch two-phase q56 path).
    """
    if k % bands:
        raise ValueError(f"k={k} not divisible by bands={bands}")

    @F.pandas_udf("array<string>")
    def _bh(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: band_hashes(t or "", k, bands, n))

    banded = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(_bh(F.col("text"))).alias("band_hash"),
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (band_hash,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        rows = pd.concat(list(pdfs))
        # deterministic intra-batch order: the smallest doc_id claims a
        # virgin bucket, so replays and repartitions agree
        doc_ids = sorted(int(d) for d in rows["doc_id"])
        (first,) = state.get if state.exists else (None,)
        out = []
        for d in doc_ids:
            if first is None:
                first = d
            out.append((band_hash, d, first))
        state.update((first,))
        yield pd.DataFrame(out, columns=["band_hash", "doc_id", "first_doc"])

    return banded.groupBy("band_hash").applyInPandasWithState(
        update,
        outputStructType=BAND_OUTPUT_SCHEMA,
        stateStructType=BAND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
