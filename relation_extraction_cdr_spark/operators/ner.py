"""NER-path featurization (SURVEY §3.2; reference extract_ner_sample,
cdr_dataset.py:378-447): the mention-type classifier's input rows.

Semantics reproduced:
- ALL entity mentions of the document are marker-wrapped, sorted by
  start and inserted in REVERSE order so earlier offsets stay valid
  (W1/W2, cdr_dataset.py:395-400)
- tokenize the whole marked document
- truncate to 512 ids, then cut BACK to just after the last ``[/e]``
  marker id inside the window (W5, cdr_dataset.py:407-411) — a
  candidate span must never be half-truncated
- one output row per marked span: the position of the span's FIRST
  inner token + the type label Chemical=0 / Disease=1
  (cdr_dataset.py:439-445)

Execution: one narrow mapInPandas over (url, text, mentions array).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.tokenize import E_END_ID, E_START_ID, encode

NER_SCHEMA = (
    "url string, token_ids array<int>, entity_token_idx array<int>, "
    "labels array<int>"
)

TYPE_LABELS = {"Chemical": 0, "Disease": 1}


def ner_featurize_py(text: str, mentions: list[dict], max_len: int = 512) -> dict | None:
    """mentions: [{'start','end','type'}]; returns token_ids +
    per-marked-span first-token index + type labels."""
    ms = sorted(mentions, key=lambda m: int(m["start"]))
    t = text
    for m in reversed(ms):
        s, e = int(m["start"]), int(m["end"])
        t = t[:s] + " [E] " + t[s:e] + " [/E] " + t[e:]
    ids = encode(t)
    if len(ids) > max_len:
        ids = ids[:max_len]
        # cut back to just after the last [/e] in the window (W5)
        last_end = -1
        for i, x in enumerate(ids):
            if x == E_END_ID:
                last_end = i
        if last_end < 0:
            return None
        ids = ids[: last_end + 1]
    token_idx: list[int] = []
    labels: list[int] = []
    span = 0
    i = 0
    while i < len(ids):
        if ids[i] == E_START_ID and i + 1 < len(ids):
            token_idx.append(i + 1)  # first inner token of the span
            labels.append(TYPE_LABELS.get(ms[span]["type"], -1) if span < len(ms) else -1)
            span += 1
        i += 1
    if not token_idx:
        return None
    return dict(token_ids=ids, entity_token_idx=token_idx, labels=labels)


def ner_features(docs_with_mentions: DataFrame, max_len: int = 512) -> DataFrame:
    """Input: (url, text, mentions array<struct<start,end,type>>);
    output: NER_SCHEMA rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "token_ids", "entity_token_idx", "labels"]
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                feat = ner_featurize_py(
                    r.text,
                    [dict(start=m["start"], end=m["end"], type=m["type"]) for m in r.mentions],
                    max_len=max_len,
                )
                if feat is not None:
                    out.append({"url": r.url, **feat})
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return docs_with_mentions.mapInPandas(run, schema=NER_SCHEMA)


def docs_with_mentions(docs: DataFrame, mentions: DataFrame) -> DataFrame:
    """Join helper: one row per doc with its mention array."""
    agg = mentions.groupBy("url").agg(
        F.array_sort(F.collect_list(F.struct("start", "end", "type"))).alias("mentions")
    )
    return docs.join(agg, "url")
