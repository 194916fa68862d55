"""Distributed BPE training vs a literal single-process reference
implementation (Sennrich et al. 2016 learn_bpe shape): identical merge
sequences, identical final segmentations."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from relation_extraction_cdr_spark.operators import bpe as B


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Plain-Python BPE trainer with the same (count desc, pair lex asc)
    tie-break — the oracle the distributed trainer must match."""
    vocab = {
        tuple(list(w[:-1]) + [w[-1] + "</w>"]): f for w, f in word_freqs.items() if w
    }
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, vocab


CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "wider wide wide low"),
]


def _freqs(rows):
    c: Counter = Counter()
    for _, text in rows:
        for w in text.lower().split(" "):
            if w:
                c[w] += 1
    return dict(c)


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, symbols = B.train_bpe(docs, n_merges=8)
    ref_merges, _ = _reference_bpe(_freqs(CORPUS), 8)
    assert merges == ref_merges
    # final distributed symbol table == reference segmentation per word
    got = {r["word"]: tuple(r["syms"]) for r in symbols.collect()}
    for w in got:
        assert got[w] == tuple(B.segment_word(w, merges)), w


def test_segment_word_mirrors_apply_merge(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, symbols = B.train_bpe(docs, n_merges=5)
    got = {r["word"]: list(r["syms"]) for r in symbols.collect()}
    for w, syms in got.items():
        assert B.segment_word(w, merges) == syms


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=6), min_size=1, max_size=12
    )
)
def test_train_bpe_property(spark, words):
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    merges, _ = B.train_bpe(docs, n_merges=4)
    ref_merges, _ = _reference_bpe(_freqs([(0, " ".join(words))]), 4)
    assert merges == ref_merges


def test_train_bpe_empty_corpus(spark):
    docs = spark.createDataFrame([(0, "")], "doc_id long, text string")
    merges, symbols = B.train_bpe(docs, n_merges=3)
    assert merges == [] and symbols.count() == 0
