"""Punkt-equivalent sentence splitting: decision-component goldens.

Each case exercises one decision of the Kiss & Strunk algorithm the
regex splitter could not make (the round-1 fidelity gap): abbreviation
suppression, initials, decimals, ellipsis + ortho correction, and the
unsupervised trainer learning an abbreviation from corpus evidence.
"""

from __future__ import annotations

from relation_extraction_cdr_spark.functions.punkt import (
    PunktSplitter,
    sent_tokenize_punkt,
)


def test_plain_boundaries():
    s = sent_tokenize_punkt("First sentence here. Second one there! A third? Yes.")
    assert s == ["First sentence here.", "Second one there!", "A third?", "Yes."]


def test_abbreviations_do_not_split():
    text = "Dr. Smith treated the patient. The dose was 5 mg."
    assert sent_tokenize_punkt(text) == [
        "Dr. Smith treated the patient.",
        "The dose was 5 mg.",
    ]
    text2 = "Carbamazepine causes tremor, dystonia etc. in some patients."
    assert sent_tokenize_punkt(text2) == [text2]
    text3 = "Effects were dose-dependent (e.g. at 10 mg/kg i.v. doses)."
    assert sent_tokenize_punkt(text3) == [text3]


def test_initials_do_not_split():
    text = "The study by J. Smith and K. Jones was replicated."
    assert sent_tokenize_punkt(text) == [text]


def test_decimals_and_numbers_do_not_split():
    text = "The ratio was 3.5 versus 2.8 in controls."
    assert sent_tokenize_punkt(text) == [text]
    # a number CAN end a sentence when the follower is a known lowercase
    # non-starter... but with a capitalized unknown follower and no
    # orthographic evidence the period after a number stays a boundary
    text2 = "Mortality fell by 0.5. Survival improved."
    out = sent_tokenize_punkt(text2)
    assert out[-1] == "Survival improved."


def test_ellipsis():
    text = "The results were inconclusive... Further work followed."
    out = sent_tokenize_punkt(text)
    # capitalized follower after ellipsis: ortho 'unknown' keeps the
    # first-pass ellipsis (no break) unless evidence says otherwise —
    # text reconstructs either way
    assert " ".join(out) == text


def test_spans_reconstruct_text():
    text = "Dr. Smith gave 2.5 mg. The patient (J. Doe) improved. No relapse occurred."
    sp = PunktSplitter()
    spans = sp.span_tokenize(text)
    assert all(text[s:e] == sent for (s, e), sent in zip(spans, sp.tokenize(text)))
    # spans are ordered, non-overlapping, within bounds
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert s1 < e1 <= s2 < e2 <= len(text)
    # first-occurrence offsets (the reference's text.find(sent) quirk)
    # stay valid: every sentence is findable at its span start
    for (s, e) in spans:
        assert text.find(text[s:e]) <= s


def test_trailing_quote_realignment():
    text = 'He said "stop." Then he left.'
    out = sent_tokenize_punkt(text)
    assert out[0].endswith('"stop."')


def test_unsupervised_trainer_learns_abbreviation():
    """'apx.' is not in the seed list — corpus evidence (always
    period-final, short type) must teach it.  (The exp(-len) length
    factor makes long types near-unlearnable by design, per the paper —
    real abbreviations are short.)"""
    corpus = " ".join(
        f"the value was apx. {i} units in sample {i}." for i in range(50)
    )
    sp = PunktSplitter()
    assert "apx" not in sp.params.abbrev_types
    sp.train(corpus)
    assert "apx" in sp.params.abbrev_types
    out = sp.tokenize("We measured apx. five units. The rest followed.")
    assert out[0] == "We measured apx. five units."


def test_trainer_learns_sentence_starter_rescues_abbrev_boundary():
    """A frequent capitalized sentence starter after an abbreviation
    forces the boundary even though the abbreviation suppresses it."""
    # varied sentence-final words: a constant ender would (correctly,
    # per the algorithm) be learned as an always-period-final
    # abbreviation and suppress every boundary in this synthetic corpus
    corpus = " ".join(
        f"sample {i} was type{i % 7}. However the control {i} gave result{i % 5}."
        for i in range(60)
    )
    sp = PunktSplitter().train(corpus)
    assert "however" in sp.params.sent_starters
    out = sp.tokenize("Dosing followed Fig. However the outcome differed.")
    assert out == ["Dosing followed Fig.", "However the outcome differed."]


def test_empty_and_degenerate():
    assert sent_tokenize_punkt("") == []
    assert sent_tokenize_punkt("   ") == []
    assert sent_tokenize_punkt("no terminal punctuation") == ["no terminal punctuation"]


def test_pipeline_runs_with_punkt_splitter(spark, fixtures, mesh):
    """End-to-end with sentence_splitter='punkt': same positive triples
    as the regex contract on the fixture corpus (whose sentences are
    simple enough for both splitters to agree on boundaries)."""
    from relation_extraction_cdr_spark.plans.pipeline import score_candidates

    pages, _, gold = fixtures
    regex_pos = {
        (r["url"], r["chem_mesh"], r["dis_mesh"])
        for r in score_candidates(pages, mesh, gold=gold).collect()
        if r["pred"] == 1
    }
    punkt_pos = {
        (r["url"], r["chem_mesh"], r["dis_mesh"])
        for r in score_candidates(
            pages, mesh, gold=gold, sentence_splitter="punkt"
        ).collect()
        if r["pred"] == 1
    }
    assert punkt_pos == regex_pos and len(punkt_pos) > 0


def test_realigned_closer_not_duplicated():
    """A closing quote absorbed by boundary realignment must not also
    begin the next sentence (previously produced overlapping spans and
    a duplicated character)."""
    sp = PunktSplitter()
    text = 'He said "stop." Then he left.'
    spans = sp.span_tokenize(text)
    assert all(b[0] >= a[1] for a, b in zip(spans, spans[1:])), spans
    assert "".join(text[s:e] for s, e in spans).replace(" ", "") == text.replace(
        " ", ""
    )


def test_ortho_context_tracks_current_token():
    """Sentence-initial lowercase types must record BEG_LC (8), not
    MID_LC — the training loop previously lagged first_of_sentence by
    one token."""
    sp = PunktSplitter()
    sp.train(
        "He slept well. the dog barked loudly. the cat ran away. "
        "the dog barked loudly."
    )
    assert sp.params.ortho_context.get("the") == 8
