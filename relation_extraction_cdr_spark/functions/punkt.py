"""Punkt-equivalent sentence boundary detection (Kiss & Strunk 2006).

The reference splits sentences with ``nltk.tokenize.sent_tokenize``
(reference utils/text_utils.py:46,73,153), i.e. the pre-trained English
Punkt model.  nltk (and its pickled parameters) are not dependencies of
this engine, so this module vendors the PUBLIC algorithm itself — the
unsupervised sentence-boundary system of Kiss & Strunk, "Unsupervised
Multilingual Sentence Boundary Detection" (CL 32(4), 2006), with the
decision thresholds nltk's implementation documents:

- type-based abbreviation detection: a period-final type is an
  abbreviation when Dunning's log-likelihood ratio of P(period|type)
  against P(period), scaled by exp(-len) and the internal-period count
  and penalized by occurrences without a final period, reaches 0.3;
- token-based second pass: ellipses and abbreviations end a sentence
  only when the next token is orthographically a sentence starter;
  single initials ("J. Smith") and numbers never end one unless the
  orthographic evidence says the follower must start a sentence;
- collocation suppression (threshold 7.88) and frequent sentence
  starters (threshold 30), both Dunning-scored;
- orthographic context: per type, whether it has been seen
  uppercase/lowercase sentence-initially vs mid-sentence.

Punkt is UNSUPERVISED: ``PunktSplitter.train(corpus)`` learns the
parameters from raw text of the language/domain being split (exactly how
the algorithm is meant to be deployed — the pre-trained nltk English
pickle is just the algorithm run over WSJ text).  A compact seed
abbreviation list for biomedical English ships as the zero-training
fallback.

Deviations from nltk's implementation (documented contract, tested in
tests/test_punkt.py): the word tokenizer is whitespace-splitting with
leading/trailing bracket/quote isolation rather than nltk's regex
grammar, and boundary realignment handles the common trailing
quote/paren cases.  Both only affect typography the CDR/ALPS corpora do
not contain.

Scale note: training is one aggregation pass over token types (Zipfian,
bounded); splitting is a per-row kernel used inside Arrow-batched UDFs —
the trained parameters are a small plain-dict payload, broadcast-safe.
"""

from __future__ import annotations

import math
import re
from collections import Counter

ABBREV_THRESHOLD = 0.3
COLLOCATION_THRESHOLD = 7.88
SENT_STARTER_THRESHOLD = 30.0
MIN_COLLOC_FREQ = 1

SENT_END_CHARS = (".", "?", "!")

# orthographic-context flags (subset of nltk's _ORTHO_* lattice)
_ORTHO_BEG_UC = 1 << 1  # seen uppercase sentence-initially
_ORTHO_MID_UC = 1 << 2  # seen uppercase mid-sentence
_ORTHO_BEG_LC = 1 << 3  # seen lowercase sentence-initially
_ORTHO_MID_LC = 1 << 4  # seen lowercase mid-sentence

_RE_NUMBER = re.compile(r"^-?[\.,]?\d[\d,\.-]*\.?$")
_RE_INITIAL = re.compile(r"^[^\W\d]\.$", re.UNICODE)
_RE_ELLIPSIS = re.compile(r"\.\.+$")
_RE_BOUNDARY_PUNCT = "\"'`)’”]}"
_RE_LEAD_PUNCT = "\"'`(‘“[{"

# biomedical-English seed abbreviations (zero-training fallback; the
# trainer extends/overrides this from corpus evidence)
DEFAULT_ABBREVS = frozenset(
    """dr mr mrs ms prof fig figs ref refs al et e.g i.e cf vs etc approx
    i.v p.o b.i.d t.i.d q.d s.c i.m mg/kg wk mo yr hr min sec no vol pp
    ed eds inc ltd co corp univ dept est ca""".split()
)


class PunktToken:
    __slots__ = ("tok", "type", "period_final", "sentbreak", "abbr", "ellipsis")

    def __init__(self, tok: str):
        self.tok = tok
        typ = tok.lower()
        if _RE_NUMBER.match(typ.rstrip(".")) or _RE_NUMBER.match(typ):
            typ = "##number##" + ("." if typ.endswith(".") else "")
        self.type = typ
        self.period_final = tok.endswith(".")
        self.sentbreak = False
        self.abbr = False
        self.ellipsis = False

    @property
    def type_no_period(self) -> str:
        return self.type[:-1] if self.type.endswith(".") and len(self.type) > 1 else self.type

    @property
    def type_no_sentperiod(self) -> str:
        return self.type_no_period if self.sentbreak else self.type

    @property
    def first_upper(self) -> bool:
        return bool(self.tok) and self.tok[0].isupper()

    @property
    def first_lower(self) -> bool:
        return bool(self.tok) and self.tok[0].islower()

    @property
    def is_initial(self) -> bool:
        return bool(_RE_INITIAL.match(self.tok))

    @property
    def is_number(self) -> bool:
        return self.type.startswith("##number##")


def _word_spans(text: str) -> list[tuple[int, str]]:
    """(offset, token) pairs: whitespace chunks with leading/trailing
    quote/bracket punctuation isolated as their own tokens."""
    out: list[tuple[int, str]] = []
    for m in re.finditer(r"\S+", text):
        s, chunk = m.start(), m.group(0)
        lead = 0
        while lead < len(chunk) and chunk[lead] in _RE_LEAD_PUNCT:
            out.append((s + lead, chunk[lead]))
            lead += 1
        trail = len(chunk)
        tail: list[tuple[int, str]] = []
        while trail > lead and chunk[trail - 1] in _RE_BOUNDARY_PUNCT:
            trail -= 1
            tail.append((s + trail, chunk[trail]))
        if trail > lead:
            out.append((s + lead, chunk[lead:trail]))
        out.extend(reversed(tail))
    return out


def _dunning_ll(count_a: int, count_b: int, count_ab: int, n: int) -> float:
    """Dunning log-likelihood of P(b|a) != P(b) (the abbreviation score
    core, Kiss & Strunk eq. 1)."""
    p1 = count_b / n
    p2 = 0.99
    null = count_ab * math.log(p1 + 1e-300) + (count_a - count_ab) * math.log(1.0 - p1 + 1e-300)
    alt = count_ab * math.log(p2) + (count_a - count_ab) * math.log(1.0 - p2)
    return -2.0 * (null - alt)


def _col_ll(count_a: int, count_b: int, count_ab: int, n: int) -> float:
    """Two-hypothesis log-likelihood for collocations/starters."""
    p = count_b / n
    p1 = count_ab / (count_a or 1)
    p2 = (count_b - count_ab) / ((n - count_a) or 1)

    def lg(k, m, pr):
        pr = min(max(pr, 1e-10), 1 - 1e-10)
        return k * math.log(pr) + (m - k) * math.log(1.0 - pr)

    null = lg(count_ab, count_a, p) + lg(count_b - count_ab, n - count_a, p)
    alt = lg(count_ab, count_a, p1) + lg(count_b - count_ab, n - count_a, p2)
    return -2.0 * (null - alt)


class PunktParameters:
    def __init__(self):
        self.abbrev_types: set[str] = set(DEFAULT_ABBREVS)
        self.collocations: set[tuple[str, str]] = set()
        self.sent_starters: set[str] = set()
        self.ortho_context: dict[str, int] = {}

    def add_ortho(self, typ: str, flag: int) -> None:
        self.ortho_context[typ] = self.ortho_context.get(typ, 0) | flag


class PunktSplitter:
    """Train on raw text (unsupervised), then split text into sentences
    (or spans).  Deterministic; parameters are plain picklable dicts."""

    def __init__(self, params: PunktParameters | None = None):
        self.params = params or PunktParameters()

    # --- training ------------------------------------------------------

    def train(self, text: str) -> "PunktSplitter":
        toks = [PunktToken(t) for _, t in _word_spans(text)]
        type_fdist: Counter[str] = Counter(t.type for t in toks)
        num_period_toks = sum(1 for t in toks if t.period_final)
        n = len(toks) or 1

        # stage 1: abbreviation types (Kiss & Strunk §4.1)
        seen: set[str] = set()
        for t in toks:
            typ = t.type
            if not typ.endswith(".") or typ == "." or typ in seen:
                continue
            seen.add(typ)
            base = typ[:-1]
            num_nonperiods = len(base.replace(".", "")) or 1
            count_with = type_fdist[typ]
            count_without = type_fdist.get(base, 0)
            ll = _dunning_ll(
                count_with + count_without, num_period_toks, count_with, n
            )
            f_length = math.exp(-num_nonperiods)
            f_periods = base.count(".") + 1
            f_penalty = num_nonperiods ** -count_without if count_without else 1.0
            score = ll * f_length * f_periods * f_penalty
            if score >= ABBREV_THRESHOLD:
                self.params.abbrev_types.add(base)
            else:
                self.params.abbrev_types.discard(base)

        # stage 2: annotate with current abbrevs, learn ortho context,
        # collocations around abbreviations/initials, sentence starters
        self._first_pass(toks)
        pair_fdist: Counter[tuple[str, str]] = Counter()
        starter_fdist: Counter[str] = Counter()
        n_breaks = 0
        prev = None
        first_of_sentence = True
        for t in toks:
            flag = 0
            if t.first_upper:
                flag = _ORTHO_BEG_UC if first_of_sentence else _ORTHO_MID_UC
            elif t.first_lower:
                flag = _ORTHO_BEG_LC if first_of_sentence else _ORTHO_MID_LC
            if flag:
                self.params.add_ortho(t.type_no_sentperiod, flag)
            if prev is not None:
                if prev.sentbreak:
                    n_breaks += 1
                    if not (t.is_number or t.is_initial):
                        starter_fdist[t.type_no_sentperiod] += 1
                if prev.abbr or prev.is_initial or prev.is_number:
                    pair_fdist[(prev.type_no_period, t.type_no_sentperiod)] += 1
            prev = t
            # the NEXT token is sentence-initial iff THIS one ends a
            # sentence (reading prev two tokens back lagged the
            # orthographic flags by one token and attached BEG/MID
            # evidence to the wrong types)
            first_of_sentence = t.sentbreak

        for typ, count in starter_fdist.items():
            cnt_typ = type_fdist[typ] + type_fdist.get(typ + ".", 0)
            if n_breaks and cnt_typ:
                ll = _col_ll(n_breaks, cnt_typ, count, n)
                if ll >= SENT_STARTER_THRESHOLD and n / n_breaks > cnt_typ / count:
                    self.params.sent_starters.add(typ)
        for (a, b), count in pair_fdist.items():
            if count < MIN_COLLOC_FREQ:
                continue
            ca = type_fdist.get(a, 0) + type_fdist.get(a + ".", 0)
            cb = type_fdist.get(b, 0) + type_fdist.get(b + ".", 0)
            if ca and cb:
                ll = _col_ll(ca, cb, count, n)
                if ll >= COLLOCATION_THRESHOLD and n / ca > cb / count:
                    self.params.collocations.add((a, b))
        return self

    # --- annotation ----------------------------------------------------

    def _first_pass(self, toks: list[PunktToken]) -> None:
        for t in toks:
            t.sentbreak = t.abbr = t.ellipsis = False
            if t.tok and t.tok[-1] in ("?", "!"):
                t.sentbreak = True
            elif t.period_final:
                if _RE_ELLIPSIS.search(t.tok):
                    t.ellipsis = True
                elif t.type_no_period in self.params.abbrev_types:
                    t.abbr = True
                else:
                    t.sentbreak = True

    def _ortho_heuristic(self, t: PunktToken):
        """True / False / 'unknown': does this token look like it starts
        a sentence, per accumulated orthographic evidence?"""
        if t.tok and t.tok[0] in (";", ",", ":", ".", "!", "?"):
            return False
        ctx = self.params.ortho_context.get(t.type_no_sentperiod, 0)
        if t.first_upper and (ctx & _ORTHO_BEG_LC) and not (ctx & _ORTHO_MID_UC):
            return True
        if t.first_lower and ((ctx & _ORTHO_MID_LC) or not (ctx & _ORTHO_BEG_UC)):
            return False
        return "unknown"

    def _second_pass(self, toks: list[PunktToken]) -> None:
        for t1, t2 in zip(toks, toks[1:]):
            if not t1.period_final:
                continue
            # collocation binds across the period: never a boundary
            if (
                (t1.type_no_period, t2.type_no_sentperiod) in self.params.collocations
                and not (t1.sentbreak and (t1.is_number or t1.is_initial))
            ):
                t1.sentbreak = False
                t1.abbr = True
                continue
            if t1.abbr or t1.ellipsis:
                heur = self._ortho_heuristic(t2)
                if heur is True:
                    t1.sentbreak = True
                    continue
                if t2.first_upper and t2.type_no_sentperiod in self.params.sent_starters:
                    t1.sentbreak = True
                    continue
            if t1.is_initial or t1.is_number:
                heur = self._ortho_heuristic(t2)
                if heur is False:
                    t1.sentbreak = False
                    t1.abbr = True
                elif heur == "unknown" and t1.is_initial and t2.first_upper:
                    # "J. Smith": unknown follower capitalized after an
                    # initial is read as a name, not a boundary
                    t1.sentbreak = False
                    t1.abbr = True

    # --- splitting -----------------------------------------------------

    def span_tokenize(self, text: str) -> list[tuple[int, int]]:
        spans = _word_spans(text)
        toks = [PunktToken(t) for _, t in spans]
        self._first_pass(toks)
        self._second_pass(toks)
        out: list[tuple[int, int]] = []
        start = None
        consumed = 0  # end of the last realigned boundary
        for (off, tok), t in zip(spans, toks):
            if start is None:
                # a closer absorbed by the previous sentence's
                # realignment must not also begin this one (nltk's
                # realign_boundaries: the next sentence starts AFTER
                # the absorbed punctuation)
                start = max(off, consumed)
            if t.sentbreak:
                end = off + len(tok)
                # boundary realignment: trailing closing quotes/brackets
                # belong to this sentence
                while end < len(text) and text[end] in _RE_BOUNDARY_PUNCT:
                    end += 1
                if end > start:
                    out.append((start, end))
                consumed = end
                start = None
        if start is not None and spans:
            last_off, last_tok = spans[-1]
            end = last_off + len(last_tok)
            if end > start:
                out.append((start, end))
        return out

    def tokenize(self, text: str) -> list[str]:
        return [text[s:e] for s, e in self.span_tokenize(text)]


_DEFAULT = PunktSplitter()


def sent_tokenize_punkt(text: str, splitter: PunktSplitter | None = None) -> list[str]:
    """Module-level convenience mirroring nltk.sent_tokenize's shape."""
    return (splitter or _DEFAULT).tokenize(text)
