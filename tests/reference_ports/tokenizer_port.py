"""Literal port of the reference's runtime tokenizer, as a pytest oracle.

The reference tokenizes with a pickled transformers==2.11
``ElectraTokenizer`` (reference utils/trainer_utils.py:9-18: the public
google/electra-small-discriminator checkpoint plus added ``[E]``/``[/E]``
tokens, stored lowercased because do_lower_case=True).  This module
transcribes, step by step and without any optimization, the exact code
path ``tokenizer.encode(text)`` executes in transformers 2.11:

- ``PreTrainedTokenizer.tokenize``: the lowercase-protecting-specials
  regex substitution, then ``split_on_tokens`` over
  ``unique_added_tokens_encoder`` with the per-fragment ``rstrip()``;
- ``BertTokenizer._tokenize``: BasicTokenizer (clean text, CJK padding,
  whitespace split, lower + NFD accent strip, punctuation split — the
  same char-class helpers the reference vendors at
  models/tokenization.py:197-234) then WordpieceTokenizer (greedy
  longest-match-first, ``##`` continuation, 100-char cap);
- ``convert_tokens_to_ids``: added-tokens dict first, vocab, [UNK];
- ``encode``: [CLS] + ids + [SEP] (add_special_tokens defaults True).

Deliberately naive: per-char loops, no caches, the regex lowercase pass
always (no ASCII fast path) — an independent implementation for the
engine kernel (relation_extraction_cdr_spark/functions/wordpiece.py) to
be compared against.
"""

from __future__ import annotations

import itertools
import re
import unicodedata

from relation_extraction_cdr_spark.functions.wordpiece import VOCAB as _VOCAB

VOCAB = dict(_VOCAB)  # token -> id (same committed vocab file)
ADDED_TOKENS_ENCODER = {"[e]": 30522, "[/e]": 30523}
ALL_SPECIAL_TOKENS = ["[UNK]", "[SEP]", "[PAD]", "[CLS]", "[MASK]"]
UNIQUE_ADDED_TOKENS_ENCODER = set(ALL_SPECIAL_TOKENS) | {"[e]", "[/e]"}
UNK_TOKEN = "[UNK]"
MAX_INPUT_CHARS_PER_WORD = 100


# --- char classes (models/tokenization.py:197-234 / tokenization_bert) ------

def _is_whitespace(char):
    if char == " " or char == "\t" or char == "\n" or char == "\r":
        return True
    cat = unicodedata.category(char)
    if cat == "Zs":
        return True
    return False


def _is_control(char):
    if char == "\t" or char == "\n" or char == "\r":
        return False
    cat = unicodedata.category(char)
    if cat.startswith("C"):
        return True
    return False


def _is_punctuation(char):
    cp = ord(char)
    if (cp >= 33 and cp <= 47) or (cp >= 58 and cp <= 64) or (cp >= 91 and cp <= 96) or (cp >= 123 and cp <= 126):
        return True
    cat = unicodedata.category(char)
    if cat.startswith("P"):
        return True
    return False


def whitespace_tokenize(text):
    text = text.strip()
    if not text:
        return []
    return text.split()


# --- BasicTokenizer ----------------------------------------------------------

class BasicTokenizer:
    def __init__(self, do_lower_case=True, never_split=None, tokenize_chinese_chars=True):
        self.do_lower_case = do_lower_case
        self.never_split = never_split if never_split is not None else []
        self.tokenize_chinese_chars = tokenize_chinese_chars

    def tokenize(self, text, never_split=None):
        never_split = self.never_split + (never_split if never_split is not None else [])
        text = self._clean_text(text)
        if self.tokenize_chinese_chars:
            text = self._tokenize_chinese_chars(text)
        orig_tokens = whitespace_tokenize(text)
        split_tokens = []
        for token in orig_tokens:
            if self.do_lower_case and token not in never_split:
                token = token.lower()
                token = self._run_strip_accents(token)
            split_tokens.extend(self._run_split_on_punc(token, never_split))
        return whitespace_tokenize(" ".join(split_tokens))

    def _run_strip_accents(self, text):
        text = unicodedata.normalize("NFD", text)
        output = []
        for char in text:
            cat = unicodedata.category(char)
            if cat == "Mn":
                continue
            output.append(char)
        return "".join(output)

    def _run_split_on_punc(self, text, never_split=None):
        if never_split is not None and text in never_split:
            return [text]
        chars = list(text)
        i = 0
        start_new_word = True
        output = []
        while i < len(chars):
            char = chars[i]
            if _is_punctuation(char):
                output.append([char])
                start_new_word = True
            else:
                if start_new_word:
                    output.append([])
                start_new_word = False
                output[-1].append(char)
            i += 1
        return ["".join(x) for x in output]

    def _tokenize_chinese_chars(self, text):
        output = []
        for char in text:
            cp = ord(char)
            if self._is_chinese_char(cp):
                output.append(" ")
                output.append(char)
                output.append(" ")
            else:
                output.append(char)
        return "".join(output)

    def _is_chinese_char(self, cp):
        if (
            (cp >= 0x4E00 and cp <= 0x9FFF)
            or (cp >= 0x3400 and cp <= 0x4DBF)
            or (cp >= 0x20000 and cp <= 0x2A6DF)
            or (cp >= 0x2A700 and cp <= 0x2B73F)
            or (cp >= 0x2B740 and cp <= 0x2B81F)
            or (cp >= 0x2B820 and cp <= 0x2CEAF)
            or (cp >= 0xF900 and cp <= 0xFAFF)
            or (cp >= 0x2F800 and cp <= 0x2FA1F)
        ):
            return True
        return False

    def _clean_text(self, text):
        output = []
        for char in text:
            cp = ord(char)
            if cp == 0 or cp == 0xFFFD or _is_control(char):
                continue
            if _is_whitespace(char):
                output.append(" ")
            else:
                output.append(char)
        return "".join(output)


# --- WordpieceTokenizer -------------------------------------------------------

class WordpieceTokenizer:
    def __init__(self, vocab, unk_token, max_input_chars_per_word=100):
        self.vocab = vocab
        self.unk_token = unk_token
        self.max_input_chars_per_word = max_input_chars_per_word

    def tokenize(self, text):
        output_tokens = []
        for token in whitespace_tokenize(text):
            chars = list(token)
            if len(chars) > self.max_input_chars_per_word:
                output_tokens.append(self.unk_token)
                continue
            is_bad = False
            start = 0
            sub_tokens = []
            while start < len(chars):
                end = len(chars)
                cur_substr = None
                while start < end:
                    substr = "".join(chars[start:end])
                    if start > 0:
                        substr = "##" + substr
                    if substr in self.vocab:
                        cur_substr = substr
                        break
                    end -= 1
                if cur_substr is None:
                    is_bad = True
                    break
                sub_tokens.append(cur_substr)
                start = end
            if is_bad:
                output_tokens.append(self.unk_token)
            else:
                output_tokens.extend(sub_tokens)
        return output_tokens


_basic = BasicTokenizer(do_lower_case=True, never_split=[], tokenize_chinese_chars=True)
_wordpiece = WordpieceTokenizer(vocab=VOCAB, unk_token=UNK_TOKEN,
                                max_input_chars_per_word=MAX_INPUT_CHARS_PER_WORD)


def _tokenize_fragment(text):
    """BertTokenizer._tokenize (do_basic_tokenize=True path)."""
    split_tokens = []
    for token in _basic.tokenize(text, never_split=ALL_SPECIAL_TOKENS):
        for sub_token in _wordpiece.tokenize(token):
            split_tokens.append(sub_token)
    return split_tokens


# --- PreTrainedTokenizer.tokenize (transformers 2.11) -------------------------

def tokenize(text):
    all_special_tokens = ALL_SPECIAL_TOKENS

    def lowercase_text(t):
        escaped_special_toks = [re.escape(s_tok) for s_tok in all_special_tokens]
        pattern = r"(" + r"|".join(escaped_special_toks) + r")|" + r"(.+?)"
        return re.sub(pattern, lambda m: m.groups()[0] or m.groups()[1].lower(), t)

    # init_kwargs['do_lower_case'] is True in the shipped pickle
    text = lowercase_text(text)

    def split_on_token(tok, text):
        result = []
        split_text = text.split(tok)
        for i, sub_text in enumerate(split_text):
            sub_text = sub_text.rstrip()
            if i == 0 and not sub_text:
                result += [tok]
            elif i == len(split_text) - 1:
                if sub_text:
                    result += [sub_text]
            else:
                if sub_text:
                    result += [sub_text]
                result += [tok]
        return result

    def split_on_tokens(tok_list, text):
        if not text.strip():
            return []
        if not tok_list:
            return _tokenize_fragment(text)
        tokenized_text = []
        text_list = [text]
        for tok in tok_list:
            tokenized_text = []
            for sub_text in text_list:
                if sub_text not in UNIQUE_ADDED_TOKENS_ENCODER:
                    tokenized_text += split_on_token(tok, sub_text)
                else:
                    tokenized_text += [sub_text]
            text_list = tokenized_text
        return list(
            itertools.chain.from_iterable(
                (
                    _tokenize_fragment(token)
                    if token not in UNIQUE_ADDED_TOKENS_ENCODER
                    else [token]
                    for token in tokenized_text
                )
            )
        )

    # set iteration order is arbitrary in the original; none of the
    # added tokens is a substring of another, so any order is equivalent
    added_tokens = sorted(UNIQUE_ADDED_TOKENS_ENCODER)
    tokenized_text = split_on_tokens(added_tokens, text)
    return tokenized_text


def convert_tokens_to_ids(tokens):
    out = []
    for token in tokens:
        if token in ADDED_TOKENS_ENCODER:
            out.append(ADDED_TOKENS_ENCODER[token])
        else:
            out.append(VOCAB.get(token, VOCAB[UNK_TOKEN]))
    return out


def encode(text):
    """tokenizer.encode(text): [CLS] + ids + [SEP]."""
    return [VOCAB["[CLS]"]] + convert_tokens_to_ids(tokenize(text)) + [VOCAB["[SEP]"]]
