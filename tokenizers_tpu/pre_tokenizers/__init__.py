"""PreTokenizers: offset-preserving word splitting components.

Reference `tokenizers/src/pre_tokenizers/`. Device-side vectorized split
kernels for the hot patterns (GPT-2/Llama-3/whitespace/bert) live in
`tokenizers_tpu.ops.pretok`.
"""

from __future__ import annotations

import unicodedata
from typing import List

import regex as _re

from ..normalized import (
    CONTIGUOUS,
    ISOLATED,
    MERGED_WITH_NEXT,
    MERGED_WITH_PREVIOUS,
    REMOVED,
    NormalizedString,
    _is_whitespace,
)
from ..pattern import Invert, SysRegex
from ..pretokenized import PreTokenizedString


class PreTokenizer:
    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        raise NotImplementedError

    def pre_tokenize_str(self, sequence: str):
        p = PreTokenizedString(sequence)
        self.pre_tokenize(p)
        return [(s, o) for s, o, _ in p.get_splits("original", "char")]

    @staticmethod
    def custom(obj) -> "CustomPreTokenizer":
        """Wrap a user object with a `pre_tokenize(PreTokenizedString)`
        method (reference `bindings/python/src/pre_tokenizers.rs:146,815`).
        Host-only and non-serializable."""
        return CustomPreTokenizer(obj)


class CustomPreTokenizer(PreTokenizer):
    def __init__(self, obj):
        if not callable(getattr(obj, "pre_tokenize", None)):
            raise TypeError(
                "custom pre-tokenizer must have a "
                "pre_tokenize(PreTokenizedString) method"
            )
        self.obj = obj

    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        self.obj.pre_tokenize(pretokenized)


class Sequence(PreTokenizer):
    def __init__(self, pretokenizers: List[PreTokenizer]):
        self.pretokenizers = list(pretokenizers)

    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        for p in self.pretokenizers:
            p.pre_tokenize(pretokenized)

    def __getitem__(self, i):
        return self.pretokenizers[i]

    def __len__(self):
        return len(self.pretokenizers)


# Rust regex `\w` == [\p{Alphabetic}\p{M}\p{Nd}\p{Pc}\p{Join_Control}]
_WORD_CLASS = r"[\p{Alphabetic}\p{M}\p{Nd}\p{Pc}\p{Join_Control}]"
_WHITESPACE_RE = _re.compile(rf"{_WORD_CLASS}+|[^{_WORD_CLASS[1:-1]}\s]+")


class Whitespace(PreTokenizer):
    """Split keeping `\\w+|[^\\w\\s]+` matches
    (reference `pre_tokenizers/whitespace.rs:12`)."""

    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        pretokenized.split(
            lambda i, normalized: normalized.split(Invert(_WHITESPACE_RE), REMOVED)
        )

    def pre_tokenize_str(self, sequence: str):
        # Fast path: with no upstream normalization the match spans ARE
        # the char offsets, so skip the NormalizedString machinery — this
        # is the trainer-feed hot loop (reference rayon-parallel word
        # counting, `models/bpe/trainer.rs:609-638`); one C-level
        # finditer pass per line instead of per-split alignment tracking.
        return [
            (m.group(), m.span()) for m in _WHITESPACE_RE.finditer(sequence)
        ]


class WhitespaceSplit(PreTokenizer):
    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        pretokenized.split(lambda i, normalized: normalized.split(_is_whitespace, REMOVED))


def _is_punc(c: str) -> bool:
    # ascii punctuation or Unicode category P*
    return (c in "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~") or unicodedata.category(
        c
    ).startswith("P")


class BertPreTokenizer(PreTokenizer):
    """whitespace-remove + punctuation-isolate
    (reference `pre_tokenizers/bert.rs:11`)."""

    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        pretokenized.split(lambda i, s: s.split(_is_whitespace, REMOVED))
        pretokenized.split(lambda i, s: s.split(_is_punc, ISOLATED))


class CharDelimiterSplit(PreTokenizer):
    def __init__(self, delimiter: str):
        if len(delimiter) != 1:
            raise ValueError("delimiter must be a single char")
        self.delimiter = delimiter

    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        d = self.delimiter
        pretokenized.split(lambda i, s: s.split(lambda c: c == d, REMOVED))


class Punctuation(PreTokenizer):
    def __init__(self, behavior: str = ISOLATED):
        self.behavior = behavior

    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        pretokenized.split(lambda i, s: s.split(_is_punc, self.behavior))


def _is_numeric(c: str) -> bool:
    # Rust char::is_numeric == categories Nd, Nl, No
    return unicodedata.category(c).startswith("N")


class Digits(PreTokenizer):
    def __init__(self, individual_digits: bool = False):
        self.individual_digits = individual_digits

    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        if self.individual_digits:
            pretokenized.split(lambda i, s: s.split(_is_numeric, ISOLATED))
        else:
            pretokenized.split(lambda i, s: s.split(_is_numeric, CONTIGUOUS))


class Split(PreTokenizer):
    """Arbitrary pattern + behavior + invert
    (reference `pre_tokenizers/split.rs`)."""

    def __init__(self, pattern, behavior: str, invert: bool = False):
        if isinstance(pattern, tuple) and len(pattern) == 2 and pattern[0] == "Regex":
            self.pattern_kind = "Regex"
            self.pattern_str = pattern[1]
            self.regex = SysRegex(pattern[1])
        elif isinstance(pattern, SysRegex):
            self.pattern_kind = "Regex"
            self.pattern_str = pattern.pattern
            self.regex = pattern
        else:
            self.pattern_kind = "String"
            self.pattern_str = pattern
            self.regex = SysRegex(_re.escape(pattern))
        self.behavior = behavior
        self.invert = invert

    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        if self.invert:
            pretokenized.split(
                lambda i, s: s.split(Invert(self.regex), self.behavior)
            )
        else:
            pretokenized.split(lambda i, s: s.split(self.regex, self.behavior))


class FixedLength(PreTokenizer):
    """Fixed char-count chunks (reference `pre_tokenizers/fixed_length.rs`)."""

    def __init__(self, length: int = 5):
        self.length = length

    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        def split_fn(i, normalized: NormalizedString):
            text = normalized.get()
            if not text:
                return []
            out = []
            # byte offsets of char boundaries
            bpos = [0]
            for c in text:
                bpos.append(bpos[-1] + len(c.encode("utf-8")))
            n = len(text)
            for start_c in range(0, n, self.length):
                end_c = min(start_c + self.length, n)
                out.append(normalized.slice(bpos[start_c], bpos[end_c], "normalized"))
            return out

        pretokenized.split(split_fn)


from .byte_level import ByteLevel  # noqa: E402
from .metaspace import Metaspace, PREPEND_ALWAYS, PREPEND_FIRST, PREPEND_NEVER  # noqa: E402
from .unicode_scripts import UnicodeScripts  # noqa: E402

__all__ = [
    "PreTokenizer",
    "Sequence",
    "Whitespace",
    "WhitespaceSplit",
    "BertPreTokenizer",
    "CharDelimiterSplit",
    "Punctuation",
    "Digits",
    "Split",
    "FixedLength",
    "ByteLevel",
    "Metaspace",
    "UnicodeScripts",
    "PREPEND_ALWAYS",
    "PREPEND_FIRST",
    "PREPEND_NEVER",
]
